package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TrailingWindowFeatures semantics: strictly-before visibility (no label
  * leakage, no same-instant peers), per-entity isolation, NULL-on-empty
  * sums, and the one-exchange plan across horizons. */
class TrailingWindowSpec extends SparkSpec {
  import spark.implicits._

  private val ev = Seq(
    // user 1: events at t = 100, 150, 150, 400
    (1L, 100L, 10L), (2L, 150L, 20L), (3L, 150L, 30L), (4L, 400L, 40L),
    // user 2: isolated singleton at t = 120
    (5L, 120L, 99L)
  ).toDF("event_id", "ts_sec", "v")
    .withColumn("user_id", when(col("event_id") <= 4, 1L).otherwise(2L))

  test("trailing frame is (ts-h, ts) exclusive of the current second") {
    val out = TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(100L))
      .transform(ev)
      .select("event_id", "n_100s", "sum_100s")
      .as[(Long, Long, Option[Long])].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(out(1L) == ((0L, None)))          // nothing before t=100
    assert(out(2L) == ((1L, Some(10L))))     // sees t=100 only — NOT its t=150 peer
    assert(out(3L) == ((1L, Some(10L))))     // same: peers at equal ts are excluded
    assert(out(4L) == ((0L, None)))          // t=400: frame (300, 399] is empty
    assert(out(5L) == ((0L, None)))          // user 2 sees nothing of user 1
  }

  test("multiple horizons: wider frames include more, same rows out") {
    val out = TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(100L, 1000L))
      .transform(ev)
    assert(out.count() == 5)
    val r4 = out.filter(col("event_id") === 4)
      .select("n_100s", "n_1000s", "sum_1000s")
      .as[(Long, Long, Option[Long])].head()
    assert(r4 == ((0L, 3L, Some(60L)))) // 1d-style horizon sees all three priors
  }

  test("horizons share one exchange + sort (single shuffle, single sort)") {
    val plan = TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(100L, 1000L))
      .transform(ev).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one exchange, got $exchanges in:\n$plan")
    assert(sorts == 1, s"expected one sort, got $sorts in:\n$plan")
  }

  test("ensemble save/load round-trips the op") {
    import graft.core.{Ensemble, EnsemblePersistence}
    val op = TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(100L, 1000L))
    val dir = java.nio.file.Files.createTempDirectory("tw_roundtrip").toString
    EnsemblePersistence.save(Ensemble(Seq(op), ev.schema), dir, spark)
    val loaded = EnsemblePersistence.load(dir, spark)
    assert(loaded.transform(ev).orderBy("event_id").collect().toSeq ==
      op.transform(ev).orderBy("event_id").collect().toSeq)
  }

  test("fail fast: non-numeric ts, output collisions, bad horizons") {
    val tsTyped = ev.withColumn("ts_t", timestamp_seconds(col("ts_sec")))
    intercept[IllegalArgumentException] {
      TrailingWindowFeatures("user_id", "ts_t", "v", Seq(100L))
        .transform(tsTyped) }
    intercept[IllegalArgumentException] {
      TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(100L))
        .transform(ev.withColumn("n_100s", lit(0L))) }
    intercept[IllegalArgumentException] {
      TrailingWindowFeatures("user_id", "ts_sec", "v", Seq.empty) }
    intercept[IllegalArgumentException] {
      TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(100L, 100L)) }
    intercept[IllegalArgumentException] {
      TrailingWindowFeatures("user_id", "ts_sec", "v", Seq(-5L)) }
  }
}
