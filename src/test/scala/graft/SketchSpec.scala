package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: HLL++ distinct counting is engine-specific (no
  * DuckDB oracle possible), so its accuracy contract is pinned here
  * against the exact count instead. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within its rsd bound of the exact count") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = li.agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a"),
      countDistinct(col("l_partkey")).as("e")).head()
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("band keys from stored signatures equal band keys computed live from text") {
    // the identity that makes a persisted signature index joinable
    // against live-hashed ingest batches: SigBandKeys ∘ MinHashSignature
    // ≡ MinHashBandKeys, slot for slot
    import graft.functions.{FastExpressions => F, TextFunctions => T}
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a completely different document about spark and shuffles",
      "short one two three four").toDF("text")
      .select(T.shingleSet(col("text"), 3).as("sh"))
    val rows = docs.select(
      F.sigBandKeys(F.minhashSignature(col("sh"), 64), 16).as("via_sig"),
      F.minhashBandKeys(col("sh"), 64, 16).as("direct"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (viaSig, direct) => assert(viaSig == direct) }
  }

  test("signature slot-agreement estimates Jaccard within sampling error") {
    import graft.functions.{FastExpressions => F, TextFunctions => T}
    import spark.implicits._
    // two docs sharing most shingles: estimator must land near the true
    // Jaccard (k=256 → se ≈ sqrt(j(1-j)/k) ≈ 0.03 at j=0.8; assert ±0.15)
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val b = "one two three four five six seven eight nine ten eleven thirteen"
    val df = Seq((a, b)).toDF("ta", "tb").select(
      T.shingleSet(col("ta"), 3).as("sa"), T.shingleSet(col("tb"), 3).as("sb"))
    val (est, exact) = df.select(
      (size(filter(zip_with(
        F.minhashSignature(col("sa"), 256), F.minhashSignature(col("sb"), 256),
        (x, y) => x === y), m => m)) / lit(256.0)).as("est"),
      (size(array_intersect(col("sa"), col("sb"))) /
        size(array_union(col("sa"), col("sb"))).cast("double")).as("exact"))
      .as[(Double, Double)].head()
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
  }

  test("approx percentile equals exact discrete percentile on integral data") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = li.agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(100000)).as("a"),
      expr("percentile(l_quantity, 0.5)").as("e")).head()
    // on integral-valued data with high accuracy the sketch returns a real
    // element at the median rank; interpolated exact may sit between two
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) <= 1.0)
  }
}
