package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design-for-scale pins for the skew-stress path (`op_salted_join_skew`):
  * a 100:1 hot key makes one unsalted shuffle partition a straggler
  * holding ~half the fact, and the salt restores the per-task ceiling.
  * The pins measure REAL partition sizes under the same HashPartitioning
  * a sort-merge join's exchange uses (repartition by the join keys), so
  * "no task reads >10x the median" is checked against actual row
  * placement, not a model of it. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 100:1-skewed fact: key 1 carries ~half the rows, the rest spread
  // over 200 keys — the hot key is ~200x the median group
  private def skewedFact(n: Int) =
    spark.range(n).select(
      when(col("id") % 2 === 0, lit(1L))
        .otherwise(pmod(col("id"), lit(200L))).as("key"),
      col("id").as("row_id"), (col("id") % 10).as("v"))

  private def partitionSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().toSeq

  test("the skew fixture is genuinely 100:1 — the hot key dwarfs the median group") {
    val sizes = skewedFact(40000).groupBy("key").count()
      .select("count").as[Long].collect().sorted
    assert(sizes.max >= 100L * sizes(sizes.length / 2),
      s"hot=${sizes.max} median=${sizes(sizes.length / 2)}")
  }

  test("unsalted, the hot key makes a straggler shuffle partition; " +
      "salted, no partition exceeds 10x the median") {
    val fact = skewedFact(40000)
    // the exchange a sort-merge join performs on the fact side
    val unsalted = partitionSizes(fact.repartition(32, col("key"))).sorted
    val uMax = unsalted.max
    val uMed = math.max(1L, unsalted(unsalted.length / 2))
    assert(uMax > 10L * uMed,
      s"fixture must exhibit the straggler unsalted: max=$uMax median=$uMed")
    // the salted exchange: same rows, keys spread over (key, salt)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(32L)))
    val sSizes = partitionSizes(
      salted.repartition(32, col("key"), col("__salt"))).sorted
    val sMax = sSizes.max
    val sMed = math.max(1L, sSizes(sSizes.length / 2))
    assert(sMax <= 10L * sMed,
      s"salted per-task ceiling violated: max=$sMax median=$sMed")
    // and the mitigation is material, not marginal
    assert(sMax * 4 < uMax,
      s"salting must shrink the straggler: salted max=$sMax unsalted max=$uMax")
  }

  test("the skew bench row runs a sort-merge plan (broadcast would sidestep skew)") {
    val fact = skewedFact(4000)
    val dim = spark.range(0, 200)
      .select(col("id").as("key"), (col("id") % 7).as("grp")).hint("merge")
    val joined = SaltedJoin(dim, on = "key", saltBy = "row_id",
      saltBuckets = 32).transform(fact)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a forced sort-merge join, got:\n$plan")
    // and the salted join still returns exactly the plain-join aggregate
    val got = joined.groupBy("grp").count().orderBy("grp")
      .as[(Long, Long)].collect().toSeq
    val want = fact.join(spark.range(0, 200)
        .select(col("id").as("key"), (col("id") % 7).as("grp")), "key")
      .groupBy("grp").count().orderBy("grp")
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }
}
