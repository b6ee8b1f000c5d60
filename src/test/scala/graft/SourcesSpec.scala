package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage (SURVEY.md §2.6): parquet is exercised everywhere;
  * this suite covers CSV (with and without header — the reference's
  * conftest fixture variants) and partitioned parquet sinks. */
class SourcesSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  // Environment-drift canary: the driver regenerated events.parquet between
  // rounds (TIMESTAMP(NANOS)/int64 → timestamp[us]) and the loader's nanos
  // workaround silently broke 11 queries + the bench (round 5). Reading the
  // REAL testdata here makes the next drift fail `sbt test`, not the round
  // artifact.
  test("Tables.events reads the real testdata and yields usable timestamps") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.count() > 0)
    // timestamp arithmetic must analyze and execute (the round-5 failure
    // mode was an analyzer error on exactly this kind of expression)
    val windowed = ev.groupBy(window(col("ts"), "1 hour")).count()
    assert(windowed.count() > 0)
    val hours = ev.select(max(col("ts")).cast("long") - min(col("ts")).cast("long"))
      .head().getLong(0)
    assert(hours > 0, "ts range must be non-degenerate")
  }

  test("csv round-trip (header) preserves values under an explicit schema") {
    val src = Tables.customer(spark, "/root/testdata/sf0.001")
    val dir = tmp("csv_h")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    assert(back.count() == src.count())
    val a = src.orderBy("c_custkey").collect().toSeq
    val b = back.orderBy("c_custkey").collect().toSeq
    assert(a == b)
  }

  test("headerless csv reads positionally with a supplied schema") {
    val src = Tables.nation(spark, "/root/testdata/sf0.001")
    val dir = tmp("csv_nh")
    src.write.mode("overwrite").csv(dir)
    val back = spark.read.schema(src.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("json lines round-trip under an explicit schema") {
    val src = Tables.region(spark, "/root/testdata/sf0.001")
    val dir = tmp("jsonl")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      src.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip preserves values and pushes filters") {
    val src = Tables.supplier(spark, "/root/testdata/sf0.001")
    val dir = tmp("orc")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
    val filtered = back.filter(col("s_suppkey") >= 10)
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(s_suppkey), GreaterThanOrEqual(s_suppkey,10)]"),
      "predicate must reach the ORC scan")
  }

  test("partitioned parquet sink prunes partitions on read") {
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
    val dir = tmp("part_sink")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val expected = src.filter(col("o_orderstatus") === "F").count()
    assert(back.count() == expected)
    // partition pruning: the scan must touch only the o_orderstatus=F dir
    val scan = back.queryExecution.executedPlan.toString
    assert(!scan.contains("o_orderstatus=O"), "pruned partitions must not be listed")
  }

  // The 100 TB co-location story: two fact tables bucketed on the join key
  // join WITHOUT any shuffle — the scan partitioning satisfies the join's
  // distribution requirement. At cluster scale this is how repeated joins
  // on the same key (user_id, item_id) amortize their shuffle to zero.
  test("bucketed tables join with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a killed previous JVM can leave the warehouse dirs behind with no
    // catalog entry — DROP above won't clear them, so remove the locations
    // recursively (a mid-write kill leaves nested _temporary/... dirs)
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete()
    }
    val wh = new java.io.File("spark-warehouse")
    Seq("b_orders", "b_lineitem").foreach(t => rmTree(new java.io.File(wh, t)))
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_partkey"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed scans:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
