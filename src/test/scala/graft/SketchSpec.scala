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
