package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read through here so
  * that, on a real cluster, this single point can swap to a catalog /
  * Delta table without touching operator code.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  /** `events.ts` has shipped as two physical parquet types across testdata
    * generations: TIMESTAMP(NANOS) (which Spark reads as int64 only under
    * `nanosAsLong`) and, currently, plain `timestamp[us]`. Dispatch on the
    * dtype Spark actually reads so either generation loads; normalize to
    * session-TZ `TimestampType` (UTC everywhere in this project) so
    * downstream window/interval arithmetic sees one type.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    // a TIMESTAMP(NANOS) file fails at schema inference unless nanosAsLong
    // is set; only mutate the session conf when that generation is present
    val raw = try table(spark, d, "events") catch {
      case e: Exception if Option(e.getMessage).exists(_.contains("NANOS")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        table(spark, d, "events")
    }
    raw.schema("ts").dataType match {
      case LongType =>
        // legacy nanos-as-int64 read: floor-convert nanos → micros, the
        // same truncation DuckDB applies at micro precision
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType | _: TimestampType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        sys.error(s"events.ts: unsupported parquet type $other " +
          "(expected int64 nanos, timestamp, or timestamp_ntz)")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
