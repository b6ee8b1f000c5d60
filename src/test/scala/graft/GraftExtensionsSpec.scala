package graft

import org.apache.spark.sql.functions._
import graft.functions.{FastExpressions, TextFunctions => T}

/** The SQL surface must evaluate identically to the Column API — same
  * expression classes, so this pins the registration plumbing. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered = { GraftExtensions.register(spark); true }

  test("array_dot and lsh_bucket work from pure SQL") {
    assert(registered)
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT array_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(sql == 11.0)
    val viaApi = spark.table("vecs")
      .select(FastExpressions.lshBucket(col("a"), array(lit(0.0), lit(0.0)), 4).as("bkt"))
      .head().getInt(0)
    val viaSql = spark.sql(
      "SELECT lsh_bucket(a, array(0.0D, 0.0D), 4) AS bkt FROM vecs").head().getInt(0)
    assert(viaApi == viaSql)
    val agree = spark.sql(
      "SELECT array_agree_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS c")
      .head().getInt(0)
    assert(agree == 2, "signature-agreement kernel reachable from SQL")
    // the whole minhash pipeline from pure SQL: shingle → signature →
    // band keys, identical to the DataFrame API's expressions
    val bands = spark.sql(
      """SELECT sig_band_keys(minhash_signature(
        |  word_shingles('the quick brown fox jumps high', 3), 8), 4) AS bk""".stripMargin)
      .head().getSeq[Long](0)
    val viaApi2 = Seq("the quick brown fox jumps high").toDF("text")
      .select(FastExpressions.sigBandKeys(
        FastExpressions.minhashSignature(
          FastExpressions.wordShingles(col("text"), 3), 8), 4).as("bk"))
      .head().getSeq[Long](0)
    assert(bands == viaApi2 && bands.size == 4)
  }

  test("word_shingles, simhash64 and repetition_signals work from pure SQL") {
    assert(registered)
    Seq(("the cat sat on the mat the cat sat")).toDF("text")
      .createOrReplaceTempView("docs")
    val apiShingles = spark.table("docs")
      .select(T.shingleSet(col("text"), 3).as("sh")).head().getSeq[String](0)
    val sqlShingles = spark.sql("SELECT word_shingles(text, 3) AS sh FROM docs")
      .head().getSeq[String](0)
    assert(apiShingles == sqlShingles)
    val apiHash = spark.table("docs")
      .select(FastExpressions.simhash64(T.shingleSet(col("text"), 3))).head().getLong(0)
    val sqlHash = spark.sql(
      "SELECT simhash64(word_shingles(text, 3)) FROM docs").head().getLong(0)
    assert(apiHash == sqlHash)
    val sig = spark.sql(
      "SELECT repetition_signals(text, 2, 3) AS s FROM docs").head().getSeq[Long](0)
    assert(sig.length == 5 && sig.head > 0, s"got $sig")
  }

  test("kept_tokens works from pure SQL (scrub reconstruction)") {
    assert(registered)
    val kept = spark.sql(
      "SELECT kept_tokens(array('a','b','c','d','e'), array(1), 2) AS k")
      .head().getSeq[String](0)
    assert(kept == Seq("a", "d", "e"), s"window [1,3) scrubbed: got $kept")
  }

  test("hash_bucket_counts works from pure SQL and matches the Scala API") {
    assert(registered)
    val api = Seq("A b  C").toDF("text")
      .select(graft.functions.FastExpressions
        .hashBucketCounts($"text", "graft-qc", 8).as("f"))
      .head().getSeq[Double](0)
    val sql = spark.sql(
      "SELECT hash_bucket_counts('A b  C', 'graft-qc', 8) AS f")
      .head().getSeq[Double](0)
    assert(api == sql && api.sum == 3.0, s"api=$api sql=$sql")
  }

  test("non-literal integer parameters are rejected with a clear error") {
    assert(registered)
    Seq(("x y z", 2)).toDF("text", "n").createOrReplaceTempView("docs2")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, n) FROM docs2").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }
}
