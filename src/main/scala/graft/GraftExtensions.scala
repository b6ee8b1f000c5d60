package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions._

/** SQL surface for the custom Catalyst expressions: registered through
  * `SparkSessionExtensions` (`--conf spark.sql.extensions=graft.GraftExtensions`)
  * or imperatively via [[GraftExtensions.register]], so every engine
  * primitive is reachable from pure `spark.sql(...)` — a reference user
  * who lives in SQL can run similarity scoring, shingling, SimHash and
  * LSH bucketing without touching the Scala API. The expressions are the
  * same codegen'd classes the DataFrame ops use; integer parameters must
  * be literals (they parameterize codegen, they are not per-row data).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def intArg(fn: String, e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal parameter, got $other")
  }

  private def strArg(fn: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal parameter, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("hash_bucket_counts", "fixed-order md5 bucket-count feature array of text",
      (args: Seq[Expression]) => args match {
        case Seq(c, s, b) => HashBucketCounts(c,
          strArg("hash_bucket_counts", s), intArg("hash_bucket_counts", b))
        case _ => throw new IllegalArgumentException(
          "hash_bucket_counts(text, salt, numBuckets)")
      }),
    ("array_dot", "dot product of two numeric arrays (double accumulation)",
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayDotProduct(a, b)
        case _ => throw new IllegalArgumentException("array_dot(a, b)")
      }),
    ("array_agree_count", "count of positions where two bigint arrays agree",
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayAgreeCount(a, b)
        case _ => throw new IllegalArgumentException("array_agree_count(a, b)")
      }),
    ("simhash64", "64-bit SimHash over a string-array column",
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c)
        case _ => throw new IllegalArgumentException("simhash64(shingles)")
      }),
    ("word_shingles", "distinct word n-gram shingles of normalized text",
      (args: Seq[Expression]) => args match {
        case Seq(c, n) => WordShingles(c, intArg("word_shingles", n))
        case _ => throw new IllegalArgumentException("word_shingles(text, n)")
      }),
    ("minhash_band_keys", "MinHash LSH band keys of a shingle array",
      (args: Seq[Expression]) => args match {
        case Seq(c, h, b) => MinHashBandKeys(c,
          intArg("minhash_band_keys", h), intArg("minhash_band_keys", b))
        case _ => throw new IllegalArgumentException(
          "minhash_band_keys(shingles, numHashes, bands)")
      }),
    ("minhash_signature", "fixed-size MinHash signature of a shingle array",
      (args: Seq[Expression]) => args match {
        case Seq(c, h) => MinHashSignature(c, intArg("minhash_signature", h))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles, numHashes)")
      }),
    ("sig_band_keys", "LSH band keys of a MinHash signature",
      (args: Seq[Expression]) => args match {
        case Seq(c, b) => SigBandKeys(c, intArg("sig_band_keys", b))
        case _ => throw new IllegalArgumentException(
          "sig_band_keys(signature, bands)")
      }),
    ("lsh_bucket", "sign-random-projection LSH bucket of an embedding",
      (args: Seq[Expression]) => args match {
        case Seq(v, center, bits) => LshBucket(v, center, intArg("lsh_bucket", bits))
        case _ => throw new IllegalArgumentException(
          "lsh_bucket(vec, center, numBits)")
      }),
    ("repetition_signals", "Gopher repetition signals [n_chars, top_n, dup_n, ...]",
      (args: Seq[Expression]) => args match {
        case c +: ns if ns.nonEmpty =>
          RepetitionSignals(c, ns.map(intArg("repetition_signals", _)))
        case _ => throw new IllegalArgumentException(
          "repetition_signals(text, n1 [, n2, ...])")
      }),
    ("kept_tokens", "tokens outside every [s, s+n) shared-gram window (scrub reconstruction)",
      (args: Seq[Expression]) => args match {
        case Seq(ws, starts, n) => KeptTokens(ws, starts, intArg("kept_tokens", n))
        case _ => throw new IllegalArgumentException(
          "kept_tokens(tokens, sorted_starts, n)")
      })
  ).map { case (name, usage, builder) =>
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", null, name, usage, ""),
      builder)
  }

  /** Imperative registration into an existing session (tests, notebooks
    * where the session predates the library). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
