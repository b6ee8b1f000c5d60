package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{FastExpressions, TextFunctions => T}

/** PII scrubbing for corpus curation (the C4/Dolma-style masking pass):
  * replaces email addresses and IPv4 literals with fixed placeholder
  * tokens and reports per-doc match counts. Row-local regexp work —
  * shuffle-free, codegen'd, linear at any scale. The patterns are chosen
  * to evaluate identically under Java regex (Spark) and RE2 (the DuckDB
  * oracle): character classes, bounded repetition and word boundaries
  * only — no backreferences, no lookaround. */
case class MaskPii(
    textCol: String = "text",
    outCol: String = "text_masked") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, textCol)
    StructType(in ++ Seq(
      StructField("n_emails", IntegerType),
      StructField("n_ips", IntegerType),
      StructField(outCol, StringType)))
  }

  override def transform(df: DataFrame): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(MaskPii.EmailRe), lit(0))))
      .withColumn("n_ips",
        size(regexp_extract_all(col(textCol), lit(MaskPii.Ipv4Re), lit(0))))
      .withColumn(outCol,
        regexp_replace(
          regexp_replace(col(textCol), MaskPii.EmailRe, MaskPii.EmailToken),
          MaskPii.Ipv4Re, MaskPii.IpToken))
}

object MaskPii {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
}

/** Repetition-based quality signals for LLM pre-training corpora — the
  * Gopher/MassiveText repetition filters (Rae et al. 2021, §A1.1): the
  * fraction of characters covered by the single most-frequent word n-gram
  * (n small: catches boilerplate headers) and the fraction of characters
  * in n-grams that occur more than once (n larger: catches templated /
  * machine-generated spam). Documents dominated by repetition are dropped.
  *
  * Scale design: a document's n-gram counts are a ROW-LOCAL fact, so the
  * whole computation is one map over the corpus — the
  * [[graft.functions.RepetitionSignals]] expression normalizes, splits and
  * hash-counts each doc's grams in a single pass and returns all signals
  * as a flat long array. Zero shuffles, zero joins, zero windows; the
  * first cut of this op exploded grams through a (doc, n, gram)-keyed
  * groupBy and was 20× slower at sf0.1 — and at 100 TB that shuffle would
  * have carried ~3× the corpus in gram strings.
  *
  * All ratios are integer basis points over the normalized character count
  * (floor(chars*10000/totalChars)) so the DuckDB oracle matches bit-for-bit.
  */
case class RepetitionStats(
    textCol: String = "text",
    idCol: String = "doc_id",
    topNs: Seq[Int] = Seq(2, 3),
    dupNs: Seq[Int] = Seq(5),
    // Gopher table A1 thresholds: top 2-gram 0.20, top 3-gram 0.18,
    // dup 5-gram 0.15 — kept in basis points.
    topBpMax: Map[Int, Long] = Map(2 -> 2000L, 3 -> 1800L),
    dupBpMax: Map[Int, Long] = Map(5 -> 1500L)) extends EnsembleOp {

  require(topNs.nonEmpty || dupNs.nonEmpty, s"$name: no n-gram sizes configured")
  require(topNs.forall(topBpMax.contains) && dupNs.forall(dupBpMax.contains),
    s"$name: every configured n needs a threshold (topNs=$topNs topBpMax keys=" +
      s"${topBpMax.keys.toSeq.sorted}; dupNs=$dupNs dupBpMax keys=${dupBpMax.keys.toSeq.sorted})")
  private def allNs: Seq[Int] = (topNs ++ dupNs).distinct.sorted

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, textCol)
    requireCol(in, idCol)
    StructType(
      Seq(in(idCol), StructField("n_chars_norm", IntegerType)) ++
        topNs.map(n => StructField(s"top${n}_bp", LongType)) ++
        dupNs.map(n => StructField(s"dup${n}_bp", LongType)) :+
        StructField("keep", BooleanType, nullable = false))
  }

  override def transform(df: DataFrame): DataFrame = {
    // null text → empty doc: zero signals, bp columns null (0-char
    // denominator), keep=false — never a null verdict (EdgeCaseSpec)
    val sig = FastExpressions.repetitionSignals(
      coalesce(col(textCol), lit("")), allNs)
    val base = df.select(col(idCol), sig.as("_s"))
      .withColumn("_chars", element_at(col("_s"), 1))
    def bpOf(n: Int, dup: Boolean): Column = {
      val idx = 1 + 2 * allNs.indexOf(n) + (if (dup) 1 else 0) + 1
      // ANSI-safe: a 0-char doc has no ratio (null → keep coalesces false)
      when(col("_chars") > 0, T.bp(element_at(col("_s"), idx), col("_chars")))
    }
    val topCols = topNs.map(n => bpOf(n, dup = false).as(s"top${n}_bp"))
    val dupCols = dupNs.map(n => bpOf(n, dup = true).as(s"dup${n}_bp"))
    val keep = coalesce(
      (topNs.map(n => bpOf(n, dup = false) <= topBpMax(n)) ++
        dupNs.map(n => bpOf(n, dup = true) <= dupBpMax(n))
      ).reduce(_ && _), lit(false))
    base.select(
      col(idCol) +: col("_chars").cast("int").as("n_chars_norm") +:
        (topCols ++ dupCols) :+ keep.as("keep"): _*)
  }
}
