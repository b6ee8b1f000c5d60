package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{transform => arrayTransform}
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TextFunctions => T}

/** Repetition-based quality signals for LLM pre-training corpora — the
  * Gopher/MassiveText repetition filters (Rae et al. 2021, §A1.1): the
  * fraction of characters covered by the single most-frequent word n-gram
  * (n small: catches boilerplate headers) and the fraction of characters
  * in n-grams that occur more than once (n larger: catches templated /
  * machine-generated spam). Documents dominated by repetition are dropped.
  *
  * Scale design: one pass builds (n, gram) pairs for ALL configured n per
  * row (codegen'd array expressions, no shuffle), a single explode +
  * groupBy(doc, n, gram) counts occurrences — this is the only shuffle and
  * it is keyed by (doc_id, n, gram), so it partial-aggregates map-side and
  * spreads evenly regardless of document-length skew — then one conditional
  * aggregation per doc pivots the per-n signals wide and a final join
  * attaches them to the ids. Never all-pairs, never a window, never a
  * driver collect; at 100 TB the cost is ~k scans of each word array per
  * row plus one gram-keyed shuffle (the same order of work as shingling
  * for MinHash).
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
    val base = df.select(col(idCol), T.normalize(col(textCol)).as("_norm"))
      .withColumn("_chars", length(col("_norm")))
    // one (n, gram) pair per positional n-gram occurrence, all n at once
    val tagged = flatten(array(allNs.map { n =>
      arrayTransform(T.wordShingles(col("_norm"), n),
        g => struct(lit(n).as("n"), g.as("g")))
    }: _*))
    val counts = base
      .select(col(idCol), explode(tagged).as("t"))
      .groupBy(col(idCol), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cnt"))
    // per-(doc, n): chars covered by the top gram / by duplicated grams
    val perN = counts.groupBy(col(idCol), col("n")).agg(
      max(col("cnt") * length(col("g"))).as("top_chars"),
      sum(when(col("cnt") > 1, col("cnt") * length(col("g"))).otherwise(lit(0L)))
        .as("dup_chars"))
    // pivot wide with conditional aggregation (no Spark `pivot` — this way
    // the output columns and their order are statically known)
    val aggCols =
      allNs.map(n => max(when(col("n") === n, col("top_chars"))).as(s"_top$n")) ++
        allNs.map(n => max(when(col("n") === n, col("dup_chars"))).as(s"_dup$n"))
    val wide = perN.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val joined = base.join(wide, Seq(idCol), "left")
    def bpOf(chars: Column): Column = T.bp(coalesce(chars, lit(0L)), col("_chars"))
    val topCols = topNs.map(n => bpOf(col(s"_top$n")).as(s"top${n}_bp"))
    val dupCols = dupNs.map(n => bpOf(col(s"_dup$n")).as(s"dup${n}_bp"))
    val keep = (
      topNs.map(n => bpOf(col(s"_top$n")) <= topBpMax(n)) ++
        dupNs.map(n => bpOf(col(s"_dup$n")) <= dupBpMax(n))
    ).reduce(_ && _)
    joined.select(
      col(idCol) +: col("_chars").as("n_chars_norm") +:
        (topCols ++ dupCols) :+ keep.as("keep"): _*)
  }
}
