package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

/** Offline ranking evaluation — the metric harness every retrieval /
  * recommendation change is judged by (MRR, NDCG@k, recall@k; standard
  * IR metrics, Järvelin & Kekäläinen 2002 for NDCG). Input: a ranked
  * candidate list per query (the output shape of TopKRetrieval / AnnLsh /
  * Bm25Index / PredictImplicit) plus a relevance set; output: one metric
  * row per query.
  *
  * Engine-portable exactness: NDCG's `1/log2(rank+1)` gains are not
  * bit-portable across libm implementations, so the op precomputes the k
  * gains ONCE in Scala as integer NANOS (`floor(1e9/log2(r+1))`) and
  * every downstream number is integer arithmetic — gain sums, the
  * ideal-DCG prefix table, basis-point ratios, floor-micro reciprocal
  * ranks. Metrics therefore hash-match a DuckDB replay from the same
  * literals and are stable under any aggregation order.
  *
  * Scale: one equi-join of the ranked lists against the relevance set on
  * (query, item) — both sides are per-query-bounded (≤ k candidates, the
  * relevance inventory) — then one partial-aggregable groupBy per query;
  * no windows, no sorts beyond what the input rank column already
  * carries. Queries with no relevant items emit NULL recall/NDCG (the
  * metric is undefined, not zero). */
case class EvalRanking(
    relevant: DataFrame,
    k: Int = 10,
    queryCol: String = "query_id",
    itemCol: String = "item_id",
    rankCol: String = "rank") extends EnsembleOp {

  require(k >= 1, s"$name: k must be >= 1")

  val gainNanos: Seq[Long] = EvalRanking.gainNanos(k)
  val idcgNanos: Seq[Long] = EvalRanking.idcgNanos(k)

  /** The relevance-set subplans every [[transform]] call shares: the
    * distinct (query, item) set and the per-query relevant counts. Lazy
    * and exposed so a caller that evaluates the op repeatedly — the
    * per-micro-batch monitoring sink — can persist EXACTLY these frames
    * once; every later transform then reads the cache instead of
    * re-deriving the relevance aggregation per batch (JobTraceProbe r15:
    * each micro-batch re-ran 5.7–7.2 task-s of relevance distinct/count
    * work that is invariant across batches). Plain plans, not caches:
    * persistence is the caller's choice and responsibility. */
  @transient lazy val relFrame: DataFrame =
    relevant.select(col(queryCol), col(itemCol)).distinct()
  @transient lazy val relCountsFrame: DataFrame =
    relFrame.groupBy(queryCol).agg(count(lit(1)).as("__nrel"))

  override def transformSchema(in: StructType): StructType = {
    Seq(queryCol, itemCol, rankCol).foreach(requireCol(in, _))
    require(relevant.schema.fieldNames.contains(queryCol) &&
      relevant.schema.fieldNames.contains(itemCol),
      s"$name: relevance set needs ($queryCol, $itemCol)")
    StructType(Seq(
      in(queryCol),
      StructField("n_rel", LongType, nullable = false),
      StructField("hits", LongType, nullable = false),
      StructField("recall_bp", LongType),
      StructField("rr_micros", LongType, nullable = false),
      StructField("ndcg_bp", LongType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val rel = relFrame
    val relCounts = relCountsFrame
    // a ranked list that repeats an item inside top-k must count ONE hit
    // and ONE gain (at its best rank), or recall_bp can exceed 10000 and
    // DCG double-bills the item — collapse to min rank per (query, item)
    // before the relevance join rather than assuming distinct input
    val topk = df.filter(col(rankCol) <= k)
      .groupBy(queryCol, itemCol).agg(min(col(rankCol)).as(rankCol))
    val gains = typedLit(gainNanos.toArray)
    val hits = topk.join(rel, Seq(queryCol, itemCol))
      .groupBy(queryCol)
      .agg(count(lit(1)).as("__hits"),
        sum(element_at(gains, col(rankCol).cast("int"))).as("__dcg_nanos"),
        min(col(rankCol)).as("__minrank"))
    val idcg = typedLit(idcgNanos.toArray)
    // metric base = every query PRESENT in the ranked input, not only
    // those with top-k rows: a query whose candidates all rank past k
    // must score zero, not vanish (averaging recall only over answered
    // queries overstates quality exactly when retrieval fails). A query
    // with NO input rows at all is outside the op's view — retrievers
    // that emit nothing for a no-match query (BM25) leave those to the
    // caller's accounting (empty-in → empty-out, which is also what
    // keeps the per-batch monitoring sink's stream ≡ batch identity).
    df.select(col(queryCol)).distinct()
      .join(relCounts, Seq(queryCol), "left")
      .join(hits, Seq(queryCol), "left")
      // ideal DCG for this query: the best case places min(n_rel, k)
      // relevant items at the top ranks — a prefix-sum table lookup
      .withColumn("__idcg",
        // greatest(1, ...): element_at is 1-based and errors on index 0;
        // the n_rel = 0 case emits NULL ndcg anyway, the lookup just
        // needs a valid index
        element_at(idcg, greatest(lit(1L),
          least(coalesce(col("__nrel"), lit(0L)), lit(k.toLong))).cast("int")))
      .select(col(queryCol),
        coalesce(col("__nrel"), lit(0L)).as("n_rel"),
        coalesce(col("__hits"), lit(0L)).as("hits"),
        when(coalesce(col("__nrel"), lit(0L)) > 0,
          expr("coalesce(__hits, 0) * 10000 DIV __nrel")).as("recall_bp"),
        coalesce(expr("1000000 DIV __minrank"), lit(0L)).as("rr_micros"),
        when(coalesce(col("__nrel"), lit(0L)) > 0,
          expr("(coalesce(__dcg_nanos, 0) * 10000) DIV __idcg")).as("ndcg_bp"))
    // no output orderBy: presentation ordering belongs to the query layer
    // (a global sort here is a needless range exchange at 1e9 queries)
  }
}

object EvalRanking {
  /** Integer-nanos discounted gain per rank 1..k: floor(1e9 / log2(r+1)).
    * Computed once driver-side (libm log is used ONLY here, at parameter
    * time — never per row, never cross-engine); the ONE definition the
    * op and any oracle replay share. */
  def gainNanos(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(1e9 / (math.log(r + 1) / math.log(2))).toLong)

  /** Ideal-DCG prefix table: idcgNanos(i) = Σ gains(1..i), i in 1..k. */
  def idcgNanos(k: Int): Seq[Long] = gainNanos(k).scanLeft(0L)(_ + _).tail
}
