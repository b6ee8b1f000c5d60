package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TopKAggregator, VectorFunctions}

/** Top-k similarity retrieval — the Spark-native `QueryFaiss`
  * (/root/reference/merlin/systems/dag/ops/faiss.py:90-112): for each query
  * embedding, return the k nearest item ids by inner product (or cosine).
  *
  * Physical shape: `queries × broadcast(items)` scored per pair, then the
  * bounded-heap [[TopKAggregator]] keeps k per query with map-side combine —
  * no global sort, no window over the full candidate set. The item matrix
  * plays the role of the FAISS index (precomputed, broadcast); at 100 TB of
  * queries the work is embarrassingly parallel over query partitions. For
  * item sets too big to broadcast, see `AnnLsh` (bucketed candidate
  * generation) — the IVF/nprobe analog.
  */
case class TopKRetrieval(
    items: DataFrame,
    queryIdCol: String,
    queryVecCol: String,
    itemIdCol: String = "item_id",
    itemVecCol: String = "embedding",
    k: Int = 10,
    metric: String = "dot", // dot | cosine
    outputCol: String = "candidate_ids") extends EnsembleOp {

  require(k >= 1, s"$name: k must be >= 1, got $k")

  private def score(q: Column, it: Column): Column = metric match {
    case "dot"    => VectorFunctions.dot(q, it)
    case "cosine" => VectorFunctions.cosine(q, it)
    case m        => throw new IllegalArgumentException(s"$name: unknown metric $m")
  }

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, queryIdCol); requireCol(in, queryVecCol)
    require(in(queryVecCol).dataType.isInstanceOf[ArrayType], s"$name: $queryVecCol must be array")
    StructType(Seq(
      in(queryIdCol),
      StructField(outputCol, ArrayType(LongType)),
      StructField("candidate_scores", ArrayType(DoubleType))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    // the same null discipline on the ITEM side: a null (or
    // dimension-mismatched — ArrayDotProduct yields NULL) item vector
    // would otherwise score 0.0 against every query via the tuple
    // encoder's coercion and surface as a phantom candidate above all
    // negatively-scored true neighbors
    val it = broadcast(items
      .where(col(itemVecCol).isNotNull)
      .select(col(itemIdCol).cast("long").as("__item_id"),
        col(itemVecCol).as("__item_vec")))
    // a null query vector has no similarity to anything: drop the row
    // (same contract as AnnLsh, whose null bucket never joins) — without
    // this, the tuple encoder silently coerces the null score to 0.0 and
    // the user receives arbitrary candidates "scored" 0. distinct():
    // duplicate request rows would feed every item twice and duplicate
    // ids inside top-k (PredictImplicit.requestedUsers discipline)
    df.where(col(queryVecCol).isNotNull)
      .select(col(queryIdCol), col(queryVecCol)).distinct()
      .join(it)  // broadcast nested loop: every query scores every item
      .groupBy(col(queryIdCol))
      .agg(topk(col("__item_id"), coalesce(score(col(queryVecCol), col("__item_vec")),
        lit(Double.NaN))).as("__top"))
      .select(col(queryIdCol),
        col("__top.ids").as(outputCol),
        col("__top.scores").as("candidate_scores"))
  }

  /** Relational form: one row per (query, rank, item) — used by the
    * correctness oracle where arrays of ties are awkward to hash. */
  def asRows(df: DataFrame): DataFrame =
    transform(df).select(col(queryIdCol),
      posexplode(arrays_zip(col(outputCol), col("candidate_scores"))).as(Seq("pos", "pair")))
      .select(col(queryIdCol), (col("pos") + 1).as("rank"),
        col(s"pair.$outputCol").as("item_id"), col("pair.candidate_scores").as("score"))
}
