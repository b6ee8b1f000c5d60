package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

/** Reciprocal-rank fusion of two ranked candidate lists — the hybrid-
  * retrieval composition stage: the reference serves single-index ANN
  * retrieval (QueryFaiss, /root/reference/merlin/systems/dag/ops/faiss.py:
  * 90-112); production retrieval stacks fuse several rankers (lexical
  * BM25, dense ANN, popularity/quality priors) into one candidate list.
  * RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
  * training-free fusion: `score(d) = Σ_lists 1/(k0 + rank_list(d))`,
  * robust to incomparable score scales because it uses only ranks.
  *
  * Input = ranked list A `(queryCol, itemCol, rankCol)`; `other` = ranked
  * list B with the same three columns. Items missing from one list simply
  * contribute nothing from it (the standard convention). Output = top-k
  * per query by fused score, ties broken by item id.
  *
  * Scale: one (query, item) equi-join of two ALREADY-BOUNDED candidate
  * lists (each ≤ per-query fan-out rows, never corpus-sized) + one
  * per-query window over ≤ |A|+|B| rows — shuffle keys are the query id,
  * nothing global. The fused score is two exact IEEE divisions and an
  * add, so results hash-match cross-engine.
  */
case class ReciprocalRankFusion(
    other: DataFrame,
    queryCol: String = "query_id",
    itemCol: String = "doc_id",
    rankCol: String = "rank",
    k0: Int = 60,
    topk: Int = 10,
    outputCol: String = "rrf_score") extends EnsembleOp {

  require(k0 >= 1, s"$name: k0 must be >= 1 (standard RRF uses 60), got $k0")
  require(topk >= 1, s"$name: topk must be >= 1, got $topk")

  private def requireRanked(sch: StructType, which: String): Unit = {
    Seq(queryCol, itemCol, rankCol).foreach(c =>
      require(sch.fieldNames.contains(c),
        s"$name: $which list is missing required column '$c' in ${sch.simpleString}"))
    val integral = sch(rankCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"$name: $which list rank '$rankCol' must be integral, got ${sch(rankCol).dataType.sql}")
  }

  override def transformSchema(in: StructType): StructType = {
    requireRanked(in, "input")
    requireRanked(other.schema, "other")
    require(in(itemCol).dataType == other.schema(itemCol).dataType,
      s"$name: item dtype mismatch — input ${in(itemCol).dataType.simpleString} vs " +
        s"other ${other.schema(itemCol).dataType.simpleString}")
    require(in(queryCol).dataType == other.schema(queryCol).dataType,
      s"$name: query dtype mismatch — input ${in(queryCol).dataType.simpleString} vs " +
        s"other ${other.schema(queryCol).dataType.simpleString}")
    StructType(Seq(
      in(queryCol),
      StructField(rankCol, IntegerType, nullable = false),
      in(itemCol),
      StructField(outputCol, DoubleType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    transformSchema(df.schema)
    val a = df.select(col(queryCol), col(itemCol), col(rankCol).as("__rrf_a"))
    val b = other.select(col(queryCol), col(itemCol), col(rankCol).as("__rrf_b"))
    // full outer: an item ranked by either list is a fusion candidate
    val joined = a.join(b, Seq(queryCol, itemCol), "full_outer")
    val score =
      coalesce(lit(1.0) / (lit(k0) + col("__rrf_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0) + col("__rrf_b")), lit(0.0))
    val w = Window.partitionBy(queryCol).orderBy(desc(outputCol), col(itemCol))
    joined.withColumn(outputCol, score)
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= topk)
      .select(col(queryCol), col(rankCol), col(itemCol), col(outputCol))
  }
}
