package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

/** Overlapping token-window chunking — the document → training-example
  * splitter every LLM data pipeline runs before tokenization: each
  * document becomes ⌈(len − overlap) / stride⌉ windows of `chunkSize`
  * whitespace tokens advancing by `stride = chunkSize − overlap`. The
  * LAST chunk is the first window that reaches the end of the document,
  * so a trailing window that would be a pure suffix of its predecessor
  * is never emitted; documents at or under `chunkSize` tokens yield
  * exactly one chunk.
  *
  * Tokenization is [[graft.functions.TextFunctions.words]] (normalize +
  * whitespace split), shared with the dedup/quality family so chunk
  * boundaries and dedup shingles can never disagree on what a token is.
  * A NULL text yields no chunks (explode of a null sequence).
  *
  * Scale: per-row expressions + one explode — shuffle-free, row-local,
  * linear in corpus size; the only data motion is the scan itself.
  */
case class DocumentChunks(
    idCol: String = "doc_id",
    textCol: String = "text",
    chunkSize: Int = 32,
    overlap: Int = 8) extends EnsembleOp {

  require(chunkSize >= 1, s"$name: chunkSize must be >= 1")
  require(overlap >= 0 && overlap < chunkSize,
    s"$name: overlap must be in [0, chunkSize)")

  /** Window advance per chunk. */
  val stride: Int = chunkSize - overlap

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol),
      StructField("chunk_id", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType),
      StructField("chunk_text", StringType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val n = size(col("__ws"))
    // 1 + ceil(max(0, n − chunkSize) / stride); int magnitudes keep the
    // double division exact, so floor matches integer division
    val nc = (lit(1) + floor((greatest(n - chunkSize, lit(0)) + lit(stride - 1))
      / lit(stride))).cast("int")
    df.select(col(idCol),
      // drop empty tokens: words("") is [""], and an unfiltered empty or
      // whitespace-only document would emit one phantom chunk with
      // n_tokens = 1 and empty text — Bm25Index filters the same
      // tokenizer's empties for exactly this reason
      filter(graft.functions.TextFunctions.words(col(textCol)),
        w => length(w) > 0).as("__ws"))
      // a NULL text has no chunks by contract. (On this build size(NULL)
      // is NULL, and NULL arithmetic would silently drop the row anyway;
      // under legacy sizeOfNull=true it is -1, which would make nc = 1
      // and emit one bogus empty chunk — filter explicitly so the
      // contract never depends on that config.) An EMPTY token list
      // (empty/whitespace-only text) likewise has no chunks.
      .filter(col("__ws").isNotNull && size(col("__ws")) > 0)
      .select(col(idCol), col("__ws"),
        explode(sequence(lit(0), nc - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__ws"), col("chunk_id") * stride + 1, lit(chunkSize)).as("__cw"))
      .select(col(idCol), col("chunk_id"),
        size(col("__cw")).as("n_tokens"),
        concat_ws(" ", col("__cw")).as("chunk_text"))
  }
}

/** Time-series resampling with forward fill (LOCF — last observation
  * carried forward): per entity, align an irregular event stream to a
  * fixed daily grid running from the entity's first observation to the
  * corpus's last day, carrying the most recent value across gaps — the
  * feature-freshness shape every serving store materializes (today's
  * features for users who last acted a week ago). Public method: classic
  * gap-fill / `resample().ffill()`.
  *
  * Determinism discipline: the per-(entity, day) observation is the LAST
  * event under the total (ts, tie) order; values quantize to integer
  * cents before any aggregation so the filled series hash-checks
  * cross-engine.
  *
  * Scale: the observation collapse is one partial-aggregable groupBy to
  * (entity, day) rows; the grid explode is bounded by entities × days
  * (the OUTPUT size — no way around materializing what you asked for);
  * the forward fill is one per-entity window, linear per row. The corpus
  * max day is a 1-row broadcast. Shuffles key on the entity id only. */
case class ResampleLocf(
    entityCol: String = "user_id",
    tsCol: String = "ts",
    valueCol: String = "value",
    tieCol: String = "event_id") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    Seq(entityCol, tsCol, valueCol, tieCol).foreach(requireCol(in, _))
    StructType(Seq(
      in(entityCol),
      StructField("day", DateType),
      StructField("value_cents", LongType),
      StructField("is_observed", IntegerType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val day = to_date(col(tsCol))
    // last observation per (entity, day): max_by under the total
    // (ts, tie) order — one aggregate, no window over the raw events
    val obs = df
      .select(col(entityCol), day.as("day"),
        round(col(valueCol) * 100).cast("long").as("__v"),
        struct(col(tsCol), col(tieCol)).as("__ord"))
      .groupBy(col(entityCol), col("day"))
      .agg(max_by(col("__v"), col("__ord")).as("__v"))
    val maxDay = obs.select(max(col("day")).as("__gmax"))
    val grid = obs.groupBy(col(entityCol))
      .agg(min(col("day")).as("__d0"))
      .crossJoin(broadcast(maxDay))
      .select(col(entityCol),
        explode(sequence(col("__d0"), col("__gmax"))).as("day"))
    val w = Window.partitionBy(entityCol).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(entityCol, "day"), "left")
      .select(col(entityCol), col("day"),
        last(col("__v"), ignoreNulls = true).over(w).as("value_cents"),
        when(col("__v").isNotNull, 1).otherwise(0).as("is_observed"))
  }
}

/** Training-example construction for sequential models: per entity,
  * order events and emit one (context, label) pair per position — the
  * last `contextLen` feature values as the context, the current value as
  * the label. This is the offline twin of the reference's session-based
  * serving path (Transformer4Rec sequences rebuilt from values/offsets in
  * /root/reference/merlin/systems/triton/models/pytorch_model.py:44-221):
  * the same sequences, built as a training set instead of a request.
  *
  * Positions with fewer than `contextLen` predecessors are dropped
  * (fixed-shape contexts only — the padded variant is [[Padding]] over
  * the ragged form). The context is emitted both as an array and as a
  * `|`-joined string so downstream can choose shape; ordering is made
  * total by (orderCol, tieCol), so the output is deterministic.
  *
  * Scale: one shuffle on the entity key (the window partition); windows
  * are per-entity, never global. Lag chains reuse the single sorted pass —
  * at 1000 executors this is the textbook distributed window.
  */
case class TrainingSequences(
    entityCol: String = "user_id",
    orderCol: String = "ts",
    tieCol: String = "event_id",
    featureCol: String = "event_type",
    contextLen: Int = 3) extends EnsembleOp {

  require(contextLen >= 1, s"$name: contextLen must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    Seq(entityCol, orderCol, tieCol, featureCol).foreach(requireCol(in, _))
    val f = in(featureCol)
    StructType(Seq(
      in(entityCol),
      in(tieCol).copy(name = "label_" + tieCol),
      StructField("context", ArrayType(f.dataType, containsNull = true)),
      StructField("context_str", StringType),
      f.copy(name = "label")))
  }

  override def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(orderCol), col(tieCol))
    val lags = (contextLen to 1 by -1).map(k =>
      lag(col(featureCol), k).over(w))
    // lags must be evaluated over the FULL per-entity window, before the
    // short-context filter — a post-filter window would see only the
    // surviving rows and lag into nothing
    df.select(
        col(entityCol),
        col(tieCol).as("label_" + tieCol),
        array(lags: _*).as("context"),
        concat_ws("|", lags: _*).as("context_str"),
        col(featureCol).as("label"),
        row_number().over(w).as("__rn"))
      .filter(col("__rn") > contextLen)
      .drop("__rn")
  }
}
