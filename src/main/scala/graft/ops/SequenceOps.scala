package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

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
