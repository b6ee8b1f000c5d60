package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.core.EnsembleOp
import graft.functions.{VectorFunctions => V}

/** One dense layer of a portable MLP: `units × inputs` weight rows, one
  * bias per unit, activation `"relu"` or `"linear"`. */
case class MlpLayer(weights: Seq[Seq[Double]], bias: Seq[Double],
    activation: String) {
  require(weights.nonEmpty, "MlpLayer: need at least one unit")
  require(weights.map(_.size).distinct.size == 1,
    "MlpLayer: ragged weight rows — every unit must take the same inputs")
  require(bias.size == weights.size,
    s"MlpLayer: ${bias.size} biases for ${weights.size} units")
  require(activation == "relu" || activation == "linear",
    s"MlpLayer: unsupported activation '$activation' (relu|linear) — " +
      "sigmoid/softmax outputs are monotone in the logits this op emits, " +
      "so rank/threshold consumers need no transcendental at all")
  def inputs: Int = weights.head.size
  def units: Int = weights.size
}

/** Expression-based scorer for small dense neural rankers exported as
  * JSON weights — the portable-weights analog of [[XgbForest]] /
  * [[SklForest]] for the reference's PredictTensorflow / PredictPyTorch
  * surface (/root/reference/merlin/systems/dag/ops/tensorflow.py:31-170,
  * pytorch.py:27-119: schema-driven batched scoring of a saved model).
  * A JVM engine cannot (and should not) load SavedModel/TorchScript
  * payloads; a serving-side ranking head, however, is typically a small
  * MLP over an embedding — and its weights export to five lines of JSON
  * (`model.get_weights()` / `state_dict()` → lists). This op replays the
  * forward pass as pure Catalyst expressions: each unit is one
  * [[graft.functions.ArrayDotProduct]] against a literal weight row plus
  * a literal bias, relu is `greatest(0, x)`, and layers chain inside one
  * projection — whole-stage codegen'd, shuffle-free, linear in
  * rows × weights at any scale (the PcaProject execution shape).
  *
  * Activations are restricted to relu/linear ON PURPOSE: the forward
  * pass stays exact integer-free double arithmetic that replays
  * bit-identically cross-engine (the hash-oracle discipline — exp/tanh
  * differ in last bits across libm implementations). Emit LOGITS and
  * threshold/rank on them: sigmoid and softmax are monotone, so every
  * classification/ranking decision is available without a
  * transcendental. `output__0` is a scalar for single-unit heads, an
  * array otherwise (FIL/Predict* naming parity).
  *
  * CAUTION for pair-join consumers (the PcaProject trap): Catalyst
  * inlines this projection into whatever consumes it — persist the
  * scored frame before any join that multiplies rows. */
case class MlpScorer(
    layers: Seq[MlpLayer],
    vecCol: String,
    outputCol: String = "output__0") extends EnsembleOp {

  require(layers.nonEmpty, s"$name: need at least one layer")
  layers.sliding(2).foreach {
    case Seq(a, b) =>
      require(a.units == b.inputs,
        s"$name: layer widths must chain — ${a.units} outputs feed ${b.inputs} inputs")
    case _ => ()
  }

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, vecCol)
    require(in(vecCol).dataType.isInstanceOf[ArrayType],
      s"$name: '$vecCol' must be an array column")
    require(!in.fieldNames.contains(outputCol),
      s"$name: output column '$outputCol' collides with the input schema")
    val t = if (layers.last.units == 1) DoubleType
            else ArrayType(DoubleType): DataType
    StructType(in :+ StructField(outputCol, t))
  }

  /** One unit: dot against the literal weight row, plus bias, then the
    * layer activation. relu must propagate NULL explicitly: ArrayDotProduct
    * returns NULL on a dimension-mismatched or null-element vector, and
    * Spark's `greatest` SKIPS nulls — a bare `greatest(0, z)` would turn
    * that NULL into 0.0 and emit a phantom bias-only logit instead of a
    * NULL score. */
  private def unit(prev: Column, w: Seq[Double], b: Double,
      act: String): Column = {
    val z = V.dot(prev, typedLit(w.toArray)) + lit(b)
    if (act == "relu") when(z.isNull, lit(null)).otherwise(greatest(lit(0.0), z))
    else z
  }

  override def transform(df: DataFrame): DataFrame = {
    transformSchema(df.schema)
    val x0 = col(vecCol).cast("array<double>")
    val out = layers.foldLeft(x0) { (prev, layer) =>
      array(layer.weights.zip(layer.bias).map { case (w, b) =>
        unit(prev, w, b, layer.activation)
      }: _*)
    }
    val shaped = if (layers.last.units == 1) element_at(out, 1) else out
    df.withColumn(outputCol,
      when(col(vecCol).isNull, lit(null)).otherwise(shaped))
  }
}

object MlpScorer {
  /** Parse the portable JSON weight export:
    * `{"layers": [{"weights": [[...], ...], "bias": [...],
    * "activation": "relu"}, ...]}` — the shape `get_weights()` /
    * `state_dict()` dumps flatten to. Fails fast on unsupported
    * activations and non-chaining widths (the reference's fail-fast
    * stance, fil.py:360-373). */
  def fromJson(json: String, vecCol: String,
      outputCol: String = "output__0"): MlpScorer = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val layers = (root \ "layers") match {
      case JArray(ls) => ls.map { l =>
        MlpLayer(
          (l \ "weights").extract[Seq[Seq[Double]]],
          (l \ "bias").extract[Seq[Double]],
          (l \ "activation").extractOpt[String].getOrElse("linear"))
      }
      case _ => throw new IllegalArgumentException(
        "MlpScorer.fromJson: missing 'layers' array")
    }
    MlpScorer(layers, vecCol, outputCol)
  }
}
