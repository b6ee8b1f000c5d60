package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MlpScorerSpec extends SparkSpec {
  import spark.implicits._

  private val json =
    """{"layers": [
      |  {"weights": [[0.5, -0.25], [1.0, 0.5]], "bias": [0.125, -2.0],
      |   "activation": "relu"},
      |  {"weights": [[2.0, 4.0]], "bias": [0.0625], "activation": "linear"}
      |]}""".stripMargin

  test("forward pass matches the hand-computed dyadic arithmetic") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(-4.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = MlpScorer.fromJson(json, "embedding").transform(df)
      .select("vec_id", "output__0").as[(Long, Double)].collect().toMap
    // row 1: z = (0.5*1 - 0.25*2 + 0.125, 1*1 + 0.5*2 - 2) = (0.125, 0)
    //        h = (0.125, 0); score = 2*0.125 + 4*0 + 0.0625 = 0.3125
    assert(out(1L) == 0.3125, s"got ${out(1L)}")
    // row 2: z = (-2 + 0.125, -4 - 2) → relu (0, 0); score = 0.0625
    assert(out(2L) == 0.0625, s"got ${out(2L)}")
  }

  test("single-unit head emits a scalar; multi-unit an array; null in → null out") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, null.asInstanceOf[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val op = MlpScorer.fromJson(json, "embedding")
    assert(op.transformSchema(df.schema)("output__0").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val rows = op.transform(df).orderBy("vec_id").collect()
    assert(!rows(0).isNullAt(2) && rows(1).isNullAt(2),
      "a null vector scores null, not a phantom bias-only logit")
    val wide = MlpScorer(Seq(MlpLayer(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(0.0, 0.0), "linear")), "embedding")
    assert(wide.transformSchema(df.schema)("output__0").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
  }

  test("relu propagates NULL from a dimension-mismatched vector (no phantom bias logit)") {
    // ArrayDotProduct returns NULL on a wrong-width or null-element
    // vector; greatest() SKIPS nulls, so an unguarded relu would score
    // such rows 0.0 and the head would emit a bias-only logit. The unit
    // must instead null the whole forward pass.
    val df = Seq(
      (1L, Seq(1.0, 2.0)),        // well-formed
      (2L, Seq(1.0)),             // wrong width
      (3L, Seq(1.0, Double.NaN))  // NaN is a VALUE, must flow, not null
    ).toDF("vec_id", "embedding")
    val rows = MlpScorer.fromJson(json, "embedding").transform(df)
      .orderBy("vec_id").collect()
    assert(!rows(0).isNullAt(2))
    assert(rows(1).isNullAt(2),
      "mismatched vector must score NULL, not the bias-only 0.0625")
    assert(!rows(2).isNullAt(2) && rows(2).getDouble(2).isNaN)
  }

  test("fail-fast on unsupported activation and non-chaining widths") {
    assertThrows[IllegalArgumentException] {
      MlpLayer(Seq(Seq(1.0)), Seq(0.0), "sigmoid")
    }
    assertThrows[IllegalArgumentException] {
      MlpScorer(Seq(
        MlpLayer(Seq(Seq(1.0, 2.0)), Seq(0.0), "relu"), // 1 output...
        MlpLayer(Seq(Seq(1.0, 2.0)), Seq(0.0), "linear")), // ...2 inputs
        "embedding")
    }
  }
}
