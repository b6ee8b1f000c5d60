package graft.queries

import graft.SparkSpec

class EvidenceSpec extends SparkSpec {
  import spark.implicits._

  test("recallRow: empty truth counts as full recall, floors throw, precision guards") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("q", "item")
    val empty = Seq.empty[(Long, Long)].toDF("q", "item")
    // empty truth: nothing to find → 10000 bp, no division by zero
    val r0 = Evidence.recallRow(spark, empty, empty, Seq("q", "item"), 5000).head()
    assert(r0.getLong(3) == 10000L)
    // below the floor with a tiny truth set (< 30): the floor is a
    // scale property, not a 3-trial coin-flip property — report, don't
    // throw (sf0.001 preflight runs would otherwise fail by chance)
    val partial = Seq((1L, 10L)).toDF("q", "item")
    val tiny = Evidence.recallRow(spark, partial, truth, Seq("q", "item"), 5000).head()
    assert(tiny.getLong(3) == 3333L)
    // at a supported sample size the floor THROWS with the measured value
    val bigTruth = (1L to 40L).map(i => (i, i * 100)).toDF("q", "item")
    val bigPartial = (1L to 10L).map(i => (i, i * 100)).toDF("q", "item")
    val err = intercept[IllegalArgumentException] {
      Evidence.recallRow(spark, bigPartial, bigTruth, Seq("q", "item"), 5000)
    }
    assert(err.getMessage.contains("2500 bp"), err.getMessage)
    // a false row violates the precision contract when asserted
    val withFalse = Seq((1L, 10L), (9L, 99L)).toDF("q", "item")
    val perr = intercept[IllegalArgumentException] {
      Evidence.recallRow(spark, withFalse, truth, Seq("q", "item"), 0,
        requirePrecision = true)
    }
    assert(perr.getMessage.contains("precision"), perr.getMessage)
    // and without the assertion the same input just reports
    val ok = Evidence.recallRow(spark, withFalse, truth, Seq("q", "item"), 0).head()
    assert(ok.getLong(0) == 3L && ok.getLong(1) == 2L && ok.getLong(2) == 1L)
  }
}
