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

  test("sampledRecallRow: the binomial bound's edges — empty truth, perfect recall, the exact formula") {
    val empty = Seq.empty[(Long, Long)].toDF("q", "item")
    // empty truth: full recall, zero margin, no division by zero
    val r0 = Evidence.sampledRecallRow(spark, empty, empty,
      Seq("q", "item"), 5000, nQueriesSampled = 0L).head()
    assert(r0.getLong(0) == 0L && r0.getLong(4) == 10000L &&
      r0.getLong(5) == 10000L)
    // perfect recall: p(1-p) = 0 → the bound equals the estimate (a
    // degenerate normal interval — the honest small-sample caveat lives
    // in n_queries_sampled, not in a fudged margin)
    val full = (1L to 40L).map(i => (i, i * 100)).toDF("q", "item")
    val r1 = Evidence.sampledRecallRow(spark, full, full,
      Seq("q", "item"), 5000, nQueriesSampled = 4L).head()
    assert(r1.getLong(4) == 10000L && r1.getLong(5) == 10000L)
    // partial recall: ci_low = recall_bp − floor(19600·sqrt(p(1−p)/n))
    // with the exact left-to-right double evaluation the oracle replays
    val part = (1L to 30L).map(i => (i, i * 100)).toDF("q", "item")
    val r2 = Evidence.sampledRecallRow(spark, part, full,
      Seq("q", "item"), 5000, nQueriesSampled = 4L).head()
    val p = 30.0 / 40.0
    val want = 7500L -
      math.floor(19600.0 * math.sqrt(p * (1.0 - p) / 40.0)).toLong
    assert(r2.getLong(4) == 7500L && r2.getLong(5) == want,
      s"ci_low must replay the documented formula: ${r2.getLong(5)} vs $want")
    // the floor gate stays on the OBSERVED recall, same as recallRow
    val err = intercept[IllegalArgumentException] {
      Evidence.sampledRecallRow(spark, part.limit(10), full,
        Seq("q", "item"), 5000, nQueriesSampled = 4L)
    }
    assert(err.getMessage.contains("2500 bp"), err.getMessage)
  }
}
