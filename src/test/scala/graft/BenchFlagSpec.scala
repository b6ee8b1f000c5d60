package graft

import org.scalatest.funsuite.AnyFunSuite

/** The remeasure flag metric (round-13 VERDICT item 2): a fixed top-N by
  * absolute warm delta let a consistent family-shaped 1.7× slip 5th past
  * the cut on BOTH boards. The flag set is now the union of top-N
  * absolute delta and ratio >= 1.5× (warm >= 0.5 s), so this suite
  * REPLAYS round 13's two boards and pins that `pipeline_feature_workflow`
  * (and the sub-second FE rows) earn an isolated column while noise-floor
  * rows stay out. */
class BenchFlagSpec extends AnyFunSuite {

  /** Round-12 committed board (the baseline r13's flags were computed
    * against) and round-13 driver-board warms, for the rows that decided
    * the round-13 flag set: four streaming-lifecycle rows whose absolute
    * deltas outranked the FE family, plus the FE family itself. */
  private val r12 = Map(
    "op_purge_corpus" -> 6.75, "op_compact_corpus" -> 5.91,
    "op_ann_pq_stream" -> 4.73, "pipeline_curation_stream" -> 8.29,
    "pipeline_feature_workflow" -> 6.27, "pipeline_dsir" -> 1.75,
    "op_standard_scale" -> 0.32, "op_target_encode_loo" -> 1.12,
    "op_topk_retrieval" -> 0.56, "op_unroll_features" -> 0.68,
    "op_stratified_sample" -> 0.19, "q1_agg" -> 0.84)
  private val r13 = Seq(
    "op_purge_corpus" -> 20.66, "op_compact_corpus" -> 13.99,
    "op_ann_pq_stream" -> 10.98, "pipeline_curation_stream" -> 12.95,
    "pipeline_feature_workflow" -> 10.58, "pipeline_dsir" -> 3.14,
    "op_standard_scale" -> 0.82, "op_target_encode_loo" -> 1.56,
    "op_topk_retrieval" -> 0.91, "op_unroll_features" -> 1.05,
    "op_stratified_sample" -> 0.38, "q1_agg" -> 0.44)

  test("round-13 replay: the FE family is flagged despite placing past the top-4 delta cut") {
    val flags = Bench.flagSet(r13, r12, remeasureN = 4)
    val names = flags.map(_._1).toSet
    // the four big-delta rows still flag (absolute view unchanged)
    assert(Set("op_purge_corpus", "op_compact_corpus", "op_ann_pq_stream",
      "pipeline_curation_stream").subsetOf(names))
    // ...and the consistent-ratio family now earns isolated columns too
    assert(names("pipeline_feature_workflow"),
      s"pipeline_feature_workflow missing from $names")
    assert(names("pipeline_dsir") && names("op_standard_scale"))
    assert(flags.find(_._1 == "pipeline_feature_workflow").get._2 == "ratio")
    // baseline travels with the flag (artifact adjudication contract)
    assert(flags.find(_._1 == "op_standard_scale").get._3.contains(0.32))
  }

  test("noise floor and improvements stay out; cap bounds the pass") {
    val flags = Bench.flagSet(r13, r12, remeasureN = 4)
    val names = flags.map(_._1).toSet
    // 2.0x ratio but warm 0.38 < 0.5 s: scheduling jitter, not a flag
    assert(!names("op_stratified_sample"))
    // improved rows never flag
    assert(!names("q1_agg"))
    // union is bounded: N delta rows + at most 2N ratio rows
    assert(flags.size <= 3 * 4)
  }

  test("rows absent from the baseline flag as new at full weight") {
    val flags = Bench.flagSet(Seq("brand_new_heavy" -> 9.0) ++ r13, r12, 4)
    assert(flags.exists(f => f._1 == "brand_new_heavy" && f._2 == "new"))
  }

  test("no baseline: heaviest rows flag") {
    val flags = Bench.flagSet(r13, Map.empty, 2)
    assert(flags.map(_._1).toSet == Set("op_purge_corpus", "op_compact_corpus"))
    assert(flags.forall(_._2 == "heaviest"))
  }
}
