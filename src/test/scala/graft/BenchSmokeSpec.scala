package graft

/** Steady-state performance gate (CI twin of the bench's warm protocol):
  * PlanSpec pins plan SHAPES, but a regression that keeps the shape while
  * destroying the cost model — a lost broadcast falling back to a
  * shuffled join, an accidental cartesian blow-up, a projection inlined
  * under a pair join — only shows up as wall-clock. This suite times the
  * WARM (second) execution of the heaviest flagship queries at sf0.01 and
  * fails when one exceeds a generous multiple of its recorded floor, so a
  * real plan regression fails `sbt test` instead of waiting for the round
  * bench artifact.
  *
  * Warm-only on purpose: first execution pays one-time JIT/codegen of the
  * query's generated methods (measured 2-10x, not a plan property) while
  * warm runs are far tighter, so the cold run is executed but uncounted.
  * Ceilings are 4x the recorded warm floor + 2 s fixed slack — loose
  * enough for virtualized-host contention, tight enough to catch the
  * regression classes actually observed: the pair-join inlining trap
  * (dropping the persist before op_pca_ann_recall's shortlist join
  * re-measured 0.96 s → 11.45 s at sf0.01, 12x — red under the 6 s
  * ceiling) and any new shuffle/cartesian of that magnitude. A
  * lost-broadcast simulation via autoBroadcastJoinThreshold=-1 does NOT
  * move these plans (≤1.3x at sf0.1) because every small side carries an
  * explicit broadcast() hint the threshold cannot disable — the plans
  * don't depend on the auto-sizing heuristic (see SCALE.md round 7).
  *
  * Wall-clock assertions inside `sbt test` can flake on a contended host
  * independent of any plan regression — and a gate people learn to ignore
  * is worse than none. The suite therefore always RUNS and reports its
  * timings (info lines), but only ENFORCES the ceilings when
  * `GRAFT_PERF_GATE=1` (set it for bench rounds / perf work); ordinary
  * test runs stay deterministic. */
class BenchSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"
  private val enforce = sys.env.get("GRAFT_PERF_GATE").contains("1")

  /** Warm floors in seconds, measured at sf0.01 / local[4] (this suite's
    * session config). Re-baseline here if a query's plan legitimately
    * changes. */
  private val floors = Map(
    "pipeline_ranking" -> 1.5,
    "pipeline_curation" -> 1.5,
    "dedup_clusters" -> 1.5,
    "pipeline_feature_workflow" -> 1.5,
    "op_pca_ann_recall" -> 1.0,
    "pipeline_recsys" -> 1.5,
    "text_scrub_spans" -> 1.0)

  floors.toSeq.sortBy(_._1).foreach { case (name, floor) =>
    test(s"warm steady-state within ceiling: $name") {
      // the flagship serves from prefit parquet factors (the bench's
      // offline-artifact discipline) — the gate times serving, not the
      // seeded ALS fit's 4x run-to-run variance
      if (name == "pipeline_recsys") Flagship.prewarmAlsFactors(spark, sfDir)
      val fn = SparkEntry.queries(name)
      def run(): Double = {
        // same inter-execution isolation as Bench: each run starts from
        // clean cache state so the warm number is JIT-warm, cache-cold
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold: one-time codegen/JIT, uncounted
      val warm = run()
      val ceiling = floor * 4 + 2.0
      info(f"$name%-28s warm $warm%6.2f s (ceiling $ceiling%5.2f s" +
        (if (enforce) ", enforced)" else ", report-only — set GRAFT_PERF_GATE=1 to enforce)"))
      if (enforce)
        assert(warm <= ceiling,
          f"$name warm $warm%.2f s exceeds ceiling $ceiling%.2f s — " +
            "either a plan regression (lost broadcast / new shuffle / " +
            "inlined projection under a pair join) or the floor needs " +
            "re-baselining after a deliberate plan change")
      else if (warm > ceiling)
        info(f"WARNING: $name warm $warm%.2f s exceeds ceiling $ceiling%.2f s " +
          "(not failing: GRAFT_PERF_GATE unset)")
    }
  }
}
