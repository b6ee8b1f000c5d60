package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE self-validating recall harness behind the rows-only driver
  * queries (ANN recall, dedup pair recall): compares an approximate
  * result against exact ground truth in-Spark on the given key columns
  * and THROWS below the floor — so the driver artifact carries the
  * evidence, and the floor/zero-truth semantics cannot drift between
  * query families. Empty truth counts as full recall (nothing to find).
  * `requirePrecision` additionally asserts approx ⊆ truth — the
  * exact-verification contract of the dedup family. */
object Evidence {
  def recallRow(spark: SparkSession, approx: DataFrame, exact: DataFrame,
      keyCols: Seq[String], floorBp: Int,
      requirePrecision: Boolean = false): DataFrame = {
    import spark.implicits._
    val truth = exact.select(keyCols.map(col): _*)
    val ap = approx.select(keyCols.map(col): _*)
    val matched = ap.join(truth, keyCols, "left_semi")
    val row = truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(ap.agg(count(lit(1)).as("n_approx")))
      .crossJoin(matched.agg(count(lit(1)).as("n_matched"))).head()
    val (nt, na, nm) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val recallBp = if (nt == 0) 10000L else nm * 10000 / nt
    if (requirePrecision)
      require(nm == na, s"precision 1.0 violated: $na approx rows, $nm real")
    // The floor is a property of the estimator AT SCALE (per-pair surface
    // probability); over a handful of Bernoulli trials it fails by chance
    // alone (sf0.001: 7 truth pairs → one miss costs 14 points). Enforce
    // only where the sample supports it; the row still carries the
    // observed recall either way, so small-SF runs stay inspectable.
    val minTruth = 30
    require(nt < minTruth || recallBp >= floorBp,
      s"recall floor violated: $recallBp bp < $floorBp bp over $nt truth rows")
    Seq((nt, na, nm, recallBp, floorBp.toLong))
      .toDF("n_truth", "n_approx", "n_matched", "recall_bp", "floor_bp")
  }

  /** [[recallRow]] over a SEEDED QUERY SAMPLE, with a 95%
    * normal-approximation binomial lower bound on the per-pair recall —
    * the monitoring shape that still RUNS at production scale. The
    * full-population recall rows are indictment evidence whose all-pairs
    * truth sweep cannot exist beyond rehearsal SFs; confining the exact
    * sweep to a fixed-size sample makes the cost ∝ sample × catalog
    * (constant in query volume), and `ci_low_bp` quantifies exactly what
    * the sample bought: recall_bp − floor(1.96·10⁴·√(p(1−p)/n)). Every
    * step of the margin is fixed-order IEEE double arithmetic
    * (mul/div/sub/sqrt are correctly rounded), so the whole row —
    * including the bound — hash-replays cross-engine. The floor gate
    * stays on the OBSERVED recall (the [[recallRow]] contract); the CI
    * column is the honesty label for how far to trust it. */
  def sampledRecallRow(spark: SparkSession, approx: DataFrame,
      exact: DataFrame, keyCols: Seq[String], floorBp: Int,
      nQueriesSampled: Long): DataFrame = {
    import spark.implicits._
    val truth = exact.select(keyCols.map(col): _*)
    val ap = approx.select(keyCols.map(col): _*)
    val matched = ap.join(truth, keyCols, "left_semi")
    val row = truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(ap.agg(count(lit(1)).as("n_approx")))
      .crossJoin(matched.agg(count(lit(1)).as("n_matched"))).head()
    val (nt, na, nm) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val recallBp = if (nt == 0) 10000L else nm * 10000 / nt
    val marginBp = if (nt == 0) 0L else {
      val p = nm.toDouble / nt.toDouble
      math.floor(19600.0 * math.sqrt(p * (1.0 - p) / nt.toDouble)).toLong
    }
    val minTruth = 30
    require(nt < minTruth || recallBp >= floorBp,
      s"sampled recall floor violated: $recallBp bp < $floorBp bp " +
      s"over $nt truth rows ($nQueriesSampled queries)")
    Seq((nQueriesSampled, nt, na, nm, recallBp, recallBp - marginBp,
        floorBp.toLong))
      .toDF("n_queries_sampled", "n_truth", "n_approx", "n_matched",
        "recall_bp", "ci_low_bp", "floor_bp")
  }
}
