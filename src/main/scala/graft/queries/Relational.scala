package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Tables._

/** Relational core: scans, projection, filter pushdown, joins (broadcast /
  * semi / anti), aggregation, rollup, window top-N, sort/limit, set ops.
  *
  * The reference has no general relational surface (SURVEY.md §2.6) — these
  * queries are the engine-level capabilities Catalyst gives us for free and
  * they anchor the DuckDB-oracle harness.
  *
  * Oracle-exactness rules (SURVEY.md §7.4 dtype discipline):
  *  - money sums go through integer cents: sum(cast(round(x*100) as long)) —
  *    bit-exact in any summation order, unlike double sums of 2-decimal data;
  *  - l_quantity is integral-valued double → its double sum is also exact;
  *  - every query ends in a deterministic ORDER BY with full tiebreak.
  */
object Relational {

  private def cents(c: String) = sum(round(col(c) * 100).cast("long")).as(c + "_cents")

  def q1_agg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        cents("l_extendedprice"),
        avg("l_quantity").as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Star join: orders ⋈ customer ⋈ nation ⋈ region, all dims broadcast. */
  def q2_join_agg(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .join(broadcast(customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"), cents("o_totalprice"))
      .orderBy("r_name", "n_name")

  /** Global top-k with deterministic tiebreak — sort + limit. */
  def q3_topk(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("price_cents"))

  /** Per-group top-N via window row_number (the per-request top-k idiom). */
  def q4_window_topn(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .orderBy("o_custkey", "rn")
  }

  /** Predicate + projection pushdown to the parquet scan. */
  def q5_filter(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_shipdate") < lit("1995-06-17").cast("timestamp") &&
        col("l_quantity") >= 5 && col("l_quantity") <= 45)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")

  /** Hierarchical aggregate (rollup / grouping sets). */
  def q6_rollup(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_qty"))
      .orderBy("flag", "status")

  /** Semi join: customers with at least one finished order. */
  def q7_semi(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .join(orders(spark, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Anti join: customers with no pending ('P') order. */
  def q8_anti(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .join(orders(spark, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")

  /** Set difference: (brand,size) combos never shipped returned at max quantity.
    * The predicate (quantity = max AND returned) is rare enough that the EXCEPT
    * stays non-empty and non-trivial at every test scale factor (151 / 681 / 65
    * rows at sf0.001/0.01/0.1) — a saturating predicate would make the larger-SF
    * check vacuous (0 rows matches any bug that empties the result). */
  def q9_setop(spark: SparkSession, d: String): DataFrame = {
    val allCombos = part(spark, d).select("p_brand", "p_size").distinct()
    val bigQty = part(spark, d)
      .join(lineitem(spark, d)
          .filter(col("l_quantity") >= 50 && col("l_returnflag") === "R"),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_brand", "p_size").distinct()
    allCombos.except(bigQty).orderBy("p_brand", "p_size")
  }

  /** Event-log aggregate by day (timestamp handling). */
  def q10_events(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), cents("value"))
      .orderBy("day", "event_type")

  /** Batch gap-sessionization over the event log (lag + running sum —
    * the batch twin of streaming.StreamingOps.sessionize). Timestamps are
    * compared at whole-second epoch (floor) for cross-engine parity. */
  def q11_sessionize(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_s").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts").cast("long")).as("start_s"),
        max(col("ts").cast("long")).as("end_s"))
      .orderBy("user_id", "session_id")
  }

  /** Exact distinct-count aggregation. */
  def q12_distinct(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Full cube over two dimensions (grouping-sets coverage beyond q6's
    * rollup). */
  def q13_cube(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), cents("o_totalprice"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("o_totalprice_cents"))
      .orderBy("status", "priority")

  /** JSON extraction from the event props payload (real JSON parsing on
    * the Spark side; the oracle regexp-extracts the same field — equal on
    * this uniform payload shape). */
  def q14_json(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), max("k").as("max_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Ordered-set aggregates: exact interpolated percentiles per group.
    * l_quantity is integral-valued, so scaling to integer cents before
    * comparing removes any float-formatting drift; the interpolation
    * formula ((n−1)·p) is the same in both engines. The HLL/approx
    * twin (approx_count_distinct) is sketch-based and engine-specific —
    * covered by SketchSpec error bounds instead of the oracle. */
  def q15_percentiles(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(
        floor(percentile_approx(col("l_quantity"), lit(0.5), lit(100000)) * 100)
          .cast("long").as("p50_cents"),
        floor(expr("percentile(l_quantity, 0.5)") * 100).cast("long").as("p50x_cents"),
        floor(expr("percentile(l_quantity, 0.95)") * 100).cast("long").as("p95x_cents"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Pivot (the wide-table cross-tab): per-day event-type value totals as
    * one row per day, one column per type. Spark's `pivot` with an
    * EXPLICIT value list — never the value-discovery variant, which runs
    * an extra distinct job and makes the output schema data-dependent
    * (a 100 TB no-no for downstream consumers). Absent cells fill 0 so
    * the oracle's conditional-aggregation replay matches exactly. */
  def q16_pivot(spark: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(spark, d)
      .withColumn("day", to_date(col("ts")))
      .groupBy("day")
      .pivot("event_type", types)
      .agg(sum(round(col("value") * 100).cast("long")))
      .na.fill(0L, types)
      .orderBy("day")
  }

  /** Unpivot (melt) — the inverse cross-tab: the wide per-day frame back
    * to long (day, event_type, value_cents) rows via `Dataset.unpivot`.
    * Zero-filled cells survive the round trip, so the oracle rebuilds the
    * dense day × type grid explicitly. */
  def q17_unpivot(spark: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    q16_pivot(spark, d)
      .unpivot(Array(col("day")), types.map(col).toArray,
        "event_type", "value_cents")
      .orderBy("day", "event_type")
  }

  /** INTERSECT — the set-op q9's EXCEPT leaves uncovered: brands that
    * appear both among returned ('R') and accepted ('N') high-quantity
    * line items. */
  def q18_intersect(spark: SparkSession, d: String): DataFrame = {
    def brands(flag: String) = lineitem(spark, d)
      .filter(col("l_returnflag") === flag && col("l_quantity") >= 45)
      .join(part(spark, d), col("l_partkey") === col("p_partkey"))
      .select("p_brand").distinct()
    brands("R").intersect(brands("N")).orderBy("p_brand")
  }

  /** Explicit GROUPING SETS — the general form rollup (q6) and cube (q13)
    * are sugar for: exactly the three requested granularities
    * ((flag,status), (flag), ()) and no others, so the grand-total row
    * appears once and per-status-only rows never do. One pass over the
    * fact table: Catalyst expands the sets via a single Expand node, so
    * cost is sets × input rows map-side, then one shuffle — identical
    * plan shape to rollup at 100 TB. */
  def q19_grouping_sets(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_qty"))
      .orderBy("flag", "status")

  /** RANGE-frame windowed aggregation — the time-interval sibling of
    * q4's ROWS frames: per-customer trailing-30-day spend and order
    * count, the frame defined by VALUE distance (all same-day peers
    * included, so the result is tie-order-independent and hashes
    * deterministically) rather than row position. Day numbers are
    * integer days-since-epoch and money is integer cents, so both
    * engines agree exactly. One shuffle on the partition key + a
    * per-partition sort; the frame evaluates as a sliding two-pointer
    * accumulation, linear per partition — the trailing-feature shape
    * (`op_trailing_features`) expressed in pure windowed SQL. */
  def q20_range_window(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = orders(spark, d).select(col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("day_no"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy(col("day_no"))
      .rangeBetween(-30, Window.currentRow)
    o.select(col("o_orderkey"), col("o_custkey"), col("day_no"),
        sum("cents").over(w).as("trailing_cents"),
        count(lit(1)).over(w).as("trailing_n"))
      .orderBy("o_orderkey")
  }

  /** Correlated scalar subqueries — "parts priced above their brand's
    * average", the classical decorrelation workload: each WHERE-clause
    * subquery references the outer row's brand, and Catalyst's subquery
    * rewrite turns them into brand-keyed aggregates + joins (ONE pass
    * over part per aggregate, a dictionary-scale broadcastable side —
    * never a per-row subquery execution; at 100 TB that difference is
    * the whole feature). The above-average test is integer-exact:
    * `cents × brand_count > brand_cents_sum` avoids comparing against a
    * double average whose last-ulp could differ across engines. */
  def q21_correlated(spark: SparkSession, d: String): DataFrame = {
    part(spark, d).select(col("p_partkey"), col("p_brand"),
      round(col("p_retailprice") * 100).cast("long").as("cents"))
      .createOrReplaceTempView("q21_part")
    spark.sql(
      """SELECT p_brand, count(*) AS n_above
        |FROM q21_part p
        |WHERE p.cents * (SELECT count(*) FROM q21_part p2
        |                 WHERE p2.p_brand = p.p_brand)
        |    > (SELECT sum(p3.cents) FROM q21_part p3
        |       WHERE p3.p_brand = p.p_brand)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  /** WITH RECURSIVE — Spark 4's recursive-CTE operator on the classical
    * gaps-and-islands workload: each user's longest run of CONSECUTIVE
    * active days. Anchor = days with no predecessor (NOT EXISTS, itself
    * a decorrelated anti-join); the recursive step joins `day + 1`, and
    * strictly increasing day numbers make the recursion ACYCLIC, so
    * UNION ALL terminates without needing recursive dedup (the level
    * limit is raised as a safety net, not a semantic bound). Integer
    * day numbers keep both engines exact. Execution is an iterated
    * frontier equi-join against the (user, day) grid — the shape
    * DupClusters drives by hand with pointer doubling; here the
    * engine's recursion drives it, one brand-new Spark 4 surface the
    * classical checklist was missing. Cost model: depth = the longest
    * streak, and every level is one frontier join PASS (not per-row) —
    * so wall-clock scales with streak length, not data size. When the
    * recursion depth itself is data-dependent and large, the
    * constant-pass form of this islands workload is the
    * window/sessionize shape (q11, op_trailing_features); this row
    * exists to exercise the recursion operator, not to replace them. */
  def q22_recursive(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
    // cache the (user, day) grid: every recursion level joins the
    // frontier against this view, and an uncached view would re-scan
    // events + re-distinct once PER LEVEL (depth × scan cost)
    val days = events(spark, d).select(col("user_id"),
      datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")).as("day_no"))
      .distinct().cache()
    days.count() // materialize before the recursion starts
    days.createOrReplaceTempView("q22_days")
    spark.sql(
      """WITH RECURSIVE s AS (
        |  SELECT user_id, day_no, 1 AS len FROM q22_days d
        |  WHERE NOT EXISTS (SELECT 1 FROM q22_days p
        |    WHERE p.user_id = d.user_id AND p.day_no = d.day_no - 1)
        |  UNION ALL
        |  SELECT s.user_id, n.day_no, s.len + 1 AS len
        |  FROM s JOIN q22_days n
        |    ON n.user_id = s.user_id AND n.day_no = s.day_no + 1)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** LATERAL join — the correlated derived table: each customer joined
    * to their own 2 most recent orders (ORDER BY ... LIMIT 2 inside the
    * lateral subquery, referencing the outer row). Catalyst decorrelates
    * the per-row LIMIT into a partitioned rank filter — the same
    * physical plan a hand-written window top-n gets (q4), which is
    * exactly why the surface is safe at 100 TB: the "run a query per
    * row" phrasing never executes per row. Tie-safe ordering
    * (day DESC, o_orderkey DESC) keeps the picked rows deterministic
    * across engines. */
  def q23_lateral(spark: SparkSession, d: String): DataFrame = {
    customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
      .createOrReplaceTempView("q23_cust")
    orders(spark, d).select(col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("day_no"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .createOrReplaceTempView("q23_ord")
    spark.sql(
      """SELECT c.c_custkey, c.c_mktsegment, r.o_orderkey, r.day_no, r.cents
        |FROM q23_cust c
        |JOIN LATERAL (
        |  SELECT o_orderkey, day_no, cents FROM q23_ord o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY day_no DESC, o_orderkey DESC LIMIT 2) r
        |ORDER BY c.c_custkey, r.o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_lateral" -> (q23_lateral _),
    "q22_recursive" -> (q22_recursive _),
    "q21_correlated" -> (q21_correlated _),
    "q20_range_window" -> (q20_range_window _),
    "q19_grouping_sets" -> (q19_grouping_sets _),
    "q18_intersect" -> (q18_intersect _),
    "q17_unpivot" -> (q17_unpivot _),
    "q16_pivot" -> (q16_pivot _),
    "q15_percentiles" -> (q15_percentiles _),
    "q14_json" -> (q14_json _),
    "q11_sessionize" -> (q11_sessionize _),
    "q12_distinct" -> (q12_distinct _),
    "q13_cube" -> (q13_cube _),
    "q1_agg" -> (q1_agg _),
    "q2_join_agg" -> (q2_join_agg _),
    "q3_topk" -> (q3_topk _),
    "q4_window_topn" -> (q4_window_topn _),
    "q5_filter" -> (q5_filter _),
    "q6_rollup" -> (q6_rollup _),
    "q7_semi" -> (q7_semi _),
    "q8_anti" -> (q8_anti _),
    "q9_setop" -> (q9_setop _),
    "q10_events" -> (q10_events _))

  val oracle: Map[String, String] = Map(
    "q23_lateral" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_no,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders)
        |SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
        |  r.o_orderkey AS o_orderkey, r.day_no AS day_no, r.cents AS cents
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, day_no, cents FROM o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY day_no DESC, o_orderkey DESC LIMIT 2) r ON true
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q22_recursive" ->
      """WITH RECURSIVE days AS (SELECT DISTINCT user_id,
        |  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no
        |  FROM events),
        |s AS (
        |  SELECT user_id, day_no, 1 AS len FROM days d
        |  WHERE NOT EXISTS (SELECT 1 FROM days p
        |    WHERE p.user_id = d.user_id AND p.day_no = d.day_no - 1)
        |  UNION ALL
        |  SELECT s.user_id, n.day_no, s.len + 1 AS len
        |  FROM s JOIN days n
        |    ON n.user_id = s.user_id AND n.day_no = s.day_no + 1)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q21_correlated" ->
      """WITH p AS (SELECT p_partkey, p_brand,
        |  CAST(round(p_retailprice*100) AS BIGINT) AS cents FROM part)
        |SELECT p_brand, count(*) AS n_above
        |FROM p
        |WHERE p.cents * (SELECT count(*) FROM p p2 WHERE p2.p_brand = p.p_brand)
        |    > (SELECT CAST(sum(p3.cents) AS BIGINT) FROM p p3
        |       WHERE p3.p_brand = p.p_brand)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q20_range_window" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_no,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderkey, o_custkey, day_no,
        |  CAST(sum(cents) OVER w AS BIGINT) AS trailing_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS trailing_n
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q19_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
        |count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY 1,2""".stripMargin,
    "q18_intersect" ->
      """SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_returnflag = 'R' AND l_quantity >= 45
        |INTERSECT
        |SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_returnflag = 'N' AND l_quantity >= 45
        |ORDER BY p_brand""".stripMargin,
    "q17_unpivot" ->
      """WITH base AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1,2),
        |days AS (SELECT DISTINCT day FROM base),
        |types(event_type) AS (VALUES ('click'),('error'),('purchase'),('signup'),('view'))
        |SELECT d.day AS day, t.event_type AS event_type,
        |  CAST(coalesce(b.v, 0) AS BIGINT) AS value_cents
        |FROM days d CROSS JOIN types t
        |LEFT JOIN base b ON b.day = d.day AND b.event_type = t.event_type
        |ORDER BY d.day, t.event_type""".stripMargin,
    "q16_pivot" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"CAST(coalesce(sum(CASE WHEN event_type = '$t' " +
          s"THEN CAST(round(value*100) AS BIGINT) END), 0) AS BIGINT) AS $t")
        .mkString(",\n")
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |$cols
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin
    },
    "q15_percentiles" ->
      """SELECT l_returnflag,
        |CAST(floor(quantile_disc(l_quantity, 0.5) * 100) AS BIGINT) AS p50_cents,
        |CAST(floor(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50x_cents,
        |CAST(floor(quantile_cont(l_quantity, 0.95) * 100) AS BIGINT) AS p95x_cents,
        |count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_json" ->
      """SELECT event_type,
        |CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |CAST(max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS max_k,
        |count(*) AS n FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_sessionize" ->
      """WITH f AS (SELECT user_id, event_id, ts,
        |CASE WHEN lag(ts) OVER w IS NULL
        |  OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |THEN 1 ELSE 0 END AS new_s
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
        |CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q12_distinct" ->
      """SELECT c_mktsegment, CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |count(*) AS n_customers FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
        |count(*) AS n_orders,
        |CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS o_totalprice_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY 1,2""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows,
        |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS l_extendedprice_cents,
        |avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_join_agg" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS o_totalprice_cents
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q5_filter" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-17' AND l_quantity >= 5 AND l_quantity <= 45
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
        |count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY 1,2""".stripMargin,
    "q7_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_orderstatus='F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_orderstatus='P')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_setop" ->
      """SELECT p_brand, p_size FROM (
        |SELECT DISTINCT p_brand, p_size FROM part
        |EXCEPT SELECT DISTINCT p_brand, p_size FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey=p_partkey AND l_quantity >= 50 AND l_returnflag='R'))
        |ORDER BY p_brand, p_size""".stripMargin,
    "q10_events" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n_events,
        |CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
}
