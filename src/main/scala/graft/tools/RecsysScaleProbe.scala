package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the recsys serving path at rehearsal SFs
  * (`runMain graft.tools.RecsysScaleProbe <dataDir>`): times the fit,
  * the tier decision, the quantizer, index build, probe join and the
  * full serving pass separately, plus the fitted tiers' occupancy
  * reports — the measurement tool behind SCALE.md's recsys
  * adjudications (in-board bench rows blend these; regressions need the
  * decomposition). */
object RecsysScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    t("prewarm ALS")(graft.Flagship.prewarmAlsFactors(spark, d))
    val (_, itemFactors) = graft.Flagship.prefitFactorFrames(spark, d).get
    val itemVecs = itemFactors.select(col("id").as("item_id"),
      col("features").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = t("item count")(itemVecs.count())
    println(s"[probe] nItems = $nItems")
    val numBits = math.max(4, math.min(12,
      (math.log(math.max(1L, nItems / 64).toDouble) / math.log(2)).round.toInt))
    val center = t("mean vector")(
      graft.functions.VectorFunctions.meanVector(itemVecs, "embedding").toSeq)
    val (tier, bp) = t("chooseRetriever")(
      graft.Flagship.chooseRetriever(itemVecs, center, numBits))
    println(s"[probe] tier=$tier skew_bp=$bp numBits=$numBits")
    // the round-13 decision surface: cost_bp on the REAL user workload,
    // with the one-shot resize retry — what recommend() actually runs
    locally {
      val (uf0, _) = graft.Flagship.prefitFactorFrames(spark, d).get
      val workload = uf0.select(col("id").as("user_id"),
        col("features").as("user_vec"))
      val dec = t("decideRetriever (workload)")(
        graft.Flagship.decideRetriever(itemVecs, center, numBits,
          workload = Some(workload)))
      println(s"[probe] decide: tier=${dec.tier} ev=${dec.evidence} " +
        s"bp=${dec.bp} bits=${dec.numBits}")
      // SHIFTING-workload rehearsal (round-13 VERDICT item 6): the
      // memoized decision samples the FIT-TIME workload; a request mix
      // migrating onto a hot cluster can invalidate cost_bp while the
      // item-side skew_bp is unchanged. Worst-case migration by
      // construction: serve ONLY the users homed on the workload's most
      // popular bucket — every probe set concentrates — and re-run the
      // decision fresh. The printed divergence (and the re-decision's
      // own cost, one or two metadata-scale aggregates) is the evidence
      // behind the re-decision policy documented on recommend().
      val mu = typedLit(center.toArray)
      val homed = workload.withColumn("__h",
        graft.functions.FastExpressions.lshBucket(col("user_vec"), mu,
          dec.numBits))
      val topBucket = homed.groupBy("__h").count()
        .orderBy(desc("count"), asc("__h")).head().getAs[Int]("__h")
      val hot = homed.filter(col("__h") === topBucket).drop("__h")
      val nHot = hot.count()
      val drift = t("re-decide (hot-subset drift)")(
        graft.Flagship.decideRetriever(itemVecs, center, numBits,
          workload = Some(hot)))
      println(s"[probe] drift: $nHot users on bucket $topBucket -> " +
        s"tier=${drift.tier} bp=${drift.bp} " +
        s"(fit-time: ${dec.tier}/${dec.bp} bp; " +
        s"memoized decision ${if (drift.tier == dec.tier) "HOLDS"
          else "DIVERGES"} under worst-case migration)")
    }
    val nlist = math.max(4, math.min(4096, (nItems / 64).toInt))
    val centers = t(s"k-means fit (nlist=$nlist)")(
      graft.functions.VectorFunctions.fitCenters(
        itemVecs, "embedding", nlist, maxIter = 10, seed = 42L))
    val ivfOcc = t("IvfSkewReport")(
      graft.ops.IvfSkewReport(centers).transform(itemVecs).head())
    println(s"[probe] ivf occupancy: $ivfOcc")
    t("index build (noop write)")(
      graft.ops.AnnIvf.index(itemVecs, centers)
        .write.format("noop").mode("overwrite").save())
    // candidate volume = Σ_users Σ_probed-lists |list| — THE retrieval
    // cost driver; compare against users × nprobe × uniform-list-size
    // to see how much fit skew (× probe-correlation) multiplies the join
    val (userFactors, _) = graft.Flagship.prefitFactorFrames(spark, d).get
    val probes = userFactors
      .select(col("id").as("user_id"), col("features").as("user_vec"))
      .select(col("user_id"), explode(graft.functions.FastExpressions
        .nearestCids(col("user_vec"), centers, 4)).as("__cid"))
    val listSizes = graft.ops.AnnIvf.index(itemVecs, centers)
      .groupBy("__cid").agg(count(lit(1)).as("__n"))
    val cand = t("candidate volume (count)")(
      probes.join(listSizes, Seq("__cid"))
        .agg(sum("__n")).head().getLong(0))
    val nUsers = userFactors.count()
    println(s"[probe] candidates=$cand users=$nUsers uniform=${
      nUsers * 4 * ((nItems + centers.size - 1) / centers.size)}")
    // recommend's serving stages, timed individually (mirrors
    // Flagship.recommend's plan; any drift between this decomposition
    // and the real path shows up as the residual in the full-pass rows)
    locally {
      import graft.Tables._
      val interactions = orders(spark, d)
        .join(lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").cast("int").as("user"),
          col("l_partkey").cast("int").as("item"))
        .agg(sum("l_quantity").cast("float").as("strength"))
      t("stage: interactions count")(interactions.count())
      val seen = interactions.groupBy(col("user").cast("long").as("user_id"))
        .agg(collect_set(col("item").cast("long")).as("seen_ids"))
      t("stage: seen-set (noop)")(
        seen.write.format("noop").mode("overwrite").save())
      val (uf, _) = graft.Flagship.prefitFactorFrames(spark, d).get
      val userVecs = uf.select(col("id").as("user_id"),
        col("features").as("user_vec"))
      val requests = customer(spark, d)
        .select(col("c_custkey").cast("long").as("user_id"))
      val withVec = requests.join(userVecs, Seq("user_id"))
        .filter(col("user_vec").isNotNull)
      val op = graft.ops.AnnIvf(itemVecs, centers, "user_id", "user_vec",
        k = 100, nprobe = 4, metric = "dot")
      t("stage: retrieval (noop)")(
        op.transform(withVec).write.format("noop").mode("overwrite").save())
      t("stage: retrieval again (noop)")(
        op.transform(withVec).write.format("noop").mode("overwrite").save())
      // stages 3-4 over a MATERIALIZED retrieval (isolates post-retrieval
      // cost from retrieval recomputation)
      val retrieved = op.transform(withVec)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("stage: retrieved persist")(retrieved.count())
      val filtered = graft.ops.QueryFeatureStore(seen, "user_id",
        Seq("seen_ids"), includeId = true)
        .transform(retrieved)
        .select(col("user_id"),
          posexplode(org.apache.spark.sql.functions.filter(
            arrays_zip(col("candidate_ids"), col("candidate_scores")),
            p => coalesce(
              !array_contains(col("seen_ids"), p.getField("candidate_ids")),
              lit(true)))).as(Seq("__pos", "__pair")))
        .select(col("user_id"),
          col("__pair.candidate_ids").as("item_id"),
          col("__pair.candidate_scores").as("rank_score"))
      t("stage: seen-filter explode (noop)")(
        filtered.write.format("noop").mode("overwrite").save())
      val requests2 = customer(spark, d)
        .select(col("c_custkey").cast("long").as("user_id"),
          col("c_mktsegment"), col("c_acctbal"))
      val ranked = graft.ops.UnrollFeatures(requests2, Seq("c_mktsegment"),
        on = "user_id").transform(filtered)
      val perUser = ranked.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("item_id"), col("rank_score")))).as("ps"))
        .select(col("user_id").as("requestId"),
          expr("transform(ps, p -> p.item_id)").as("candidate_ids"),
          expr("transform(ps, p -> p.rank_score)").as("relevance"))
      t("stage: unroll+collect+softmax (noop)")(
        graft.ops.SoftmaxSampling("candidate_ids", "relevance",
          temperature = 20.0, topk = 10).transform(perUser)
          .write.format("noop").mode("overwrite").save())
      retrieved.unpersist()
    }
    t("recommend warm 1 (noop)")(
      graft.Flagship.recommend(spark, d)
        .write.format("noop").mode("overwrite").save())
    t("recommend warm 2 (noop)")(
      graft.Flagship.recommend(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
