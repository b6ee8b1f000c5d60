package graft

import org.apache.spark.sql.functions._

/** End-to-end smoke of the 4-stage pipeline on sf0.001 (t1 tier). */
class FlagshipSpec extends SparkSpec {
  import spark.implicits._

  test("entry returns 10 ranked recommendations per known user") {
    val out = SparkEntry.entry(spark).cache()
    assert(out.count() > 0, "driver smoke contract: rows > 0")
    val row = out.select("ordered_ids", "ordered_scores")
      .as[(Seq[Long], Seq[Double])].head()
    assert(row._1.size == 10 && row._2.size == 10)
    assert(row._1.distinct.size == 10, "no duplicate recommendations")
  }

  test("prewarmed ALS factors serve from parquet: no fit inside the serving plan") {
    val d = "/root/testdata/sf0.001"
    Flagship.prewarmAlsFactors(spark, d)
    val plan = Flagship.recommend(spark, d).queryExecution.optimizedPlan.toString
    // the offline-artifact discipline: the serving plan reads the factor
    // tables as plain parquet relations (graft_als_factors_* temp dir);
    // an inline ALS fit would instead surface as LogicalRDD leaves from
    // MLlib's internal conversion — the eviction/retrain hazard r6 flagged
    assert(plan.contains("graft_als_factors_"),
      s"serving plan must scan the prewarmed parquet factor tables:\n$plan")
    val out = Flagship.recommend(spark, d)
    assert(out.count() > 0, "prewarmed serving path still recommends")
  }

  test("fitted serving ensemble round-trips: save → load → identical output") {
    val d = "/root/testdata/sf0.001"
    val (ens, requests) = Flagship.servingEnsemble(spark, d, retrievalK = 50)
    val dir = java.nio.file.Files.createTempDirectory("flagship_ens").toString
    graft.core.EnsemblePersistence.save(ens, dir, spark)
    val loaded = graft.core.EnsemblePersistence.load(dir, spark)

    val a = ens.transform(requests).orderBy("user_id").collect().toSeq
    val b = loaded.transform(requests).orderBy("user_id").collect().toSeq
    assert(a.nonEmpty, "serving ensemble must produce recommendations")
    assert(a == b, "reloaded flagship ensemble must reproduce identical rows")
    // sanity: the graph serves ranked, seen-filtered, k-bounded lists
    val row = a.head
    val ids = row.getSeq[Long](row.fieldIndex("ordered_ids"))
    assert(ids.size <= 10 && ids.distinct.size == ids.size)
  }

  test("IVF retriever backend serves and round-trips interchangeably") {
    val d = "/root/testdata/sf0.001"
    val (ens, requests) = Flagship.servingEnsemble(spark, d, retrievalK = 50,
      retriever = "ivf")
    val dir = java.nio.file.Files.createTempDirectory("flagship_ivf").toString
    graft.core.EnsemblePersistence.save(ens, dir, spark)
    val loaded = graft.core.EnsemblePersistence.load(dir, spark)
    val a = ens.transform(requests).orderBy("user_id").collect().toSeq
    assert(a.nonEmpty, "IVF-backed serving ensemble must produce recommendations")
    assert(loaded.transform(requests).orderBy("user_id").collect().toSeq == a)
  }

  test("PQ retriever backend serves and round-trips interchangeably") {
    val d = "/root/testdata/sf0.001"
    val (ens, requests) = Flagship.servingEnsemble(spark, d, retrievalK = 50,
      retriever = "pq")
    val dir = java.nio.file.Files.createTempDirectory("flagship_pq").toString
    graft.core.EnsemblePersistence.save(ens, dir, spark)
    val loaded = graft.core.EnsemblePersistence.load(dir, spark)
    val a = ens.transform(requests).orderBy("user_id").collect().toSeq
    assert(a.nonEmpty, "PQ-backed serving ensemble must produce recommendations")
    assert(loaded.transform(requests).orderBy("user_id").collect().toSeq == a)
  }

  test("chooseRetriever: the sf1.0 skew geometry in miniature trips the IVF action") {
    // the rehearsal pathology in miniature: ALS factors collapsed into a
    // line through the mean — after centering, every vector projects onto
    // the fixed hyperplanes with one of two ± sign patterns, so ~2 of
    // 2^bits buckets carry the whole catalog (SCALE.md measured 22×
    // uniform in the heaviest bucket at sf1.0; this is the same geometry
    // taken to its limit)
    val dir = Seq(1.0, 2.0, 3.0, 0.5, -1.5, 0.7, 2.2, -0.9)
    val line = (1L to 240L).map { i =>
      val s = (i.toDouble - 120.5) / 40.0
      (i, dir.map(x => (x * s).toFloat))
    }.toDF("item_id", "embedding")
    val muL = graft.functions.VectorFunctions.meanVector(line, "embedding").toSeq
    val (t1, bp1) = Flagship.chooseRetriever(line, muL, numBits = 5)
    assert(bp1 > Flagship.LshSkewBoundBp,
      s"cone geometry must exceed the skew bound: $bp1 bp")
    assert(t1 == "ivf", s"cone geometry must trip the IVF action ($bp1 bp)")

    // spread geometry keeps the cheap LSH tier
    val rnd = new scala.util.Random(7)
    val spread = (1L to 240L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))).toDF("item_id", "embedding")
    val muS = graft.functions.VectorFunctions.meanVector(spread, "embedding").toSeq
    val (t2, bp2) = Flagship.chooseRetriever(spread, muS, numBits = 5)
    assert(t2 == "lsh", s"spread geometry must keep LSH ($bp2 bp)")
    assert(bp2 <= Flagship.LshSkewBoundBp)
  }

  test("auto retriever keeps LSH on the healthy test catalog (skew below bound)") {
    // the decision the default serving graph now makes: sf0.001's ALS
    // factor fit measures ~25k bp (probe-verified), under the 80k bound,
    // so "auto" must resolve to the sign-LSH tier — the cheap index stays
    // the default until the occupancy monitor actually trips
    val d = "/root/testdata/sf0.001"
    val (ens, requests) = Flagship.servingEnsemble(spark, d, retrievalK = 50)
    assert(ens.ops.exists(_.isInstanceOf[graft.ops.AnnLsh]),
      s"auto must pick AnnLsh on healthy geometry: ${ens.ops.map(_.getClass.getSimpleName)}")
    assert(ens.transform(requests).count() > 0)
  }

  test("forced-IVF recommend serves the full 4-stage graph (the tripped-skew branch)") {
    // the branch chooseRetriever activates when the occupancy monitor
    // trips: same 4-stage contract — ranked, deduplicated, seen-filtered
    // k-lists — through the k-means tier instead of sign-LSH
    val d = "/root/testdata/sf0.001"
    val out = Flagship.recommend(spark, d, retriever = Some("ivf")).cache()
    assert(out.count() > 0, "IVF-served recommend must produce rows")
    val row = out.select("ordered_ids", "ordered_scores")
      .as[(Seq[Long], Seq[Double])].head()
    assert(row._1.size == 10 && row._1.distinct.size == 10)
    val recs = out.select($"user_id", explode($"ordered_ids").as("item_id"))
    val seen = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .distinct()
    assert(recs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
    out.unpersist()
  }

  test("recommendations exclude already-seen items") {
    val d = "/root/testdata/sf0.001"
    val recs = Flagship.recommend(spark, d)
      .select($"user_id", explode($"ordered_ids").as("item_id"))
    val seen = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .distinct()
    assert(recs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
  }
}
