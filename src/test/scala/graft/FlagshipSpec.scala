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
