package graft

import org.apache.spark.sql.functions._
import graft.core.{Ensemble, EnsemblePersistence}
import graft.ops._

/** The §3.3 lifecycle end-to-end: persist a fitted serving graph, score
  * a request parquet through graft.Serve, and read the response — the
  * "a user could switch" path with nothing in-process shared between
  * export and serving except the artifact directory. */
class ServeSpec extends SparkSpec {
  import spark.implicits._

  test("Serve scores a request parquet through a reloaded ensemble") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val features = Seq((10L, "A", 1.5), (11L, "B", 2.5), (12L, "C", 3.5))
      .toDF("item_id", "brand", "price")
    val requests = Seq(
      (1L, Seq(10L, 11L, 12L), Seq(11L)),
      (2L, Seq(12L, 10L), Seq.empty[Long]))
      .toDF("requestId", "candidate_ids", "seen_ids")
    val ens = Ensemble(Seq(
      FilterCandidates("candidate_ids", "seen_ids"),
      ExplodeCandidates("filtered_ids", "item_id"),
      QueryFeatureStore(features, "item_id", Seq("brand", "price"), includeId = true)),
      requests.schema)

    val ensDir = tmp("serve_ens"); val reqDir = tmp("serve_req")
    val outDir = tmp("serve_out")
    EnsemblePersistence.save(ens, ensDir, spark)
    requests.write.mode("overwrite").parquet(reqDir)

    Serve.score(spark, ensDir, reqDir, outDir)

    val response = spark.read.parquet(outDir)
    val expected = ens.transform(requests)
    assert(response.orderBy("requestId", "item_id").collect().toSeq ==
      expected.orderBy("requestId", "item_id").collect().toSeq)
    assert(response.count() == 4, "2 + 2 surviving candidates")
    // schema mismatch fails eagerly at ensemble revalidation, not mid-job
    val badReq = tmp("serve_bad")
    Seq(Tuple1(1L)).toDF("wrong_col").write.mode("overwrite").parquet(badReq)
    assertThrows[IllegalArgumentException] {
      Serve.score(spark, ensDir, badReq, tmp("serve_out2"))
    }
  }
}
