package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops._

/** Save/load round-trip equality — the reference asserts the reloaded
  * ensemble produces identical outputs (test_ensemble.py:27-58). */
class EnsemblePersistenceSpec extends SparkSpec {
  import spark.implicits._

  test("save/load round-trip reproduces identical outputs") {
    val features = Seq((10L, "A", 1.5), (11L, "B", 2.5), (12L, "C", 3.5))
      .toDF("item_id", "brand", "price")
    val input = Seq(
      (1, Seq(10L, 11L, 12L), Seq(11L)),
      (2, Seq(12L, 10L), Seq.empty[Long])
    ).toDF("requestId", "candidate_ids", "seen_ids")

    val ens = Ensemble(Seq(
      FilterCandidates("candidate_ids", "seen_ids"),
      ExplodeCandidates("filtered_ids", "item_id"),
      QueryFeatureStore(features, "item_id", Seq("brand", "price"),
        includeId = true, outputPrefix = "item_"),
      Rename(Map("item_brand" -> "brand_nvt"))), input.schema)

    val dir = Files.tmp("ens_roundtrip")
    EnsemblePersistence.save(ens, dir, spark)
    val loaded = EnsemblePersistence.load(dir, spark)

    // parquet/DDL round-trips legitimately relax nullability; the schema
    // contract is names + types
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(shape(loaded.inputSchema) == shape(ens.inputSchema))
    assert(shape(loaded.outputSchema) == shape(ens.outputSchema))
    val a = ens.transform(input).orderBy("requestId", "item_id").collect().toSeq
    val b = loaded.transform(input).orderBy("requestId", "item_id").collect().toSeq
    assert(a == b, "reloaded ensemble must produce identical rows")
  }

  test("save rejects non-persistable ops; load rejects unknown types") {
    val input = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val items = input
    val ens = Ensemble(Seq(TopKRetrieval(items, "vec_id", "embedding")), input.schema)
    assertThrows[IllegalArgumentException] {
      EnsemblePersistence.save(ens, Files.tmp("ens_bad"), spark)
    }
  }

  private object Files {
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
  }
}
