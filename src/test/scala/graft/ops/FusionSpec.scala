package graft.ops

import graft.SparkSpec
import graft.core.{Ensemble, EnsemblePersistence}
import org.apache.spark.sql.functions._

/** ReciprocalRankFusion: the training-free multi-ranker fusion
  * (Cormack et al., SIGIR 2009) over bounded candidate lists. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def listA = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
    (2L, 20L, 1), (2L, 21L, 2)
  ).toDF("query_id", "doc_id", "rank")

  private def listB = Seq(
    (1L, 11L, 1), (1L, 13L, 2), // 13 only in B; 10/12 only in A
    (2L, 21L, 1), (2L, 20L, 2)
  ).toDF("query_id", "doc_id", "rank")

  test("fused scores match the closed form; items from either list participate") {
    val out = ReciprocalRankFusion(listB, k0 = 60, topk = 10)
      .transform(listA).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getInt(1), r.getDouble(3))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    assert(out((1L, 11L))._2 === rr(2) + rr(1)) // both lists
    assert(out((1L, 10L))._2 === rr(1))         // A only
    assert(out((1L, 13L))._2 === rr(2))         // B only
    // q1 ordering: 11 (two votes) first, then 10, then 12/13 by score then id
    assert(out((1L, 11L))._1 === 1)
    assert(out((1L, 10L))._1 === 2)
    // q2: 20 and 21 each rank 1+2 -> identical scores; tie broken by doc_id
    assert(out((2L, 20L))._2 === out((2L, 21L))._2)
    assert(out((2L, 20L))._1 === 1 && out((2L, 21L))._1 === 2)
  }

  test("topk truncates per query; output schema is (query, rank, item, score)") {
    val op = ReciprocalRankFusion(listB, topk = 2)
    val out = op.transform(listA)
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) <= 2))
    assert(out.schema.fieldNames.toSeq ===
      Seq("query_id", "rank", "doc_id", "rrf_score"))
    val declared = op.transformSchema(listA.schema)
    assert(declared.map(f => (f.name, f.dataType)) ===
      out.schema.map(f => (f.name, f.dataType)))
  }

  test("fails fast: missing columns, non-integral rank, dtype mismatch") {
    intercept[IllegalArgumentException] {
      ReciprocalRankFusion(listB).transformSchema(
        listA.drop("rank").schema)
    }
    intercept[IllegalArgumentException] {
      ReciprocalRankFusion(listB).transformSchema(
        listA.withColumn("rank", col("rank").cast("double")).schema)
    }
    intercept[IllegalArgumentException] {
      ReciprocalRankFusion(listB.withColumn("doc_id", col("doc_id").cast("int")))
        .transformSchema(listA.schema)
    }
  }

  test("round-trips through the ensemble codec with its other-list artifact") {
    val op = ReciprocalRankFusion(listB, k0 = 30, topk = 3, outputCol = "s")
    val dir = java.nio.file.Files.createTempDirectory("ens_rrf").toString
    EnsemblePersistence.save(Ensemble(Seq(op), listA.schema), dir, spark)
    val loaded = EnsemblePersistence.load(dir, spark)
    val a = op.transform(listA).orderBy("query_id", "rank").collect().toSeq
    val b = loaded.transform(listA).orderBy("query_id", "rank").collect().toSeq
    assert(a === b)
  }
}
