package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Recall of bucketed ANN vs brute-force ground truth on driver data. */
class AnnLshSpec extends SparkSpec {
  import spark.implicits._

  test("AnnLsh recall@10 vs brute force is reasonable and rises with nprobe") {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(30).cache()
    val items = emb.filter($"label" =!= 0).select($"vec_id".as("item_id"), $"embedding").cache()

    val truth = TopKRetrieval(items, "vec_id", "embedding", k = 10, metric = "cosine")
      .transform(queries)
      .select($"vec_id", $"candidate_ids").as[(Long, Seq[Long])].collect().toMap

    def recall(nprobe: Int): Double = {
      val approx = AnnLsh(items, "vec_id", "embedding", k = 10,
        numBits = 4, nprobe = nprobe, metric = "cosine")
        .transform(queries)
        .select($"vec_id", $"candidate_ids").as[(Long, Seq[Long])].collect().toMap
      val hits = truth.map { case (q, t) =>
        approx.get(q).map(a => a.toSet.intersect(t.toSet).size).getOrElse(0)
      }.sum
      hits.toDouble / (truth.size * 10)
    }

    val r1 = recall(1)
    val r5 = recall(5)
    assert(r5 >= r1, s"recall should not fall with more probes: $r1 -> $r5")
    assert(r5 >= 0.25, s"multi-probe recall@10 too low: $r5")
  }

  test("AnnLsh candidates always come from the item set") {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(5)
    val items = emb.filter($"label" === 1).select($"vec_id".as("item_id"), $"embedding")
    val itemIds = items.select($"item_id").as[Long].collect().toSet
    val out = AnnLsh(items, "vec_id", "embedding", k = 5, numBits = 6, nprobe = 4)
      .transform(queries)
      .select(explode($"candidate_ids")).as[Long].collect()
    assert(out.forall(itemIds.contains))
  }
}
