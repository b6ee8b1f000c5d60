package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** IVF ANN: recall vs brute-force ground truth, probe monotonicity, and
  * the fitted-centroid round trip. */
class AnnIvfSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("AnnIvf recall@10 vs brute force rises with nprobe; full probe is exact") {
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(30).cache()
    val items = emb.filter($"label" =!= 0).select($"vec_id".as("item_id"), $"embedding").cache()

    val truth = TopKRetrieval(items, "vec_id", "embedding", k = 10, metric = "cosine")
      .transform(queries)
      .select($"vec_id", $"candidate_ids").as[(Long, Seq[Long])].collect().toMap

    val fitted = AnnIvf.fit(items, "vec_id", "embedding", k = 10,
      nlist = 16, metric = "cosine")
    def recall(nprobe: Int): Double = {
      val approx = fitted.copy(nprobe = nprobe).transform(queries)
        .select($"vec_id", $"candidate_ids").as[(Long, Seq[Long])].collect().toMap
      val hits = truth.map { case (q, t) =>
        approx.get(q).map(a => a.toSet.intersect(t.toSet).size).getOrElse(0)
      }.sum
      hits.toDouble / (truth.size * 10)
    }

    val r2 = recall(2)
    val r8 = recall(8)
    assert(r8 >= r2, s"recall must not fall with more probes: $r2 -> $r8")
    assert(r8 >= 0.5, s"nprobe=8/nlist=16 recall@10 too low: $r8")
    // probing every list scans every item: IVF degrades gracefully to exact
    assert(recall(16) == 1.0, "full probe must equal brute force")
  }

  test("incremental index ingest is id-identical to a full rebuild") {
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(20)
    val items = emb.filter($"label" =!= 0).select($"vec_id".as("item_id"), $"embedding")
    val fitted = AnnIvf.fit(items, "vec_id", "embedding", k = 10, nlist = 8)
    // the persisted index: 2/3 of the catalog; the rest arrives as a batch
    val prior = AnnIvf.index(items.filter($"item_id" % 3 =!= 0), fitted.centers,
      "item_id", "embedding")
    val updated = fitted.updatedIndex(prior, items.filter($"item_id" % 3 === 0))
    val incremental = fitted.transformIndexed(queries, updated)
      .orderBy("vec_id").select($"vec_id", $"candidate_ids")
      .as[(Long, Seq[Long])].collect().toSeq
    val rebuilt = fitted.transform(queries)
      .orderBy("vec_id").select($"vec_id", $"candidate_ids")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(incremental == rebuilt,
      "frozen-quantizer append must equal re-indexing the union")
    // the index table carries every item exactly once
    assert(updated.count() == items.count() &&
      updated.select("__item_id").distinct().count() == items.count())
    // the claimed serving path: the maintained index PERSISTS as parquet
    // and the reloaded frames probe identically (no live state)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    updated.write.mode("overwrite").parquet(dir)
    val reloaded = fitted.transformIndexed(queries, spark.read.parquet(dir))
      .orderBy("vec_id").select($"vec_id", $"candidate_ids")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(reloaded == rebuilt, "parquet-backed index must probe identically")
  }

  test("fitted centroids are plain parameters and the op round-trips") {
    val emb = graft.Tables.embeddings(spark, d)
    val items = emb.filter($"label" === 1).select($"vec_id".as("item_id"), $"embedding")
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(5)
    val fitted = AnnIvf.fit(items, "vec_id", "embedding", k = 5, nlist = 4)
    assert(fitted.centers.size == 4 && fitted.centers.forall(_.nonEmpty))

    val dir = java.nio.file.Files.createTempDirectory("ann_ivf").toString
    val ens = graft.core.Ensemble(Seq(fitted), queries.schema)
    graft.core.EnsemblePersistence.save(ens, dir, spark)
    val loaded = graft.core.EnsemblePersistence.load(dir, spark)
    assert(loaded.ops.head.asInstanceOf[AnnIvf].centers == fitted.centers,
      "centroids must persist exactly as parameters")
    assert(loaded.transform(queries).orderBy("vec_id").collect().toSeq ==
      fitted.transform(queries).orderBy("vec_id").collect().toSeq)
  }

  test("a query probing only EMPTY inverted lists keeps its row (empty candidates)") {
    import org.apache.spark.sql.functions._
    // two centroids; every item sits near A, so B's list is empty
    val items = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)))
      .toDF("item_id", "embedding")
    val centers = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0))
    val op = AnnIvf(items, centers, "qid", "qvec", k = 5, nprobe = 1)
    val qs = Seq((10L, Seq(-1.0, 0.0)), (11L, Seq(1.0, 0.0)))
      .toDF("qid", "qvec")
    val out = op.transform(qs).orderBy("qid").collect()
    assert(out.length == 2, s"both queries must keep their rows: ${out.toSeq}")
    assert(out(0).getAs[scala.collection.Seq[Long]]("candidate_ids").isEmpty,
      "the empty-list query emits empty candidate arrays")
    assert(out(1).getAs[scala.collection.Seq[Long]]("candidate_ids").nonEmpty)
  }
}
