package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The full index lifecycle — build → incremental append → purge
  * retirement → probe — composed END TO END for each of the three index
  * families (exact digest, MinHash signature, IVF inverted lists). The
  * pieces are individually pinned elsewhere; this is the contract a
  * 100 TB operator actually runs across deployments: after any sequence
  * of ingests and takedowns, probing the maintained index must be
  * indistinguishable from probing a from-scratch rebuild over the
  * surviving corpus. */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  // batch 1 seeds the corpus; batch 2 appends (with one exact dup of a
  // batch-1 doc and one near-dup); the purge then removes doc 2 and
  // doc 11; batch 3 probes the surviving state
  private val batch1 = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "one two three four five six"),
    (3L, "the quick brown fox jumps over the lazy dog"))
  private val batch2 = Seq(
    (11L, "seven eight nine ten eleven"),
    (12L, "alpha beta gamma delta epsilon"), // exact dup of 1 -> rejected
    (13L, "the quick brown fox jumps over the lazy cat")) // near-dup of 3
  private val tombstoneIds = Seq(2L, 11L)
  private val batch3 = Seq(
    (21L, "one two three four five six"),    // purged content: re-acceptable
    (22L, "alpha beta gamma delta epsilon"), // still indexed: duplicate
    (23L, "completely novel content here"))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
  private def tombstones = tombstoneIds.map(Tuple1(_)).toDF("doc_id")

  test("digest index lifecycle: build + append + purge probes like a rebuild") {
    val emptyIndex = Seq.empty[Tuple1[String]].toDF("content_hash")
    // build: ingest batch 1 against an empty index
    val op1 = IncrementalDedup(emptyIndex)
    val index1 = op1.updatedIndex(df(batch1))
    // append: ingest batch 2 against the maintained index
    val op2 = IncrementalDedup(index1)
    val accepted2 = op2.transform(df(batch2)).filter($"dup_kind".isNull)
      .select($"doc_id").as[Long].collect().toSet
    assert(accepted2 == Set(11L, 13L), s"12 is an exact index dup: $accepted2")
    val index2 = op2.updatedIndex(df(batch2))
    // purge: retire tombstoned docs' digests (corpus = accepted rows)
    val corpus = df(batch1).unionByName(df(batch2))
      .filter(!$"doc_id".isInCollection(Seq(12L))) // 12 was never accepted
    val purge = Purge(tombstones)
    val surviving = purge.transform(corpus)
    val index3 = purge.updatedIndex(index2, corpus)
    // the maintained index equals a from-scratch rebuild over survivors
    val rebuilt = surviving
      .select(md5(graft.functions.TextFunctions.normalize($"text"))
        .as("content_hash")).distinct()
    assert(index3.as[String].collect().toSet ==
      rebuilt.as[String].collect().toSet,
      "maintained digest index != rebuild over the surviving corpus")
    // probe: batch 3 labels identically through either index
    def labels(index: DataFrame) =
      IncrementalDedup(index).transform(df(batch3))
        .select($"doc_id", $"dup_kind").as[(Long, Option[String])]
        .collect().toMap
    val got = labels(index3)
    assert(got == labels(rebuilt), "probe diverges from the rebuilt index")
    assert(got(21L).isEmpty, "purged content must be re-acceptable")
    assert(got(22L).contains("index"), "still-indexed content must reject")
    assert(got(23L).isEmpty)
  }

  test("signature index lifecycle: build + append + purge probes like a rebuild") {
    // build over batch 1's accepted docs
    val index1 = IncrementalMinHashDedup.signatures(df(batch1))
    // append batch 2's keepers
    val op2 = IncrementalMinHashDedup(index1)
    val labeled2 = op2.transform(df(batch2))
      .select($"doc_id", $"dup_kind").as[(Long, Option[String])].collect().toMap
    assert(labeled2(12L).contains("near_index") &&
      labeled2(13L).contains("near_index"),
      s"exact and near dups of indexed docs must both flag: $labeled2")
    val index2 = op2.updatedIndex(df(batch2))
    // purge: drop tombstoned ids' signatures
    val purge = Purge(tombstones)
    val index3 = purge.updatedSignatureIndex(index2)
    // equals the rebuild over the surviving accepted corpus
    val survivingDocs = df(batch1).unionByName(df(batch2))
      .filter(!$"doc_id".isInCollection(Seq(12L, 13L))) // batch-2 non-keepers
      .join(tombstones, Seq("doc_id"), "left_anti")
    val rebuilt = IncrementalMinHashDedup.signatures(survivingDocs)
    def sigSet(idx: DataFrame) = idx.select($"doc_id", $"minhash_sig")
      .as[(Long, Seq[Long])].collect().toSet
    assert(sigSet(index3) == sigSet(rebuilt),
      "maintained signature index != rebuild over survivors")
    // probe: batch 3 labels identically through either index
    def labels(index: DataFrame) =
      IncrementalMinHashDedup(index).transform(df(batch3))
        .select($"doc_id", $"dup_kind", $"matched_id")
        .as[(Long, Option[String], Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    val got = labels(index3)
    assert(got == labels(rebuilt), "probe diverges from the rebuilt index")
    assert(got(21L)._1.isEmpty, "purged near-identity must be re-acceptable")
    assert(got(22L)._1.contains("near_index") && got(22L)._2.contains(1L))
  }

  test("IVF index lifecycle: build + append + purge probes like a rebuild") {
    val rnd = new scala.util.Random(11)
    val seed = (1L to 40L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val added = (41L to 60L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val seedDf = seed.toDF("item_id", "embedding")
    val addedDf = added.toDF("item_id", "embedding")
    val op = AnnIvf.fit(seedDf, "query_id", "query_vec", nlist = 4, nprobe = 4)
    // build + append under the frozen quantizer
    val index1 = AnnIvf.index(seedDf, op.centers)
    val index2 = op.updatedIndex(index1, addedDf)
    // purge a slice of the catalog
    val purgedIds = Seq(3L, 17L, 45L)
    val purge = Purge(purgedIds.map(Tuple1(_)).toDF("doc_id"))
    val index3 = purge.updatedAnnIndex(index2)
    // equals the rebuild over the surviving catalog
    val survivors = seedDf.unionByName(addedDf)
      .filter(!$"item_id".isInCollection(purgedIds))
    val rebuilt = AnnIvf.index(survivors, op.centers)
    def rows(idx: DataFrame) = idx.select($"__item_id", $"__cid")
      .as[(Long, Int)].collect().toSet
    assert(rows(index3) == rows(rebuilt),
      "maintained IVF index != rebuild over the surviving catalog")
    // probe: identical top-k through either index; purged items never return
    val queries = (101L to 110L)
      .map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("query_id", "query_vec")
    def probe(idx: DataFrame) =
      op.asRowsIndexed(queries, idx)
        .as[(Long, Int, Long, Double)].collect().toSet
    val got = probe(index3)
    assert(got == probe(rebuilt), "probe diverges from the rebuilt index")
    assert(got.forall { case (_, _, item, _) => !purgedIds.contains(item) },
      "a purged item must never be retrieved")
  }

  test("SQ8 coded-index lifecycle: build + append + purge probes like a rebuild") {
    val rnd = new scala.util.Random(13)
    val seed = (1L to 40L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val added = (41L to 60L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val seedDf = seed.toDF("item_id", "embedding")
    val addedDf = added.toDF("item_id", "embedding")
    // quantizers (coarse + scalar range) freeze at build time — the SQ
    // analog of the frozen IVF centroids; drift outside the fitted range
    // saturates and is the documented refit trigger
    val op = AnnSq.fit(seedDf, "query_id", "query_vec", nlist = 4, nprobe = 4)
    val index1 = AnnSq.index(seedDf, op.centers, op.mins, op.maxs)
    val index2 = op.updatedIndex(index1, addedDf)
    val purgedIds = Seq(3L, 17L, 45L)
    val purge = Purge(purgedIds.map(Tuple1(_)).toDF("doc_id"))
    val index3 = purge.updatedAnnIndex(index2)
    val survivors = seedDf.unionByName(addedDf)
      .filter(!$"item_id".isInCollection(purgedIds))
    val rebuilt = AnnSq.index(survivors, op.centers, op.mins, op.maxs)
    def rows(idx: DataFrame) = idx.select($"__item_id", $"__cid", $"__codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(rows(index3) == rows(rebuilt),
      "maintained SQ index != rebuild over the surviving catalog")
    val queries = (101L to 110L)
      .map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("query_id", "query_vec")
    def probe(idx: DataFrame) =
      op.transformIndexed(queries, idx)
        .select($"query_id", $"candidate_ids")
        .as[(Long, Seq[Long])].collect().toSet
    val got = probe(index3)
    assert(got == probe(rebuilt), "probe diverges from the rebuilt index")
    assert(got.forall { case (_, items) => items.forall(!purgedIds.contains(_)) },
      "a purged item must never be retrieved")
  }
}
