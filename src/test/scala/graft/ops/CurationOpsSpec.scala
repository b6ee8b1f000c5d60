package graft.ops

import graft.SparkSpec

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Decontaminate flags exactly the docs sharing an n-gram with the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content here entirely"),
      (3L, "too short"),
      (4L, "QUICK   Brown fox JUMPS over")) // normalization must unify case/spacing
      .toDF("doc_id", "text")
    val eval = Seq((100L, "a quick brown fox jumps around")).toDF("doc_id", "text")
    val out = Decontaminate(eval, n = 4).transform(train).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    // eval 4-grams: {a quick brown fox, quick brown fox jumps, brown fox jumps around}
    assert(out(0) == ((1L, 6, 1L, true)), s"doc1 shares 'quick brown fox jumps': ${out(0)}")
    assert(out(1) == ((2L, 2, 0L, false)), s"doc2 is clean: ${out(1)}")
    assert(out(2) == ((3L, 0, 0L, false)), "sub-n docs have zero grams and are clean")
    assert(out(3) == ((4L, 2, 1L, true)),
      s"doc4 matches through case/whitespace normalization: ${out(3)}")
  }

  test("Decontaminate counts repeated matching grams per occurrence") {
    val train = Seq((1L, "x y x y x y")).toDF("doc_id", "text") // grams: xy yx xy yx xy (n=2... )
    val eval = Seq((9L, "x y")).toDF("doc_id", "text")
    val out = Decontaminate(eval, n = 2).transform(train).collect().head
    assert(out.getInt(1) == 5, "five bigrams total")
    assert(out.getLong(2) == 3L, "'x y' occurs three times, each occurrence counts")
  }

  test("PackChunks packs greedily: budget never exceeded, oversized chunks isolated") {
    // single shard so the whole order is one fold
    val chunks = Seq(
      (1L, 0L, 60L), (2L, 0L, 60L), (3L, 0L, 30L), (4L, 0L, 100L),
      (5L, 0L, 10L), (6L, 0L, 500L), (7L, 0L, 1L))
      .toDF("doc_id", "chunk_id", "n_tokens")
    val op = PackChunks(budget = 128, shards = 1)
    val out = op.transform(chunks).orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getInt(5)))
    // fold: 60(p0), 60(p0), 30 → 150>128 → p1, 100 → 130>128 → p2,
    // 10(p2), 500 capped to 128 → 110+128>128 → p3 alone, 1 → p4
    assert(out.toSeq == Seq(
      (1L, 0L, 0), (2L, 0L, 1), (3L, 1L, 0), (4L, 2L, 0),
      (5L, 2L, 1), (6L, 3L, 0), (7L, 4L, 0)), out.toSeq.toString)
    // invariant: no pack's (capped) token total exceeds the budget
    val sums = op.transform(chunks)
      .groupBy("shard", "pack_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.least($"n_tokens",
          org.apache.spark.sql.functions.lit(128L))).as("tot"))
      .select("tot").as[Long].collect()
    assert(sums.forall(_ <= 128L), sums.toSeq.toString)
    // deterministic under re-run
    assert(op.transform(chunks).collect().toSet == op.transform(chunks).collect().toSet)
  }

  test("PackChunks shards by content hash of the doc id: doc order within shard is stable") {
    val chunks = (1L to 40L).map(i => (i, 0L, 50L)).toDF("doc_id", "chunk_id", "n_tokens")
    val op = PackChunks(budget = 100, shards = 4)
    val out = op.transform(chunks).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(out.map(_._2).distinct.sorted.forall(s => s >= 0 && s < 4))
    // two 50-token chunks per pack, positions 0 and 1, within every shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      rows.groupBy(_._3).foreach { case (_, pk) =>
        assert(pk.length <= 2 && pk.map(_._4).sorted.sameElements(pk.indices))
      }
    }
    // null token counts are dropped, not packed
    val withNull = Seq((1L, 0L, Some(50L)), (2L, 0L, None))
      .toDF("doc_id", "chunk_id", "n_tokens")
    assert(op.transform(withNull).count() == 1)
  }
}
