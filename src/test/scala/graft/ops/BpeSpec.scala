package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE trainer/tokenizer semantics: hand-worked merge lists, greedy
  * left-to-right overlap handling, distributed ≡ local-reference
  * equality, and expression-strategy ≡ closure-strategy equality. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePair: greedy left-to-right, overlaps leftmost-first") {
    val df = Seq(
      Tuple1(Seq("a", "a", "a")),
      Tuple1(Seq("a", "a", "a", "a")),
      Tuple1(Seq("x", "a", "a", "y"))
    ).toDF("toks")
    val got = df.select(BpeTrainer.mergePair(col("toks"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("x", "aa", "y")))
  }

  test("fit learns the hand-computed merge list on a known corpus") {
    // types: "aaab" ×10, "aab" ×6 → initial pairs (a,a):10*2+6=26,
    // (a,b):16, (b,</w>):16 → merge 1 = (a,a) [26].
    // After: aaab→[aa,a,b,</w>] ×10, aab→[aa,b,</w>] ×6 →
    // pairs: (aa,a):10, (a,b):10, (aa,b):6, (b,</w>):16 → merge 2 =
    // (b,</w>) [16]. After: pairs (aa,a):10, (a,b</w>):10, (aa,b</w>):6
    // → merge 3 = (a,b</w>) [tie 10 with (aa,a); "a" < "aa" lexically].
    val docs = (Seq.fill(10)("aaab") ++ Seq.fill(6)("aab"))
      .zipWithIndex.map { case (w, i) => (i, w) }.toDF("id", "text")
    val merges = BpeTrainer.fit(docs, "text", numMerges = 3, minPairCount = 1L)
    assert(merges == Seq(("a", "a"), ("b", "</w>"), ("a", "b</w>")))
    assert(BpeTrainer.fitLocal(Map("aaab" -> 10L, "aab" -> 6L), 3, 1L) == merges)
  }

  test("fit stops early when no pair reaches minPairCount") {
    val docs = Seq((1, "ab"), (2, "cd")).toDF("id", "text")
    val merges = BpeTrainer.fit(docs, "text", numMerges = 10, minPairCount = 2L)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("distributed fit equals the independent local trainer on the testdata corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrainer.fit(docs, "text", numMerges = 20)
    val typeFreqs = docs
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(BpeTrainer.fitLocal(typeFreqs, 20) == merges)
    assert(merges.length == 20)
  }

  test("tokenize: expression strategy ≡ closure strategy ≡ local reference; lossless") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val merges = BpeTrainer.fit(docs, "text", numMerges = 12)
    val viaExpr = BpeTokenize(merges, "text", maxExprMerges = 64)
      .transform(docs).select("doc_id", "bpe_tokens")
      .as[(Long, Seq[String])].collect().toMap
    val viaUdf = BpeTokenize(merges, "text", maxExprMerges = 0)
      .transform(docs).select("doc_id", "bpe_tokens")
      .as[(Long, Seq[String])].collect().toMap
    assert(viaExpr == viaUdf)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      val norm = BpeTokenize.normalizeLocal(text)
      val local = norm.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => BpeTokenize.applyWord(w, merges))
      assert(viaExpr(id) == local, s"doc $id strategy/local divergence")
      // lossless: detokenized == normalized input
      val recon = viaExpr(id).mkString("")
        .replace(BpeTrainer.EndOfWord, " ").trim
      assert(recon == norm, s"doc $id reconstruction broke")
    }
  }

  test("planBatch: contiguous safe prefix — disjoint+UB accept, shared-token stop, tie stop") {
    import BpeTrainer.planBatch
    // token-disjoint second pair whose count exceeds every created-pair
    // bound (maxRight(b) = 8 via (b,x)) → both merges batch in one pass
    assert(planBatch(Seq((("a", "b"), 10L), (("c", "d"), 9L), (("b", "x"), 8L)),
      0L, 10, 1L) == Seq(("a", "b"), ("c", "d")))
    // second shares a token with the accepted merge → its post-merge
    // count is unknown: the scan must STOP, never skip past it
    assert(planBatch(Seq((("a", "b"), 10L), (("b", "y"), 9L), (("c", "d"), 8L)),
      0L, 10, 1L) == Seq(("a", "b")))
    // a pair created by merge 1 could reach count 5 (bounded by (b,z));
    // a 5-count candidate TIES with it and could lose lexicographically
    assert(planBatch(Seq((("a", "b"), 10L), (("c", "d"), 5L), (("b", "z"), 5L)),
      0L, 10, 1L) == Seq(("a", "b")))
    // out-of-window bound: unseen pairs may reach tailCnt=8
    assert(planBatch(Seq((("a", "b"), 10L), (("c", "d"), 7L)), 8L, 10, 1L)
      == Seq(("a", "b")))
    // a candidate naming the just-created SYMBOL string — merging could
    // create new occurrences of it → stop
    assert(planBatch(Seq((("a", "b"), 10L), (("ab", "c"), 9L)), 0L, 10, 1L)
      == Seq(("a", "b")))
    // remaining-merge limit and the minPairCount floor
    assert(planBatch(Seq((("a", "b"), 10L), (("c", "d"), 9L)), 0L, 1, 1L)
      == Seq(("a", "b")))
    assert(planBatch(Seq((("a", "b"), 1L)), 0L, 10, 2L) == Seq.empty)
  }

  test("batched fit: fewer counting passes than merges, merge-list identical at any window") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, rounds) = BpeTrainer.fitWithStats(docs, "text", numMerges = 20)
    // batchWindow=1 degenerates to the serial one-merge-per-pass trainer
    val serial = BpeTrainer.fit(docs, "text", numMerges = 20, batchWindow = 1)
    assert(merges == serial, "batched greedy must equal the serial merge order")
    assert(merges.length == 20)
    assert(rounds < 20, s"batching must beat one counting pass per merge: $rounds")
  }

  test("ensemble save/load round-trips the tokenizer with its merge list") {
    import graft.core.{Ensemble, EnsemblePersistence}
    val df = Seq((1L, "aaab aab"), (2L, "ab aaab")).toDF("doc_id", "text")
    val op = BpeTokenize(Seq(("a", "a"), ("b", "</w>"), ("a", "b</w>")), "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_roundtrip").toString
    EnsemblePersistence.save(Ensemble(Seq(op), df.schema), dir, spark)
    val loaded = EnsemblePersistence.load(dir, spark)
    assert(loaded.transform(df).orderBy("doc_id").collect().toSeq ==
      op.transform(df).orderBy("doc_id").collect().toSeq)
  }

  test("fail fast: empty merge list, output collision, bad fit params") {
    val df = Seq((1, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] { BpeTokenize(Seq.empty, "text") }
    intercept[IllegalArgumentException] {
      BpeTokenize(Seq(("a", "b")), "text", outputCol = "text").transform(df) }
    intercept[IllegalArgumentException] {
      BpeTrainer.fit(df, "text", numMerges = 0) }
  }
}
