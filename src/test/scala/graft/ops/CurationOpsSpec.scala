package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("BoilerplateReport surfaces cross-document shared grams, bounded by topK") {
    val docs = Seq(
      (1L, "x y z x y z tail"),          // "x y z" twice in one doc
      (2L, "prefix x y z suffix words"), // "x y z" again -> 2 docs, 3 occ
      (3L, "entirely unrelated content here")) // shares nothing
      .toDF("doc_id", "text")
    val out = BoilerplateReport(n = 3, minDocs = 2, topK = 10)
      .transform(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("x y z", 2L, 3L)),
      s"only the cross-document gram survives minDocs: $out")
    // topK bounds the report deterministically
    val many = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val top1 = BoilerplateReport(n = 3, minDocs = 2, topK = 1)
      .transform(many).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "a b c",
      "ties break on gram text ascending")
  }

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

  test("BloomDecontaminate labels are bit-identical to the exact op") {
    // the real testdata corpus: src0 plays the eval set, every doc gets
    // labeled — the prefilter may pass extra suspects (false positives)
    // but the verify stage must ground every final label exactly
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val eval = docs.filter(col("source") === "src0")
    val exact = Decontaminate(eval, n = 5).transform(docs)
      .orderBy("doc_id").collect().toSeq
    val bloom = BloomDecontaminate(eval, n = 5).transform(docs)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact, "sketch may move work, never change labels")
    assert(exact.exists(_.getBoolean(3)), "fixture must exercise the contaminated path")
    assert(exact.exists(r => !r.getBoolean(3)), "and the clean path")
  }

  test("BloomDecontaminate fails fast past the sketch budget, naming the fallback") {
    val train = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BloomDecontaminate(eval, n = 4, sketchBudgetBytes = 1L).transform(train).count()
    }
    assert(e.getMessage.contains("Decontaminate"), e.getMessage)
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

  test("ScrubSharedGrams removes exactly the tokens inside cross-document shared n-grams") {
    val df = Seq(
      (1L, "aa bb cc dd tail1 one"),        // shares 4-gram "aa bb cc dd" with doc 2
      (2L, "head2 aa bb cc dd tail2"),
      (3L, "totally unrelated words here today"),
      (4L, "aa bb cc"),                      // sub-n: no grams, untouched
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = ScrubSharedGrams(n = 4, minDocs = 2).transform(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out(0) == ((1L, 6, 4, "tail1 one")), s"doc1 loses the shared span: ${out(0)}")
    assert(out(1) == ((2L, 6, 4, "head2 tail2")), s"doc2 keeps its unique flanks: ${out(1)}")
    assert(out(2) == ((3L, 5, 0, "totally unrelated words here today")), "unique doc untouched")
    assert(out(3) == ((4L, 3, 0, "aa bb cc")), "sub-n doc has no grams to share")
    assert(out(4) == ((5L, 0, 0, null)), "null text stays null with zero counts")
    // overlapping shared grams cover their union, not double-remove:
    // docs share "a b c d" AND "b c d e" → tokens a..e all go, once
    val ov = Seq((1L, "a b c d e x"), (2L, "a b c d e y")).toDF("doc_id", "text")
    val o = ScrubSharedGrams(n = 4, minDocs = 2).transform(ov).orderBy("doc_id")
      .collect().map(r => (r.getInt(2), r.getString(3)))
    assert(o.toSeq == Seq((5, "x"), (5, "y")), s"span union removed: ${o.toSeq}")
    // minDocs guards the trivial self-match
    assertThrows[IllegalArgumentException] { ScrubSharedGrams(minDocs = 1) }
  }

  test("TopFractionByGroup exact mode keeps the top fraction per stratum, id-tiebroken") {
    // src a: scores 9,8,7,7,6 — 40% of 5 = top 2 (ids 1,2); the 7-tie
    // (ids 3 < 4) must cut on id order, not partition luck
    val df = Seq(
      (1L, "a", 9.0), (2L, "a", 8.0), (3L, "a", 7.0), (4L, "a", 7.0), (5L, "a", 6.0),
      (6L, "b", 1.0), (7L, "b", 2.0),
      (8L, "c", 5.0), (9L, "c", 4.0)).toDF("doc_id", "source", "score")
    val op = TopFractionByGroup("source", "score", "doc_id",
      Map("a" -> 4000, "b" -> 0), defaultBp = 5000)
    val out = op.transform(df).collect()
      .map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(out == Map(1L -> 1, 2L -> 2, 8L -> 1), s"got $out")
    // 60% of the tie group: rank 3 passes (3*10000 <= 6000*5), rank 4 not —
    // the id tiebreak decides WHICH of the tied docs survives
    val out60 = TopFractionByGroup("source", "score", "doc_id",
      Map("a" -> 6000), defaultBp = 0).transform(df)
      .select("doc_id").as[Long].collect().toSet
    assert(out60 == Set(1L, 2L, 3L), s"tied doc 3 (lower id) survives, 4 does not: $out60")
    // rank-column collision fails at schema time
    assertThrows[IllegalArgumentException] {
      op.transformSchema(df.withColumn("quality_rank", lit(0)).schema)
    }
  }

  test("TopFractionByGroup approx mode lands near the budget with no sort and no rank") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "lang", "n_chars")
    val op = TopFractionByGroup("lang", "n_chars", "doc_id",
      Map("en" -> 4000), defaultBp = 7000, approx = true)
    assert(op.transformSchema(docs.schema) == docs.schema, "approx emits no rank column")
    val kept = op.transform(docs)
    val rates = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = rates("en").toDouble / totals("en")
    assert(math.abs(enRate - 0.4) < 0.1, s"en keep-rate ~40%: $enRate")
    totals.keys.filterNot(_ == "en").foreach { l =>
      val r = rates.getOrElse(l, 0L).toDouble / totals(l)
      assert(math.abs(r - 0.7) < 0.15, s"$l keep-rate ~70%: $r")
    }
    // every survivor outscores every dropped row of its stratum (threshold
    // semantics) — the property that makes approx a faithful scale path
    val minKept = kept.groupBy("lang").agg(min("n_chars").as("mn"))
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val violations = dropped.join(minKept, "lang")
      .filter(col("n_chars") > col("mn")).count()
    assert(violations == 0, "no dropped row outscores a kept row in its stratum")
    // frac=0 keeps nothing even though the stratum max would pass >= max
    val none = TopFractionByGroup("lang", "n_chars", "doc_id",
      Map.empty, defaultBp = 0, approx = true).transform(docs)
    assert(none.count() == 0)
    // an all-NULL-score stratum must NOT bypass its budget (a NULL sketch
    // is not the keep-all sentinel); only fracBp=10000 keeps NULL scores
    val nullScores = Seq(
      (1L, "broken", None), (2L, "broken", None),
      (3L, "ok", Some(5.0)), (4L, "ok", Some(1.0)))
      .toDF("doc_id", "source", "score")
    val got = TopFractionByGroup("source", "score", "doc_id",
      Map("broken" -> 2000, "ok" -> 5000), approx = true)
      .transform(nullScores).select("doc_id").as[Long].collect().toSet
    // the budgeted-but-unscoreable stratum keeps NOTHING; the scored
    // stratum keeps a top-suffix (sketch granularity may round the
    // 2-element stratum's threshold down, so doc 4 may legally survive)
    assert(!got.contains(1L) && !got.contains(2L),
      s"broken stratum must not bypass its budget: $got")
    assert(got.contains(3L), s"top of the scored stratum always survives: $got")
    val keepAll = TopFractionByGroup("source", "score", "doc_id",
      Map.empty, defaultBp = 10000, approx = true)
      .transform(nullScores).count()
    assert(keepAll == 4, "10000 bp keeps everything, NULL scores included")
  }

  test("SemanticDecontaminate exact: flags corpus vectors near any eval vector") {
    val eval = Seq(
      (100L, Seq(1.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9f, 0.1f)),   // cos to (1,0) = .9/|v| ~ 0.993 -> hit
      (2L, Seq(-1.0f, 0.0f)),  // cos -1 and 0 -> clean, max 0.0
      (3L, Seq(1.0f, 1.0f)),   // cos ~0.707 to BOTH -> two hits
      (4L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding") // zero norm -> cos 0
    val out = SemanticDecontaminate(eval, threshold = 0.7).transform(corpus)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out(0)._2 == 1L && out(0)._4, s"v1 hits one eval vector: ${out(0)}")
    assert(out(1)._2 == 0L && !out(1)._4 && out(1)._3 == 0.0,
      s"v2 is clean with max clamped at 0: ${out(1)}")
    assert(out(2)._2 == 2L && out(2)._4, s"v3 hits both eval vectors: ${out(2)}")
    assert(out(3)._2 == 0L && !out(3)._4 && out(3)._3 == 0.0,
      s"zero-norm scores cosine 0 everywhere: ${out(3)}")
  }

  test("SemanticDecontaminate with an empty eval set marks everything clean") {
    val eval = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = SemanticDecontaminate(eval, threshold = 0.5).transform(corpus).collect()
    assert(out.length == 1 && out(0).getLong(1) == 0L && !out(0).getBoolean(3))
    assert(out(0).isNullAt(2), "nothing scanned -> max_cosine is null")
  }

  test("SemanticDecontaminate probed hits are a verified subset of the exact scan") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val eval = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val exact = SemanticDecontaminate(eval, threshold = 0.40).transform(corpus)
      .filter(col("contaminated")).select("vec_id").collect().map(_.getLong(0)).toSet
    val probed = SemanticDecontaminate
      .fit(eval, threshold = 0.40, nlist = 8, nprobe = 2, maxIter = 5)
      .transform(corpus)
      .filter(col("contaminated")).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probed.subsetOf(exact), "every probe hit must be exactly verified")
    assert(exact.nonEmpty, "the fixture threshold should produce contamination")
  }

  test("SnapshotDiff classifies added/removed/changed/unchanged and null texts") {
    val old = Seq(
      (1L, "same content"),
      (2L, "old version"),
      (3L, "will be dropped"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nw = Seq(
      (1L, "same content"),
      (2L, "new version"),
      (4L, "fresh doc"),
      (5L, null.asInstanceOf[String]),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = SnapshotDiff(old).transform(nw).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "added"),
      s"status map was $out")
  }

  test("SnapshotDiff normalized mode treats case/whitespace variants as unchanged") {
    val old = Seq((1L, "Hello   World")).toDF("doc_id", "text")
    val nw = Seq((1L, "hello world")).toDF("doc_id", "text")
    assert(SnapshotDiff(old, normalized = true).transform(nw)
      .collect().head.getString(3) == "unchanged")
    assert(SnapshotDiff(old).transform(nw)
      .collect().head.getString(3) == "changed")
  }

  test("FuzzyDecontaminate exact: Jaccard-threshold hits against the eval set") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"),
      (101L, "completely unrelated benchmark question text here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog yesterday"), // near-dup of 100
      (2L, "nothing in common with anything at all whatsoever"),
      (3L, "too short")).toDF("doc_id", "text") // < 3 tokens -> no shingles
    val out = FuzzyDecontaminate(eval, n = 3, thresholdBp = 5000).transform(corpus)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(out(0) == ((1L, 1L, true)), s"doc1 is a near-dup of eval 100: ${out(0)}")
    assert(out(1) == ((2L, 0L, false)), s"doc2 is clean: ${out(1)}")
    assert(out(2) == ((3L, 0L, false)), s"sub-n docs scan nothing: ${out(2)}")
    val short = FuzzyDecontaminate(eval, n = 3, thresholdBp = 5000).transform(corpus)
      .orderBy("doc_id").collect()(2)
    assert(short.isNullAt(2), "no shingles -> null max_jaccard_bp")
  }

  test("FuzzyDecontaminate banded hits are a verified subset of the exact scan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val eval = docs.filter(col("source") === "src0")
    val corpus = docs.filter(col("source") =!= "src0")
    def hits(banded: Boolean) =
      FuzzyDecontaminate(eval, n = 3, thresholdBp = 5000, banded = banded)
        .transform(corpus).filter(col("contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = hits(banded = false)
    val banded = hits(banded = true)
    assert(banded.subsetOf(exact), "precision 1.0: every banded hit is exactly verified")
  }

  test("FuzzyDecontaminate dedups identical eval texts before counting hits") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "alpha  BETA gamma delta epsilon")).toDF("doc_id", "text") // same normal form
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = FuzzyDecontaminate(eval, n = 3, thresholdBp = 8000)
      .transform(corpus).collect().head
    assert(out.getLong(1) == 1L, "normalized-identical eval rows count once")
    assert(out.getLong(2) == 10000L, "exact match scores 10000 bp")
  }

  test("Purge drops tombstoned docs and retires exactly their digests") {
    val corpus = Seq(
      (1L, "keep me around"),
      (2L, "take me down"),
      (3L, "also staying here"),
      (4L, "second takedown text")).toDF("doc_id", "text")
    val tomb = Seq(2L, 4L, 99L).toDF("doc_id") // 99 is a no-op tombstone
    val op = Purge(tomb)
    val kept = op.transform(corpus).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"kept set was $kept")
    val index = ExactDedup(normalized = true).transform(corpus).select("content_hash")
    val updated = op.updatedIndex(index, corpus).collect().map(_.getString(0)).toSet
    val keepDigests = ExactDedup(normalized = true)
      .transform(corpus.filter(col("doc_id").isin(1L, 3L)))
      .select("content_hash").collect().map(_.getString(0)).toSet
    assert(updated == keepDigests, "index must retain exactly the kept contents")
  }

  test("Purge with an empty tombstone list is the identity") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val tomb = Seq.empty[Long].toDF("doc_id")
    assert(Purge(tomb).transform(corpus).count() == 2)
  }

  test("Purge.updatedIndex keeps a digest still carried by a kept row") {
    // duplicate content under two ids — the corpus was NOT ingested
    // one-carrier-per-digest; purging one copy must not retire the
    // digest the surviving copy still carries
    val corpus = Seq(
      (1L, "shared content"),
      (2L, "shared  CONTENT"), // same normal form as 1
      (3L, "unique takedown")).toDF("doc_id", "text")
    val index = corpus.select(
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
        .as("content_hash")).distinct()
    val op = Purge(Seq(2L, 3L).toDF("doc_id"))
    val updated = op.updatedIndex(index, corpus)
      .collect().map(_.getString(0)).toSet
    val sharedDigest = index.orderBy("content_hash").collect().map(_.getString(0)).toSet
    assert(updated.size == 1, s"only doc 3's digest retires: $updated")
    val keptDigest = corpus.filter(col("doc_id") === 1L)
      .select(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .collect().head.getString(0)
    assert(updated == Set(keptDigest),
      s"the shared digest survives (kept carrier doc 1): $updated vs $sharedDigest")
  }

  test("Purge.updatedSignatureIndex stops a purged doc from band-colliding") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((1L, base), (2L, "completely different words about other things entirely here"))
      .toDF("doc_id", "text")
    val sigIndex = IncrementalMinHashDedup.signatures(corpus)
    // a light edit of doc 1 — near-dup by MinHash estimate
    val reingest = Seq((10L, base + " tonight")).toDF("doc_id", "text")
    val before = IncrementalMinHashDedup(sigIndex, thresholdBp = 7000)
      .transform(reingest).select("dup_kind", "matched_id").collect().head
    assert(before.getString(0) == "near_index" && before.getLong(1) == 1L,
      s"pre-purge the edit collides with doc 1: $before")
    val purged = Purge(Seq(1L).toDF("doc_id")).updatedSignatureIndex(sigIndex)
    assert(purged.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
    val after = IncrementalMinHashDedup(purged, thresholdBp = 7000)
      .transform(reingest).select("dup_kind").collect().head
    assert(after.isNullAt(0),
      "post-purge the stale signature is gone: the re-ingest is a keeper")
  }

  test("SignalReconcile: carried served verbatim, fresh recomputed, retired dropped") {
    val sig = QualitySignals(keyCols = Seq("doc_id", "content_hash"))
    def corpusOf(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("content_hash", md5(col("text")))
    // prior state: signals over the v0 corpus, then POISONED — if the
    // reconcile ever re-scores a carried row, the poison disappears and
    // this spec fails: carried rows must be SERVED, never recomputed.
    val v0 = corpusOf(
      (1L, "alpha beta gamma delta"),
      (2L, "to be purged soon enough"),
      (3L, "left alone and carried forward"))
    val prior = sig.transform(v0)
      .withColumn("quality_score", col("quality_score") + 1000000L)
    // live corpus: doc 2 purged, doc 4 freshly ingested, 1/3 unchanged
    val live = corpusOf(
      (1L, "alpha beta gamma delta"),
      (3L, "left alone and carried forward"),
      (4L, "a brand new arrival document"))
    val out = SignalReconcile(prior, sig).transform(live)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L),
      "retired keys must not survive; fresh keys must appear")
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("quality_score"), r.getAs[Boolean]("carried"))).toMap
    assert(byId(1L)._2 && byId(3L)._2 && !byId(4L)._2, s"carried flags: $byId")
    assert(byId(1L)._1 > 1000000L && byId(3L)._1 > 1000000L,
      "carried rows keep the prior values untouched (no recompute)")
    val flat = sig.transform(live.filter(col("doc_id") === 4L)).collect().head
    assert(byId(4L)._1 == flat.getAs[Long]("quality_score"),
      "fresh rows equal a flat recompute")
  }

  test("SignalReconcile keys on content: an edited doc under the same id recomputes") {
    val sig = QualitySignals(keyCols = Seq("doc_id", "content_hash"))
    def corpusOf(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("content_hash", md5(col("text")))
    val prior = sig.transform(corpusOf((1L, "the original text body here")))
      .withColumn("quality_score", col("quality_score") + 1000000L)
    val live = corpusOf((1L, "the edited replacement text body"))
    val out = SignalReconcile(prior, sig).transform(live).collect()
    assert(out.length == 1 && !out.head.getAs[Boolean]("carried"),
      "same id, new hash: the old signal retires and the row re-scores")
    assert(out.head.getAs[Long]("quality_score") < 1000000L,
      "the recomputed score is the live text's, not the poisoned prior")
  }

  test("SignalReconcile carries DENSE embedding-derived state: re-encoded vectors " +
      "recompute, unchanged assignments are served poisoned-verbatim") {
    val sig = graft.ops.ClusterAssign(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)), idCol = "vec_id")
    def catalogOf(rows: (Long, Seq[Float])*) =
      rows.toSeq.toDF("vec_id", "embedding").withColumn("content_hash",
        md5(concat_ws(",", transform(col("embedding"), x => x.cast("string")))))
    val v0 = catalogOf(
      (1L, Seq(0.5f, 0.5f)), (2L, Seq(9.0f, 9.0f)), (3L, Seq(1.0f, 0.0f)))
    // poison the prior assignments: a reconcile that re-scores a carried
    // vector would wash the poison out
    val prior = sig.transform(v0).withColumn("d2", col("d2") + 1e9)
    // vec 2 purged; vec 3 RE-ENCODED near the far centroid; vec 4 new
    val live = catalogOf(
      (1L, Seq(0.5f, 0.5f)), (3L, Seq(9.5f, 9.5f)), (4L, Seq(10.0f, 9.0f)))
    val out = SignalReconcile(prior, sig, idCol = "vec_id").transform(live)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Int]("cluster_id"), r.getAs[Double]("d2"),
        r.getAs[Boolean]("carried"))).toMap
    assert(byId(1L)._3 && byId(1L)._2 > 1e8,
      "unchanged vector: assignment served verbatim from the prior")
    assert(!byId(3L)._3 && byId(3L)._1 == 1 && byId(3L)._2 < 1e8,
      "re-encoded vector: new hash, fresh nearest-centroid recompute")
    assert(!byId(4L)._3 && byId(4L)._1 == 1, "new vector scores fresh")
  }

  test("SignalReconcile transformSchema rejects mismatched prior / key-dropping signal") {
    val sig = QualitySignals(keyCols = Seq("doc_id", "content_hash"))
    val in = sig.transformSchema(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content_hash", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val goodPrior = Seq.empty[(Long, String, Long, Long, Long, Long, Boolean)]
      .toDF("doc_id", "content_hash", "n_tokens", "ttr_bp", "mwl_bp",
        "quality_score", "keep")
    // a signal op that drops the hash key cannot reconcile
    val dropsKey = QualitySignals(keyCols = Seq("doc_id"))
    assertThrows[IllegalArgumentException] {
      SignalReconcile(goodPrior, dropsKey).transformSchema(
        org.apache.spark.sql.types.StructType(in.filterNot(_.name == "carried")))
    }
    // a prior whose columns disagree with the signal output cannot either
    val badPrior = Seq.empty[(Long, String)].toDF("doc_id", "content_hash")
    assertThrows[IllegalArgumentException] {
      SignalReconcile(badPrior, sig).transformSchema(
        org.apache.spark.sql.types.StructType(in.filterNot(_.name == "carried")))
    }
  }

  test("SignalReconcile.publishAgainst maintains the signal table as versioned state") {
    val sig = QualitySignals(keyCols = Seq("doc_id", "content_hash"))
    def corpusOf(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("content_hash", md5(col("text")))
    val dir = java.nio.file.Files
      .createTempDirectory("signal_state_spec").toString
    val c1 = corpusOf((1L, "first corpus text one"), (2L, "first corpus text two"))
    val v1 = SignalReconcile.publishAgainst(c1, dir, sig)
    val t1 = graft.core.VersionedDir.readLatest(spark, dir).get.collect()
    assert(t1.length == 2 && t1.forall(!_.getAs[Boolean]("carried")),
      "first publish scores everything fresh")
    // corpus evolves: doc 2 removed, doc 3 added, doc 1 untouched
    val c2 = corpusOf((1L, "first corpus text one"), (3L, "a new third document"))
    SignalReconcile.publishAgainst(c2, dir, sig)
    val t2 = graft.core.VersionedDir.readLatest(spark, dir).get
      .orderBy("doc_id").collect()
    assert(t2.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      "retired doc 2 left the table; fresh doc 3 joined")
    assert(t2.map(_.getAs[Boolean]("carried")).toSeq == Seq(true, false),
      "lineage: doc 1 carried, doc 3 recomputed")
    // the published version equals a flat recompute (minus the audit flag)
    val flat = sig.transform(c2).orderBy("doc_id").collect()
    assert(t2.map(_.getAs[Long]("quality_score")).toSeq ==
      flat.map(_.getAs[Long]("quality_score")).toSeq)
    // time travel: version 1 is still readable as published
    val back = graft.core.VersionedDir.readAt(spark, dir, v1).get
    assert(back.count() == 2L, "signal history survives the pointer swap")
  }
}
