package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (3L, "  The   quick brown FOX jumps over the lazy dog"), // norm-dup of 0
    (4L, "completely different content about spark engines and data"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("ExactDedup groups identical texts, keeps min id") {
    val out = ExactDedup().transform(docs).orderBy("keep_id").collect()
    assert(out.length == 5) // 0==2; 3 differs raw
    val g = out.find(_.getAs[Long]("keep_id") == 0L).get
    assert(g.getAs[Long]("n_copies") == 2)
  }

  test("ExactDedup normalized also folds case/whitespace variants") {
    val out = ExactDedup(normalized = true).transform(docs).collect()
    assert(out.length == 4) // 0==2==3
    val g = out.find(_.getAs[Long]("keep_id") == 0L).get
    assert(g.getAs[Long]("n_copies") == 3)
  }

  test("NgramJaccard finds near-dup pairs above threshold only") {
    val pairs = NgramJaccardDedup(thresholdBp = 6000).transform(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "near-dup pair detected")
    assert(pairs.contains((0L, 2L)) && pairs.contains((0L, 3L)), "exact dups trivially pass")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc not paired")
  }

  test("MinHashDedup recall matches exact jaccard on driver documents") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = NgramJaccardDedup(thresholdBp = 8000).transform(d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = MinHashDedup(thresholdBp = 8000).transform(d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(exact), "verification step guarantees precision 1.0")
    // 16 bands × 4 rows: P(surface) ≈ 0.9998 at j = 0.8 — recall must be
    // ≥ 0.99 at the advertised operating point, not just 0.9
    assert(mh.size >= math.ceil(exact.size * 0.99).toInt,
      s"recall ${mh.size}/${exact.size} >= 0.99")
  }

  test("SimHash: identical docs collide; near-dups closer than unrelated") {
    val h = docs.select($"doc_id", T.simhash64(T.shingleSet($"text", 3)).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(2L) && h(0L) == h(3L), "exact/normalized dups → same simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(1L)) < ham(h(0L), h(4L)), "near-dup closer than unrelated")
    // the banded op surfaces the exact-dup pairs at radius 0
    val pairs = SimHashDedup(maxHamming = 3).transform(docs)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 2L)) == 0 && m((0L, 3L)) == 0 && m((2L, 3L)) == 0)
  }

  // Completeness guarantee: with planted exact bit flips, every pair
  // within the radius MUST surface (pigeonhole over the adaptive bands) —
  // and pairs beyond the radius must be excluded.
  test("SimHashDedup banding is complete for the requested hamming radius") {
    val h0 = 0x0123456789ABCDEFL
    // hamming-3 pair: flips in 3 different 16-bit bands (4×16 must find it)
    val h3 = h0 ^ (1L << 0) ^ (1L << 16) ^ (1L << 32)
    // hamming-5 pair: one flip in EVERY 16-bit band (4×16 would miss it;
    // 8×8 banding at maxHamming=5 must find it — bands 1,3,5 stay clean)
    val h5 = h0 ^ (1L << 0) ^ (1L << 16) ^ (1L << 32) ^ (1L << 48) ^ (1L << 63)
    val df = Seq((0L, h0), (3L, h3), (5L, h5)).toDF("doc_id", "h")
      .withColumn("text", lit("")) // unused when hashCol is set

    val r3 = SimHashDedup(maxHamming = 3, hashCol = Some("h")).transform(df)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(r3.contains((0L, 3L, 3)), "hamming-3 pair found at radius 3")
    assert(!r3.exists(p => p._1 == 0L && p._2 == 5L), "hamming-5 excluded at radius 3")

    val r5 = SimHashDedup(maxHamming = 5, hashCol = Some("h")).transform(df)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(r5.contains((0L, 5L, 5)), "hamming-5 pair found at radius 5 (8×8 bands)")
    assert(r5.contains((0L, 3L, 3)))

    assertThrows[IllegalArgumentException](SimHashDedup(maxHamming = 16))
  }

  test("DupClusters: transitive closure labels components by min id, keeps singletons") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique {10,11}, singletons 20, 21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val out = DupClusters(allDocs = Some(docs)).transform(pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (20L, 20L, true), (21L, 21L, true)))
    // without allDocs only paired nodes appear
    val noSingles = DupClusters().transform(pairs)
    assert(noSingles.count() == 6)
  }

  test("DupClusters: pointer doubling converges a 60-node chain within 8 rounds") {
    import spark.implicits._
    // diameter 59: plain min-propagation needs 59 rounds; label(label)
    // compression needs ~log2(59). 8 rounds only suffice with doubling.
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // edgeBudget = 0 forces the distributed propagation path
    val out = DupClusters(maxIters = 8, edgeBudget = 0L).transform(pairs).collect()
    assert(out.length == 60)
    assert(out.forall(_.getLong(1) == 1L), "whole chain must collapse to label 1")
    assert(out.count(_.getBoolean(2)) == 1, "exactly one keeper")
  }

  test("DupClusters driver union-find path equals the distributed propagation") {
    import spark.implicits._
    // messy graph: chains, a clique, self-pairs, duplicate + reversed edges
    val rnd = new scala.util.Random(13)
    val pairs = ((1L until 60L).map(i => (i, i + 1)) ++
      Seq((100L, 103L), (103L, 100L), (101L, 103L), (102L, 101L), (200L, 200L)) ++
      Seq.tabulate(80)(_ => { val a = 300L + rnd.nextInt(40); (a, 300L + rnd.nextInt(40)) }))
      .toDF("doc_a", "doc_b")
    def run(budget: Long) =
      DupClusters(edgeBudget = budget).transform(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(run(Long.MaxValue) == run(0L),
      "both paths must assign identical min-label clusters and keepers")
  }

  test("DupClusters rejects non-orderable and mismatched id dtypes up front") {
    import spark.implicits._
    // array ids would ClassCastException deep inside the DRIVER path only
    // (the distributed path would happily order them) — both paths must
    // instead fail schema-time with the op named
    val arrayIds = Seq((Seq(1L), Seq(2L))).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      DupClusters().transform(arrayIds)
    }
    assert(e.getMessage.contains("orderable atomic"), e.getMessage)
    val mixed = Seq((1L, "x")).toDF("doc_a", "doc_b")
    assertThrows[IllegalArgumentException] { DupClusters().transform(mixed) }
  }

  test("CosineNearDup finds only pairs above threshold") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.999f, 0.04f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = CosineNearDup(threshold = 0.95, exact = true).transform(vecs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L)))
  }

  test("SemanticNearDup: single cluster equals exact; clustered path is precise with bounded recall loss") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = CosineNearDup(threshold = 0.45, exact = true).transform(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // nlist = 1 → every pair shares the cluster → identical to brute force
    val full = SemanticNearDup.fit(emb, nlist = 1, maxIter = 1).transform(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full == exact, s"single-cluster must equal the exact scan")
    // the real SemDeDup shape: everything emitted is a true pair
    // (precision 1.0); cross-cluster pairs are the documented recall loss
    val clustered = SemanticNearDup.fit(emb, nlist = 8, maxIter = 5).transform(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clustered.subsetOf(exact), "no false pairs: exact verification")
    assert(exact.isEmpty || clustered.size * 10 >= exact.size * 4,
      s"recall ≥ 0.4 vs exact: ${clustered.size}/${exact.size}")
  }

  test("bucketed CosineNearDup: precision 1.0, high recall vs exact path") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = CosineNearDup(threshold = 0.45, exact = true).transform(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every true pair here sits AT the 0.45 boundary (cos 0.45-0.48, so
    // p = 1-θ/π ≈ 0.65 per plane) — 2 bits × 16 tables keeps the per-pair
    // miss probability ≈ (1-p²)^16 ≈ 1e-4 even for boundary pairs
    val lsh = CosineNearDup(threshold = 0.45, numBits = 2, numTables = 16)
      .transform(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "exact verification guarantees precision 1.0")
    assert(exact.nonEmpty && lsh.size >= math.ceil(exact.size * 0.8).toInt,
      s"bucketed recall ${lsh.size}/${exact.size} too low")
  }

  test("langId picks the dominant stopword language, und when none") {
    val df = Seq(
      (1, "the cat and the dog of a house"),
      (2, "der hund und die katze ist von hier"),
      (3, "le chat et la maison est une merveille"),
      (4, "xyzzy plugh foobar")
    ).toDF("id", "text")
    val got = df.select($"id", T.langId($"text").as("l")).as[(Int, String)].collect().toMap
    assert(got(1) == "en" && got(2) == "de" && got(3) == "fr" && got(4) == "und")
  }

  test("rollingHash is order-sensitive, whitespace-insensitive") {
    val df = Seq(
      (1, "alpha beta gamma"), (2, "  alpha   beta gamma "), (3, "gamma beta alpha")
    ).toDF("id", "text")
    val h = df.select($"id", T.rollingHash($"text").as("h")).as[(Int, Long)].collect().toMap
    assert(h(1) == h(2))
    assert(h(1) != h(3))
  }

  test("IncrementalDedup labels index dups, batch dups, and keepers") {
    // accepted corpus: docs 0 and 4 (their normalized digests)
    val prior = ExactDedup(normalized = true)
      .transform(docs.filter($"doc_id".isin(0L, 4L))).select("content_hash")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // = doc 0 → index
      (11L, "  The   quick brown FOX jumps over the lazy dog"), // norm = doc 0 → index
      (12L, "brand new content never accepted before"),       // keeper
      (13L, "brand new content never accepted before"),       // dup of 12 → batch
      (14L, "another fresh document")                          // keeper
    ).toDF("doc_id", "text")
    val out = IncrementalDedup(prior).transform(batch)
      .select($"doc_id", $"dup_kind").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      10L -> Some("index"), 11L -> Some("index"),
      12L -> None, 13L -> Some("batch"), 14L -> None))
  }

  test("IncrementalDedup: index dup beats batch dup; null text passes as keeper") {
    val prior = ExactDedup(normalized = true)
      .transform(Seq((0L, "known content")).toDF("doc_id", "text"))
      .select("content_hash")
    val batch = Seq(
      (20L, "known content"),   // index (not keeper-of-batch)
      (21L, "known content"),   // index (not 'batch' — index wins)
      (22L, null.asInstanceOf[String]),
      (23L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = IncrementalDedup(prior).transform(batch)
      .select($"doc_id", $"dup_kind").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      20L -> Some("index"), 21L -> Some("index"), 22L -> None, 23L -> None))
  }

  test("IncrementalDedup.updatedIndex carries prior plus newly-accepted digests") {
    val prior = ExactDedup(normalized = true)
      .transform(Seq((0L, "known content")).toDF("doc_id", "text"))
      .select("content_hash")
    val batch = Seq(
      (30L, "known content"),       // already accepted — no new digest
      (31L, "fresh a"), (32L, "fresh a"), // one new digest
      (33L, "fresh b"),
      (34L, null.asInstanceOf[String])    // null digest never enters the index
    ).toDF("doc_id", "text")
    val op = IncrementalDedup(prior)
    val idx = op.updatedIndex(batch).as[String].collect().toSet
    assert(idx.size == 3, s"known + fresh a + fresh b, got $idx")
    assert(prior.as[String].collect().toSet.subsetOf(idx))
    // idempotent: re-ingesting the same batch against the new index adds nothing
    val op2 = IncrementalDedup(op.updatedIndex(batch))
    assert(op2.updatedIndex(batch).count() == 3)
  }

  test("IncrementalMinHashDedup labels near-index, near-batch, and keepers") {
    // long base text so one changed word keeps shingle Jaccard ≈ 0.85 —
    // comfortably above the 0.7 test threshold even with k=64 estimator
    // noise, and band-catch probability ≈ 1 − (1−0.85⁴)¹⁶ ≈ 1 − 8e-6
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val accepted = Seq(
      (0L, base),
      (1L, "completely unrelated accepted content about engines")
    ).toDF("doc_id", "text")
    val idx = IncrementalMinHashDedup.signatures(accepted)
    val batch = Seq(
      // near-dup of accepted 0 (one word changed at the end)
      (10L, base.replace("w40", "changed")),
      (11L, "a genuinely new document with its own fresh content entirely"),
      // exact clone of 11 within the batch
      (12L, "a genuinely new document with its own fresh content entirely"),
      (13L, "short"), // < n tokens: no shingle identity → keeper
      (14L, "another novel document that matches nothing else at all")
    ).toDF("doc_id", "text")
    val out = IncrementalMinHashDedup(idx, thresholdBp = 7000).transform(batch)
      .select($"doc_id", $"dup_kind", $"matched_id")
      .as[(Long, Option[String], Option[Long])].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(out(10L) == (Some("near_index"), Some(0L)))
    assert(out(11L) == (None, None))
    assert(out(12L) == (Some("near_batch"), Some(11L)))
    assert(out(13L) == (None, None))
    assert(out(14L) == (None, None))
  }

  test("IncrementalMinHashDedup.updatedIndex chains: re-ingest adds nothing") {
    val accepted = Seq((0L, "the quick brown fox jumps over the lazy dog and keeps running"))
      .toDF("doc_id", "text")
    val idx = IncrementalMinHashDedup.signatures(accepted)
    val batch = Seq(
      (10L, "a genuinely new document with its own fresh content entirely"),
      (11L, "a genuinely new document with its own fresh content entirely"))
      .toDF("doc_id", "text")
    val op = IncrementalMinHashDedup(idx)
    val after = op.updatedIndex(batch)
    assert(after.select("doc_id").as[Long].collect().toSet == Set(0L, 10L))
    // the whole batch now dups the updated index
    val relabeled = IncrementalMinHashDedup(after).transform(batch)
      .select($"doc_id", $"dup_kind").as[(Long, Option[String])].collect().toMap
    assert(relabeled == Map(10L -> Some("near_index"), 11L -> Some("near_index")))
  }

  test("IncrementalDedup validates schema and rejects column collisions") {
    val prior = Seq("abc").toDF("content_hash")
    intercept[IllegalArgumentException] {
      IncrementalDedup(prior).transformSchema(
        Seq((1L, "t", "x")).toDF("doc_id", "text", "dup_kind").schema)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup(Seq("abc").toDF("wrong_col"))
    }
  }

  test("PrefixDedup groups truncated copies and keeps the longest") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),      // full doc
      (11L, "alpha beta gamma delta"),                   // truncation (same 3-prefix)
      (12L, "alpha beta gamma delta epsilon zeta eta"),  // longer still -> keeper
      (13L, "totally different text"),
      (14L, "a b")).toDF("doc_id", "text")               // shorter than n: keys on itself
    val out = PrefixDedup(n = 3).transform(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.length == 3, s"three prefix groups: ${out.toSeq}")
    assert(out(0) == ((12L, 7L, 3L)), s"longest of the alpha family wins: ${out(0)}")
    assert(out(1) == ((13L, 3L, 1L)))
    assert(out(2) == ((14L, 2L, 1L)))
  }

  test("PrefixDedup ties on token count break to the smallest id") {
    val docs = Seq(
      (5L, "x y z TAIL-A"),
      (2L, "x y z TAIL-B")).toDF("doc_id", "text")
    val out = PrefixDedup(n = 3).transform(docs).collect().head
    assert(out.getLong(1) == 2L && out.getLong(3) == 2L)
  }

  test("PrefixDedup normalizes case and whitespace like the rest of the family") {
    val docs = Seq(
      (1L, "The  QUICK brown fox one two three four five"),
      (2L, "the quick BROWN fox")).toDF("doc_id", "text")
    val out = PrefixDedup(n = 4).transform(docs).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L,
      "normalized 4-prefixes agree; the 9-token copy is kept")
  }

  test("NgramJaccardDedup survives very long documents (long-safe basis-point math)") {
    // ~220k shingles per doc: 32-bit n_sh * 10000 wraps negative and the
    // size-compatibility filter silently dropped the pair pre-fix
    val words = (0 until 220000).map(i => (i % 99991).toString).mkString(" ")
    val docs = Seq((1L, words), (2L, words)).toDF("doc_id", "text")
    val out = NgramJaccardDedup(thresholdBp = 8000).transform(docs).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L && out.head.getLong(1) == 2L,
      s"the identical long-document pair must surface: ${out.toSeq}")
  }

  test("DupClusters distributed path converges correctly for STRING ids") {
    // edgeBudget = 0 forces the distributed label propagation; a chain of
    // diameter 6 needs >2 rounds — the old numeric-cast checksum summed
    // to zero for string ids and declared convergence after round 2
    val chain = Seq(("a","b"), ("b","c"), ("c","d"), ("d","e"), ("e","f"), ("f","g"))
      .toDF("doc_a", "doc_b")
    val out = DupClusters(edgeBudget = 0L).transform(chain)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out.values.toSet.size == 1 && out.values.head == "a",
      s"one component, min-id keeper 'a': $out")
  }

  test("IncrementalMinHashDedup matches against a STRING-id index") {
    val text = (0 until 200).map(i => s"w$i").mkString(" ")
    val index = Seq(("doc-accepted", text)).toDF("doc_id", "text")
    val idx = IncrementalMinHashDedup.signatures(index)
      .select(col("doc_id"), col("minhash_sig"))
    val batch = Seq(("doc-new", text)).toDF("doc_id", "text")
    val out = IncrementalMinHashDedup(idx).transform(batch).collect().head
    assert(out.getAs[String]("dup_kind") == "near_index" &&
      out.getAs[String]("matched_id") == "doc-accepted",
      s"string-id index match must label the re-ingest: $out")
  }
}
