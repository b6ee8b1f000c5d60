package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.core.Ensemble

/** Per-op semantics in the reference's own test style (SURVEY.md §5):
  * small seeded batches, exact counts/schemas/dtype preservation.
  * F-numbers refer to FIXTURES.md.
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  // F1: 100 distinct candidates, 20 overlap with filter list → exactly 80
  // survive (reference tests/unit/systems/dag/test_executors.py:34-62).
  test("FilterCandidates removes exactly the overlapping ids, keeps order") {
    val rng = new scala.util.Random(7)
    val candidates = rng.shuffle((0 until 100000).toList).take(100)
    val seen = rng.shuffle(candidates).take(20)
    val df = Seq((1, candidates, seen)).toDF("requestId", "candidate_ids", "movie_ids")
    val out = FilterCandidates("candidate_ids", "movie_ids").transform(df)
    val filtered = out.select("filtered_ids").as[Seq[Int]].head()
    assert(filtered.size == 80)
    assert(filtered.toSet.intersect(seen.toSet).isEmpty)
    // order preserved relative to input
    assert(filtered == candidates.filterNot(seen.toSet))
    // schema propagation
    val outSchema = FilterCandidates("candidate_ids", "movie_ids").transformSchema(df.schema)
    assert(outSchema.fieldNames.toSeq == Seq("requestId", "filtered_ids"))
  }

  // A NULL filter array (e.g. an unmatched left-join key) means "no filter
  // entry" — all candidates must survive, matching the reference's np.isin
  // with an empty set (session_filter.py:142-162).
  test("FilterCandidates keeps all candidates when the filter array is NULL or empty") {
    val df = Seq(
      (1, Seq(10, 11, 12), Some(Seq(11))),
      (2, Seq(20, 21), None),           // null filter list
      (3, Seq(30, 31), Some(Seq.empty[Int])))
      .toDF("requestId", "candidate_ids", "seen_ids")
    val out = FilterCandidates("candidate_ids", "seen_ids").transform(df)
      .orderBy("requestId").select("filtered_ids").as[Seq[Int]].collect()
    assert(out(0) == Seq(10, 12))
    assert(out(1) == Seq(20, 21), "null filter must keep all candidates")
    assert(out(2) == Seq(30, 31))
  }

  test("FilterCandidates rejects non-array columns") {
    val schema = StructType(Seq(
      StructField("candidate_ids", IntegerType), StructField("movie_ids", IntegerType)))
    assertThrows[IllegalArgumentException] {
      FilterCandidates("candidate_ids", "movie_ids").transformSchema(schema)
    }
  }

  // F2: output dims (None, topk); int64/double dtypes preserved; output ids
  // are a subset of candidates (reference test_ops.py:55-120).
  test("SoftmaxSampling returns topk ids drawn from candidates, dtypes preserved") {
    val ids = (1L to 100L).toArray
    val scores = ids.map(i => i / 100.0)
    val df = Seq((1, ids, scores), (2, ids, scores))
      .toDF("requestId", "movie_ids", "relevance")
    val op = SoftmaxSampling("movie_ids", "relevance", temperature = 20.0, topk = 10)
    val out = op.transform(df)
    assert(out.schema("ordered_ids").dataType.asInstanceOf[ArrayType].elementType == LongType)
    assert(out.schema("ordered_scores").dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    val rows = out.orderBy("requestId")
      .select("ordered_ids", "ordered_scores").as[(Seq[Long], Seq[Double])].collect()
    rows.foreach { case (oids, oscores) =>
      assert(oids.size == 10 && oscores.size == 10)
      assert(oids.toSet.subsetOf(ids.toSet))
      assert(oids.distinct.size == 10, "sampling is without replacement")
    }
    // deterministic for a fixed seed, different across requestIds
    val again = op.transform(df).orderBy("requestId")
      .select("ordered_ids", "ordered_scores").as[(Seq[Long], Seq[Double])].collect()
    assert(rows.toSeq == again.toSeq)
    assert(rows(0)._1 != rows(1)._1, "different requests sample differently")
    // high-temperature sampling should strongly prefer high scores: the very
    // best candidate makes the top-10 with overwhelming probability
    assert(rows(0)._1.contains(100L))
  }

  // F9 padding: values [1,2,3]/offsets[0,1,3] → (2,5) zero-padded
  // (reference tests/unit/systems/ops/padding_op.py:26-41).
  test("IntervalJoin matches points to containing intervals across bucket boundaries") {
    import spark.implicits._
    // interval [95, 210) spans three size-100 buckets; [300, 300) is empty
    val intervals = Seq((1L, 95L, 210L, "w1"), (1L, 300L, 300L, "w2"),
      (2L, 0L, 50L, "w3")).toDF("key", "s", "e", "tag")
    val points = Seq((1L, 95L), (1L, 150L), (1L, 209L), (1L, 210L), (1L, 300L),
      (2L, 49L), (2L, 50L)).toDF("key", "ts")
    val op = IntervalJoin(intervals, "key", "s", "e", "ts", bucketSize = 100L,
      outputPrefix = "iv_")
    val out = op.transform(points).select("key", "ts", "iv_tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 95L, "w1"), (1L, 150L, "w1"), (1L, 209L, "w1"),
      (2L, 49L, "w3")), s"start inclusive, end exclusive, empties skipped: $out")
    // each (point, interval) pair appears exactly once despite multi-bucket spans
    assert(op.transform(points).count() == 4)
    // and the plan is an equi-join, not a nested loop
    val plan = op.transform(points).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("PointInTimeJoin attaches the latest feature at or before each request ts") {
    import spark.implicits._
    val features = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("id", "ts", "v")
    val requests = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 9L))
      .toDF("id", "ts")
    val out = PointInTimeJoin(features, "id", "ts", Seq("v"))
      .transform(requests).orderBy("id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    // matches DuckDB `ASOF LEFT JOIN ... ON f.ts <= r.ts` exactly:
    // before-first → null, equal ts → visible, between versions → latest
    assert(out.toSeq == Seq(
      (1L, 5L, null), (1L, 10L, "a"), (1L, 25L, "b"),
      (2L, 14L, null), (3L, 9L, null)))
  }

  test("PointInTimeJoin matches a brute-force as-of reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val feats = Seq.fill(80)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong))
      .distinct.map { case (id, ts) => (id, ts, s"v${id}_$ts") }
    val reqs = Seq.fill(60)((rnd.nextInt(10).toLong, rnd.nextInt(60).toLong))
    val out = PointInTimeJoin(feats.toDF("id", "ts", "v"), "id", "ts", Seq("v"))
      .transform(reqs.toDF("id", "ts"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) null else r.getString(2))).toMap
    reqs.foreach { case (id, ts) =>
      val expect = feats.filter(f => f._1 == id && f._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3).orNull
      assert(out((id, ts)) == expect, s"request ($id,$ts)")
    }
  }

  test("HashSplit is deterministic, salt-sensitive, and near the requested ratios") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    val op = HashSplit("id", trainBp = 8000, validBp = 1000)
    val counts = op.transform(df).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 1600L) < 100, s"train ~80%: $counts")
    assert(math.abs(counts("valid") - 200L) < 60, s"valid ~10%: $counts")
    assert(math.abs(counts("test") - 200L) < 60, s"test ~10%: $counts")
    // determinism: identical assignment on re-run
    val a = op.transform(df).select("id", "split").collect().toSet
    val b = op.transform(df).select("id", "split").collect().toSet
    assert(a == b)
    // a different salt reshuffles assignments
    val salted = HashSplit("id", 8000, 1000, salt = "other").transform(df)
      .select("id", "split").collect().toSet
    assert(salted != a)
  }

  test("Padding pads ragged rows to fixed length and truncates long ones") {
    val df = Seq((1, Seq(1, 2, 3)), (2, Seq(4)), (3, (1 to 8).toSeq)).toDF("id", "a")
    val out = Padding("a", length = 5, padValue = 0).transform(df)
      .orderBy("id").select("a").as[Seq[Int]].collect()
    assert(out(0) == Seq(1, 2, 3, 0, 0))
    assert(out(1) == Seq(4, 0, 0, 0, 0))
    assert(out(2) == Seq(1, 2, 3, 4, 5))
  }

  // F9 embedding lookup: ids → (batch, dim) vectors.
  test("EmbeddingLookup attaches vectors by id") {
    val emb = (0 until 100).map(i => (i.toLong, Seq.fill(50)(i.toFloat))).toDF("vec_id", "embedding")
    val req = Seq(1L, 2L, 3L).toDF("id")
    val out = EmbeddingLookup(emb, "id").transform(req).orderBy("id")
    val got = out.select("embedding").as[Seq[Float]].collect()
    assert(got.length == 3 && got.forall(_.size == 50))
    assert(got(1).head == 2.0f)
  }

  test("UnrollFeatures repeats user features across candidate rows with prefix") {
    val cands = Seq((1, 10), (1, 11), (2, 12)).toDF("requestId", "item_id")
    val users = Seq((1, "A", 25), (2, "B", 30)).toDF("requestId", "segment", "age")
    val out = UnrollFeatures(users, Seq("segment", "age")).transform(cands)
    assert(out.columns.toSeq == Seq("requestId", "item_id", "user_segment", "user_age"))
    assert(out.count() == 3)
    assert(out.filter($"requestId" === 1 && $"user_segment" === "A").count() == 2)
  }

  // Graph mechanics: eager schema propagation + failure on invalid chain
  // (reference tests/unit/systems/dag/test_graph.py:32-50).
  test("Ensemble propagates schemas eagerly and fails fast on bad wiring") {
    val schema = StructType(Seq(
      StructField("requestId", IntegerType),
      StructField("candidate_ids", ArrayType(IntegerType)),
      StructField("seen", ArrayType(IntegerType))))
    val ens = Ensemble(Seq(
      FilterCandidates("candidate_ids", "seen"),
      Padding("filtered_ids", 5, 0)), schema)
    assert(ens.outputSchema.fieldNames.toSeq == Seq("requestId", "filtered_ids"))
    assertThrows[IllegalArgumentException] {
      Ensemble(Seq(FilterCandidates("nope", "seen")), schema)
    }
  }

  test("Selection and Rename behave like column selectors") {
    val df = Seq((1, "x", 2.0)).toDF("a", "b", "c")
    val out = Ensemble(Seq(Selection(Seq("a", "b")), Rename(Map("b" -> "b_nvt"))), df.schema)
      .transform(df)
    assert(out.columns.toSeq == Seq("a", "b_nvt"))
  }

  // SaltedJoin must be row-identical to the plain equi-join it replaces:
  // the salt only splits a hot key across shuffle partitions, never
  // changes what matches. A 90%-hot-key fact side exercises the skew path.
  test("SaltedJoin returns exactly the plain-join rows under heavy skew") {
    val fact = (1 to 200).map(i => (i.toLong, if (i <= 180) 7L else (i % 5).toLong))
      .toDF("row_id", "key")
    val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("key", "label")
    val salted = SaltedJoin(dim, on = "key", saltBy = "row_id", saltBuckets = 4)
      .transform(fact).orderBy("row_id").collect()
    val plain = fact.join(dim, Seq("key")).select("row_id", "key", "label")
      .orderBy("row_id").collect()
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
    // the hot key's rows really do spread over multiple salt buckets
    val spread = fact.filter(col("key") === 7L)
      .select(pmod(xxhash64(col("row_id")), lit(4L)).as("s"))
      .distinct().count()
    assert(spread > 1, "salting must split the hot key across buckets")
    // schema: fact columns then dim payload, no __salt remnant
    assert(SaltedJoin(dim, "key", "row_id").transformSchema(fact.schema)
      .fieldNames.toSeq == Seq("row_id", "key", "label"))
  }

  test("StratifiedSample keeps per-stratum fractions deterministically") {
    val df = (1L to 3000L).map(i =>
      (i, i % 3 match { case 0 => "books"; case 1 => "web"; case _ => "other" }))
      .toDF("id", "stratum")
    val op = StratifiedSample("id", "stratum",
      Map("books" -> 10000, "web" -> 2000), defaultBp = 0)
    val counts = op.transform(df).groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("books") == 1000L, s"100% stratum keeps every row: $counts")
    assert(math.abs(counts.getOrElse("web", 0L) - 200L) < 80, s"~20% of web: $counts")
    assert(!counts.contains("other"), s"defaultBp=0 drops unlisted strata: $counts")
    // deterministic under re-run AND independent of the stratum column:
    // a row's bucket depends only on (id, salt), so changing a stratum's
    // rate never reshuffles which ids survive in OTHER strata
    val a = op.transform(df).select("id").as[Long].collect().toSet
    assert(a == op.transform(df).select("id").as[Long].collect().toSet)
    val webOnly = StratifiedSample("id", "stratum", Map("web" -> 2000), 0)
      .transform(df).select("id").as[Long].collect().toSet
    assert(webOnly == a.filter(_ % 3 == 1), "per-id fate is stratum-independent")
  }

  test("WeightedSampleByGroup: exactly k per stratum, weight-proportional, deterministic") {
    val rnd = new scala.util.Random(23)
    // two strata; stratum "a" has one heavy row per id-block — heavy rows
    // must be strongly over-represented in the sample
    val df = (1L to 2000L).map { i =>
      val stratum = if (i % 2 == 0) "a" else "b"
      val w = if (i % 100 == 0) 1000.0 else 1.0
      (i, stratum, w)
    }.toDF("id", "stratum", "w")
    val op = WeightedSampleByGroup("stratum", "w", "id", k = 20)
    val out = op.transform(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // exactly k per stratum, ranks dense 1..k
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.length == 20, s"stratum $s")
      assert(rows.map(_._3).sorted.sameElements(1 to 20))
    }
    // determinism across runs and partitionings
    val again = op.transform(df.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    assert(out.toSet == again.toSet)
    // the 20 heavy rows (w=1000 vs 1) carry ~95% of stratum "a"'s mass —
    // they must dominate its 20 slots
    val heavyPicked = out.count { case (id, s, _) => s == "a" && id % 100 == 0 }
    assert(heavyPicked >= 15, s"heavy rows must dominate the sample: $heavyPicked/20")
    // zero/negative/null weights carry no mass
    val degenerate = Seq((1L, "a", Some(0.0)), (2L, "a", Some(-1.0)),
      (3L, "a", None), (4L, "a", Some(2.0))).toDF("id", "stratum", "w")
    val kept = op.transform(degenerate).select("id").as[Long].collect().toSeq
    assert(kept == Seq(4L))
  }

  test("NegativeSampling: unseen-only, deduped, ranked, deterministic") {
    // 40 users × 3 positives each over a 50-item catalog
    val rnd = new scala.util.Random(31)
    val pos = (1L to 40L).flatMap { u =>
      rnd.shuffle((0L until 50L).toList).take(3).map(i => (u, i))
    }.distinct
    val df = pos.toDF("user_id", "item_id")
    val catalog = (0L until 50L).toDF("item")
    val op = NegativeSampling(catalog, "user_id", "item_id", "item", k = 4)
    val outSchema = op.transformSchema(df.schema)
    assert(outSchema.fieldNames.toSeq ==
      Seq("user_id", "item_id", "neg_item", "neg_rank"))
    assert(outSchema("neg_item").dataType == LongType)

    val out = op.transform(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val seenByUser = pos.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).toSet }
    // negatives never collide with ANY of the user's positives
    out.foreach { case (u, _, neg, _) =>
      assert(!seenByUser(u).contains(neg), s"user $u drew seen item $neg") }
    // per pair: no duplicate negatives, ranks dense 1..n, n <= k
    out.groupBy(t => (t._1, t._2)).foreach { case (pair, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length, s"dup negative in $pair")
      assert(rows.map(_._4).sorted.sameElements(1 to rows.length), s"ranks in $pair")
      assert(rows.length <= 4)
    }
    // 9 of 12 attempts surviving a 47/50-unseen catalog: k=4 essentially always
    assert(out.groupBy(t => (t._1, t._2)).forall(_._2.length == 4))
    // deterministic across reruns and partitionings
    val again = op.transform(df.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSet == again.toSet)
  }

  test("NegativeSampling exhaustion, null and collision contracts") {
    // catalog of 3; the user has seen 2 → only 1 negative exists, despite k=3
    val df = Seq((100L, 1L), (100L, 2L)).toDF("user_id", "item_id")
    val catalog = Seq(1L, 2L, 3L).toDF("item")
    val op = NegativeSampling(catalog, "user_id", "item_id", "item",
      k = 3, attempts = 30)
    val out = op.transform(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSet == Set((100L, 1L, 3L, 1), (100L, 2L, 3L, 1)),
      "the single unseen item is each pair's only negative, rank 1")
    // NULL user/item rows carry no deterministic coin — dropped
    val nulls = Seq((Option(1L), Option(1L)), (None, Option(2L)),
      (Option(2L), None)).toDF("user_id", "item_id")
    val fromNulls = op.transform(nulls).select("user_id").collect()
    assert(fromNulls.forall(_.getLong(0) == 1L))
    // output-name collisions and parameter bounds fail fast
    val clash = Seq((1L, 1L, 1L)).toDF("user_id", "item_id", "neg_item")
    assertThrows[IllegalArgumentException] { op.transformSchema(clash.schema) }
    assertThrows[IllegalArgumentException] {
      NegativeSampling(catalog, "user_id", "item_id", "item", k = 5, attempts = 4)
    }
    assertThrows[IllegalArgumentException] {
      NegativeSampling(catalog, "user_id", "item_id", "missing", k = 1)
    }
    // dtype mismatch between itemCol and the catalog would let the seen-set
    // anti join cast implicitly and silently re-emit positives — fail fast
    val intCatalog = Seq(1, 2, 3).toDF("item")
    assertThrows[IllegalArgumentException] {
      NegativeSampling(intCatalog, "user_id", "item_id", "item", k = 1)
        .transformSchema(df.schema)
    }
  }

  test("NegativeSampling size gate: the shuffle-join fallback returns the identical set") {
    val rnd = new scala.util.Random(7)
    val pos = (1L to 20L).flatMap { u =>
      rnd.shuffle((0L until 40L).toList).take(3).map(i => (u, i))
    }.distinct
    val df = pos.toDF("user_id", "item_id")
    val catalog = (0L until 40L).toDF("item")
    val base = NegativeSampling(catalog, "user_id", "item_id", "item", k = 3)
    val gated = base.copy(broadcastBudgetBytes = 1L) // forces the fallback
    val broadcastOut = base.transform(df)
    val gatedOut = gated.transform(df)
    // above the budget the index must NOT broadcast (the whole point of
    // the gate: a 1B-item catalog cannot pass through the driver)
    assert("BroadcastHashJoin \\[__idx".r
      .findFirstIn(gatedOut.queryExecution.executedPlan.toString).isEmpty,
      "gated plan must not broadcast the catalog index")
    assert("BroadcastHashJoin \\[__idx".r
      .findFirstIn(broadcastOut.queryExecution.executedPlan.toString).isDefined,
      "under the budget the index broadcast is the fast path")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(rows(broadcastOut) == rows(gatedOut),
      "both physical shapes must draw the exact same negative set")
  }

  test("UpsampleMix emits floor(weight) epochs plus a hash-deterministic fractional copy") {
    val df = (1L to 3000L).map(i =>
      (i, i % 3 match { case 0 => "books"; case 1 => "web"; case _ => "other" }))
      .toDF("id", "stratum")
    val op = UpsampleMix("id", "stratum",
      Map("books" -> 20000, "web" -> 15000), defaultBp = 0)
    val out = op.transform(df).cache()
    try {
      val copies = out.groupBy("id", "stratum").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      // whole-epoch stratum: every books row exactly twice, epochs 0 and 1
      assert(copies.filter(_._1._2 == "books").values.toSet == Set(2L))
      assert(out.filter($"stratum" === "books").select("epoch").distinct()
        .as[Int].collect().toSet == Set(0, 1))
      // fractional stratum: 1 or 2 copies, ~1.5 on average, and the 2-copy
      // set is exactly the md5-coin winners (bucket < 5000)
      val webCopies = copies.filter(_._1._2 == "web")
      assert(webCopies.values.toSet == Set(1L, 2L))
      val twoCopyIds = webCopies.filter(_._2 == 2L).keys.map(_._1).toSet
      val coinWinners = df.filter($"stratum" === "web")
        .filter(graft.functions.TextFunctions.hashBucket(col("id"), "graft-mix", 10000) < 5000)
        .select("id").as[Long].collect().toSet
      assert(twoCopyIds == coinWinners, "fractional copy = the content-hash coin")
      // zero-weight stratum vanishes entirely
      assert(!copies.keys.exists(_._2 == "other"))
    } finally out.unpersist()
    // weight < 10000 degenerates to exactly StratifiedSample's keep rule —
    // under a SHARED salt (defaults deliberately differ so composed
    // sampling stages draw independent coins)
    val mixed = UpsampleMix("id", "stratum", Map.empty, defaultBp = 2000, salt = "same")
      .transform(df)
    assert(mixed.select("epoch").distinct().as[Int].collect().toSet == Set(0))
    val sampled = StratifiedSample("id", "stratum", Map.empty, defaultBp = 2000, salt = "same")
      .transform(df)
    assert(mixed.select("id").as[Long].collect().toSet ==
      sampled.select("id").as[Long].collect().toSet)
    // and the DEFAULT salts are distinct streams: a 50% sample composed
    // with a 50%-fractional mix keeps ~25%, not 0% or 50%
    val sampledHalf = StratifiedSample("id", "stratum", Map.empty, defaultBp = 5000)
      .transform(df)
    val remixed = UpsampleMix("id", "stratum", Map.empty, defaultBp = 5000)
      .transform(sampledHalf.drop("sample_bucket"))
    val rate = remixed.count().toDouble / df.count()
    assert(math.abs(rate - 0.25) < 0.05, s"independent coins compose to ~25%: $rate")
  }

  test("UpsampleMix null semantics, collision check and weight bounds") {
    val nulls = Seq((Option(1L), Option("books")), (Option(2L), None),
      (None, Option("books"))).toDF("id", "stratum")
    // null stratum takes the default weight; null id has no coin → dropped
    val out = UpsampleMix("id", "stratum", Map.empty, defaultBp = 10000)
      .transform(nulls).select("id").as[Option[Long]].collect().toSet
    assert(out == Set(Option(1L), Option(2L)))
    val clash = Seq((1L, "a", 0)).toDF("id", "stratum", "epoch")
    assertThrows[IllegalArgumentException] {
      UpsampleMix("id", "stratum", Map.empty).transformSchema(clash.schema)
    }
    assertThrows[IllegalArgumentException] {
      UpsampleMix("id", "stratum", Map("a" -> 1000001))
    }
  }

  test("StratifiedSample null semantics and output-collision check") {
    val nulls = Seq((Option(1L), Option("books")), (Option(2L), None),
      (None, Option("books"))).toDF("id", "stratum")
    // defaultBp=10000: the null-stratum row is kept via the default rate,
    // the null-id row is dropped (no deterministic fate exists for it)
    val kept = StratifiedSample("id", "stratum", Map.empty, defaultBp = 10000)
      .transform(nulls).select("id").as[Option[Long]].collect().toSet
    assert(kept == Set(Option(1L), Option(2L)))
    // an input already carrying sample_bucket must fail at schema time
    val clash = Seq((1L, "a", 0L)).toDF("id", "stratum", "sample_bucket")
    assertThrows[IllegalArgumentException] {
      StratifiedSample("id", "stratum", Map.empty).transformSchema(clash.schema)
    }
  }

  // The scaladoc's associativity claim: folding snapshots forward batch
  // by batch lands on exactly the one-shot materialization of the full
  // history — the property that makes incremental refresh exact.
  test("MaterializeFeatureView incremental refresh equals full-history materialization") {
    val rnd = new scala.util.Random(11)
    val history = Seq.tabulate(120)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(40).toLong, i.toLong, s"v$i"))
    val schema = Seq.empty[(Long, Long, Long, String)]
      .toDF("id", "ts", "seq", "v").schema
    def frame(rows: Seq[(Long, Long, Long, String)]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row.fromTuple)), schema)
    val batches = history.grouped(40).toSeq
    val empty = frame(Seq.empty)
    val incremental = batches.foldLeft(empty)((snap, b) =>
      MaterializeFeatureView(frame(b), Seq("id"), "ts", "seq").transform(snap))
    val oneShot = MaterializeFeatureView(frame(history), Seq("id"), "ts", "seq")
      .transform(empty)
    assert(incremental.collect().toSet == oneShot.collect().toSet)
    assert(incremental.count() == history.map(_._1).distinct.size.toLong,
      "exactly one row per key survives")
    // the survivor per key really is the (ts, seq)-max row
    val got = incremental.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    history.groupBy(_._1).foreach { case (id, rows) =>
      assert(got(id) == rows.map(r => (r._2, r._3)).max, s"key $id")
    }
  }

  test("MaterializeFeatureView rejects updates with mismatched dtypes at schema time") {
    val snap = Seq((1L, 10L, 1L, "a")).toDF("id", "ts", "seq", "v")
    val badTyped = Seq((1L, 10L, 1L, 2.5)).toDF("id", "ts", "seq", "v") // v: DOUBLE
    val err = intercept[IllegalArgumentException] {
      MaterializeFeatureView(badTyped, Seq("id"), "ts", "seq")
        .transformSchema(snap.schema)
    }
    assert(err.getMessage.contains("same columns and types"),
      s"mismatch must surface with the op's message: ${err.getMessage}")
  }

  test("SaltedJoin left join keeps unmatched fact rows with null payload") {
    val fact = Seq((1L, 7L), (2L, 99L)).toDF("row_id", "key")
    val dim = Seq((7L, "hot")).toDF("key", "label")
    val out = SaltedJoin(dim, "key", "row_id", saltBuckets = 3, joinType = "left")
      .transform(fact).orderBy("row_id").collect()
    assert(out.length == 2)
    assert(out(0).getString(2) == "hot")
    assert(out(1).isNullAt(2), "unmatched key must survive with null payload")
  }

  test("ShardShuffle: complete partition into dense per-shard positions, " +
    "deterministic across reruns, null ids dropped") {
    import spark.implicits._
    val df = ((1L to 200L).map(i => (Some(i), s"d$i")) :+
      (Option.empty[Long], "nullid")).toDF("doc_id", "payload")
    val op = ShardShuffle("doc_id", shards = 8)
    val out = op.transform(df).collect()
    assert(out.length == 200, "null id dropped, everything else kept")
    val byShard = out.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keys.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (s, rows) =>
      val pos = rows.map(_.getAs[Int]("shard_pos")).sorted
      assert(pos.toSeq == (1 to rows.length).toSeq,
        s"shard $s positions must be dense 1..n, got ${pos.toSeq}")
    }
    // rerun → identical layout (content-hashed, no rand())
    val again = op.transform(df).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Int]("shard_pos"))
    assert(out.map(key).sortBy(_._1).toSeq == again.map(key).sortBy(_._1).toSeq)
    // the shuffle does shuffle: within-shard order differs from id order
    val someShard = byShard.values.maxBy(_.length)
    val idsByPos = someShard.sortBy(_.getAs[Int]("shard_pos")).map(_.getAs[Long]("doc_id"))
    assert(idsByPos.toSeq != idsByPos.sorted.toSeq,
      "within-shard order should not degenerate to id order")
  }

  test("ShardShuffle rejects output-column collisions at schema time") {
    import spark.implicits._
    val df = Seq((1L, 2)).toDF("doc_id", "shard")
    assertThrows[IllegalArgumentException] {
      ShardShuffle("doc_id").transformSchema(df.schema)
    }
  }

test("SkewReport ranks the heaviest keys with exact shares and mean multiples") {
    val rows = Seq.fill(60)(("hot", 1)) ++ Seq.fill(30)(("warm", 1)) ++
      Seq.fill(5)(("c1", 1)) ++ Seq.fill(5)(("c2", 1))
    val out = SkewReport(Seq("k"), topK = 2)
      .transform(rows.toDF("k", "v")).orderBy(desc("n_rows")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 2)
    // hot: 60 of 100 rows, 4 keys -> share 6000 bp, 2.4x mean
    assert(out(0) == (("hot", 60L, 6000L, 24000L)), s"${out(0)}")
    assert(out(1) == (("warm", 30L, 3000L, 12000L)), s"${out(1)}")
  }

  test("SkewReport's mean-multiple survives products beyond Long.MaxValue") {
    // 1e9-row hot key over 1e9 keys in a 1e12-row table: the naive
    // BIGINT product n_rows * n_keys * 10000 is 1e22 — wrapped, the
    // metric would corrupt for exactly the heaviest keys. The shared
    // DECIMAL(38,0) definition must return the exact floor: 1e10.
    val frame = Seq((1000000000L, 1000000000L, 1000000000000L))
      .toDF("n_rows", "__n_keys", "__total")
    val got = frame.select(
      SkewReport.multVsMeanBp("n_rows", "__n_keys", "__total").as("m"))
      .collect().head.getLong(0)
    assert(got == 10000000000L, s"expected 1e10, got $got")
  }

  test("MixturePlan integer math survives frontier-scale token budgets") {
    // 9e17-token budget over a 9e17-token stratum: the naive
    // target*10000 / avail*rate products are ~4.5e21, far past
    // Long.MaxValue — the DECIMAL intermediates must return exact floors
    val docs = Seq(("en", 900000000000000000L)).toDF("lang", "toks")
    val out = MixturePlan("lang", "toks", Map("en" -> 5000),
      budgetTokens = 900000000000000000L).transform(docs).collect().head
    assert(out.getLong(3) == 450000000000000000L, s"target: $out")
    assert(out.getLong(4) == 5000L, s"rate: $out")
    assert(out.getLong(5) == 450000000000000000L, s"planned: $out")
    assert(!out.getBoolean(6))
  }

  test("MixturePlan rejects a non-string strata column") {
    val docs = Seq((1, 100L)).toDF("lang", "toks")
    assertThrows[IllegalArgumentException] {
      MixturePlan("lang", "toks", Map("1" -> 5000), budgetTokens = 100)
        .transform(docs)
    }
  }

  test("MixturePlan computes budgets, rates, and shortfalls in floor integer math") {
    val docs = Seq(
      ("en", 100L), ("en", 300L),   // en avail 400
      ("zh", 50L),                  // zh avail 50
      ("fr", 1000L)).toDF("lang", "toks") // fr avail 1000
    val out = MixturePlan("lang", "toks",
      Map("en" -> 5000, "zh" -> 3000), budgetTokens = 1000, defaultBp = 1000)
      .transform(docs).orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    // en: target 500 of avail 400 -> capped rate 10000, planned 400, SHORT
    assert(out(0) == (("en", 400L, 500L, 10000L, 400L, true)), s"${out(0)}")
    // fr: default 10% -> target 100 of 1000 -> rate 1000 bp, planned 100
    assert(out(1) == (("fr", 1000L, 100L, 1000L, 100L, false)), s"${out(1)}")
    // zh: target 300 of avail 50 -> capped, short
    assert(out(2) == (("zh", 50L, 300L, 10000L, 50L, true)), s"${out(2)}")
  }

  test("MixturePlan surfaces declared strata absent from the corpus as short") {
    val docs = Seq(("en", 100L)).toDF("lang", "toks")
    val out = MixturePlan("lang", "toks", Map("en" -> 5000, "zh" -> 5000),
      budgetTokens = 100, defaultBp = 0)
      .transform(docs).orderBy("stratum").collect()
    assert(out.length == 2, "the empty declared stratum must still plan")
    val zh = out(1)
    assert(zh.getString(0) == "zh" && zh.getLong(1) == 0L && zh.getLong(2) == 0L)
    assert(zh.getLong(3) == 50L && zh.isNullAt(4) && zh.getBoolean(6),
      s"zh can fill none of its 50-token share: $zh")
  }

  test("PointInTimeJoin attaches the latest feature ROW wholesale (ASOF, not per-column LOCF)") {
    import java.sql.Timestamp
    val feat = Seq(
      (1L, new Timestamp(1000L), Some(5.0), Some(10.0)),
      (1L, new Timestamp(2000L), Option.empty[Double], Some(20.0)))
      .toDF("entity_id", "ts", "fa", "fb")
    val req = Seq((1L, new Timestamp(3000L))).toDF("entity_id", "ts")
    val out = PointInTimeJoin(feat, "entity_id", "ts").transform(req).collect().head
    // the latest row (ts=2000) wins WHOLESALE: fa is NULL there, and a
    // per-column fill would resurrect fa=5.0 from ts=1000 — a feature
    // row that never existed (ASOF JOIN semantics, what the oracle runs)
    assert(out.isNullAt(out.fieldIndex("fa")),
      s"fa must be the latest row's NULL, not a resurrected older value: $out")
    assert(out.getAs[Double]("fb") == 20.0)
  }

  test("StandardScale integral sums survive values whose squares overflow a long") {
    val v = 4_000_000_000L // v*v = 1.6e19 > Long.MaxValue
    val df = Seq(v, 0L).toDF("x")
    val out = StandardScale(Seq("x")).transform(df)
      .orderBy(desc("x")).collect()
    // mean 2e9, std 2e9 -> scaled = +-1 exactly
    assert(out.map(_.getAs[Double]("x_scaled")).toSeq == Seq(1.0, -1.0),
      s"decimal sums keep the rescale exact: ${out.toSeq}")
  }

  test("QueryFeatureStore rejects feature names colliding with request columns") {
    val feat = Seq((1L, 9.9)).toDF("entity_id", "price")
    val req = Seq((1L, 1.0)).toDF("entity_id", "price")
    assertThrows[IllegalArgumentException] {
      QueryFeatureStore(feat, "entity_id").transformSchema(req.schema)
    }
  }

  test("EvalRanking scores a query whose candidates all rank past k as ZERO, not absent") {
    val rel = Seq((1L, 10L), (2L, 20L)).toDF("query_id", "item_id")
    // query 2 was served, but its only candidate ranks past k = 3 —
    // basing metrics on top-k rows alone would silently drop it and
    // average recall only over the answered queries
    val ranked = Seq((1L, 10L, 1), (2L, 20L, 7)).toDF("query_id", "item_id", "rank")
    val out = EvalRanking(rel, k = 3).transform(ranked)
      .orderBy("query_id").collect()
    assert(out.length == 2, s"the failed query must appear: ${out.toSeq}")
    val failed = out(1)
    assert(failed.getLong(0) == 2L && failed.getAs[Long]("hits") == 0L &&
      failed.getAs[Long]("recall_bp") == 0L &&
      failed.getAs[Long]("rr_micros") == 0L,
      s"zero metrics, not absence: $failed")
  }

  test("DocumentChunks emits no chunks for empty or whitespace-only documents") {
    val docs = Seq((1L, "real words here"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = DocumentChunks().transform(docs).collect()
    assert(out.forall(_.getLong(0) == 1L),
      s"empty docs must produce no phantom chunk: ${out.toSeq}")
  }
}
