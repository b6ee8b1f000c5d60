package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** The property layer the reference lacks (SURVEY.md §5): algebraic
  * invariants of the sampling/mixing/packing family over GENERATED
  * inputs, not fixtures. Iteration counts stay small because every case
  * runs real Spark jobs; the point is the invariant, not the case count. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val idsGen: Gen[List[Long]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 10000L))).map(_.distinct)

  test("HashSplit: every id labeled, labels partition, assignment is order-independent") {
    check(Prop.forAll(idsGen, Gen.chooseNum(0, 9000), Gen.chooseNum(0, 1000)) {
      (ids, trainBp, validBp) =>
        val op = HashSplit("id", trainBp, validBp)
        val a = op.transform(ids.toDF("id"))
          .select("id", "split").as[(Long, String)].collect().toMap
        val b = op.transform(ids.reverse.toDF("id").repartition(3))
          .select("id", "split").as[(Long, String)].collect().toMap
        a == b &&
          a.keySet == ids.toSet &&
          a.values.forall(Set("train", "valid", "test"))
    })
  }

  test("fit-once serving is bit-identical to fit-at-serve over generated frames") {
    // the FittableOp contract on GENERATED data: for random (category,
    // group, value) frames — nulls, duplicate keys, single-row groups,
    // negative values included — every bound twin's output equals the
    // unfitted op's row for row, and so does the composed chain
    val rowGen: Gen[List[(Option[String], String, Long, Option[Long])]] =
      Gen.chooseNum(2, 25).flatMap(n => Gen.listOfN(n, for {
        cat <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
        grp <- Gen.oneOf("x", "y", "z")
        qty <- Gen.chooseNum(-50L, 50L)
        qn <- Gen.option(Gen.chooseNum(0L, 9L))
      } yield (cat, grp, qty, qn)))
    check(Prop.forAll(rowGen) { rows0 =>
      // sentinel guarantees a non-null median source: an ALL-null
      // qty_n frame makes BOTH paths throw identically (fit has
      // nothing to fit), which is a different property than this one
      val rows = rows0 :+ ((Some("a"): Option[String], "x", 7L,
        Some(5L): Option[Long]))
      val df = rows.zipWithIndex
        .map { case ((c, g, q, n), i) => (i.toLong, c, g, q, n) }
        .toDF("rid", "cat", "grp", "qty", "qty_n")
      val ens = graft.core.Ensemble(Seq(
        Categorify(Seq("grp")),
        TargetEncoding(Seq("cat"), "qty", leaveOneOut = true),
        JoinGroupby("grp", Seq("qty"), Seq("count", "sum", "mean")),
        FillMissing(medianCols = Seq("qty_n")),
        StandardScale(Seq("qty"))), df.schema)
      val plain = ens.transform(df).orderBy("rid").collect().toSeq
      val bound = FittedOps.fitEnsemble(ens, df)
        .transform(df).orderBy("rid").collect().toSeq
      plain == bound
    }, n = 8)
  }

  test("ArrayAgreeCount equals the zip_with definition on generated arrays") {
    val sigGen: Gen[List[Long]] =
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 3L)))
    check(Prop.forAll(sigGen, sigGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b").select(
        graft.functions.FastExpressions.arrayAgreeCount(col("a"), col("b")).as("fast"),
        size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), m => m)).as("hof"))
      val r = df.collect().head
      r.getInt(0) == r.getInt(1)
    }, n = 15)
  }

  test("StratifiedSample: kept set grows monotonically with the keep fraction") {
    check(Prop.forAll(idsGen, Gen.chooseNum(0, 10000), Gen.chooseNum(0, 10000)) {
      (ids, bp1, bp2) =>
        val (lo, hi) = (math.min(bp1, bp2), math.max(bp1, bp2))
        val df = ids.map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "stratum")
        def kept(bp: Int) = StratifiedSample("id", "stratum", Map.empty, defaultBp = bp)
          .transform(df).select("id").as[Long].collect().toSet
        kept(lo).subsetOf(kept(hi))
    })
  }

  test("UpsampleMix: per-id copies are floor(w) or floor(w)+1 and epochs are dense") {
    check(Prop.forAll(idsGen, Gen.chooseNum(0, 30000)) { (ids, w) =>
      val df = ids.map(i => (i, "s")).toDF("id", "stratum")
      val out = UpsampleMix("id", "stratum", Map.empty, defaultBp = w)
        .transform(df).select("id", "epoch").as[(Long, Int)].collect()
      val byId = out.groupBy(_._1)
      byId.values.forall { copies =>
        val n = copies.length
        (n == w / 10000 || n == w / 10000 + 1) &&
          copies.map(_._2).sorted.sameElements(0 until n)
      } &&
        // not vacuous: at >= 1 whole epoch EVERY input id must appear
        (w < 10000 || byId.keySet == ids.toSet)
    })
  }

  test("SoftmaxSampling: output ids come from the candidates, size min(k,n), runs repeat") {
    val rowGen = for {
      n <- Gen.chooseNum(0, 12)
      ids <- Gen.listOfN(n, Gen.chooseNum(0, 1000))
    } yield (ids.distinct, ids.distinct.map(_ / 7.0))
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen), Gen.chooseNum(1, 6)) { (rows0, k) =>
      // unique requestId per row so every assertion is per-row exact
      val rows = rows0.zipWithIndex.map { case ((ids, sc), i) => (i.toLong, ids, sc) }
      val df = rows.toDF("requestId", "candidate_ids", "scores")
      val op = SoftmaxSampling("candidate_ids", "scores", topk = k)
      def run() = op.transform(df)
        .select("requestId", "ordered_ids").as[(Long, Seq[Int])].collect()
        .map { case (req, out) => req -> out.toList }.toMap
      val got = run()
      val cand = rows.map { case (req, ids, _) => req -> ids }.toMap
      got == run() && got.forall { case (req, out) =>
        out.length == math.min(k, cand(req).length) &&
          out.toSet.subsetOf(cand(req).toSet) &&
          out.distinct == out // sampling WITHOUT replacement
      }
    }, n = 8)
  }

  test("WeightedSampleByGroup: exactly min(k, eligible) rows per stratum, order-independent") {
    val rowGen = for {
      s <- Gen.oneOf("a", "b")
      w <- Gen.chooseNum(-2.0, 50.0) // negatives/zeros must be ineligible
    } yield (s, w)
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen), Gen.chooseNum(1, 8)) { (rows0, k) =>
      val rows = rows0.zipWithIndex.map { case ((s, w), i) => (i.toLong, s, w) }
      val df = rows.toDF("id", "stratum", "w")
      val op = WeightedSampleByGroup("stratum", "w", "id", k)
      val out = op.transform(df).select("id", "stratum").as[(Long, String)].collect()
      val eligible = rows.filter(_._3 > 0).groupBy(_._2).view.mapValues(_.length).toMap
      val counts = out.groupBy(_._2).view.mapValues(_.length).toMap
      out.toSet == op.transform(df.repartition(5)).select("id", "stratum")
        .as[(Long, String)].collect().toSet &&
        eligible.forall { case (s, n) => counts.getOrElse(s, 0) == math.min(k, n) } &&
        out.map(_._1).toSet.subsetOf(rows.filter(_._3 > 0).map(_._1).toSet)
    }, n = 8)
  }

  test("TopFractionByGroup exact: per-stratum kept count is exactly floor(frac*n/10000)") {
    val strataGen = Gen.nonEmptyListOf(for {
      s <- Gen.oneOf("a", "b", "c")
      score <- Gen.chooseNum(0, 1000)
    } yield (s, score))
    check(Prop.forAll(strataGen, Gen.chooseNum(0, 10000)) { (rows, frac) =>
      val df = rows.zipWithIndex.map { case ((s, sc), i) => (i.toLong, s, sc) }
        .toDF("id", "stratum", "score")
      val kept = TopFractionByGroup("stratum", "score", "id", Map.empty, defaultBp = frac)
        .transform(df).groupBy("stratum").count()
        .as[(String, Long)].collect().toMap
      rows.groupBy(_._1).forall { case (s, g) =>
        kept.getOrElse(s, 0L) == frac.toLong * g.size / 10000
      }
    })
  }

  test("PackChunks: packs never exceed budget and every chunk lands in exactly one slot") {
    val chunksGen = Gen.nonEmptyListOf(Gen.chooseNum(1, 200)).map(_.zipWithIndex)
    check(Prop.forAll(chunksGen, Gen.chooseNum(50, 300)) { (chunks, budget) =>
      val df = chunks.map { case (tok, i) => (i.toLong, 0L, tok.toLong) }
        .toDF("doc_id", "chunk_id", "n_tokens")
      val out = PackChunks(budget = budget, shards = 3).transform(df)
        .select("doc_id", "shard", "pack_id", "n_tokens")
        .as[(Long, Long, Long, Long)].collect()
      val packSums = out.groupBy(r => (r._2, r._3)).values.map { pk =>
        pk.map(r => math.min(r._4, budget.toLong)).sum
      }
      out.length == chunks.length &&
        out.map(_._1).sorted.sameElements(chunks.map(_._2.toLong).sorted) &&
        packSums.forall(_ <= budget.toLong)
    }, n = 8)
  }

  test("ScrubSharedGrams: cleaned text is an ordered subsequence of the normalized tokens") {
    val vocab = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, vocab)).map(_.mkString(" "))
    check(Prop.forAll(Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, docGen))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = ScrubSharedGrams(n = 3, minDocs = 2).transform(df)
        .select("doc_id", "n_tokens", "n_removed", "cleaned_text")
        .as[(Long, Int, Int, String)].collect()
      out.forall { case (id, nt, nr, cleaned) =>
        val orig = texts(id.toInt).split(" ").toList
        val kept = if (cleaned.isEmpty) Nil else cleaned.split(" ").toList
        // subsequence check + bookkeeping consistency
        def isSubseq(xs: List[String], ys: List[String]): Boolean = xs match {
          case Nil => true
          case h :: t => ys.dropWhile(_ != h) match {
            case _ :: rest => isSubseq(t, rest)
            case Nil => false
          }
        }
        nt == orig.length && nr == nt - kept.length && isSubseq(kept, orig)
      }
    }, n = 8)
  }

  test("keptTokens span-merge reconstruction equals the brute-force covered filter") {
    // the O(tokens + spans) gap-slicing path must be EXACTLY the naive
    // O(tokens × starts) filter it replaced, for any sorted start set —
    // including chained/overlapping windows and all-covered documents
    val caseGen = for {
      nTok <- Gen.chooseNum(0, 30)
      n <- Gen.chooseNum(1, 5)
      starts <- Gen.someOf(0 until math.max(1, nTok - n + 1))
    } yield (nTok, n, starts.toList.sorted)
    check(Prop.forAll(Gen.nonEmptyListOf(caseGen)) { cases =>
      val rows = cases.zipWithIndex.map { case ((nTok, n, starts), i) =>
        (i.toLong, (0 until nTok).map(t => s"t$t"), starts, n)
      }
      val df = rows.toDF("id", "ws", "starts", "n")
      cases.map(_._2).distinct.forall { n =>
        val sub = df.filter(col("n") === n)
        val got = sub.withColumn("__kept",
          ScrubSharedGrams.keptTokens(col("ws"), col("starts"), n))
        val naive = got.withColumn("__naive", filter(col("ws"), (t, i) =>
          not(exists(col("starts"), s => s <= i && i < s + n))))
        naive.filter(not(col("__kept") <=> col("__naive"))).count() == 0
      }
    }, n = 8)
  }

  test("PrefixDedup: groups partition the corpus; keeper maximizes tokens then minimizes id") {
    val docGen = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 500L)
      nTok <- Gen.chooseNum(1, 8)
      toks <- Gen.listOfN(nTok, Gen.oneOf("a", "b", "c"))
    } yield (id, toks.mkString(" "))).map(_.distinctBy(_._1))
    check(Prop.forAll(docGen, Gen.chooseNum(1, 4)) { (docs, n) =>
      val df = docs.toDF("doc_id", "text")
      val out = PrefixDedup(n = n).transform(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val byPrefix = docs.groupBy { case (_, t) =>
        t.split(" ").take(n).mkString(" ") }
      out.map(_._4).sum == docs.size &&                     // copies partition the corpus
      out.length == byPrefix.size &&                        // one row per group
      out.forall { case (_, keepId, keepToks, _) =>
        val grp = byPrefix.values.find(_.exists(_._1 == keepId)).get
        val best = grp.maxBy { case (id, t) => (t.split(" ").length, -id) }
        keepId == best._1 && keepToks == best._2.split(" ").length
      }
    }, n = 8)
  }

  test("FuzzyDecontaminate: banded hits are always a subset of exact hits (precision 1.0)") {
    val docGen = for {
      id <- Gen.chooseNum(0L, 300L)
      nTok <- Gen.chooseNum(3, 10)
      toks <- Gen.listOfN(nTok, Gen.oneOf("w1", "w2", "w3", "w4"))
    } yield (id, toks.mkString(" "))
    check(Prop.forAll(
      Gen.nonEmptyListOf(docGen).map(_.distinctBy(_._1)),
      Gen.nonEmptyListOf(docGen).map(_.distinctBy(_._1)),
      Gen.chooseNum(2000, 9000)) { (corpus0, eval0, thr) =>
      val corpus = corpus0.toDF("doc_id", "text")
      val eval = eval0.toDF("doc_id", "text")
      def hits(banded: Boolean) =
        FuzzyDecontaminate(eval, n = 3, thresholdBp = thr, banded = banded,
          numHashes = 16, bands = 8)
          .transform(corpus).filter(col("contaminated"))
          .select("doc_id").collect().map(_.getLong(0)).toSet
      hits(banded = true).subsetOf(hits(banded = false))
    }, n = 6)
  }

  test("ResampleLocf equals a naive per-user LOCF reference on random streams") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 4) {
      val events = (1 to 40).map { i =>
        val u = rnd.nextInt(6) + 1L
        val ts = new java.sql.Timestamp(
          86400000L * rnd.nextInt(8) + rnd.nextInt(86400000))
        (u, ts, i.toLong, rnd.nextInt(5000) / 10.0)
      }
      def cents(v: Double): Long =
        BigDecimal(java.math.BigDecimal.valueOf(v * 100))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      def day(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 86400000L)
      // naive reference: per-(user, day) winner under (ts, id), global max
      // day, per-user fill from the first observed day
      val winners = events.groupBy(e => (e._1, day(e._2))).map { case (k, es) =>
        k -> cents(es.maxBy(e => (e._2.getTime, e._3))._4)
      }
      val gmax = winners.keys.map(_._2).max
      val expected = winners.keys.map(_._1).toSeq.distinct.sorted.flatMap { u =>
        val d0 = winners.keys.filter(_._1 == u).map(_._2).min
        var carry = 0L
        (d0 to gmax).map { d =>
          val obs = winners.get((u, d))
          carry = obs.getOrElse(carry)
          (u, d, carry, if (obs.isDefined) 1 else 0)
        }
      }.toSet
      val got = ResampleLocf()
        .transform(events.toDF("user_id", "ts", "event_id", "value"))
        .collect().map(r => (r.getLong(0),
          r.getDate(1).toLocalDate.toEpochDay, r.getLong(2), r.getInt(3))).toSet
      assert(got == expected, s"LOCF grid must match the naive reference")
    }
  }

  test("ClusterAssign equals a naive argmin over random vectors and centers") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 3) {
      val dim = rnd.nextInt(4) + 2
      val centers = (1 to rnd.nextInt(5) + 2).map(_ =>
        (0 until dim).map(_ => rnd.nextInt(200) / 10.0 - 10.0))
      val vecs = (1 to 30).map(i =>
        (i.toLong, (0 until dim).map(_ => rnd.nextInt(200) / 10.0f - 10.0f)))
      def dot(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.size) { s += a(i) * b(i); i += 1 }; s
      }
      val expected = vecs.map { case (id, vf) =>
        val v = vf.map(_.toDouble)
        val ds = centers.zipWithIndex.map { case (c, ci) =>
          ((c.map(x => x * x).sum - 2.0 * dot(v, c)), ci)
        }
        val (dPart, cid) = ds.min
        (id, cid, dPart + dot(v, v))
      }.toSet
      val got = ClusterAssign(centers).transform(vecs.toDF("vec_id", "embedding"))
        .select("vec_id", "cluster_id", "d2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(got == expected, "assignment and exact d2 must match the naive argmin")
    }
  }

  test("EvalRanking equals naive metric computation on random rankings") {
    val rnd = new scala.util.Random(19)
    val k = 5
    val g = EvalRanking.gainNanos(k); val idcg = EvalRanking.idcgNanos(k)
    for (_ <- 1 to 3) {
      val ranked = (1 to 6).flatMap { q =>
        rnd.shuffle((1 to 12).toList).take(rnd.nextInt(7) + 1)
          .zipWithIndex.map { case (item, i) => (q.toLong, item, i + 1) }
      }
      val rel = (1 to 6).flatMap { q =>
        (1 to 12).filter(_ => rnd.nextBoolean()).map(i => (q.toLong, i))
      }
      val relSet = rel.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = ranked.map(_._1).distinct.sorted.map { q =>
        val top = ranked.filter(r => r._1 == q && r._3 <= k)
        val rs = relSet.getOrElse(q, Set.empty)
        val hits = top.filter(r => rs(r._2))
        val nRel = rs.size.toLong
        val dcg = hits.map(h => g(h._3 - 1)).sum
        (q, nRel, hits.size.toLong,
          if (nRel > 0) Some(hits.size * 10000L / nRel) else None,
          if (hits.nonEmpty) 1000000L / hits.map(_._3).min else 0L,
          if (nRel > 0) Some(dcg * 10000 / idcg(math.min(nRel, k).toInt - 1)) else None)
      }.toSet
      val got = EvalRanking(rel.toDF("query_id", "item_id"), k = k)
        .transform(ranked.toDF("query_id", "item_id", "rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
      assert(got == expected, "metrics must match the naive reference")
    }
  }
}
