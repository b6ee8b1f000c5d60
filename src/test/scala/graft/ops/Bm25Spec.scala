package graft.ops

import graft.SparkSpec

/** [[Bm25Index]] against an independent local BM25 reference: same
  * tokenization, same Lucene-floored idf, same fixed-point rounding —
  * computed with plain Scala collections so a defect in the distributed
  * plan cannot hide in a shared code path. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark shuffles data between stages"),
    (1L, "spark spark spark everywhere spark"),
    (2L, "data data data and more data"),
    (3L, "a quiet document about nothing"),
    (4L, "stages of a spark job shuffle data"),
    (5L, ""), // empty: counts toward N, never retrievable
    (6L, "between the stages lies the shuffle"))

  private def fitIndex(k: Int = 10) =
    Bm25Index.fit(corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)

  /** Local reference: tokenize, score, rank. */
  private def referenceTopK(query: String, k: Int): Seq[(Long, Long)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toSeq
    val docToks = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val n = corpus.size.toLong
    val avgdl = docToks.values.map(_.size.toLong).sum.toDouble / n
    val dfreq = docToks.values.flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val qtf = toks(query).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val scores = docToks.flatMap { case (id, ts) =>
      if (ts.isEmpty) None
      else {
        val tf = ts.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
        val s = qtf.collect { case (term, q) if tf.contains(term) =>
          val df = dfreq(term)
          val idf6 = math.round(1e6 * math.log(1.0 + ((n - df) + 0.5) / (df + 0.5)))
          val sat = (tf(term) * (1.2 + 1.0)) /
            (tf(term) + 1.2 * ((1.0 - 0.75) + 0.75 * (ts.size / avgdl)))
          math.round(q * idf6 * sat)
        }.sum
        if (s != 0L || qtf.keySet.exists(tf.contains)) Some(id -> s) else None
      }
    }.toSeq
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("distributed scores and ranking match the local reference") {
    val idx = fitIndex()
    for (q <- Seq("spark data", "shuffle between stages", "spark spark data", "quiet nothing")) {
      val got = idx.asRows(Seq((99L, q)).toDF("query_id", "query_text"))
        .orderBy("rank").select("doc_id", "score_fp").as[(Long, Long)].collect().toSeq
      assert(got == referenceTopK(q, 10), s"query '$q'")
    }
  }

  test("docs sharing no query term never appear; empty docs are unfindable") {
    val idx = fitIndex()
    val got = idx.asRows(Seq((1L, "spark")).toDF("query_id", "query_text"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 4L), "only docs containing 'spark'")
  }

  test("query term frequency weights the accumulated score linearly") {
    val idx = fitIndex()
    def score(q: String): Map[Long, Long] =
      idx.asRows(Seq((1L, q)).toDF("query_id", "query_text"))
        .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    val s1 = score("quiet")
    val s3 = score("quiet quiet quiet")
    assert(s3(3L) == 3 * s1(3L), "qtf multiplies the per-term contribution")
  }

  test("k bounds the result and ties break by ascending doc id") {
    // identical single-term docs: all scores equal, order must be doc id
    val dup = Seq((10L, "alpha"), (11L, "alpha"), (12L, "alpha"), (13L, "alpha"))
    val idx = Bm25Index.fit(dup.toDF("doc_id", "text"), "doc_id", "text", k = 3)
    val got = idx.asRows(Seq((1L, "alpha")).toDF("query_id", "query_text"))
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L, 12L))
  }

  test("unknown-vocabulary and empty queries produce no rows") {
    val idx = fitIndex()
    val qs = Seq((1L, "zzz unseen"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("query_id", "query_text")
    assert(idx.transform(qs).count() == 0)
  }

  test("incremental ingest equals the full rebuild (additive statistics)") {
    val docs = corpus.toDF("doc_id", "text")
    val full = Bm25Index.fit(docs, "doc_id", "text")
    val prior = Bm25Index.fit(docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text")
    val inc = prior.updatedWith(docs.filter($"doc_id" % 3 === 0), "doc_id", "text")
    assert(inc.docCount == full.docCount && inc.avgdl == full.avgdl,
      "N and avgdl must be EXACTLY the rebuild's (additive integer sums)")
    val qs = Seq((1L, "spark data stages"), (2L, "quiet shuffle"))
      .toDF("query_id", "query_text")
    def rows(i: Bm25Index) = i.asRows(qs).orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows(inc) == rows(full),
      "incrementally-built index must score identically to the rebuild")
    // the empty doc (counted in N but posting-less) is covered by the
    // avgdl equality above: the append's sumdl recovery contributes 0
    // for it while docCount still carries it
  }

  test("transformSchema validates input and declares the output shape") {
    val idx = fitIndex()
    val bad = intercept[IllegalArgumentException] {
      idx.transformSchema(Seq((1L, 2L)).toDF("query_id", "query_text").schema)
    }
    assert(bad.getMessage.contains("must be string"))
    val out = idx.transformSchema(Seq((1L, "x")).toDF("query_id", "query_text").schema)
    assert(out.fieldNames.toSeq == Seq("query_id", "candidate_ids", "candidate_scores"))
  }
}
