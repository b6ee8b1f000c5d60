package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{filter => arrayFilter}
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TextFunctions => T, TopKAggregator}

/** BM25 lexical top-k retrieval — the sparse/keyword complement to the
  * dense ANN family ([[TopKRetrieval]]/[[AnnLsh]]/[[AnnIvf]]/[[AnnIvfPq]]).
  * The reference serves only dense FAISS indexes
  * (/root/reference/merlin/systems/dag/ops/faiss.py:90-112); a
  * training-data pipeline also needs lexical search (oracle mining for
  * retrieval training sets, eval-set leakage probes by keyword). Scoring
  * follows Robertson–Spärck Jones BM25 with the Lucene `ln(1 + …)` idf
  * floor (always ≥ 0, so low-df terms can never *subtract* relevance).
  *
  * Physical shape — inverted index as a join, never a scan-per-query:
  *   1. fit: one groupBy((doc, term)) over the exploded corpus builds the
  *      postings list (term, doc, tf, dl) — ∝ corpus tokens, the index
  *      build cost. The per-term document frequency table (∝ vocabulary)
  *      and the two scalars (N, avgdl) are fitted alongside.
  *   2. search: query terms (tiny) ⋈ df table, then ONE equi-join on
  *      `__term` against postings — candidate rows ∝ postings of the
  *      queried terms only (the inverted-index property). With postings
  *      persisted bucketed by `__term`, the join is co-located and the
  *      probe touches only matching buckets.
  *   3. partial-agg sum per (query, doc), then the bounded-heap
  *      [[TopKAggregator]] per query — no global sort, no full-candidate
  *      window at any point.
  *
  * Scores are ENGINE-PORTABLE fixed-point longs: each matched term
  * contributes `round(qtf * idf6 * sat)` where `idf6 = round(1e6 *
  * ln(1 + (N - df + 0.5)/(df + 0.5)))` and `sat` is the usual tf
  * saturation `tf(k1+1) / (tf + k1(1-b+b·dl/avgdl))`. Per-term rounding
  * before the sum makes the total independent of summation order (long
  * addition is associative where double addition is not), so the same
  * number falls out of any engine that mirrors the expression — the
  * integer-cents discipline of [[graft.functions.TextFunctions]].
  */
case class Bm25Index(
    postings: DataFrame, // (__term, __doc_id, __tf, __dl)
    dfreq: DataFrame,    // (__term, __df)
    docCount: Long,
    avgdl: Double,
    queryIdCol: String,
    queryTextCol: String,
    k: Int = 10,
    k1: Double = 1.2,
    b: Double = 0.75,
    outputCol: String = "candidate_ids") extends EnsembleOp {

  require(k >= 1, s"$name: k must be >= 1")
  require(k1 > 0 && b >= 0 && b <= 1, s"$name: need k1 > 0 and b in [0,1]")
  require(docCount >= 1, s"$name: empty corpus — fit over at least one document")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, queryIdCol); requireCol(in, queryTextCol)
    require(in(queryTextCol).dataType == StringType,
      s"$name: query text column '$queryTextCol' must be string, " +
        s"got ${in(queryTextCol).dataType.sql}")
    StructType(Seq(
      in(queryIdCol),
      StructField(outputCol, ArrayType(LongType)),
      StructField("candidate_scores", ArrayType(DoubleType))))
  }

  override def transform(queries: DataFrame): DataFrame = {
    transformSchema(queries.schema)
    // query-side term frequencies; empty/null text simply yields no terms
    // (and therefore no result rows for that query — documented contract)
    val qt = queries
      .select(col(queryIdCol),
        explode(arrayFilter(T.words(col(queryTextCol)), w => length(w) > 0))
          .as("__term"))
      .groupBy(col(queryIdCol), col("__term"))
      .agg(count(lit(1)).as("__qtf"))
    // Lucene-floored idf in 1e-6 fixed point. Shapes mirror the oracle
    // SQL token-for-token so IEEE arithmetic reproduces bit-exactly; ln is
    // the one libm-implementation-defined call, neutralized by the 1e6
    // rounding (a flip needs the product within 1 ulp of a .5 boundary).
    val idf6 = round(lit(1e6) *
      log(lit(1.0) + ((lit(docCount) - col("__df")) + lit(0.5)) / (col("__df") + lit(0.5))))
      .cast("long")
    // the weighted query-term table is tiny (terms per query set); the
    // broadcast makes the postings probe a map-side hash join
    val qw = broadcast(qt.join(dfreq, "__term").withColumn("__idf6", idf6))
    val sat = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / lit(avgdl))))
    val contrib = round((col("__qtf") * col("__idf6")).cast("double") * sat).cast("long")
    val scored = postings.join(qw, "__term")
      .select(col(queryIdCol), col("__doc_id"), contrib.as("__c"))
      .groupBy(col(queryIdCol), col("__doc_id"))
      .agg(sum(col("__c")).as("__score_fp"))
    val topk = udaf(new TopKAggregator(k))
    // fixed-point longs ride the aggregator's double slot exactly (scores
    // are far below 2^53); ties break (score DESC, doc_id ASC)
    scored.groupBy(col(queryIdCol))
      .agg(topk(col("__doc_id"), col("__score_fp").cast("double")).as("__top"))
      .select(col(queryIdCol),
        col("__top.ids").as(outputCol),
        col("__top.scores").as("candidate_scores"))
  }

  /** Incremental index ingest — the lexical twin of
    * [[AnnIvf.updatedIndex]] (and of [[IncrementalDedup]]'s discipline):
    * append a DISJOINT new document batch to the fitted index without
    * touching the existing postings. Every statistic is additive, so the
    * updated index EQUALS a full rebuild over the union exactly
    * (spec-pinned): postings rows are per-(doc, term) and the batches
    * are disjoint; document frequencies sum; N sums; and avgdl's
    * numerator is recovered EXACTLY from the stored postings (one
    * distinct-(doc, dl) aggregate over index-scale rows — empty docs
    * contribute 0 to the sum and ride in through `docCount`, which is
    * stored). Cost ∝ the batch's tokens plus one index-scale aggregate;
    * the corpus is never re-tokenized.
    *
    * The disjointness requirement is the ingest contract: re-ingesting
    * an existing doc id would double its postings — run the dedup layer
    * ([[IncrementalDedup]]) upstream, exactly as a real ingest pipeline
    * does. */
  def updatedWith(newDocs: DataFrame, docIdCol: String, textCol: String): Bm25Index = {
    import graft.functions.{TextFunctions => TF}
    val toks = newDocs.select(col(docIdCol).cast("long").as("__doc_id"),
      arrayFilter(TF.words(col(textCol)), w => length(w) > 0).as("__ws"))
    val bPostings = toks
      .select(col("__doc_id"), size(col("__ws")).as("__dl"),
        explode(col("__ws")).as("__term"))
      .groupBy(col("__doc_id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val bDf = bPostings.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val mergedDf = dfreq.withColumnRenamed("__df", "__dfa")
      .join(bDf.withColumnRenamed("__df", "__dfb"), Seq("__term"), "full_outer")
      .select(col("__term"),
        (coalesce(col("__dfa"), lit(0L)) + coalesce(col("__dfb"), lit(0L))).as("__df"))
    val oldSumDl = Option(postings.select(col("__doc_id"), col("__dl")).distinct()
      .agg(sum(col("__dl"))).head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val b2 = toks.agg(count(lit(1)).as("n"),
      sum(coalesce(size(col("__ws")), lit(0))).as("sdl")).head()
    val nNew = docCount + b2.getLong(0)
    val sumNew = oldSumDl + (if (b2.isNullAt(1)) 0L else b2.getLong(1))
    copy(postings = postings.unionByName(bPostings), dfreq = mergedDf,
      docCount = nNew, avgdl = sumNew.toDouble / nNew)
  }

  /** Relational form: one row per (query, rank, doc, score_fp) — the
    * scalar shape the correctness harness sorts and hashes. */
  def asRows(queries: DataFrame): DataFrame =
    transform(queries).select(col(queryIdCol),
      posexplode(arrays_zip(col(outputCol), col("candidate_scores")))
        .as(Seq("pos", "pair")))
      .select(col(queryIdCol), (col("pos") + 1).as("rank"),
        col(s"pair.$outputCol").as("doc_id"),
        col("pair.candidate_scores").cast("long").as("score_fp"))
}

object Bm25Index {
  /** The four additive statistics of a document set: (postings, dfreq,
    * docCount, sumDl). Over DISJOINT doc batches every one of them sums
    * exactly — postings rows are per-(doc, term), document frequencies
    * are long counts, and sumDl is a long token total — which is what
    * lets a streaming sink persist each batch's stats as an immutable
    * DELTA and recover the union index by unioning deltas (postings),
    * summing dfreq per term, and adding the two scalars, bit-identical
    * to a from-scratch [[fit]]. Tokenization is the canonical
    * [[graft.functions.TextFunctions.words]] normal form shared with
    * the dedup family. Cost ∝ the input's tokens. */
  def stats(docs: DataFrame, docIdCol: String, textCol: String)
      : (DataFrame, DataFrame, Long, Long) = {
    val toks = docs.select(col(docIdCol).cast("long").as("__doc_id"),
      arrayFilter(T.words(col(textCol)), w => length(w) > 0).as("__ws"))
    val postings = toks
      .select(col("__doc_id"), size(col("__ws")).as("__dl"),
        explode(col("__ws")).as("__term"))
      .groupBy(col("__doc_id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = postings.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val s = toks.agg(count(lit(1)).as("n"),
      sum(coalesce(size(col("__ws")), lit(0))).as("sdl")).head()
    (postings, dfreq, s.getLong(0),
      if (s.isNullAt(1)) 0L else s.getLong(1))
  }

  /** [[stats]] with the two scalar aggregates OBSERVED on the tokenize
    * stage instead of computed by their own action: returns (postings,
    * observation), where the observation yields `n` / `sdl` — the exact
    * [[stats]] expressions over the exact same rows, so the values are
    * bit-identical — once ANY action over `postings` completes. Lets a
    * streaming commit pay ONE tokenize pass (the postings write) where
    * stats-then-write paid two, and drops the separate stats job
    * (guide §1.2: remove passes). */
  def statsObserved(docs: DataFrame, docIdCol: String, textCol: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val toks = docs.select(col(docIdCol).cast("long").as("__doc_id"),
      arrayFilter(T.words(col(textCol)), w => length(w) > 0).as("__ws"))
      .observe(obs, count(lit(1)).as("n"),
        sum(coalesce(size(col("__ws")), lit(0))).as("sdl"))
    val postings = toks
      .select(col("__doc_id"), size(col("__ws")).as("__dl"),
        explode(col("__ws")).as("__term"))
      .groupBy(col("__doc_id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    (postings, obs)
  }

  /** Build the inverted index over a corpus: postings + document
    * frequencies + (N, avgdl). Tokenization is the canonical
    * [[TextFunctions.words]] normal form shared with the dedup family.
    * Null/empty documents count toward N (and pull avgdl down) but emit
    * no postings — they are simply unfindable. */
  def fit(docs: DataFrame, docIdCol: String, textCol: String,
      queryIdCol: String = "query_id", queryTextCol: String = "query_text",
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): Bm25Index = {
    val (postings, dfreq, n, sumDl) = stats(docs, docIdCol, textCol)
    require(n >= 1, "Bm25Index.fit: empty corpus")
    // exact-integer avgdl: long sum / long count, ONE double division —
    // any engine computing sum(dl)/N from the same integers gets the
    // identical double (unlike a running double mean, which is
    // accumulation-order-dependent)
    Bm25Index(postings, dfreq, n, sumDl.toDouble / n,
      queryIdCol, queryTextCol, k, k1, b)
  }
}
