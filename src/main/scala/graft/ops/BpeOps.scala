package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TextFunctions => T}

/** Byte-pair-encoding vocabulary induction over a document corpus
  * (Sennrich, Haddow, Birch, "Neural Machine Translation of Rare Words
  * with Subword Units", ACL 2016) — tokenizer TRAINING as a corpus
  * operator, the stage an LLM data pipeline runs between curation and
  * chunk/pack (the reference's dataloader ops consume its output side:
  * EmbeddingLookup/Padding over token ids).
  *
  * Shape, per classic BPE: merges are learned over the WORD-TYPE
  * frequency table, not the corpus — |types| ≪ |tokens| (a 100 TB corpus
  * has billions of documents but a word-type table in the hundreds of
  * millions at worst, and one groupBy builds it). Each round is
  *
  *   explode adjacent token pairs (weighted by type freq)
  *     → groupBy(pair).sum(freq)                  [map-side combined]
  *     → global argmax                            [orderBy+limit(1) over
  *                                                 the pair AGGREGATE —
  *                                                 top-1 of a shuffled
  *                                                 aggregate, not a sort
  *                                                 of the corpus]
  *     → broadcast the winning pair as two literals
  *     → re-merge every type's token array map-side (one HOF fold)
  *
  * so the driver holds ONLY the merge list (numMerges pairs — metadata),
  * and the corpus is touched exactly once (the initial word count).
  * Lineage is localCheckpoint-truncated every `checkpointEvery` rounds:
  * numMerges chained HOF rewrites would otherwise nest the logical plan
  * numMerges deep and stall the analyzer.
  *
  * Determinism: ties on pair count break by (left, right) string order,
  * so the learned vocabulary is a pure function of the corpus — stable
  * under reruns, partitioning and cluster size. BpeSpec pins the merge
  * list against an independent single-node reference implementation, and
  * the driver query `text_bpe_vocab` re-proves that equality in-artifact
  * at every scale factor (same discipline as dedup_simhash_check).
  */
object BpeTrainer {

  /** End-of-word marker (Sennrich's `</w>`): lets the vocabulary
    * distinguish "er" mid-word from "er" word-finally. */
  val EndOfWord = "</w>"

  /** Initial symbols of a word: CODE POINTS, not UTF-16 code units —
    * Spark's `split(w, "")` splits by code point, so the local reference
    * implementations must too, or a supplementary-plane character (emoji
    * etc.) would split into surrogate halves locally, diverge from the
    * distributed path, and abort `text_bpe_vocab`'s equality require. */
  private[ops] def codePointSymbols(w: String): Vector[String] =
    w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector

  /** Word-type frequency table: (tokens array<string>, freq long). */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(T.words(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__freq"))
      .select(concat(split(col("__w"), ""), array(lit(EndOfWord))).as("__toks"),
        col("__freq"))

  /** One greedy left-to-right merge pass of pair (a, b) over a token
    * array, as a pure fold expression: state = (rebuilt prefix, pending
    * token); a pending `a` followed by `b` emits the merged symbol and
    * clears — so overlapping runs merge leftmost-first ("aaa" + (a,a) →
    * ["aa","a"]), the BPE convention. */
  def mergePair(toks: Column, a: String, b: String): Column = {
    def st(out: Column, pend: Column) = struct(out.as("out"), pend.as("pend"))
    val zero = st(array().cast(ArrayType(StringType)),
      lit(null).cast(StringType))
    aggregate(toks, zero,
      (s, t) => {
        val out = s.getField("out"); val p = s.getField("pend")
        when(p.isNull, st(out, t))
          .when(p === lit(a) && t === lit(b),
            st(concat(out, array(lit(a + b))), lit(null).cast(StringType)))
          .otherwise(st(concat(out, array(p)), t))
      },
      s => when(s.getField("pend").isNull, s.getField("out"))
        .otherwise(concat(s.getField("out"), array(s.getField("pend")))))
  }

  /** Learn `numMerges` merges. Stops early when no pair reaches
    * `minPairCount` (corpus exhausted into whole words). BATCHED: each
    * Spark counting pass yields as many consecutive greedy merges as
    * [[planBatch]] can prove safe, so the driver coordinates
    * merges/avg-batch jobs instead of one job PER merge — the round-11
    * scale nit (a 32k-merge vocab was 32k driver-coordinated jobs; the
    * batched trainer is provably merge-list-identical, spec-pinned both
    * against [[fitLocal]] and on the job count). */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, checkpointEvery: Int = 8,
      batchWindow: Int = 64): Seq[(String, String)] =
    fitWithStats(docs, textCol, numMerges, minPairCount, checkpointEvery,
      batchWindow)._1

  /** [[fit]] plus the number of counting passes (= Spark collect jobs)
    * it ran — the observable the job-count spec pins. */
  private[ops] def fitWithStats(docs: DataFrame, textCol: String,
      numMerges: Int, minPairCount: Long = 2L, checkpointEvery: Int = 8,
      batchWindow: Int = 64): (Seq[(String, String)], Int) = {
    require(numMerges >= 1, "BpeTrainer: numMerges must be >= 1")
    require(checkpointEvery >= 1, "BpeTrainer: checkpointEvery must be >= 1")
    require(batchWindow >= 1, "BpeTrainer: batchWindow must be >= 1")
    var wf = wordTypes(docs, textCol).localCheckpoint(true)
    // the superseded checkpoint's blocks are released once the next one
    // materializes — otherwise numMerges/checkpointEvery stale copies of
    // the type table would pile up in storage over a long fit
    var prevCheckpoint = wf
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var sinceCheckpoint = 0
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      // ONE aggregate job per round: the (cnt desc, a, b)-sorted top
      // window plus one overflow row, whose count upper-bounds every
      // uncollected pair (planBatch's out-of-window bound)
      val top = wf
        .filter(size(col("__toks")) > 1)
        .select(col("__freq"), explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum("__freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(batchWindow + 1).collect()
      rounds += 1
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minPairCount)
        exhausted = true
      else {
        val collected = top.take(batchWindow).map(r =>
          ((r.getAs[String]("a"), r.getAs[String]("b")), r.getAs[Long]("cnt"))).toSeq
        val tailCnt =
          if (top.length > batchWindow) top.last.getAs[Long]("cnt") else 0L
        val batch = planBatch(collected, tailCnt,
          numMerges - merges.size, minPairCount)
        merges ++= batch
        wf = batch.foldLeft(wf) { case (f, (a, b)) =>
          f.withColumn("__toks", mergePair(col("__toks"), a, b))
        }
        sinceCheckpoint += batch.size
        // truncate lineage so plan depth stays bounded by checkpointEvery
        if (sinceCheckpoint >= checkpointEvery) {
          wf = wf.localCheckpoint(true)
          prevCheckpoint.unpersist(blocking = false)
          prevCheckpoint = wf
          sinceCheckpoint = 0
        }
      }
    }
    (merges.toSeq, rounds)
  }

  /** The driver-side batch plan over one counting pass: the maximal
    * PREFIX of the sorted pair table that is provably the next run of
    * serial greedy choices — merge-list-identical to one-merge-per-pass
    * by construction. `collected` is the (cnt desc, a asc, b asc)-sorted
    * window; `tailCnt` bounds every pair OUTSIDE it (the overflow row's
    * count; 0 when the table fit the window).
    *
    * A candidate c_i extends the batch iff, in the state after applying
    * the already-accepted c_1..c_{i-1}, serial greedy's argmax is still
    * exactly c_i. Three facts close that proof:
    *
    *  1. Merging elsewhere never CREATES an occurrence of a pair that
    *     shares no token with it, and destroys occurrences only of
    *     pairs that do — so a candidate token-disjoint from every
    *     accepted merge (and from their merged symbol strings) keeps
    *     its exact count, while any pair BELOW it in sort order can
    *     only have fallen further. A candidate that DOES share a token
    *     has an unknown (reduced) count, so the scan must STOP there —
    *     skipping it could skip serial's true next choice.
    *  2. A pair CREATED by accepted merge q = (a,b) involves its merged
    *     symbol s: each (x, s) occurrence was an x·a·b trigram, so
    *     count(x, s) ≤ count(x, a); symmetrically count(s, x) ≤
    *     count(b, x), and (s, s') pairs reduce to count(b, a') — all
    *     bounded by pre-state counts with a or b on the matching side,
    *     hence by max(collected pairs ending at a, collected pairs
    *     starting at b, tailCnt). A candidate accepted after q must
    *     STRICTLY exceed that bound (ties lose to the created pair's
    *     possibly-smaller lexicographic key).
    *  3. Pairs outside the window are ≤ tailCnt < the window's counts,
    *     so the prefix is contiguous in serial order.
    */
  private[ops] def planBatch(collected: Seq[((String, String), Long)],
      tailCnt: Long, limit: Int, minPairCount: Long): Seq[(String, String)] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val usedTokens = scala.collection.mutable.HashSet.empty[String]
    val mergedSyms = scala.collection.mutable.HashSet.empty[String]
    var createdUB = Long.MinValue
    val it = collected.iterator
    var stop = false
    while (!stop && it.hasNext && accepted.size < limit) {
      val ((a, b), cnt) = it.next()
      if (cnt < minPairCount) stop = true
      else if (accepted.nonEmpty &&
          (usedTokens(a) || usedTokens(b) || mergedSyms(a) || mergedSyms(b) ||
           cnt <= createdUB)) stop = true
      else {
        accepted += ((a, b))
        usedTokens += a += b
        mergedSyms += (a + b)
        val ubLeft = collected.collect {
          case ((_, r), c) if r == a => c }.maxOption.getOrElse(0L)
        val ubRight = collected.collect {
          case ((l, _), c) if l == b => c }.maxOption.getOrElse(0L)
        createdUB = math.max(createdUB,
          math.max(tailCnt, math.max(ubLeft, ubRight)))
      }
    }
    accepted.toSeq
  }

  /** Independent single-node reference trainer over a word-frequency map
    * (plain collections, no Spark) — the evidence twin: the driver query
    * `text_bpe_vocab` REQUIRES the distributed merge list to equal this
    * one on the corpus's (tiny, type-level) frequency table, and BpeSpec
    * pins both against hand-worked examples. Same contract: argmax pair
    * by (count desc, left asc, right asc); greedy left-to-right merge. */
  def fitLocal(wordFreqs: Map[String, Long], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    var wf: Map[Vector[String], Long] = wordFreqs.toSeq
      .map { case (w, f) => (codePointSymbols(w) :+ EndOfWord) -> f }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continueLoop = true
    while (out.length < numMerges && continueLoop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      wf.foreach { case (toks, f) =>
        toks.indices.dropRight(1).foreach { i =>
          val p = (toks(i), toks(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) continueLoop = false
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < minPairCount) continueLoop = false
        else {
          out += ((a, b))
          wf = wf.toSeq.map { case (toks, f) =>
            val nb = Vector.newBuilder[String]
            var pend: String = null
            toks.foreach { t =>
              if (pend == null) pend = t
              else if (pend == a && t == b) { nb += (a + b); pend = null }
              else { nb += pend; pend = t }
            }
            if (pend != null) nb += pend
            nb.result() -> f
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        }
      }
    }
    out.toSeq
  }
}

/** Apply a learned BPE merge list: text → subword token arrays.
  *
  * Two execution strategies, chosen by merge-list size:
  *
  *  - ≤ `maxExprMerges`: the merge passes chain as [[BpeTrainer.mergePair]]
  *    fold expressions — fully codegen'd, zero serialization, the
  *    preferred path for the modest vocabularies of the driver queries.
  *  - above it: the fused codegen'd kernel
  *    ([[graft.functions.BpeTokens]]) applying the SAME algorithm
  *    (each merge in learned order, one greedy left-to-right pass —
  *    subword-nmt's apply_bpe semantics, deliberately NOT the
  *    priority-queue variant, which can diverge from in-order apply on
  *    adversarial words) with a per-task word-type memo: word types
  *    repeat Zipf-style, so each distinct type tokenizes once per task.
  *    A 32k-merge vocabulary cannot be a 32k-deep expression tree —
  *    data-dependent iteration lives in the expression's `compute`
  *    loop instead, inside WholeStageCodegen (formerly a Scala UDF;
  *    the encoder round-trip was the last `udf(` in product code).
  *    Both strategies are value-identical BY CONSTRUCTION — the word
  *    kernel is one shared method — and BpeSpec pins the equality on a
  *    trained corpus.
  *
  * Scale: map-side only — no shuffle at any vocabulary size; the rank
  * map broadcast is |merges| strings (metadata).
  */
case class BpeTokenize(
    merges: Seq[(String, String)],
    textCol: String,
    outputCol: String = "bpe_tokens",
    maxExprMerges: Int = 64) extends EnsembleOp {

  require(merges.nonEmpty, s"$name: empty merge list")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, textCol)
    require(!in.fieldNames.contains(outputCol),
      s"$name: output column '$outputCol' collides with the input schema")
    StructType(in :+ StructField(outputCol,
      ArrayType(StringType, containsNull = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    transformSchema(df.schema)
    val words = T.words(col(textCol))
    if (merges.length <= maxExprMerges) {
      // per word: chars+</w>, then the merge passes in learned order;
      // flatten word-level token arrays back to one doc-level array
      val perWord = org.apache.spark.sql.functions.transform(words, w =>
        merges.foldLeft(
          concat(split(w, ""), array(lit(BpeTrainer.EndOfWord))): Column) {
          case (toks, (a, b)) => BpeTrainer.mergePair(toks, a, b)
        })
      // isNull joins the guard so NULL text yields [] here exactly as in
      // the closure strategy (otherwise flatten(null) would propagate
      // NULL and the two documented-identical strategies would diverge)
      df.withColumn(outputCol,
        when(col(textCol).isNull || length(trim(col(textCol))) === 0,
          array().cast(ArrayType(StringType)))
          .otherwise(flatten(perWord)))
    } else {
      // the fused codegen'd kernel ([[graft.functions.BpeTokens]] —
      // applyWord + per-task word-type memo inside WholeStageCodegen, no
      // ScalaUDF encoder round-trip); the null→[] guard mirrors the
      // expression-fold branch so the two strategies stay value-identical
      df.withColumn(outputCol,
        when(col(textCol).isNull, array().cast(ArrayType(StringType)))
          .otherwise(graft.functions.FastExpressions
            .bpeTokens(col(textCol), merges)))
    }
  }
}

object BpeTokenize {
  /** The exact local mirror of [[TextFunctions.normalize]] (lower + trim
    * + whitespace collapse); Locale.ROOT so lowering is locale-stable
    * like Spark's UTF8String lower. */
  def normalizeLocal(s: String): String =
    s.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")

  /** Single-node sequential BPE apply for ONE word: each merge in learned
    * order, one greedy left-to-right pass — value-identical to folding
    * [[BpeTrainer.mergePair]] expressions, and the independent reference
    * implementation BpeSpec pins both execution strategies against. */
  def applyWord(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks = BpeTrainer.codePointSymbols(w) :+ BpeTrainer.EndOfWord
    merges.foreach { case (a, b) =>
      if (toks.length > 1) {
        val out = Vector.newBuilder[String]
        var pend: String = null
        toks.foreach { t =>
          if (pend == null) pend = t
          else if (pend == a && t == b) { out += (a + b); pend = null }
          else { out += pend; pend = t }
        }
        if (pend != null) out += pend
        toks = out.result()
      }
    }
    toks
  }
}
