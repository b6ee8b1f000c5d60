package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{FastExpressions, TextFunctions => T}

/** PII scrubbing for corpus curation (the C4/Dolma-style masking pass):
  * replaces email addresses and IPv4 literals with fixed placeholder
  * tokens and reports per-doc match counts. Row-local regexp work —
  * shuffle-free, codegen'd, linear at any scale. The patterns are chosen
  * to evaluate identically under Java regex (Spark) and RE2 (the DuckDB
  * oracle): character classes, bounded repetition and word boundaries
  * only — no backreferences, no lookaround. */
case class MaskPii(
    textCol: String = "text",
    outCol: String = "text_masked") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, textCol)
    StructType(in ++ Seq(
      StructField("n_emails", IntegerType),
      StructField("n_ips", IntegerType),
      StructField(outCol, StringType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val emailMasked =
      regexp_replace(col(textCol), MaskPii.EmailRe, MaskPii.EmailToken)
    // n_ips counts AFTER the email mask: an IP embedded in an email
    // address is consumed by the <EMAIL> token, so the counts reconcile
    // exactly with the placeholder tokens the output actually contains.
    // Null text -> zero counts (never a null count), null masked text.
    df.withColumn("n_emails", coalesce(
        size(regexp_extract_all(col(textCol), lit(MaskPii.EmailRe), lit(0))),
        lit(0)))
      .withColumn("n_ips", coalesce(
        size(regexp_extract_all(emailMasked, lit(MaskPii.Ipv4Re), lit(0))),
        lit(0)))
      .withColumn(outCol,
        regexp_replace(emailMasked, MaskPii.Ipv4Re, MaskPii.IpToken))
  }
}

object MaskPii {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
}

/** Repetition-based quality signals for LLM pre-training corpora — the
  * Gopher/MassiveText repetition filters (Rae et al. 2021, §A1.1): the
  * fraction of characters covered by the single most-frequent word n-gram
  * (n small: catches boilerplate headers) and the fraction of characters
  * in n-grams that occur more than once (n larger: catches templated /
  * machine-generated spam). Documents dominated by repetition are dropped.
  *
  * Scale design: a document's n-gram counts are a ROW-LOCAL fact, so the
  * whole computation is one map over the corpus — the
  * [[graft.functions.RepetitionSignals]] expression normalizes, splits and
  * hash-counts each doc's grams in a single pass and returns all signals
  * as a flat long array. Zero shuffles, zero joins, zero windows; the
  * first cut of this op exploded grams through a (doc, n, gram)-keyed
  * groupBy and was 20× slower at sf0.1 — and at 100 TB that shuffle would
  * have carried ~3× the corpus in gram strings.
  *
  * All ratios are integer basis points over the normalized character count
  * (floor(chars*10000/totalChars)) so the DuckDB oracle matches bit-for-bit.
  */
case class RepetitionStats(
    textCol: String = "text",
    idCol: String = "doc_id",
    topNs: Seq[Int] = Seq(2, 3),
    dupNs: Seq[Int] = Seq(5),
    // Gopher table A1 thresholds: top 2-gram 0.20, top 3-gram 0.18,
    // dup 5-gram 0.15 — kept in basis points.
    topBpMax: Map[Int, Long] = Map(2 -> 2000L, 3 -> 1800L),
    dupBpMax: Map[Int, Long] = Map(5 -> 1500L)) extends EnsembleOp {

  require(topNs.nonEmpty || dupNs.nonEmpty, s"$name: no n-gram sizes configured")
  require(topNs.forall(topBpMax.contains) && dupNs.forall(dupBpMax.contains),
    s"$name: every configured n needs a threshold (topNs=$topNs topBpMax keys=" +
      s"${topBpMax.keys.toSeq.sorted}; dupNs=$dupNs dupBpMax keys=${dupBpMax.keys.toSeq.sorted})")
  private def allNs: Seq[Int] = (topNs ++ dupNs).distinct.sorted

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, textCol)
    requireCol(in, idCol)
    StructType(
      Seq(in(idCol), StructField("n_chars_norm", IntegerType)) ++
        topNs.map(n => StructField(s"top${n}_bp", LongType)) ++
        dupNs.map(n => StructField(s"dup${n}_bp", LongType)) :+
        StructField("keep", BooleanType, nullable = false))
  }

  override def transform(df: DataFrame): DataFrame = {
    // null text → empty doc: zero signals, bp columns null (0-char
    // denominator), keep=false — never a null verdict (EdgeCaseSpec)
    val sig = FastExpressions.repetitionSignals(
      coalesce(col(textCol), lit("")), allNs)
    val base = df.select(col(idCol), sig.as("_s"))
      .withColumn("_chars", element_at(col("_s"), 1))
    def bpOf(n: Int, dup: Boolean): Column = {
      val idx = 1 + 2 * allNs.indexOf(n) + (if (dup) 1 else 0) + 1
      // ANSI-safe: a 0-char doc has no ratio (null → keep coalesces false)
      when(col("_chars") > 0, T.bp(element_at(col("_s"), idx), col("_chars")))
    }
    val topCols = topNs.map(n => bpOf(n, dup = false).as(s"top${n}_bp"))
    val dupCols = dupNs.map(n => bpOf(n, dup = true).as(s"dup${n}_bp"))
    val keep = coalesce(
      (topNs.map(n => bpOf(n, dup = false) <= topBpMax(n)) ++
        dupNs.map(n => bpOf(n, dup = true) <= dupBpMax(n))
      ).reduce(_ && _), lit(false))
    base.select(
      col(idCol) +: col("_chars").cast("int").as("n_chars_norm") +:
        (topCols ++ dupCols) :+ keep.as("keep"): _*)
  }
}

/** Corpus-familiarity n-gram LM score — the CCNet idea (Wenzek et al.
  * 2019: score each document by how expected its n-grams are under a
  * language model fit on a reference corpus; unfamiliar text is low
  * quality or off-domain) recast integer-exact. libm `ln` is not
  * bit-portable across engines, so instead of log-perplexity the score is
  * the MEAN REFERENCE FREQUENCY of the document's word n-grams in integer
  * micros plus the OOV-gram count — the same "familiar text scores high,
  * gibberish scores low" ranking signal, with zero floats anywhere
  * (`sum_freq * 1e6 DIV n_grams` is pure BIGINT arithmetic on both
  * engines).
  *
  * Scale shape (identical to [[Decontaminate]]'s): the reference corpus
  * collapses to a (gram-digest → frequency) table bounded by the distinct
  * n-gram vocabulary, built with map-side partial aggregation; the scored
  * corpus explodes to (doc, gram-digest) pairs and meets the frequency
  * table in an equi-join whose shuffle carries 16-byte digests, never
  * gram text. AQE broadcasts the frequency table when it is small; when a
  * user fits on something huge the shuffle path is already correct.
  * Frequencies count digest PAIRS (two independent xxhash64s, shared with
  * Decontaminate's one definition) so a merged count needs a simultaneous
  * 128-bit collision — negligible at any corpus size.
  *
  * Output: (id, n_grams, oov_grams, sum_freq, mean_freq_micro). A gram is
  * OOV when its reference frequency is <= `oovMaxCount` (default 1: when
  * fitting on the scored corpus itself, a frequency-1 gram occurs nowhere
  * else). Documents shorter than n words have no grams and score 0.
  */
case class NgramLmScore(
    reference: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    refTextCol: String = "text",
    n: Int = 2,
    oovMaxCount: Long = 1L) extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")
  require(oovMaxCount >= 0, s"$name: oovMaxCount must be >= 0")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    require(reference.schema.fieldNames.contains(refTextCol),
      s"$name: '$refTextCol' missing in reference frame")
    StructType(Seq(
      in(idCol),
      StructField("n_grams", IntegerType, nullable = false),
      StructField("oov_grams", LongType, nullable = false),
      StructField("sum_freq", LongType, nullable = false),
      StructField("mean_freq_micro", LongType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    import Decontaminate.gramDigests
    val refFreq = reference
      .select(explode(gramDigests(col(refTextCol), n)).as("__gram"))
      .groupBy("__gram").agg(count(lit(1)).as("__freq"))
    val scored = df
      .select(col(idCol), explode(gramDigests(col(textCol), n)).as("__gram"))
      // left join: a gram absent from the reference scores frequency 0
      // (possible whenever reference != the scored corpus)
      .join(refFreq, Seq("__gram"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("__n"),
        sum(when(coalesce(col("__freq"), lit(0L)) <= oovMaxCount, 1L)
          .otherwise(0L)).as("__oov"),
        sum(coalesce(col("__freq"), lit(0L))).as("__sum"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).cast("int").as("n_grams"),
        coalesce(col("__oov"), lit(0L)).as("oov_grams"),
        coalesce(col("__sum"), lit(0L)).as("sum_freq"),
        when(coalesce(col("__n"), lit(0L)) > 0,
          NgramLmScore.microMean("__sum", "__n")).otherwise(0L)
          .as("mean_freq_micro"))
  }
}

object NgramLmScore {
  /** The ONE definition of the integer micro-mean, shared by the batch op
    * and [[graft.streaming.StreamingOps.lmScoreStream]] (the gramDigests
    * discipline). Overflow-safe: the naive `sum * 1000000 DIV n` wraps
    * BIGINT once sum exceeds ~9.2e12 — reachable when scoring against a
    * web-scale reference whose common bigrams carry 1e9+ counts — and a
    * wrapped mean silently INVERTS the familiarity ranking for exactly
    * the most-familiar documents. The quotient/remainder split computes
    * the identical floor(sum·10⁶/n) with every intermediate bounded by
    * max(sum, n·10⁶): exact to sum = Long.MaxValue at any document
    * length under ~9e12 grams. */
  def microMean(sumCol: String, nCol: String): org.apache.spark.sql.Column =
    expr(s"($sumCol DIV $nCol) * 1000000 + ($sumCol % $nCol) * 1000000 DIV $nCol")
}

/** Model-based quality scoring over hashed bag-of-words features — the
  * classifier-filter stage of public LLM curation pipelines (a linear
  * quality classifier over web text, the role fastText/logistic filters
  * play in GPT-3's and CCNet's pipelines; public method: hashing trick +
  * linear model, Weinberger et al. 2009).
  *
  * The featurizer needs NO fit and NO dictionary: feature b counts the
  * document's tokens whose content-addressed bucket
  * ([[graft.functions.TextFunctions.hashBucket]]) equals b — row-local,
  * shuffle-free, stable under repartitioning, the HashBucket discipline
  * applied per token. The fitted model is `numBuckets` coefficients + an
  * intercept (metadata scale, persists as plain doubles); scoring is ONE
  * sequential dot of the integer count vector against literal
  * coefficients plus the intercept — codegen'd, and bit-reproducible
  * cross-engine because the counts are exact integers and the dot is the
  * same left-fold both engines run (the ml_classifier oracle discipline;
  * the `keep` verdict is the margin's sign, so no transcendental crosses
  * engines). Cost: tokens hash once per row, but the histogram builds by
  * scanning the bucket array once PER BUCKET (`size(filter(bs, = b))`) —
  * O(rows × tokens × numBuckets) in long comparisons, the price of
  * staying inside codegen'd expressions (Catalyst has no in-place array
  * update to fold a one-pass count vector with). Fine at the default 64
  * buckets where the comparisons are branch-free long equality; a much
  * larger feature space wants a custom Expression that fills the count
  * array in one token pass before reaching for more buckets.
  */
case class TextQualityClassifier(
    coefficients: Seq[Double],
    intercept: Double,
    textCol: String = "text",
    numBuckets: Int = 64,
    salt: String = "graft-qc") extends EnsembleOp {

  require(coefficients.nonEmpty, s"$name: need at least one coefficient")
  require(coefficients.size == numBuckets,
    s"$name: ${coefficients.size} coefficients for $numBuckets buckets")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, textCol)
    StructType(in ++ Seq(
      StructField("margin", DoubleType),
      StructField("keep_quality", BooleanType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val margin = TextQualityClassifier.marginExpr(
      col(textCol), coefficients, intercept, numBuckets, salt)
    df.withColumn("margin", margin)
      .withColumn("keep_quality", col("margin") > 0.0)
  }
}

object TextQualityClassifier {
  import graft.functions.{TextFunctions => TF, VectorFunctions => V}
  import org.apache.spark.sql.Column

  /** The hashed count vector as a FIXED-ORDER double array (bucket 0..B-1)
    * — fixed order is what makes the margin a deterministic sequential
    * fold instead of an order-dependent float sum. Backed by the fused
    * [[graft.functions.HashBucketCounts]] expression: one loop per row,
    * O(tokens + buckets), each token md5-hashed once. */
  def featureExpr(text: Column, numBuckets: Int, salt: String): Column =
    graft.functions.FastExpressions.hashBucketCounts(text, salt, numBuckets)

  /** The original HOF formulation — O(tokens × buckets) per row — kept
    * as the independent reference for CodegenSpec's fused ≡ HOF pin. */
  private[graft] def featureExprHof(text: Column, numBuckets: Int,
      salt: String): Column = {
    val buckets = transform(TF.words(text),
      w => TF.hashBucket(w, salt, numBuckets))
    element_at(transform(array(buckets), bs =>
      transform(sequence(lit(0), lit(numBuckets - 1)), b =>
        size(filter(bs, x => x === b)).cast("double"))), 1)
  }

  def marginExpr(text: Column, coefficients: Seq[Double], intercept: Double,
      numBuckets: Int, salt: String): Column =
    V.dot(featureExpr(text, numBuckets, salt),
      typedLit(coefficients.toArray)) + lit(intercept)

  /** Fit the linear model with MLlib logistic regression over the hashed
    * features (distributed fit; what persists is the coefficient vector).
    * `labelCol` is the supervision signal — in a real pipeline, a sample
    * of curated-vs-crawl documents. */
  def train(df: DataFrame, labelCol: String, textCol: String = "text",
      numBuckets: Int = 64, salt: String = "graft-qc",
      maxIter: Int = 20, regParam: Double = 0.01): TextQualityClassifier = {
    val feats = df
      // a null text has no features — MLlib would NPE on a null vector,
      // so null-text rows are excluded from the fit (scoring still emits
      // NULL for them, the op's null contract)
      .filter(col(textCol).isNotNull)
      .select(col(labelCol).cast("double").as("__label"),
        org.apache.spark.ml.functions.array_to_vector(
          featureExpr(col(textCol), numBuckets, salt)).as("__features"))
    val m = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("__label").setFeaturesCol("__features")
      .fit(feats)
    TextQualityClassifier(m.coefficients.toArray.toSeq, m.intercept,
      textCol, numBuckets, salt)
  }
}

/** The heuristic quality-signal vector every curation pass starts from
  * (the C4/Gopher-style length + lexical-diversity screen; the fitted
  * complement is [[TextQualityClassifier]]): token count, type-token
  * ratio and mean word length in integer basis points, a composite
  * score, and the keep verdict. All integer arithmetic over the shared
  * normal form ([[graft.functions.TextFunctions.words]]), so the whole
  * vector replays exactly in SQL — the `text_quality` oracle — and,
  * being row-local and deterministic, it is a valid [[SignalReconcile]]
  * signal: recomputing a row can never disagree with a carried copy.
  *
  * `keyCols` pass through untouched (identity columns the signal table
  * is keyed by — (id) for a plain table, (id, content_hash) when the
  * table reconciles against a content-addressed corpus). Row-local,
  * shuffle-free, codegen'd — linear at any scale. */
case class QualitySignals(
    textCol: String = "text",
    keyCols: Seq[String] = Seq("doc_id"),
    minTokens: Long = 20L,
    minTtrBp: Long = 1500L) extends EnsembleOp {

  require(keyCols.nonEmpty, s"$name: need at least one key column")

  override def transformSchema(in: StructType): StructType = {
    keyCols.foreach(requireCol(in, _)); requireCol(in, textCol)
    StructType(keyCols.map(in(_)) ++ Seq(
      StructField("n_tokens", LongType),
      StructField("ttr_bp", LongType),
      StructField("mwl_bp", LongType),
      StructField("quality_score", LongType),
      StructField("keep", BooleanType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val ws = T.words(col(textCol))
    val nTok = size(ws).cast("long")
    val ttrBp = T.bp(size(array_distinct(ws)), size(ws))
    val mwlBp = T.bp(aggregate(ws, lit(0L), (acc, w) => acc + length(w)), size(ws))
    val score = least(nTok, lit(100L)) +
      floor(ttrBp / 100).cast("long") + floor(mwlBp / 1000).cast("long")
    df.select(keyCols.map(col) ++ Seq(
      nTok.as("n_tokens"), ttrBp.as("ttr_bp"), mwlBp.as("mwl_bp"),
      score.as("quality_score"),
      // never a NULL verdict (the RepetitionStats contract): a null-text
      // doc measures nothing (null signals) but must still fall on ONE
      // side of a keep/reject split — a null keep fails both filter(keep)
      // and filter(!keep), silently losing the row from both corpora
      coalesce(nTok >= minTokens && ttrBp >= minTtrBp, lit(false))
        .as("keep")): _*)
  }
}
