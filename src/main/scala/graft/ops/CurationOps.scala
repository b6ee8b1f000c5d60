package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{transform => arrayTransform}
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Benchmark-decontamination: flag every training document that shares at
  * least one word n-gram with an evaluation corpus — the standard
  * pre-training hygiene step (the GPT-3 appendix's 13-gram overlap rule;
  * public method). A document is contaminated iff an n-gram of its
  * normalized text appears in the eval set's n-gram inventory, decided on
  * a PAIR of independent 64-bit gram digests — textual equality up to a
  * simultaneous 128-bit collision (P ≈ n²/2^129: negligible even at 10^13
  * corpus grams, where a single 64-bit digest would already birthday-
  * collide), while the shuffle still carries 16 bytes per gram, never
  * text.
  *
  * Scale shape: the eval side collapses to DISTINCT n-gram digests
  * (eval sets are MB-scale against a 100 TB corpus), the train side
  * explodes to (doc, gram digest) pairs, and contamination is a semi-join
  * on the digest — an equi-join whose shuffle carries 8-byte hashes, not
  * text, proportional to corpus tokens. No broadcast assumption: if the
  * eval inventory is small Spark's planner broadcasts it on its own; if a
  * user decontaminates against something huge, the shuffle path is
  * already correct.
  *
  * Output: one row per train document — (id, n_grams, matched_grams,
  * contaminated) — so callers can either drop contaminated docs or audit
  * the overlap rate. Documents shorter than n grams have no n-grams and
  * are clean by definition (matching the public rule).
  */
case class Decontaminate(
    eval: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    evalTextCol: String = "text",
    n: Int = 13) extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    require(eval.schema.fieldNames.contains(evalTextCol),
      s"$name: '$evalTextCol' missing in eval frame")
    StructType(Seq(
      in(idCol),
      StructField("n_grams", IntegerType),
      StructField("matched_grams", LongType, nullable = false),
      StructField("contaminated", BooleanType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    import Decontaminate.gramDigests
    val evalGrams = eval
      .select(explode(gramDigests(col(evalTextCol), n)).as("__gram"))
      .distinct()
    val matches = df
      .select(col(idCol), explode(gramDigests(col(textCol), n)).as("__gram"))
      .join(evalGrams, Seq("__gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("matched_grams"))
    // the gram COUNT needs no shingle materialization: it is just the
    // token count minus n−1 (shingling the text twice measured ~2× the
    // whole op at sf0.1)
    val nGrams = greatest(T.tokenCount(col(textCol)) - (n - 1), lit(0))
    df.select(col(idCol), nGrams.cast("int").as("n_grams"))
      .join(matches, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"),
        (coalesce(col("matched_grams"), lit(0L)) > 0).as("contaminated"))
  }
}

object Decontaminate {
  /** The ONE definition of the contamination digest — two independent
    * 64-bit xxhash64 digests per word n-gram (128-bit join key). Shared
    * by the batch op and [[graft.streaming.StreamingOps.decontaminateStream]]
    * so a seed or shingling change can never make the stream twin
    * silently stop matching the batch inventory. */
  def gramDigests(text: Column, n: Int): Column =
    arrayTransform(T.wordShingles(text, n),
      g => struct(xxhash64(g).as("h1"), xxhash64(g, lit(7919)).as("h2")))
}

/** [[Decontaminate]] with a Bloom prefilter — the beyond-broadcast scale
  * path. The exact op's semi-join is already right when the eval gram
  * inventory fits a broadcast hash relation; past that (billions of eval
  * grams — a large held-out suite against a 100 TB corpus) the hash
  * relation is tens of GB while a Bloom sketch of the same inventory at
  * 1% false-positive rate is ~16× smaller (~1.2 GB per 10⁹ grams).
  *
  * Two stages, one contract:
  *   1. PREFILTER (map-side, shuffle-free): broadcast the sketch, keep a
  *      document iff ANY of its gram digests might be in the eval set.
  *      Bloom filters have NO false negatives, so every document dropped
  *      here is exactly clean — the verdict for the overwhelming majority
  *      of a healthy corpus, decided without moving a byte of it.
  *   2. VERIFY (exact): only the suspects' grams flow into the exact
  *      128-bit digest semi-join, so the corpus-side shuffle is
  *      ∝ (true contamination + fpp·docs), not ∝ corpus.
  * Final labels are therefore IDENTICAL to [[Decontaminate]]'s — the
  * sketch changes where the work happens, never the answer (oracled by
  * the same SQL, pinned by spec).
  *
  * The membership probe is a scalar Scala function over each document's
  * digest array (one invocation per document, row-local): Spark's
  * codegen'd `might_contain` expression only accepts the internal
  * aggregate's serialization, not the public `util.sketch.BloomFilter`
  * this op fits with `df.stat.bloomFilter` — the same documented-reason
  * UDF exception as the BPE tokenize closure. The sketch fit itself is a
  * fit-time action over eval metadata (digest count + sketch build),
  * size-gated by `sketchBudgetBytes` exactly like the ALS broadcast gate:
  * an inventory whose sketch exceeds the budget fails fast with the
  * shuffling exact op named as the fallback. */
case class BloomDecontaminate(
    eval: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    evalTextCol: String = "text",
    n: Int = 13,
    fpp: Double = 0.01,
    sketchBudgetBytes: Long = 1L << 30) extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")
  require(fpp > 0.0 && fpp < 0.5, s"$name: fpp must be in (0, 0.5), got $fpp")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    require(eval.schema.fieldNames.contains(evalTextCol),
      s"$name: '$evalTextCol' missing in eval frame")
    StructType(Seq(
      in(idCol),
      StructField("n_grams", IntegerType),
      StructField("matched_grams", LongType, nullable = false),
      StructField("contaminated", BooleanType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    import Decontaminate.gramDigests
    // the eval inventory is extracted three times (count, sketch fit,
    // exact verify join); it is MB-scale by definition, so three passes
    // beat a persist the caller would have to release
    val evalGrams = eval
      .select(explode(gramDigests(col(evalTextCol), n)).as("__gram"))
      .distinct()
    val nEval = evalGrams.count()
    // optimal bloom bits ≈ n·ln(1/fpp)/ln(2)²; fail fast past the budget
    val sketchBytes =
      math.ceil(nEval * math.log(1.0 / fpp) / (math.log(2) * math.log(2)) / 8.0).toLong
    require(sketchBytes <= sketchBudgetBytes,
      s"$name: eval inventory of $nEval grams needs a ~$sketchBytes-byte sketch, " +
        s"over the $sketchBudgetBytes budget — raise fpp/budget or use the " +
        "exact Decontaminate (shuffling) path")
    // the sketch keys on h1 alone: a single-hash prefilter collision only
    // adds to the false-positive rate the exact verify removes anyway
    val bloom = evalGrams.select(col("__gram.h1").as("h1"))
      .stat.bloomFilter("h1", math.max(nEval, 1L), fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val mightHit = udf { hs: Seq[Long] =>
      val b = bc.value; hs != null && hs.exists(b.mightContain(_))
    }
    val withDigests = df.select(col(idCol), col(textCol),
      gramDigests(col(textCol), n).as("__grams"))
    val suspects = withDigests
      .filter(mightHit(arrayTransform(col("__grams"), _.getField("h1"))))
    val matches = suspects
      .select(col(idCol), explode(col("__grams")).as("__gram"))
      .join(evalGrams, Seq("__gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("matched_grams"))
    val nGrams = greatest(T.tokenCount(col(textCol)) - (n - 1), lit(0))
    df.select(col(idCol), nGrams.cast("int").as("n_grams"))
      .join(matches, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"),
        (coalesce(col("matched_grams"), lit(0L)) > 0).as("contaminated"))
  }
}

/** Sequence packing: assign chunks to fixed-token-budget training rows by
  * GREEDY SEQUENTIAL packing within hash shards — the step between
  * [[DocumentChunks]] and a trainer that wants dense fixed-size batches.
  * Within a shard, chunks pack in (id, chunk order) order: a chunk joins
  * the current pack if it fits, else opens the next one, so no pack ever
  * exceeds `budget` tokens. Chunks at or above the budget get a pack of
  * their own (splitting is [[DocumentChunks]]' job, not this op's).
  *
  * Determinism is the design point: pack = a pure fold over (shard,
  * total chunk order), no RNG, no load-balancing heuristics — so packing
  * is reproducible across engines (the DuckDB oracle replays the fold as
  * a recursive CTE) and across reruns/backfills, the same property as
  * [[HashSplit]]. A true greedy fold is inherently sequential, which is
  * exactly why it runs per-shard: shard = content hash of the doc id
  * (HashSplit discipline), shards are embarrassingly parallel, and the
  * fold state is one counter.
  *
  * Scale shape: the fold shuffles ONLY chunk metadata — (shard, id,
  * order, tokens), ~32 bytes per chunk, never the text; callers join
  * `pack_id` back to the corpus by (id, order). Size `shards` so one
  * shard's metadata fits an executor comfortably (at 25 B chunks and
  * 64 K shards that is ~400 K rows/shard); pack ids are globally unique
  * as (shard, pack_in_shard).
  */
/** Cross-document repeated-span removal — sub-document dedup, the
  * granularity the doc-level family ([[ExactDedup]]…[[DupClusters]])
  * cannot reach: boilerplate headers, license blocks and templated
  * passages repeat across MANY documents that are otherwise distinct
  * (the public ExactSubstr observation of Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", simplified from suffix
  * arrays to fixed n-gram windows). A word n-gram occurring in at least
  * `minDocs` DISTINCT documents is "shared"; every token lying inside any
  * shared-gram occurrence is scrubbed from every document, and the
  * cleaned text is the surviving tokens of the NORMALIZED form (the same
  * normalization the whole dedup family keys on). Documents shorter than
  * n tokens have no grams and pass through untouched; a NULL text stays
  * NULL with zero counts.
  *
  * Scale shape: the shared-gram inventory is a count-distinct over
  * 128-bit gram digests (two independent xxhash64s — textual equality up
  * to a simultaneous collision; the shuffle carries 16-byte digests +
  * int positions, never text), start positions flow back as one
  * id-keyed aggregate, and reconstruction is the row-local
  * [[ScrubSharedGrams.keptTokens]] HOF — sorted starts merge into
  * disjoint (start, end) spans and the surviving gaps are sliced once
  * each, O(tokens + spans) per document, so a boilerplate-dominated
  * corpus (starts ≈ tokens, few merged spans) costs the same as a clean
  * one. The corpus text itself crosses exactly one shuffle (the final
  * id join). */
case class ScrubSharedGrams(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 8,
    minDocs: Int = 2,
    outputCol: String = "cleaned_text") extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")
  require(minDocs >= 2, s"$name: minDocs must be >= 2 (a gram always occurs in its own doc)")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    require(!in.fieldNames.contains(outputCol),
      s"$name: output column '$outputCol' collides with the input schema")
    StructType(Seq(
      in(idCol),
      StructField("n_tokens", IntegerType),
      StructField("n_removed", IntegerType),
      StructField(outputCol, StringType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    // the ONE gram-digest definition (Decontaminate.gramDigests) — scrub,
    // decontamination and its streaming twin must never drift apart
    // persisted: the gram frame feeds BOTH the sharedness aggregate and
    // the semi-join that names each doc's scrub starts — unpersisted, the
    // tokenize + per-gram double-xxhash explode (the op's dominant
    // per-row cost) ran once per branch (JobShapeProbe r14: 2 of
    // text_scrub_spans' 3 gram passes were this re-evaluation)
    val grams = df
      .select(col(idCol),
        posexplode(Decontaminate.gramDigests(col(textCol), n)).as(Seq("pos", "gd")))
      .select(col(idCol), col("pos"),
        col("gd.h1").as("g1"), col("gd.h2").as("g2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = grams.groupBy("g1", "g2")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("g1", "g2")
    val starts = grams.join(shared, Seq("g1", "g2"), "left_semi")
      .groupBy(idCol).agg(sort_array(collect_set(col("pos"))).as("__starts"))
    val ws = when(col(textCol).isNotNull, T.words(col(textCol)))
    df.join(starts, Seq(idCol), "left")
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__ws", ws)
      .withColumn("__kept",
        ScrubSharedGrams.keptTokens(col("__ws"), col("__starts"), n))
      .select(col(idCol),
        coalesce(size(col("__ws")), lit(0)).cast("int").as("n_tokens"),
        coalesce(size(col("__ws")) - size(col("__kept")), lit(0)).cast("int").as("n_removed"),
        array_join(col("__kept"), " ").as(outputCol))
  }
}

object ScrubSharedGrams {
  /** Tokens of `ws` outside every `[s, s+n)` occurrence window of the
    * SORTED, distinct `starts` array — the ONE reconstruction definition,
    * shared with [[graft.streaming.StreamingOps.scrubStream]] so the
    * twins can never drift. Delegates to the fused
    * [[graft.functions.KeptTokens]] expression (one tight loop, one
    * `compute` call in codegen): the HOF formulation below compiled into
    * one of the engine's largest generated methods — the JIT-warm-up
    * hotspot SCALE.md rounds 6-7 kept measuring on text_scrub_spans —
    * and allocated four intermediate arrays per row. */
  def keptTokens(ws: Column, starts: Column, n: Int): Column =
    graft.functions.FastExpressions.keptTokens(ws, starts, n)

  /** The HOF reference formulation — kept as the equivalence twin the
    * fused expression is pinned against (CodegenSpec; PropertySpec pins
    * both against the brute-force covered filter).
    *
    * A naive `filter(ws, (t, i) => !exists(starts, ...))` is
    * O(tokens × starts): in the boilerplate-dominated regime this op
    * exists for, starts approaches tokens and reconstruction goes
    * quadratic per document. Instead the sorted starts first merge into
    * disjoint (a, b) spans — two linear filters + a zip (start i opens a
    * span iff its predecessor's window does not reach it; closes one iff
    * its own window does not reach the next start) — and the kept array
    * is the concatenation of the gap slices between spans, each token
    * sliced exactly once: O(tokens + spans). */
  def keptTokensHof(ws: Column, starts: Column, n: Int): Column = {
    val m = size(starts)
    // sequence(0, -1) would count DOWN — guard the empty case explicitly
    val idxs = when(m > 0, sequence(lit(0), m - 1))
      .otherwise(array().cast("array<int>"))
    val begins = filter(idxs, i =>
      (i === 0) || (element_at(starts, i) + n <= element_at(starts, i + 1)))
    val ends = filter(idxs, i =>
      (i === m - 1) || (element_at(starts, i + 2) >= element_at(starts, i + 1) + n))
    // begins and ends pair up in order (every span has exactly one of each)
    val spans = zip_with(begins, ends, (b, e) =>
      struct(element_at(starts, b + 1).as("a"),
        (element_at(starts, e + 1) + n).as("b")))
    // gap lengths are >= 0 for any starts produced by gram extraction
    // (s + n <= tokens); the clamp keeps hand-fed out-of-range starts
    // from erroring the whole query instead of scrubbing to the end
    aggregate(spans,
      struct(lit(0).as("p"), array().cast("array<string>").as("acc")),
      (st, sp) => struct(sp.getField("b").as("p"),
        concat(st.getField("acc"),
          slice(ws, st.getField("p") + 1,
            greatest(sp.getField("a") - st.getField("p"), lit(0)))).as("acc")),
      st => concat(st.getField("acc"),
        slice(ws, st.getField("p") + 1,
          greatest(size(ws) - st.getField("p"), lit(0)))))
  }
}

/** Corpus boilerplate inventory — the DIAGNOSTIC face of
  * [[ScrubSharedGrams]]: the top-K word n-grams by the number of DISTINCT
  * documents they appear in, with occurrence totals. Where the scrub op
  * silently removes shared spans, this one shows a human what the
  * shared material actually is (license blocks, navigation chrome,
  * templated headers) before choosing `minDocs`/`n` — the
  * look-before-you-scrub step of a curation run.
  *
  * Scale: unlike the scrub (which shuffles 16-byte digests), the
  * inventory must SURFACE gram text, so the groupBy key is the gram
  * string itself — the standard wordcount shape, partial-aggregated
  * map-side, with output bounded by `topK` through `TakeOrdered`'s
  * bounded heap (never a global sort). On a 100 TB corpus run it over a
  * content-hash SAMPLE of documents ([[graft.ops.StratifiedSample]]'s
  * coin): a boilerplate gram by definition appears in many documents,
  * so sampling preserves exactly the rows this report exists to show.
  * Ties order (n_docs DESC, n_occurrences DESC, gram ASC) so the cut is
  * deterministic. */
case class BoilerplateReport(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 8,
    minDocs: Int = 2,
    topK: Int = 100) extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")
  require(minDocs >= 2, s"$name: minDocs must be >= 2")
  require(topK >= 1, s"$name: topK must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      StructField("gram", StringType),
      StructField("n_docs", LongType, nullable = false),
      StructField("n_occurrences", LongType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame =
    df.select(col(idCol),
        explode(T.wordShingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram"))
      .limit(topK)
}

/** Per-stratum top-fraction selection — the per-domain QUALITY BUDGET of
  * a curation pipeline: "keep the best 20% of web crawl by quality score,
  * the best 90% of books". Two modes sharing one contract:
  *
  * EXACT (default): rank rows within each stratum by (score desc, id asc
  * — the id tiebreak makes the cut deterministic, not partition-order
  * luck) and keep a row iff `rank * 10000 <= fracBp * stratum_count`.
  * The rank survives as `quality_rank` for audit. Cost: one shuffle on
  * the stratum key plus a per-stratum sort — fine while every stratum
  * fits a spillable sort, which holds for domain-sized strata (dozens of
  * sources), NOT for pathological single-domain corpora.
  *
  * APPROX (`approx = true`): the 100 TB path. Per-stratum score
  * thresholds come from `percentile_approx` over a fixed 101-point
  * quantile grid — a partial-aggregable sketch (map-side combine, no
  * global sort), after which selection is a broadcast threshold join +
  * scan-local filter. Keeps ≈ the requested fraction (sketch-accurate,
  * not exact), emits no rank column, and never sorts anything.
  *
  * Strata not in `fracsBp` fall back to `defaultBp`; a NULL stratum forms
  * its own group under `defaultBp`; NULL scores sort last (exact) /
  * never pass a threshold (approx — so an all-NULL-score stratum keeps
  * nothing rather than silently bypassing its budget). The one
  * exception: a 10000 bp budget means keep-all and keeps NULL scores
  * too, in both modes. */
case class TopFractionByGroup(
    strataCol: String,
    scoreCol: String,
    idCol: String,
    fracsBp: Map[String, Int],
    defaultBp: Int = 10000,
    approx: Boolean = false,
    rankCol: String = "quality_rank") extends EnsembleOp {

  require((defaultBp +: fracsBp.values.toSeq).forall(b => b >= 0 && b <= 10000),
    s"$name: all fractions must be basis points within [0, 10000]")

  override def transformSchema(in: StructType): StructType = {
    Seq(strataCol, scoreCol, idCol).foreach(requireCol(in, _))
    if (approx) in
    else {
      require(!in.fieldNames.contains(rankCol),
        s"$name: output column '$rankCol' collides with the input schema")
      StructType(in :+ StructField(rankCol, IntegerType, nullable = false))
    }
  }

  /** Per-row budget in basis points (the shared [[Strata.caseOver]] fold). */
  def fracBp: Column = Strata.caseOver(col(strataCol), fracsBp, defaultBp)

  /** The approx mode's per-stratum cut points ((stratum, fracBp, thr)) —
    * 101-point grid: threshold = the (1 − frac) quantile, grid-rounded.
    * percentile_approx needs a foldable percentage, so sketch the whole
    * grid once per stratum and index into it per-stratum afterwards —
    * the sketch agg is partial-aggregable, the result is strata-sized.
    * Exposed because the thresholds ARE the approx mode's fit state
    * (callers persist them; the selection itself is then plain
    * comparisons any engine replays). */
  def fittedThresholds(df: DataFrame): DataFrame = {
    val grid = array((0 to 100).map(i => lit(i / 100.0)): _*)
    df.groupBy(col(strataCol).as("__stratum"))
      .agg(percentile_approx(col(scoreCol), grid, lit(10000)).as("__q"))
      .withColumn("__fracBp", Strata.caseOver(col("__stratum"), fracsBp, defaultBp))
      // element_at is 1-based; an all-NULL-score stratum has a NULL
      // sketch, which must NOT read as keep-all — only fracBp=10000 may
      .withColumn("__thr", element_at(col("__q"),
        (lit(101) - (col("__fracBp") / lit(100.0)).cast("int"))))
      .select(col("__stratum"), col("__fracBp"), col("__thr"))
  }

  override def transform(df: DataFrame): DataFrame = {
    val out = transformSchema(df.schema)
    if (!approx) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(strataCol).orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
      df.withColumn(rankCol, row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(strataCol)))
        .filter(col(rankCol).cast("long") * 10000 <= fracBp.cast("long") * col("__cnt"))
        .select(out.fieldNames.map(col).toSeq: _*)
    } else {
      df.join(broadcast(fittedThresholds(df)),
          df(strataCol) <=> col("__stratum"), "left")
        .filter(col("__fracBp") === 10000 ||
          (col("__fracBp") > 0 && col("__thr").isNotNull &&
            col(scoreCol) >= col("__thr")))
        .select(out.fieldNames.map(col).toSeq: _*)
    }
  }
}

case class PackChunks(
    idCol: String = "doc_id",
    orderCol: String = "chunk_id",
    tokensCol: String = "n_tokens",
    budget: Int = 2048,
    shards: Int = 64,
    salt: String = "graft") extends EnsembleOp {

  require(budget >= 1, s"$name: budget must be >= 1")
  require(shards >= 1, s"$name: shards must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    Seq(idCol, orderCol, tokensCol).foreach(requireCol(in, _))
    // the fold works in longs; a non-integral id would cast to null and
    // silently drop EVERY row — fail at schema time instead
    Seq(idCol, orderCol, tokensCol).foreach { c =>
      in(c).dataType match {
        case _: LongType | _: IntegerType | _: ShortType | _: ByteType => ()
        case t => throw new IllegalArgumentException(
          s"$name: '$c' must be an integral column, got ${t.simpleString}")
      }
    }
    StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(orderCol, LongType, nullable = false),
      StructField(tokensCol, LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", IntegerType, nullable = false)))
  }

  /** The shard expression (exposed so oracle SQL can mirror it). */
  def shard: Column = T.hashBucket(col(idCol), salt, shards)

  override def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = transformSchema(df.schema)
    df.select(shard.as("__shard"), col(idCol).cast("long"),
        col(orderCol).cast("long"), col(tokensCol).cast("long"))
      // a null id has no shard and a null token count has no size: both
      // are undefined for packing — drop rather than invent a fate
      .na.drop()
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (sh: Long, rows: Iterator[(Long, Long, Long, Long)]) =>
        // metadata-only sort: ~32 bytes per chunk, bounded by shard sizing.
        // The token count joins the sort key so duplicate (id, order) rows
        // (a retried upstream write) still fold in a TOTAL order — pack
        // assignment stays deterministic instead of partition-order-bound
        val sorted = rows.toArray.sortBy(r => (r._2, r._3, r._4))
        var pack = 0L; var used = 0L; var pos = 0
        sorted.iterator.map { case (_, id, ord, tok) =>
          val t = math.min(math.max(tok, 0L), budget.toLong)
          if (used > 0 && used + t > budget) { pack += 1; used = 0L; pos = 0 }
          used += t
          val r = (id, ord, tok, sh, pack, pos)
          pos += 1
          r
        }
      }
      .toDF(out.fieldNames.toIndexedSeq: _*)
      .select(out.fieldNames.map(col).toIndexedSeq: _*)
  }
}

/** Semantic benchmark decontamination: flag every corpus item whose
  * embedding cosine to ANY evaluation-set embedding reaches `threshold` —
  * the paraphrase-robust complement of the n-gram [[Decontaminate]].
  * Token-overlap rules miss reworded benchmark items (translated,
  * paraphrased, re-templated leakage); embedding similarity catches the
  * rewordings that matter precisely because the model treats them as the
  * same content (the public observation behind SemDeDup-style semantic
  * matching, Abbas et al. 2023, applied here to eval hygiene).
  *
  * Default (`centers` empty) is the EXACT scan: every (corpus, eval)
  * pair is scored. That is also the honest scale path for real eval
  * sets — the eval side is MB-scale against a 100 TB corpus, so it
  * broadcasts whole and the scan is one map-side pass over the corpus
  * (|eval| dot products per row, zero extra shuffle: the per-id
  * aggregate partial-aggregates map-side to one row per corpus id
  * before any exchange). No recall loss, precision 1.0.
  *
  * For LARGE eval inventories, pass k-means `centers` (fit like
  * [[SemanticNearDup.fit]]): eval vectors bucket to their nearest
  * centroid once, and each corpus row scores only the buckets of its
  * `nprobe` nearest centroids — per-row cost drops to ~nprobe/nlist of
  * the scan, with the IVF family's documented recall loss (pairs whose
  * members quantize far apart); every emitted hit is exactly verified,
  * so precision stays 1.0.
  *
  * Output: one row per corpus item — (id, eval_hits, max_cosine,
  * contaminated). `max_cosine` is the max over the SCANNED eval subset
  * (all of it in exact mode), null when nothing was scanned (empty
  * eval, or no eval vector in any probed bucket); zero-norm vectors
  * score cosine 0 like the rest of the family. */
case class SemanticDecontaminate(
    eval: DataFrame,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    evalVecCol: String = "embedding",
    threshold: Double = 0.9,
    centers: Seq[Seq[Double]] = Nil,
    nprobe: Int = 4) extends EnsembleOp {

  require(centers.isEmpty || (nprobe >= 1 && nprobe <= centers.size),
    s"$name: nprobe must be in [1, nlist]")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    require(eval.schema.fieldNames.contains(evalVecCol),
      s"$name: '$evalVecCol' missing in eval frame")
    StructType(Seq(
      in(idCol),
      StructField("eval_hits", LongType, nullable = false),
      StructField("max_cosine", DoubleType),
      StructField("contaminated", BooleanType, nullable = false)))
  }

  private def cos(v: Column, n: Column, ev: Column, en: Column): Column =
    SemanticDecontaminate.cosine(v, n, ev, en)

  override def transform(df: DataFrame): DataFrame = {
    val evalP = eval.select(col(evalVecCol).as("__ev"),
      sqrt(V.dot(col(evalVecCol), col(evalVecCol))).as("__en"))
    val corpus = df.select(col(idCol), col(vecCol).as("__v"),
      sqrt(V.dot(col(vecCol), col(vecCol))).as("__n"))
    val pairs =
      if (centers.isEmpty) corpus.crossJoin(broadcast(evalP))
      else {
        // eval buckets once by nearest centroid; corpus rows probe their
        // nprobe nearest lists (same quantizer formula as AnnIvf)
        val bucketed = evalP.withColumn("__cid",
          V.nearestCentroid(col("__ev"), centers))
        corpus.withColumn("__cid",
            explode(V.nearestCentroids(col("__v"), centers, nprobe)))
          .join(bucketed, Seq("__cid"))
      }
    val scored = pairs
      .withColumn("__cos", cos(col("__v"), col("__n"), col("__ev"), col("__en")))
      .groupBy(idCol).agg(
        max(col("__cos")).as("max_cosine"),
        sum(when(col("__cos") >= threshold, 1L).otherwise(0L)).as("eval_hits"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("eval_hits"), lit(0L)).as("eval_hits"),
        col("max_cosine"),
        (coalesce(col("eval_hits"), lit(0L)) > 0).as("contaminated"))
  }
}

object SemanticDecontaminate {
  /** The ONE cosine definition (norms precomputed per side, zero-norm →
    * 0.0), shared by the batch op and
    * [[graft.streaming.StreamingOps.semanticDecontaminateStream]] so an
    * epsilon or guard change can never silently desynchronize stream
    * alerts from batch labels — the gramDigests discipline. */
  def cosine(v: Column, n: Column, ev: Column, en: Column): Column =
    when(n * en === 0, 0.0).otherwise(V.dot(v, ev) / (n * en))

  /** Fit eval-side bucket centroids (seeded MLlib k-means over the EVAL
    * vectors — the side being indexed, like [[AnnIvf.fit]] fits over
    * items) and build the probed op. */
  def fit(eval: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", evalVecCol: String = "embedding",
      threshold: Double = 0.9, nlist: Int = 32, nprobe: Int = 4,
      maxIter: Int = 10, seed: Long = 42L): SemanticDecontaminate = {
    val centers = V.fitCenters(eval, evalVecCol, nlist, maxIter, seed)
    SemanticDecontaminate(eval, idCol, vecCol, evalVecCol, threshold,
      centers, math.min(nprobe, centers.size))
  }
}

/** Snapshot diff: classify every document across two builds of a corpus
  * as `added` / `removed` / `changed` / `unchanged` by comparing content
  * digests — the audit step between training-set versions (what changed
  * since the run we trained on?) and the input to incremental downstream
  * rebuilds (recompute features only for `added`+`changed`).
  *
  * The op transforms the NEW snapshot against the `old` one. Identity is
  * the id; content equality is the md5 of the (optionally normalized)
  * text — the exact discipline [[ExactDedup]] keys on, so "changed"
  * means the dedup family would also treat the versions as distinct
  * content. A null text digests to null, which compares as changed
  * against any non-null version (and unchanged against null — both
  * absent is equality of absence).
  *
  * Scale shape: each side collapses to (id, 32-byte digest) before the
  * one full-outer equi-join on the id — the text never shuffles, so diffing
  * two 100 TB snapshots moves ~50 bytes per document. The output carries
  * both digests so downstream consumers can route without re-reading
  * either snapshot. */
case class SnapshotDiff(
    old: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    normalized: Boolean = false) extends EnsembleOp {

  require(old.schema.fieldNames.contains(idCol) &&
    old.schema.fieldNames.contains(textCol),
    s"$name: old snapshot needs columns '$idCol' and '$textCol'")

  private def key(c: Column): Column = if (normalized) T.normalize(c) else c

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol),
      StructField("old_hash", StringType),
      StructField("new_hash", StringType),
      StructField("status", StringType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val o = old.select(col(idCol), md5(key(col(textCol))).as("old_hash"),
      lit(true).as("__in_old"))
    val n = df.select(col(idCol), md5(key(col(textCol))).as("new_hash"),
      lit(true).as("__in_new"))
    n.join(o, Seq(idCol), "full_outer")
      .select(col(idCol), col("old_hash"), col("new_hash"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(coalesce(col("old_hash"), lit("")) ===
                coalesce(col("new_hash"), lit("")), "unchanged")
          .otherwise("changed").as("status"))
  }
}

/** Fuzzy benchmark decontamination: flag every corpus document whose
  * n-gram-shingle Jaccard similarity to ANY evaluation document reaches
  * `thresholdBp` — the near-duplicate middle ground between the exact
  * gram-overlap [[Decontaminate]] (any single shared n-gram) and the
  * embedding-space [[SemanticDecontaminate]] (meaning-level match).
  * This is the published contamination definition used when benchmarks
  * leak with light edits — reformatted whitespace, shuffled fields, a
  * few token substitutions (the n-gram Jaccard dedup criterion of Lee
  * et al. 2021 applied against an eval inventory).
  *
  * Default (`banded = false`) is EXACT via the family's inverted-index
  * discipline: shingles hash to 8-byte digests, both sides explode to
  * (id, digest) postings, and per-pair intersection counts come from
  * ONE digest equi-join — the pair space never materializes, and the
  * shuffle is ∝ shared shingle occurrences, never |corpus|×|eval| (an
  * all-pairs `array_intersect` scan measured 33 s at sf0.1; this shape
  * is sub-second). A pair sharing nothing has Jaccard 0 by definition,
  * so per-doc results are exact: max = the matched max or 0, hits
  * unchanged (thresholdBp > 0 is enforced). Similarity is integer
  * basis points (`inter*10000 DIV union`); digest equality is textual
  * equality up to an xxhash64 collision — the same contract every
  * gram-keyed op here hash-checks under.
  *
  * `banded = true` bounds even the postings join: both sides band
  * their MinHash signatures ([[graft.functions.MinHashBandKeys]], the
  * [[MinHashDedup]] machinery) and only band-colliding (corpus, eval)
  * candidates are exactly verified — candidates ∝ band collisions,
  * with LSH's documented recall loss and precision exactly 1.0 (every
  * hit is a true Jaccard match). Eval identity for candidate dedupe is
  * the md5 of the eval text's normal form, so identical eval rows
  * collapse instead of double-counting.
  *
  * Output: one row per corpus document — (id, eval_hits,
  * max_jaccard_bp, contaminated). Documents with no n-gram shingles
  * (shorter than n tokens, or null) scan nothing: null max, zero hits,
  * clean — as does everything when the eval side has no shingled docs.
  * In banded mode `max_jaccard_bp` ranges over the VERIFIED candidates
  * (null when none collided), mirroring [[SemanticDecontaminate]]'s
  * probed-subset stance. */
case class FuzzyDecontaminate(
    eval: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    evalTextCol: String = "text",
    n: Int = 3,
    thresholdBp: Int = 8000,
    banded: Boolean = false,
    numHashes: Int = 64,
    bands: Int = 16) extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")
  require(thresholdBp > 0 && thresholdBp <= 10000,
    s"$name: thresholdBp must be in (0, 10000]")
  require(numHashes % bands == 0,
    s"$name: bands ($bands) must divide numHashes ($numHashes)")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    require(eval.schema.fieldNames.contains(evalTextCol),
      s"$name: '$evalTextCol' missing in eval frame")
    StructType(Seq(
      in(idCol),
      StructField("eval_hits", LongType, nullable = false),
      StructField("max_jaccard_bp", LongType),
      StructField("contaminated", BooleanType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    def hashed(sh: Column) = arrayTransform(sh, s => xxhash64(s))
    val corpus = df.select(col(idCol), T.shingleSet(col(textCol), n).as("__shs"))
      .filter(size(col("__shs")) > 0)
    val evalSh = eval
      .select(T.shingleSet(col(evalTextCol), n).as("__eshs"),
        md5(T.normalize(col(evalTextCol))).as("__eid"))
      .filter(size(col("__eshs")) > 0)
      .dropDuplicates("__eid")
    val cSizes = corpus.select(col(idCol), size(col("__shs")).cast("long").as("__cs"))
    val eSizes = evalSh.select(col("__eid"), size(col("__eshs")).cast("long").as("__es"))
    // per-(corpus doc, eval doc) intersection counts over 8-byte digests
    val matched =
      if (!banded) {
        val cPost = corpus.select(col(idCol), explode(hashed(col("__shs"))).as("__g"))
        val ePost = evalSh.select(col("__eid"), explode(hashed(col("__eshs"))).as("__g"))
        cPost.join(ePost, Seq("__g"))
          .groupBy(col(idCol), col("__eid"))
          .agg(count(lit(1)).as("__inter"))
      } else {
        import graft.functions.FastExpressions
        def keys(sh: Column) =
          explode(FastExpressions.minhashBandKeys(sh, numHashes, bands))
        val cKeys = corpus.select(col(idCol), keys(col("__shs")).as("__band"))
        val eKeys = evalSh.select(col("__eid"), keys(col("__eshs")).as("__band"))
        // light (id, band) rows pair-join; shingle sets come back AFTER
        // the candidate dedupe, each side by its own key
        cKeys.join(eKeys, Seq("__band"))
          .select(col(idCol), col("__eid")).distinct()
          .join(corpus.select(col(idCol), hashed(col("__shs")).as("__hs")), Seq(idCol))
          .join(evalSh.select(col("__eid"), hashed(col("__eshs")).as("__ehs")), Seq("__eid"))
          .select(col(idCol), col("__eid"),
            size(array_intersect(col("__hs"), col("__ehs"))).cast("long").as("__inter"))
      }
    val perDoc = matched
      .join(eSizes, Seq("__eid"))
      .join(cSizes, Seq(idCol))
      .withColumn("__bp", expr("__inter * 10000 DIV (__cs + __es - __inter)"))
      .groupBy(idCol).agg(
        max(col("__bp")).as("__maxm"),
        sum(when(col("__bp") >= thresholdBp, 1L).otherwise(0L)).as("__hits"))
    val nEval = evalSh.agg(count(lit(1)).as("__ne"))
    // exact mode: unmatched pairs exist with Jaccard 0, so any shingled
    // doc facing a non-empty eval set has a defined max; banded mode
    // reports over the verified candidates only
    val maxJ =
      if (!banded)
        when(col("__has") && col("__ne") > 0, coalesce(col("__maxm"), lit(0L)))
      else col("__maxm")
    df.select(col(idCol))
      .join(cSizes.select(col(idCol), lit(true).as("__has")), Seq(idCol), "left")
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(nEval))
      .select(col(idCol),
        coalesce(col("__hits"), lit(0L)).as("eval_hits"),
        maxJ.as("max_jaccard_bp"),
        (coalesce(col("__hits"), lit(0L)) > 0).as("contaminated"))
  }
}

/** Tombstone purge: drop every document named in `tombstones` from the
  * corpus — the takedown / right-to-be-forgotten propagation step a
  * long-lived training corpus needs — and retire the purged content's
  * digests from the incremental-dedup index so the accepted-state
  * artifact stays consistent with the corpus it describes.
  *
  * [[transform]] is one id anti-join (kept corpus out). [[updatedIndex]]
  * closes the state loop: the accepted-corpus digest index minus the
  * digests whose LAST carrier was purged. Under the incremental-ingest
  * discipline ([[graft.ops.IncrementalDedup]]) each digest has exactly
  * one carrier, but the op does not rely on that: a digest still carried
  * by a kept row is NOT retired (one extra anti-join of purged digests
  * against kept-row digests), so corpora ingested without the
  * one-carrier discipline stay consistent too. Retiring a digest means
  * the same content would be ACCEPTED if re-ingested; callers that must
  * BLOCK re-ingestion instead keep the digest (skip the index update) or
  * maintain an explicit tombstone-digest list — one-line variations on
  * the same joins. [[updatedSignatureIndex]] is the near-dup twin: the
  * MinHash signature index minus purged ids, so a takedown also stops
  * future banded probes from colliding with the removed content.
  *
  * Scale shape: the corpus crosses one id-keyed anti-join (broadcast
  * when the tombstone list is small — the common case — shuffled
  * hash-anti otherwise, both correct); the index updates shuffle 16-byte
  * digests / ids only. Text never shuffles on any path. */
case class Purge(
    tombstones: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    normalized: Boolean = true) extends EnsembleOp {

  require(tombstones.schema.fieldNames.contains(idCol),
    s"$name: tombstones frame is missing id column '$idCol'")

  private def key(c: Column): Column = if (normalized) T.normalize(c) else c

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    in
  }

  override def transform(df: DataFrame): DataFrame =
    df.join(tombstones.select(idCol).distinct(), Seq(idCol), "left_anti")

  /** The accepted-digest index after the purge: `index` minus the
    * content digests of the tombstoned rows of `df` (the pre-purge
    * corpus — digests must come from the content being removed) that no
    * KEPT row still carries. The kept-carrier guard makes the update
    * correct even when the corpus holds duplicate content under
    * different ids (i.e. was not ingested one-carrier-per-digest). */
  def updatedIndex(index: DataFrame, df: DataFrame,
      digestCol: String = "content_hash"): DataFrame = {
    requireCol(df.schema, textCol)
    // ONE pass over the corpus text: digest every row with a tombstone
    // flag (metadata-scale tombstone side, broadcast), then a digest-
    // keyed partial-aggregable groupBy decides retirement — a digest
    // retires iff every carrier is tombstoned. The two-projection
    // formulation (purged semi-join + kept anti-join, each digesting the
    // text independently) scanned and hashed the 100 TB text TWICE.
    // No broadcast hint: AQE broadcasts the (usually tiny) tombstone
    // side at runtime, and a pathological takedown list stays correct
    // as a shuffled join.
    val tombIds = tombstones.select(col(idCol)).distinct()
      .withColumn("__tomb", lit(true))
    val flagged = df.join(tombIds, Seq(idCol), "left")
      .select(md5(key(col(textCol))).as(digestCol),
        coalesce(col("__tomb"), lit(false)).as("__tomb"))
    val retired = flagged.groupBy(digestCol)
      .agg(min(when(col("__tomb"), 1).otherwise(0)).as("__allTomb"))
      .filter(col("__allTomb") === 1)
      .select(digestCol)
    index.join(retired, Seq(digestCol), "left_anti")
  }

  /** The MinHash signature index after the purge: `sigIndex` (as built
    * by [[graft.ops.IncrementalMinHashDedup.signatures]] and maintained
    * by `updatedIndex` on that op) minus the tombstoned ids. Signatures
    * are keyed by doc id — one row per accepted doc — so retirement is
    * one id anti-join; without it a takedown leaves stale signatures
    * that future banded probes still collide with, resurrecting purged
    * content as a phantom `near_index` match. */
  def updatedSignatureIndex(sigIndex: DataFrame,
      sigIdCol: String = "doc_id"): DataFrame = {
    require(sigIndex.schema.fieldNames.contains(sigIdCol),
      s"$name: signature index is missing id column '$sigIdCol'")
    sigIndex.join(
      tombstones.select(col(idCol).as(sigIdCol)).distinct(),
      Seq(sigIdCol), "left_anti")
  }

  /** The ANN inverted-list index after the purge — the dense-retrieval
    * twin of [[updatedSignatureIndex]]: an [[graft.ops.AnnIvf.index]]
    * frame (one row per item, keyed `__item_id`) minus the tombstoned
    * ids, so a takedown also stops future probes from retrieving the
    * removed items. One id anti-join over index-scale rows; the frozen
    * quantizer is untouched (retirement never re-assigns survivors), so
    * the retired index is row-identical to a rebuild over the surviving
    * catalog — the lifecycle spec pins it. */
  def updatedAnnIndex(annIndex: DataFrame,
      itemIdCol: String = "__item_id"): DataFrame = {
    require(annIndex.schema.fieldNames.contains(itemIdCol),
      s"$name: ANN index is missing item id column '$itemIdCol'")
    annIndex.join(
      tombstones.select(col(idCol).cast("long").as(itemIdCol)).distinct(),
      Seq(itemIdCol), "left_anti")
  }
}

/** Incremental maintenance of a per-document SIGNAL TABLE against a
  * content-addressed corpus — the discipline that keeps derived
  * curation state (quality vectors, language ids, token counts) in sync
  * with a corpus that ingests, purges and compacts, while recomputing
  * ONLY what changed. `prior` is the signal table as last published
  * (keyed by `(idCol, hashCol)`); `transform(corpus)` returns the
  * reconciled table for the corpus as it stands now:
  *
  *   - CARRIED: prior rows whose (id, content hash) still exist in the
  *     corpus are served verbatim from the prior table — their text is
  *     never re-read, never re-scored (one left-semi join on 8+16-byte
  *     keys; the corpus side is a column-pruned identity scan, so at
  *     100 TB the carried path reads two thin columns, not text).
  *   - FRESH: corpus rows whose key is NOT in the prior table (new
  *     ingests, or re-published content after an edit) run the signal
  *     op — cost ∝ changed documents, never ∝ corpus.
  *   - RETIRED: prior rows whose key left the corpus (takedown, purge)
  *     simply do not survive the semi-join — signal rows cannot outlive
  *     their documents, the derived-state half of the right-to-erasure
  *     contract.
  *
  * Keying on CONTENT (id, hash) rather than file lineage is what makes
  * this robust to [[graft.streaming.StreamingOps.compactCorpusState]] /
  * [[graft.streaming.StreamingOps.purgeCorpusState]], which rewrite
  * every delta file without changing surviving rows: a manifest-level
  * diff would see "everything new" and recompute the world; the
  * content-keyed reconcile recomputes nothing. (For strictly
  * append-only logs the manifest diff IS the cheaper fast path — read
  * only the new deltas — and composes with this op by passing just
  * those rows; this op is the general path that also survives rewrites
  * and removals.)
  *
  * Contract: `signal` must be deterministic and row-local, and its
  * output must retain `idCol` and `hashCol` — then carried ≡ recomputed
  * (spec-pinned), and the reconciled table equals `signal` run flat
  * over the live corpus, plus a `carried` flag auditing which rows the
  * incremental pass actually touched. */
case class SignalReconcile(
    prior: DataFrame,
    signal: EnsembleOp,
    idCol: String = "doc_id",
    hashCol: String = "content_hash") extends EnsembleOp {

  require(prior.schema.fieldNames.contains(idCol) &&
    prior.schema.fieldNames.contains(hashCol),
    s"$name: prior signal table needs key columns '$idCol' and '$hashCol'")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, hashCol)
    val out = signal.transformSchema(in)
    require(out.fieldNames.contains(idCol) && out.fieldNames.contains(hashCol),
      s"$name: signal op '${signal.name}' must retain '$idCol' and '$hashCol'")
    require(prior.schema.fieldNames.sorted.sameElements(out.fieldNames.sorted),
      s"$name: prior columns ${prior.schema.fieldNames.sorted.mkString(",")} " +
        s"!= signal output ${out.fieldNames.sorted.mkString(",")}")
    StructType(out :+ StructField("carried", BooleanType, nullable = false))
  }

  override def transform(corpus: DataFrame): DataFrame = {
    val keys = Seq(idCol, hashCol)
    val ids = corpus.select(keys.map(col): _*)
    val carried = prior.join(ids, keys, "left_semi")
      .withColumn("carried", lit(true))
    val fresh = signal
      .transform(corpus.join(prior.select(keys.map(col): _*), keys, "left_anti"))
      .withColumn("carried", lit(false))
    // emit exactly transformSchema's declared order — prior may be a
    // column permutation of the signal output (sorted-name equality is
    // all the constructor requires), and unionByName would otherwise
    // leak that permutation into the output layout
    val outOrder = transformSchema(corpus.schema).fieldNames
    carried.unionByName(fresh).select(outOrder.map(col): _*)
  }
}

object SignalReconcile {
  /** The reconciled signal frame for (prior?, corpus): the incremental
    * reconcile when a prior table exists, the all-fresh first scoring
    * when none does — the one shared builder behind both maintenance
    * loops ([[publishAgainst]] and
    * [[graft.streaming.StreamingOps.publishSignalsFor]]'s fallback). */
  def reconciled(prior: Option[DataFrame], corpus: DataFrame,
      signal: graft.core.EnsembleOp,
      idCol: String = "doc_id", hashCol: String = "content_hash"): DataFrame =
    prior match {
      case Some(prev) =>
        SignalReconcile(prev.drop("carried"), signal, idCol, hashCol)
          .transform(corpus)
      case None =>
        signal.transform(corpus).withColumn("carried", lit(false))
    }

  /** The signal table as VERSIONED DERIVED STATE of a corpus — the
    * maintenance loop an operator actually runs after every corpus
    * commit: reconcile the latest published signal version against the
    * live corpus and publish the result as the next version of the
    * signal table's own commit log ([[graft.core.VersionedDir]] —
    * atomic pointer swap, snapshot-isolated readers, `readAt` time
    * travel over signal history, vacuum-bounded retention). The first
    * call (no published version yet) scores the whole corpus with
    * every row marked fresh; each later call recomputes only changed
    * documents and retires signals whose documents left. The published
    * `carried` column is the per-version audit of what the incremental
    * pass touched; it is dropped when the version serves as the next
    * reconcile's prior. Returns the published version name. */
  def publishAgainst(corpus: DataFrame, signalDir: String,
      signal: graft.core.EnsembleOp,
      idCol: String = "doc_id", hashCol: String = "content_hash",
      retainVersions: Option[Int] = None): String = {
    val spark = corpus.sparkSession
    val out = reconciled(
      graft.core.VersionedDir.readLatest(spark, signalDir),
      corpus, signal, idCol, hashCol)
    graft.core.VersionedDir.publish(out, signalDir, retainVersions)
  }
}
