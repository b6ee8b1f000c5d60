package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{transform => arrayTransform}
import org.apache.spark.sql.types._

/** Text-pipeline primitives for LLM-scale data curation (BASELINE.json
  * north star): normalization, tokenization, shingling, MinHash, SimHash,
  * language-ID and quality signals. Everything is built-in expressions —
  * per-row, shuffle-free, whole-stage-codegen'd — so the ops scale linearly
  * with document count. Ratios are reported in integer basis points
  * (`x*10000 div y`) so oracle comparison never touches float rounding.
  */
object TextFunctions {

  /** Content-addressed bucket: first 8 md5 hex chars of `id ":" salt` mod
    * `buckets` — the engine-portable hash discipline shared by HashSplit,
    * StratifiedSample and PackChunks (oracle SQL mirrors it as
    * `('0x' || substring(md5(id::VARCHAR || ':salt'), 1, 8))::BIGINT % buckets`).
    * Pure per-row expression: deterministic across engines, reruns and
    * repartitioning. A null id yields a null bucket (no deterministic
    * fate exists for it — each caller decides). */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic uniform on (0, 1) from the first 8 md5 hex chars of
    * `key` — the engine-portable stand-in for rand() used wherever a
    * sampling decision must be reproducible cross-engine (the DuckDB
    * oracle replays `(('0x' || substring(md5(key), 1, 8))::BIGINT + 0.5)
    * / 4294967296.0`). +0.5 keeps u strictly inside (0, 1) so ln(u) is
    * finite. */
  def md5Uniform(key: Column): Column =
    (conv(substring(md5(key), 1, 8), 16, 10).cast("long") + 0.5) / 4294967296.0

  /** lower + trim + whitespace collapse — the canonical dedup normal form. */
  def normalize(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def words(c: Column): Column = split(normalize(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-ish subword count: letter runs, single digits, other symbols. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(normalize(c), lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))

  /** Positional word n-gram shingles (duplicates preserved). */
  def wordShingles(c: Column, n: Int): Column =
    // bind the token array ONCE as a lambda variable: inlining `words(c)`
    // into the per-gram lambda would re-run the normalize regex + split
    // per element (CSE cannot reach into lambda bodies — measured ~30µs
    // per gram, the whole cost of every gram-based op)
    element_at(arrayTransform(array(words(c)), ws =>
      when(size(ws) < n, array().cast(ArrayType(StringType)))
        .otherwise(arrayTransform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n)))))), 1)

  /** Distinct shingle set (the unit of Jaccard similarity). Backed by the
    * one-pass [[graft.functions.WordShingles]] expression; value-identical
    * to `array_distinct(wordShingles(c, n))`. */
  def shingleSet(c: Column, n: Int): Column = FastExpressions.wordShingles(c, n)

  // (MinHash signature/banding live in the one-pass
  // graft.functions.MinHashBandKeys expression — the interpreted HOF
  // versions that used to sit here were unused and have been removed.)

  /** Bit j (as 0/1 long) of a long column; variable shift via the SQL
    * function (the Scala `shiftright` helper only takes literal shifts). */
  private def bitAt(h: Column, j: Column): Column =
    call_function("shiftright", h, j).bitwiseAND(lit(1L))

  /** 64-bit SimHash over shingles: per-bit ±1 vote of xxhash64 bits,
    * positive vote → bit set. */
  def simhash64(shingles: Column): Column = {
    val votes = aggregate(
      shingles,
      array_repeat(lit(0L), 64),
      (acc, s) => {
        val h = xxhash64(s)
        zip_with(acc, sequence(lit(0), lit(63)), (a, j) => a + (bitAt(h, j) * 2 - 1))
      })
    // assemble via shift+OR (multiply would trip the ANSI overflow check)
    val bits = zip_with(votes, sequence(lit(0), lit(63)), (v, j) =>
      when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("int")

  /** Integer basis points: floor(x*10000 / y) — exact in both engines for
    * the magnitudes involved (products stay below 2^53). */
  def bp(x: Column, y: Column): Column =
    floor(x.cast("long") * 10000 / y.cast("long")).cast("long")

  /** Deterministic 64-bit rolling hash of the word sequence:
    * h = fold(xxhash64(h, word)) — order-sensitive, whitespace-insensitive,
    * streaming-friendly (ANSI-safe: hash-chaining instead of a wrapping
    * polynomial multiply, which Spark's overflow check would reject). */
  def rollingHash(c: Column): Column =
    aggregate(words(c), lit(0L), (acc, w) => xxhash64(acc, w))

  /** Content fingerprint of the normal form (md5 hex — portable to SQL). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Stopword lists used by language-ID scoring (shared with the oracle
    * SQL generator so both engines score identically). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "es" -> Seq("el", "los", "las", "y", "es", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Stopword-hit count for one language over the word array. */
  def stopwordScore(ws: Column, lang: String): Column = {
    val list = stopwords.toMap.apply(lang)
    size(filter(ws, w => w.isInCollection(list)))
  }

  /** Language prediction: priority-ordered argmax of stopword scores;
    * all-zero → "und". Deterministic by construction. */
  def langId(c: Column): Column = {
    val ws = words(c)
    val scores = stopwords.map { case (lang, _) => lang -> stopwordScore(ws, lang) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }
}
