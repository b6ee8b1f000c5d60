package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** RepetitionStats against hand-computed Gopher repetition fractions. */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(texts: (Long, String)*): Map[Long, Row] = {
    val df = texts.toSeq.toDF("doc_id", "text")
    RepetitionStats().transform(df).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  test("clean text keeps; a dominant 2-gram fails the top-2 filter") {
    // "spam ham " * 12 → normalized 107 chars; every 2-gram alternates
    // "spam ham"/"ham spam" (len 8); "spam ham" occurs 12 times.
    val spammy = Seq.fill(12)("spam ham").mkString(" ")
    val clean = "the quick brown fox jumps over one lazy dog soon " +
      "while distant owls watch silver clouds drift across autumn skies"
    val out = statsOf(1L -> spammy, 2L -> clean)

    val s = out(1L)
    val chars = s.getAs[Int]("n_chars_norm")
    assert(chars == spammy.length)
    // top 2-gram covers 12*8 = 96 of 107 chars
    assert(s.getAs[Long]("top2_bp") == 96L * 10000 / chars)
    assert(!s.getAs[Boolean]("keep"))

    val c = out(2L)
    // all 2-grams distinct → top gram count 1; len("the quick")=9 is the
    // longest... all counts 1, so top chars = max single-gram length
    assert(c.getAs[Long]("top2_bp") < 2000)
    assert(c.getAs[Long]("dup5_bp") == 0)
    assert(c.getAs[Boolean]("keep"))
  }

  test("duplicate 5-gram fraction counts all occurrences of repeated grams") {
    // two copies of the same 6-word sentence → the 5-grams of the sentence
    // each appear twice across the doc (plus bridging grams, each unique)
    val sent = "alpha beta gamma delta epsilon zeta"
    val doc = s"$sent $sent"
    val out = statsOf(1L -> doc)(1L)
    val chars = doc.length
    // sentence 5-grams: "alpha beta gamma delta epsilon" (30 ch) and
    // "beta gamma delta epsilon zeta" (29 ch), each ×2; bridging 5-grams
    // (containing the seam) are unique. dup chars = 2*30 + 2*29 = 118.
    assert(out.getAs[Long]("dup5_bp") == 118L * 10000 / chars)
    assert(!out.getAs[Boolean]("keep")) // 118/71 > 15%
  }

  test("MaskPii masks planted emails and IPs and counts matches") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.255.1 now"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.io c@d.org and ip 192.168.1.1")).toDF("doc_id", "text")
    val out = MaskPii().transform(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_masked") == "contact <EMAIL> or <IP> now")
    assert(out(0).getAs[Int]("n_emails") == 1 && out(0).getAs[Int]("n_ips") == 1)
    assert(out(1).getAs[String]("text_masked") == "no pii here at all")
    assert(out(1).getAs[Int]("n_emails") == 0 && out(1).getAs[Int]("n_ips") == 0)
    assert(out(2).getAs[String]("text_masked") == "two mails: <EMAIL> <EMAIL> and ip <IP>")
    assert(out(2).getAs[Int]("n_emails") == 2)
  }

  test("MaskPii patterns stay within the RE2-compatible subset") {
    // the text_pii oracle replays these patterns under DuckDB's RE2 —
    // lookaround and backreferences would silently diverge the dialects
    Seq(MaskPii.EmailRe, MaskPii.Ipv4Re).foreach { p =>
      assert(!p.contains("(?"), s"no lookaround/inline flags: $p")
      assert(!p.matches(".*\\\\[0-9].*"), s"no backreferences: $p")
    }
  }

  test("short docs (< n words) get zero repetition signals and keep=true") {
    val out = statsOf(1L -> "only three words")(1L)
    assert(out.getAs[Long]("top3_bp") > 0)  // exactly one 3-gram = the doc
    assert(out.getAs[Long]("dup5_bp") == 0) // no 5-grams at all
    assert(out.getAs[Boolean]("keep") ||
      out.getAs[Long]("top2_bp") > 2000) // tiny docs may trip top-2 (top
    // gram IS most of the doc) — the signal is honest either way
  }

  test("NgramLmScore: hand-computed bigram frequencies, self-fit corpus") {
    // corpus: "a b a b" (bigrams: ab, ba, ab), "a b c" (ab, bc), "x" (none)
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = NgramLmScore(df, n = 2).transform(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // corpus freq: "a b"=3, "b a"=1, "b c"=1
    val d1 = out(1L) // grams: ab(3), ba(1), ab(3) → sum 7, oov 1 (ba)
    assert(d1.getAs[Int]("n_grams") == 3)
    assert(d1.getAs[Long]("sum_freq") == 7L)
    assert(d1.getAs[Long]("oov_grams") == 1L)
    assert(d1.getAs[Long]("mean_freq_micro") == 7L * 1000000 / 3)
    val d2 = out(2L) // ab(3), bc(1) → sum 4, oov 1
    assert(d2.getAs[Int]("n_grams") == 2)
    assert(d2.getAs[Long]("sum_freq") == 4L)
    assert(d2.getAs[Long]("oov_grams") == 1L)
    assert(d2.getAs[Long]("mean_freq_micro") == 2000000L)
    val d3 = out(3L) // shorter than n: no grams, zero score
    assert(d3.getAs[Int]("n_grams") == 0)
    assert(d3.getAs[Long]("sum_freq") == 0L)
    assert(d3.getAs[Long]("mean_freq_micro") == 0L)
  }

  test("NgramLmScore: grams absent from a foreign reference score 0 freq") {
    val ref = Seq((10L, "a b c")).toDF("doc_id", "text")
    val df = Seq((1L, "a b z")).toDF("doc_id", "text")
    val out = NgramLmScore(ref, n = 2).transform(df).collect().head
    // "a b" in ref (freq 1 ≤ oovMaxCount → OOV), "b z" absent (freq 0)
    assert(out.getAs[Int]("n_grams") == 2)
    assert(out.getAs[Long]("sum_freq") == 1L)
    assert(out.getAs[Long]("oov_grams") == 2L)
  }

  test("TextQualityClassifier: hashed counts + margin match the hand fold") {
    import graft.functions.{TextFunctions => TF}
    val nb = 8
    val df = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    // independently compute each token's bucket with the op's own hash
    val buckets = df.select(
      transform(TF.words(col("text")),
        w => TF.hashBucket(w, "graft-qc", nb)).as("bs"))
      .head().getSeq[Long](0)
    val expectCounts = (0 until nb).map(b => buckets.count(_ == b).toDouble)
    val feats = df.select(TextQualityClassifier
      .featureExpr(col("text"), nb, "graft-qc").as("fv"))
      .head().getSeq[Double](0)
    assert(feats == expectCounts)
    assert(feats.sum == 3.0, "three tokens, three counts")
    val coef = (1 to nb).map(_.toDouble)
    val wantMargin = feats.zip(coef).foldLeft(0.0) { case (s, (a, b)) => s + a * b } + 0.5
    val out = TextQualityClassifier(coef, 0.5, numBuckets = nb)
      .transform(df).head()
    assert(out.getAs[Double]("margin") == wantMargin)
    assert(out.getAs[Boolean]("keep_quality") == (wantMargin > 0))
    // null text -> null margin and null verdict (no phantom
    // intercept-only score), the MlpScorer null discipline
    val nullRow = TextQualityClassifier(coef, 0.5, numBuckets = nb)
      .transform(Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
      .head()
    assert(nullRow.isNullAt(2) && nullRow.isNullAt(3))
  }

  test("TextQualityClassifier: trained model separates a separable corpus") {
    val docs = ((1 to 30).map(i => (i.toLong, s"good clean prose number $i", 1)) ++
      (31 to 60).map(i => (i.toLong, s"spam junk noise garbage $i", 0)))
      .toDF("doc_id", "text", "y")
    val op = TextQualityClassifier.train(docs, "y", numBuckets = 32)
    val scored = op.transform(docs).select(col("y"), col("keep_quality")).collect()
    val acc = scored.count(r => (r.getInt(0) == 1) == r.getBoolean(1)).toDouble / 60
    assert(acc >= 0.9, s"separable corpus must separate, accuracy $acc")
    intercept[IllegalArgumentException] {
      TextQualityClassifier(Seq(1.0, 2.0), 0.0, numBuckets = 64)
    }
  }

  test("MaskPii counts reconcile with emitted tokens when an IP hides inside an email") {
    val df = Seq((1L, "reach me at 1.2.3.4@mail.example or 10.0.0.1"))
      .toDF("doc_id", "text")
    val out = MaskPii().transform(df).collect().head
    assert(out.getAs[Int]("n_emails") == 1)
    // the address's 1.2.3.4 is consumed by <EMAIL>; only 10.0.0.1 masks as <IP>
    assert(out.getAs[Int]("n_ips") == 1,
      s"IPs inside masked emails must not be double-counted: $out")
    val masked = out.getAs[String]("text_masked")
    assert(masked.contains("<EMAIL>") &&
      masked.split("<IP>", -1).length == 2, s"one <IP> token: $masked")
    // null text: zero counts, null masked output
    val nul = MaskPii().transform(Seq((2L, null: String)).toDF("doc_id", "text"))
      .collect().head
    assert(nul.getAs[Int]("n_emails") == 0 && nul.getAs[Int]("n_ips") == 0 &&
      nul.isNullAt(nul.fieldIndex("text_masked")))
  }

  test("QualitySignals never emits a NULL keep verdict") {
    val df = Seq((1L, null: String), (2L, "enough words to look at here"))
      .toDF("doc_id", "text")
    val out = QualitySignals().transform(df).orderBy("doc_id").collect()
    assert(!out(0).isNullAt(out(0).fieldIndex("keep")) &&
      !out(0).getAs[Boolean]("keep"),
      "a null-text doc must land on the reject side, not vanish from both")
  }
}
