package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The fitted feature-engineering family (NVTabular-parity stages served
  * through the reference's TransformWorkflow): TargetEncoding, JoinGroupby,
  * HashBucket, FillMissing, Clip, LogTransform, ListSlice. */
class FeatureOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fit = Seq(
    ("a", 10L), ("a", 20L), ("a", 30L), ("b", 40L), ("b", 60L), ("c", 100L)
  ).toDF("cat", "y")

  test("TargetEncoding: smoothed means match the closed form") {
    val out = TargetEncoding(Seq("cat"), "y", smoothing = 2.0)
      .transform(fit).select("cat", "y", "cat_te").collect()
    val prior = 260.0 / 6 // exact integer sums
    val expect = Map(
      "a" -> (60.0 + prior * 2.0) / (3.0 + 2.0),
      "b" -> (100.0 + prior * 2.0) / (2.0 + 2.0),
      "c" -> (100.0 + prior * 2.0) / (1.0 + 2.0))
    out.foreach(r => assert(r.getDouble(2) === expect(r.getString(0))))
  }

  test("TargetEncoding: leave-one-out excludes the row's own label; singleton groups -> prior") {
    val out = TargetEncoding(Seq("cat"), "y", smoothing = 2.0, leaveOneOut = true)
      .transform(fit).select("cat", "y", "cat_te").collect()
    val prior = 260.0 / 6
    out.foreach { r =>
      val (c, y, te) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val expected = c match {
        case "a" => ((60.0 - y) + prior * 2.0) / ((3.0 - 1.0) + 2.0)
        case "b" => ((100.0 - y) + prior * 2.0) / ((2.0 - 1.0) + 2.0)
        case "c" => prior // n=1: nothing left after removing the row itself
      }
      assert(te === expected, s"cat=$c y=$y")
    }
  }

  test("TargetEncoding: null category gets the prior; schema declares tagged doubles") {
    val df = fit.union(Seq((null.asInstanceOf[String], 50L)).toDF("cat", "y"))
    val op = TargetEncoding(Seq("cat"), "y", smoothing = 2.0)
    val prior = 310.0 / 7
    val nullRow = op.transform(df).filter(col("cat").isNull).select("cat_te").head()
    assert(nullRow.getDouble(0) === prior)
    val sch = op.transformSchema(df.schema)
    assert(sch("cat_te").dataType === DoubleType)
  }

  test("TargetEncoding: above-budget shuffle-hash path returns identical encodings") {
    val plain = TargetEncoding(Seq("cat"), "y", smoothing = 2.0)
    val gated = TargetEncoding(Seq("cat"), "y", smoothing = 2.0, broadcastBudgetBytes = 1L)
    val a = plain.transform(fit).orderBy("cat", "y").collect().toSeq
    val b = gated.transform(fit).orderBy("cat", "y").collect().toSeq
    assert(a === b)
  }

  test("TargetEncoding: fails fast on non-numeric target and output collision") {
    intercept[IllegalArgumentException] {
      TargetEncoding(Seq("y"), "cat").transformSchema(fit.schema)
    }
    intercept[IllegalArgumentException] {
      TargetEncoding(Seq("cat"), "y")
        .transformSchema(fit.withColumn("cat_te", lit(1.0)).schema)
    }
  }

  test("JoinGroupby: per-key stats join back exactly; broadcast gate fallback is identical") {
    val base = fit.withColumnRenamed("cat", "k")
    val op = JoinGroupby("k", Seq("y"), Seq("count", "sum", "mean", "min", "max"))
    val out = op.transform(base).filter(col("k") === "a").head()
    assert(out.getAs[Long]("k_count") === 3L)
    assert(out.getAs[Long]("k_y_sum") === 60L)
    assert(out.getAs[Double]("k_y_mean") === 20.0)
    assert(out.getAs[Long]("k_y_min") === 10L)
    assert(out.getAs[Long]("k_y_max") === 30L)
    // force the above-budget path: results must be identical
    val gated = JoinGroupby("k", Seq("y"), Seq("count", "sum", "mean", "min", "max"),
      broadcastBudgetBytes = 1L)
    val a = op.transform(base).orderBy("k", "y").collect().toSeq
    val b = gated.transform(base).orderBy("k", "y").collect().toSeq
    assert(a === b)
  }

  test("HashBucket: buckets in range, deterministic, null -> -1, salt changes assignment") {
    val df = Seq(Some("x"), Some("y"), Some("zzz"), None).toDF("c")
    val out = HashBucket(Seq("c"), numBuckets = 7).transform(df)
      .select("c", "c_hb").collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out(null) === -1)
    out.filter(_._1 != null).values.foreach(b => assert(b >= 0 && b < 7))
    val out2 = HashBucket(Seq("c"), numBuckets = 7).transform(df)
      .select("c", "c_hb").collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out === out2)
    val salted = HashBucket(Seq("c"), numBuckets = 1 << 20, salt = "other").transform(df)
      .select("c", "c_hb").collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(salted.filter(_._1 != null) !== out.filter(_._1 != null))
  }

  test("FillMissing: constant and fitted-median fills; all-null column fails fast") {
    val df = Seq((Some(1L), Some("a")), (None, None), (Some(3L), Some("b")))
      .toDF("n", "s")
    val out = FillMissing(constants = Map("s" -> "?"), medianCols = Seq("n"))
      .transform(df).orderBy("n").collect()
    // median of {1, 3} = 2.0 (interpolated)
    assert(out.map(_.getAs[Double]("n_filled")).toSet === Set(1.0, 2.0, 3.0))
    assert(out.map(_.getAs[String]("s_filled")).toSet === Set("a", "b", "?"))
    val allNull = Seq[Option[Long]](None, None).toDF("n")
    intercept[Exception] {
      FillMissing(medianCols = Seq("n")).transform(allNull).collect()
    }
  }

  test("Clip: bounds applied per side; nulls pass through; min > max rejected") {
    val df = Seq(Some(-5.0), Some(0.5), Some(99.0), None).toDF("v")
    val out = Clip(Map("v" -> (Some(0.0), Some(1.0)))).transform(df)
      .select("v_clip").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSet === Set(Some(0.0), Some(0.5), Some(1.0), None))
    val lowerOnly = Clip(Map("v" -> (Some(0.0), None))).transform(df)
      .select("v_clip").collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(lowerOnly.toSet === Set(0.0, 0.5, 99.0))
    intercept[IllegalArgumentException] { Clip(Map("v" -> (Some(2.0), Some(1.0)))) }
  }

  test("LogTransform: ln(x+1); x <= -1 yields null") {
    val df = Seq(0.0, math.E - 1, -1.0, -5.0).toDF("v")
    val out = LogTransform(Seq("v")).transform(df).select("v", "v_log").collect()
      .map(r => r.getDouble(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(0.0) === Some(0.0))
    assert(math.abs(out(math.E - 1).get - 1.0) < 1e-12)
    assert(out(-1.0) === None)
    assert(out(-5.0) === None)
  }

  test("ListSlice: python slice semantics incl. negatives, clamping, null and short lists") {
    val df = Seq(
      (1L, Some(Seq(1, 2, 3, 4, 5))),
      (2L, Some(Seq(1, 2))),
      (3L, Some(Seq.empty[Int])),
      (4L, Option.empty[Seq[Int]])
    ).toDF("id", "a")
    def run(start: Int, end: Option[Int]): Map[Long, Option[Seq[Int]]] =
      ListSlice(Seq("a"), start, end).transform(df).select("id", "a_slice")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Int](1).toList))).toMap
    val mid = run(1, Some(-1)) // python a[1:-1]
    assert(mid(1L) === Some(List(2, 3, 4)))
    assert(mid(2L) === Some(List.empty))
    assert(mid(3L) === Some(List.empty))
    assert(mid(4L) === None)
    val tail = run(-3, None) // python a[-3:]
    assert(tail(1L) === Some(List(3, 4, 5)))
    assert(tail(2L) === Some(List(1, 2))) // shorter than 3: whole list
    assert(tail(3L) === Some(List.empty))
    val over = run(0, Some(99)) // end beyond length clamps
    assert(over(1L) === Some(List(1, 2, 3, 4, 5)))
    intercept[IllegalArgumentException] {
      ListSlice(Seq("id"), 0, None).transformSchema(df.schema)
    }
  }

  test("transformSchema output matches transform output for every FE op") {
    val df = fit.withColumn("arr", array(col("y"), col("y") + 1))
    val ops: Seq[graft.core.EnsembleOp] = Seq(
      TargetEncoding(Seq("cat"), "y"),
      JoinGroupby("cat", Seq("y")),
      HashBucket(Seq("cat"), 10),
      FillMissing(constants = Map("cat" -> "?")),
      Clip(Map("y" -> (Some(0.0), Some(50.0)))),
      LogTransform(Seq("y")),
      ListSlice(Seq("arr"), 0, Some(1)))
    ops.foreach { op =>
      val declared = op.transformSchema(df.schema)
      val actual = op.transform(df).schema
      assert(declared.map(f => (f.name, f.dataType)) ===
        actual.map(f => (f.name, f.dataType)), op.name)
    }
  }

  test("DriftReport: hand-computed L1 shares, null bucket, two features") {
    import spark.implicits._
    val base = Seq((1.0, 5L), (1.0, 5L), (2.0, 5L), (2.0, 200L))
      .toDF("x", "k")
    val cur = Seq((Some(1.0), 5L), (Some(2.0), 5L), (Some(2.0), 5L),
      (Option.empty[Double], 5L)).toDF("x", "k")
    val out = DriftReport(base,
      Map("x" -> Seq(2.0), "k" -> Seq(100.0)), thresholdBp = 4000L)
      .transform(cur).orderBy("feature").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k", "x"))
    val k = out(0)
    // k base: 3×<100, 1×>=100 → 7500/2500; cur: 4×<100 → 10000/0
    // l1 = |7500−10000| + |2500−0| = 5000 → drifted at 4000
    assert(k.getAs[Long]("n_base") == 4L && k.getAs[Long]("n_cur") == 4L)
    assert(k.getAs[Long]("l1_bp") == 5000L && k.getAs[Boolean]("drifted"))
    val x = out(1)
    // x base: b0=2, b1=2 → 5000/5000; cur: null=1, b0=1, b1=2 →
    // 2500/2500/5000; l1 = |0−2500| + |5000−2500| + |5000−5000| = 5000
    assert(x.getAs[Long]("l1_bp") == 5000L && x.getAs[Boolean]("drifted"))
  }

  test("DriftReport: identical snapshots report zero drift; empty current maxes out") {
    import spark.implicits._
    val base = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val same = DriftReport(base, Map("x" -> Seq(2.5)))
      .transform(base).collect().head
    assert(same.getAs[Long]("l1_bp") == 0L && !same.getAs[Boolean]("drifted"))
    val empty = DriftReport(base, Map("x" -> Seq(2.5)))
      .transform(base.filter(col("x") > 100)).collect().head
    // cur empty → its shares are all 0 → l1 = Σ base shares = 10000
    assert(empty.getAs[Long]("n_cur") == 0L)
    assert(empty.getAs[Long]("l1_bp") == 10000L && empty.getAs[Boolean]("drifted"))
  }

  test("DriftReport rejects non-numeric features and unsorted splits") {
    import spark.implicits._
    val df = Seq((1.0, "a")).toDF("x", "s")
    assertThrows[IllegalArgumentException] {
      DriftReport(df, Map("s" -> Seq(1.0))).transformSchema(df.schema)
    }
    assertThrows[IllegalArgumentException] {
      DriftReport(df, Map("x" -> Seq(3.0, 1.0)))
    }
  }

  test("TargetEncoding LOO gives unlabeled rows the full group statistic, never NULL") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(2.0))).toDF("cat", "y")
    val out = TargetEncoding(Seq("cat"), "y", smoothing = 1.0, leaveOneOut = true)
      .transform(df).collect()
    val unlabeled = out.find(r => r.getString(0) == "a" && r.isNullAt(1)).get
    val enc = unlabeled.getAs[Double]("cat_te")
    assert(!unlabeled.isNullAt(unlabeled.fieldIndex("cat_te")),
      "a null-target row must still be encoded")
    // prior = 6/3 = 2.0; full stat for 'a' = (4 + 2*1)/(2 + 1) = 2.0
    assert(math.abs(enc - 2.0) < 1e-12, s"full smoothed statistic expected: $enc")
  }

  test("FillMissing rejects a constant whose type would widen the column") {
    val df = Seq((1L, Some(1))).toDF("id", "v")
    assertThrows[IllegalArgumentException] {
      FillMissing(constants = Map("v" -> 0.5)).transformSchema(df.schema)
    }
    // a narrower integral constant is fine and keeps the declared type
    val ok = Seq((1L, Option.empty[Long])).toDF("id", "v")
    val out = FillMissing(constants = Map("v" -> 7)).transform(ok)
    assert(out.schema("v_filled").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.collect().head.getAs[Long]("v_filled") == 7L)
  }

  test("JoinGroupby integral mean derives from the exact long sum") {
    // 2^53 + 2 and 0: a per-row double cast loses the +2 before summing
    val big = (1L << 53) + 2L
    val df = Seq(("k", big), ("k", 0L)).toDF("key", "v")
    val out = JoinGroupby("key", Seq("v"), Seq("sum", "mean"))
      .transform(df).collect().head
    assert(out.getAs[Long]("key_v_sum") == big,
      "the exact long sum is the anchor")
    assert(out.getAs[Double]("key_v_mean") == big.toDouble / 2.0,
      "mean = exact-sum / count, one final double division")
  }
}
