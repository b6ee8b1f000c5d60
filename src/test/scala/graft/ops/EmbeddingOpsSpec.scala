package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("NormalizeEmbeddings yields unit vectors; zero vector becomes null") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = NormalizeEmbeddings().transform(df)
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Double](2) == Seq(0.6, 0.8))
    assert(out(1).isNullAt(2))
    assert(out(2).getSeq[Double](2) == Seq(-1.0, 0.0))
    // schema carries the embedding tag
    val f = NormalizeEmbeddings().transformSchema(df.schema).apply("embedding_norm")
    assert(graft.core.Tags.of(f).contains(graft.core.Tags.Embedding))
  }

  test("MeanPoolEmbeddings sums exact micros per (key, dim)") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(2.0f, 3.0f)),
      (1, Array(-1.5f, 0.25f))).toDF("label", "embedding")
    val out = MeanPoolEmbeddings().transform(df)
      .orderBy("label", "pos").collect()
    // label 0, dim 0: 1e6 + 2e6 = 3e6 micros over 2 vectors
    assert(out(0).getAs[Long]("sum_micros") == 3000000L)
    assert(out(0).getAs[Long]("n_vecs") == 2L)
    assert(out(0).getAs[Double]("mean") == 1.5)
    // label 0, dim 1: 2e6 + 3e6
    assert(out(1).getAs[Long]("sum_micros") == 5000000L)
    // label 1: floor(-1.5e6) = -1500000, floor(0.25e6) = 250000
    assert(out(2).getAs[Long]("sum_micros") == -1500000L)
    assert(out(3).getAs[Long]("sum_micros") == 250000L)
  }

  // The scaladoc's error bound: midpoint dequantization reconstructs each
  // component within (max−min)/(2·levels) + the micro round-down.
  test("QuantizeEmbeddings codes dequantize within the documented error bound") {
    val rnd = new scala.util.Random(5)
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val op = QuantizeEmbeddings(levels = 255)
    val out = op.transform(df).collect()
    assert(out.length == 40 * 16, "one row per (vector, component)")
    val byVec = vecs.toMap
    out.foreach { r =>
      val (id, mn, mx, pos, code) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4))
      val x = byVec(id)(pos).toDouble
      val range = (mx - mn) / 1e6
      val dequant = (mn + (code + 0.5) * (mx - mn).toDouble / 255) / 1e6
      assert(math.abs(x - dequant) <= range / (2 * 255) + 2e-6,
        s"vec $id pos $pos: x=$x dequant=$dequant range=$range")
      assert(code >= 0 && code <= 255, s"code out of [0, levels]: $code")
    }
    // re-run is bit-identical (pure integer arithmetic, no RNG)
    assert(op.transform(df).collect().toSet == out.toSet)
  }

  test("QuantizeEmbeddings maps a constant vector to all-zero codes") {
    val df = Seq((7L, Array(1.25f, 1.25f, 1.25f))).toDF("vec_id", "embedding")
    val out = QuantizeEmbeddings().transform(df).orderBy("pos").collect()
    assert(out.forall(_.getInt(4) == 0), "no spread → every code 0")
    assert(out.forall(r => r.getLong(1) == r.getLong(2)), "mn == mx")
    // dequantize-at-min returns the (micro-floored) constant
    assert(math.abs(out.head.getLong(1) / 1e6 - 1.25) <= 1e-6)
  }

  test("NormalizeEmbeddings rejects non-array columns") {
    val df = Seq((1L, "x")).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      NormalizeEmbeddings().transformSchema(df.schema)
    }
  }

  test("PcaProject reproduces MLlib's PCA transform on the same fit") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val op = PcaProject.fit(emb, k = 4)
    // the reference transform: MLlib PCAModel over the identical fit
    val assembled = emb.select(col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("__features"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(4).setInputCol("__features").setOutputCol("__pca").fit(assembled)
    val want = model.transform(assembled)
      .select(col("vec_id"),
        org.apache.spark.ml.functions.vector_to_array(col("__pca")).as("want"))
    val got = op.transform(emb).select(col("vec_id"), col("reduced"))
    val maxErr = got.join(want, Seq("vec_id"))
      .select(expr(
        "aggregate(zip_with(reduced, want, (a, b) -> abs(a - b)), 0D, (m, x) -> greatest(m, x))")
        .as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    assert(maxErr < 1e-9, s"projection must match MLlib bitwise-ish, max err $maxErr")
  }

  test("PcaProject: null vectors project to null; axes dims validated") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq(1.0f, 2.0f)),
        org.apache.spark.sql.Row(2L, null.asInstanceOf[Any])),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val op = PcaProject(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val out = op.transform(df).orderBy("vec_id").collect()
    assert(out(0).getSeq[Double](2) == Seq(1.0, 2.0))
    assert(out(1).isNullAt(2), "null vector -> null projection")
    intercept[IllegalArgumentException] {
      PcaProject(Seq(Seq(1.0), Seq(0.0, 1.0)))
    }
  }

  test("QuantizerDrift: share drift, coverage escapes, unseen clusters") {
    import spark.implicits._
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    // reference: 3 items in c0 (max d2 = 2), 1 in c1 (d2 = 2), none in c2
    val ref = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.0f, 0.0f)),
      (4L, Seq(9.0f, 1.0f))).toDF("vec_id", "embedding")
    // new batch: 1 inside c0's radius, 1 OUTSIDE it (d2 = 8 > 2),
    // 2 in c2 — a cluster with no reference mass (far by definition)
    val batch = Seq(
      (11L, Seq(1.0f, 0.0f)),  // c0, d2 = 1 <= theta 2
      (12L, Seq(2.0f, 2.0f)),  // c0, d2 = 8 > theta 2 -> far
      (13L, Seq(0.0f, 9.0f)), (14L, Seq(1.0f, 10.0f))) // c2: unseen
      .toDF("vec_id", "embedding")
    val out = QuantizerDrift(centers, ref).transform(batch)
      .orderBy("cluster_id")
      .select("cluster_id", "ref_count", "new_count", "ref_share_bp",
        "new_share_bp", "drift_bp", "n_far")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0, 3L, 2L, 7500L, 5000L, 2500L, 1L),   // one escape past theta
      (1, 1L, 0L, 2500L, 0L, 2500L, 0L),      // mixture mass vanished
      (2, 0L, 2L, 0L, 5000L, 5000L, 2L)),     // unseen cluster: all far
      s"got $out")
    // theta is the reference's exact max in-cluster d2 (c0: (1,1) -> 2)
    val theta = QuantizerDrift(centers, ref).transform(batch)
      .filter($"cluster_id" === 0).select("theta_d2").as[Double].head()
    assert(theta == 2.0)
    // null vectors carry no assignment on either side
    val withNull = QuantizerDrift(centers,
      ref.withColumn("embedding",
        when($"vec_id" === 3L, lit(null)).otherwise($"embedding")))
      .transform(batch).filter($"cluster_id" === 0)
      .select("ref_count").as[Long].head()
    assert(withNull == 2L, "a null reference vector must not count")
  }

  test("ClusterAssign: nearest centroid with exact d2, lowest-id tie-break") {
    import spark.implicits._
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    val df = Seq(
      (1L, Seq(1.0f, 1.0f)),    // nearest c0, d2 = 2
      (2L, Seq(9.0f, 1.0f)),    // nearest c1, d2 = 2
      (3L, Seq(1.0f, 9.0f)),    // nearest c2, d2 = 2
      (4L, Seq(5.0f, 0.0f))     // equidistant c0/c1 (d2 = 25): tie -> c0
    ).toDF("vec_id", "embedding")
    val out = ClusterAssign(centers).transform(df).orderBy("vec_id")
      .select("vec_id", "cluster_id", "d2").as[(Long, Int, Double)]
      .collect().toSeq
    assert(out == Seq((1L, 0, 2.0), (2L, 1, 2.0), (3L, 2, 2.0), (4L, 0, 25.0)))
    // withDistance=false drops the column; the fitted centers validate
    val slim = ClusterAssign(centers, withDistance = false).transform(df)
    assert(!slim.columns.contains("d2"))
    intercept[IllegalArgumentException] {
      ClusterAssign(Seq(Seq(1.0), Seq(0.0, 1.0)))
    }
    // a null vector has no nearest centroid: null out, not an arbitrary
    // cluster elected by struct-min over null distances
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(9L, null.asInstanceOf[Any])),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val nullRow = ClusterAssign(centers).transform(withNull).head()
    assert(nullRow.isNullAt(2) && nullRow.isNullAt(3),
      "null vector -> null cluster_id and null d2")
  }
}
