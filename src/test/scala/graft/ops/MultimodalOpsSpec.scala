package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  // fake media: header 00 02 00 03 → 2×3, body bytes 0..9
  private def fakeMedia(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++ body

  test("DecodeMedia extracts header dims and normalized histogram") {
    val df = Seq(
      (1L, fakeMedia(640, 480, Array.tabulate(32)(_.toByte))),
      (2L, fakeMedia(2, 3, Array[Byte](0, 0, 0, 0)))
    ).toDF("media_id", "content")
    val out = DecodeMedia().transform(df).orderBy("media_id")
      .as[(Long, Int, Int, Seq[Float])].collect()
    assert(out(0)._2 == 640 && out(0)._3 == 480)
    assert(out(0)._4.size == MultimodalOps.histBins)
    assert(math.abs(out(0)._4.sum - 1.0f) < 1e-5, "histogram normalized")
    assert(out(1)._4.head == 1.0f, "all-zero body lands in bin 0")
    // deterministic: same bytes → same features
    val again = DecodeMedia().transform(df).orderBy("media_id")
      .as[(Long, Int, Int, Seq[Float])].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("DecodeMedia handles null and short content") {
    val df = Seq((1L, null.asInstanceOf[Array[Byte]]), (2L, Array[Byte](1)))
      .toDF("media_id", "content")
    val out = DecodeMedia().transform(df).orderBy("media_id")
      .as[(Long, Int, Int, Seq[Float])].collect()
    assert(out.forall(r => r._2 == 0 && r._3 == 0))
  }

  test("SampleFrames emits every strided fixed-size chunk") {
    val content = Array.tabulate(256)(_.toByte) // 4 frames of 64
    val df = Seq((7L, content)).toDF("media_id", "content")
    val frames = SampleFrames(frameBytes = 64, stride = 2).transform(df)
      .orderBy("frame_idx").as[(Long, Int, Array[Byte])].collect()
    assert(frames.map(_._2).toSeq == Seq(0, 2))
    assert(frames.forall(_._3.length == 64))
    assert(frames(0)._3(0) == 0 && frames(1)._3(0) == (128 & 0xFF).toByte)
  }

  test("ResizeMedia halves header dims, keeps every 2nd payload byte, chains") {
    val content = Array[Byte](0x01, 0x00, 0x00, 0x40.toByte,  // 256 x 64
      1, 2, 3, 4, 5, 6, 7, 8)
    val df = Seq((1L, content)).toDF("media_id", "content")
    val once = ResizeMedia(factor = 2).transform(df).collect().head.getAs[Array[Byte]](1)
    assert(((once(0) & 0xFF) << 8 | (once(1) & 0xFF)) == 128)
    assert(((once(2) & 0xFF) << 8 | (once(3) & 0xFF)) == 32)
    assert(once.drop(4).toSeq == Seq[Byte](1, 3, 5, 7), "every 2nd payload byte")
    // resize composes: output schema is input schema
    val twice = ResizeMedia(factor = 2).transform(ResizeMedia(factor = 2).transform(df))
      .collect().head.getAs[Array[Byte]](1)
    assert(((twice(0) & 0xFF) << 8 | (twice(1) & 0xFF)) == 64)
    // null and too-short content pass through untouched
    val nullRow = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(2L, null.asInstanceOf[Any])),
      df.schema)
    assert(ResizeMedia().transform(nullRow).collect().head.isNullAt(1))
  }

  test("MediaEmbed: deterministic content-derived vectors; raw-count mode is integral") {
    val content = Array[Byte](0, 0, 0, 0) ++ (0 until 20).map(_.toByte).toArray
    val df = Seq((1L, content)).toDF("media_id", "content")
    val raw = MediaEmbed(dim = 32, normalized = false).transform(df)
      .collect().head.getSeq[Float](1)
    assert(raw.length == 32)
    assert(raw.sum == 40.0f, "two tiles x 20 payload bytes")
    assert(raw.forall(v => v == v.floor), "raw counts are integral floats")
    val norm = MediaEmbed(dim = 32).transform(df).collect().head.getSeq[Float](1)
    assert(math.abs(norm.sum - 2.0f) < 1e-5, "normalized tiles each sum to 1")
    // same content -> same embedding (determinism)
    val again = MediaEmbed(dim = 32, normalized = false).transform(df)
      .collect().head.getSeq[Float](1)
    assert(again == raw)
    // null content -> null embedding
    val nullRow = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(2L, null.asInstanceOf[Any])),
      df.schema)
    assert(MediaEmbed().transform(nullRow).collect().head.isNullAt(1))
  }

  test("the expression-based decode/embed equals the reference stub byte-for-byte") {
    val rnd = new scala.util.Random(47)
    val media = (1L to 40L).map { i =>
      // varied lengths incl. header-only and odd sizes
      val len = (i % 5) match { case 0 => 4; case 1 => 5; case _ => 4 + rnd.nextInt(60) }
      (i, Array.tabulate(len)(_ => rnd.nextInt(256).toByte))
    }
    val df = media.toDF("media_id", "content")
    val got = DecodeMedia().transform(df).orderBy("media_id")
      .as[(Long, Int, Int, Seq[Float])].collect()
    media.zip(got).foreach { case ((id, bytes), (gid, w, h, feats)) =>
      val (sw, sh, sf) = MultimodalOps.decodeStub(bytes)
      assert(id == gid && w == sw && h == sh, s"dims diverge at $id")
      assert(feats == sf.toSeq, s"histogram diverges from the stub at $id")
    }
    // MediaEmbed normalized mode vs the stub's tiled loop
    val emb = MediaEmbed(dim = 32).transform(df).orderBy("media_id")
      .as[(Long, Seq[Float])].collect()
    media.zip(emb).foreach { case ((id, bytes), (gid, v)) =>
      val d = 32; val bins = MultimodalOps.histBins
      val ref = new Array[Float](d)
      for (t <- 0 until d / bins; i <- 4 until bytes.length)
        ref(t * bins + (((bytes(i) & 0xFF) + t) % bins)) += 1f
      val t0 = math.max(1, bytes.length - 4).toFloat
      assert(id == gid && v == ref.map(_ / t0).toSeq,
        s"embedding diverges from the stub loop at $id")
    }
  }

  test("media ops are Catalyst-transparent: no object boxing, codegen'd plans") {
    // a range-backed source: a local Seq would be constant-folded into a
    // LocalTableScan (ConvertToLocalRelation), hiding the plan shape
    val df = spark.range(1, 50).select(col("id").as("media_id"),
      unhex(md5(col("id").cast("string"))).as("content"))
    val ops: Seq[(graft.core.EnsembleOp, String)] = Seq(
      (DecodeMedia(), "byte_histogram"),
      (ResizeMedia(), "byte_stride"),
      (MediaEmbed(dim = 32), "byte_histogram"))
    for ((op, marker) <- ops) {
      val plan = op.transform(df).queryExecution.executedPlan.toString
      assert(!plan.contains("MapPartitions") &&
        !plan.contains("SerializeFromObject") &&
        !plan.contains("DeserializeToObject"),
        s"${op.name} must be expression-based (no object boxing), got:\n$plan")
      assert(plan.contains(marker),
        s"${op.name} must run the fused $marker byte loop, got:\n$plan")
    }
    // the per-BYTE work is inside the codegen'd fused expressions; only
    // the O(bins)=16-element HOF normalization evaluates interpreted
    // (Spark HOFs never codegen), which is bin-level, not byte-level
  }
}
