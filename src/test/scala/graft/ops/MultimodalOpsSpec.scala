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
}
