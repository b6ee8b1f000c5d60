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

  test("NormalizeEmbeddings rejects non-array columns") {
    val df = Seq((1L, "x")).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      NormalizeEmbeddings().transformSchema(df.schema)
    }
  }
}
