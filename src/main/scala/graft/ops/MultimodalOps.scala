package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in distributed
  * batches via `mapPartitions` (the JVM analog of `mapInPandas`).
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * [[MultimodalOps.decodeStub]] is a clearly-marked deterministic fake
  * (header parse + byte histogram). Everything around it — schema,
  * partition-parallel batch shape, metadata struct, null handling — is the
  * real production plumbing: swapping the stub for a JNI/javacv decoder
  * changes one function.
  */
object MultimodalOps {

  /** Canonical multimodal schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Number of histogram bins the stub extractor emits. */
  val histBins = 16

  /** === STUB ===  Deterministic fake decoder: 4-byte "header" → (w, h),
    * remaining bytes → normalized 16-bin histogram. A real deployment
    * replaces only this function with an actual codec call. */
  def decodeStub(content: Array[Byte]): (Int, Int, Array[Float]) = {
    if (content == null || content.length < 4) (0, 0, new Array[Float](histBins))
    else {
      val w = ((content(0) & 0xFF) << 8) | (content(1) & 0xFF)
      val h = ((content(2) & 0xFF) << 8) | (content(3) & 0xFF)
      val hist = new Array[Float](histBins)
      var i = 4
      while (i < content.length) { hist((content(i) & 0xFF) % histBins) += 1f; i += 1 }
      val total = math.max(1, content.length - 4).toFloat
      (w, h, hist.map(_ / total))
    }
  }
}

/** Decode + feature-extract stage over a binary media column. Runs
  * partition-parallel with no shuffle; output schema is declared up front
  * so Catalyst can prune/pushdown around the opaque stage. */
case class DecodeMedia(
    idCol: String = "media_id",
    contentCol: String = "content",
    outputPrefix: String = "") extends EnsembleOp {

  import MultimodalOps._

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    require(in(contentCol).dataType == BinaryType, s"$name: $contentCol must be binary")
    StructType(Seq(
      in(idCol),
      StructField(outputPrefix + "width", IntegerType),
      StructField(outputPrefix + "height", IntegerType),
      StructField(outputPrefix + "features", ArrayType(FloatType))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val out = transformSchema(df.schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, hist) = decodeStub(
          if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx))
        Row(r.get(idIdx), w, h, hist.toSeq)
      }
    }(encoder)
  }
}

/** Frame sampling for "video" binaries: fixed-size chunks, every `stride`th
  * chunk emitted as one frame row (1→N row expansion, requestId lineage
  * preserved). Pure expressions — substring/explode — no UDF. */
case class SampleFrames(
    idCol: String = "media_id",
    contentCol: String = "content",
    frameBytes: Int = 64,
    stride: Int = 2) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    StructType(Seq(in(idCol),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val nFrames = floor(length(col(contentCol)) / frameBytes).cast("int")
    df.select(col(idCol), col(contentCol),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        expr(s"substring($contentCol, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
  }
}

/** Resize stage for binary media — the standard normalize-before-encode
  * step. STUB like [[DecodeMedia]]: the deterministic fake halves the
  * header dimensions by `factor` and keeps every `factor`-th payload
  * byte (a real deployment swaps in a codec resample; schema, batch
  * shape, and null handling are the production plumbing). Runs
  * partition-parallel with no shuffle; output is the same media schema
  * so resize stages compose/chain. */
case class ResizeMedia(
    idCol: String = "media_id",
    contentCol: String = "content",
    factor: Int = 2) extends EnsembleOp {

  require(factor >= 1, s"$name: factor must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    require(in(contentCol).dataType == BinaryType, s"$name: $contentCol must be binary")
    StructType(Seq(in(idCol), StructField(contentCol, BinaryType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val out = transformSchema(df.schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val f = factor
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.mapPartitions { rows =>
      rows.map { r =>
        val c = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val resized =
          if (c == null || c.length < 4) c
          else {
            val w = (((c(0) & 0xFF) << 8) | (c(1) & 0xFF)) / f
            val h = (((c(2) & 0xFF) << 8) | (c(3) & 0xFF)) / f
            val payload = (4 until c.length by f).map(c(_)).toArray
            Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++ payload
          }
        Row(r.get(idIdx), resized)
      }
    }(encoder)
  }
}

/** Embedding extraction for binary media — the feature column a
  * multimodal corpus indexes and deduplicates on. STUB embedding:
  * [[MultimodalOps.decodeStub]]'s 16-bin byte histogram tiled across
  * `dim` with per-tile byte offsets (deterministic, content-derived — a
  * real deployment swaps in a vision/audio encoder call; everything
  * else is the production plumbing). The output column is a plain
  * `Array[Float]`, so the ENTIRE embedding family downstream —
  * [[NormalizeEmbeddings]], [[TopKRetrieval]], [[AnnIvf]],
  * [[CosineNearDup]], [[SemanticDecontaminate]], [[PcaProject]] —
  * consumes media embeddings unchanged. */
case class MediaEmbed(
    idCol: String = "media_id",
    contentCol: String = "content",
    dim: Int = 32,
    normalized: Boolean = true,
    outputCol: String = "embedding") extends EnsembleOp {

  import MultimodalOps.histBins
  require(dim >= 1 && dim % histBins == 0,
    s"$name: dim must be a positive multiple of $histBins")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    require(in(contentCol).dataType == BinaryType, s"$name: $contentCol must be binary")
    StructType(Seq(in(idCol), StructField(outputCol, ArrayType(FloatType))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val out = transformSchema(df.schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val d = dim
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.mapPartitions { rows =>
      rows.map { r =>
        val c = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val emb =
          if (c == null) null
          else {
            val tiles = d / histBins
            val v = new Array[Float](d)
            var t = 0
            while (t < tiles) {
              var i = 4
              while (i < c.length) {
                v(t * histBins + (((c(i) & 0xFF) + t) % histBins)) += 1f
                i += 1
              }
              t += 1
            }
            // normalized = false keeps raw integer counts (exact in
            // Float), making downstream dot scores exact doubles — the
            // hash-oracle-friendly mode
            if (normalized) { val t0 = math.max(1, c.length - 4).toFloat
              v.map(_ / t0) } else v
          }
        Row(r.get(idIdx), if (emb == null) null else emb.toSeq)
      }
    }(encoder)
  }
}
