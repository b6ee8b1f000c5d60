package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted as CODEGEN'D
  * EXPRESSIONS — header parse via stock `substring`/`hex`/`conv`, the
  * per-byte loops as the fused [[graft.functions.ByteHistogram]] /
  * [[graft.functions.ByteStride]] expressions — so the whole media
  * stage stays inside WholeStageCodegen with column pruning and filter
  * pushdown intact (no mapPartitions row boxing, no opaque-stage
  * optimizer barrier). A REAL codec (JPEG/opus decode) is not
  * byte-local and would come back as a `mapInPandas`/mapPartitions
  * stage at exactly these call sites; the vectorized-reader boundary is
  * documented in SCALE.md.
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * [[MultimodalOps.decodeStub]] is a clearly-marked deterministic fake
  * (header parse + byte histogram), and the ops implement ITS math as
  * expressions — spec-pinned equal to the stub function. Everything
  * around it — schema, batch shape, metadata struct, null handling — is
  * the real production plumbing.
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
    * replaces only this math with an actual codec call. Kept as the
    * REFERENCE implementation the expression-based ops are spec-pinned
    * against (MultimodalSpec). */
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

  /** Big-endian u16 read at 1-based byte `pos` of a binary column, as an
    * expression: 2-byte slice → hex → base-16 parse. */
  private[ops] def u16(c: Column, pos: Int): Column =
    conv(hex(substring(c, pos, 2)), 16, 10).cast("int")

  /** The payload-byte count the stub normalizes by: max(1, len - 4). */
  private[ops] def payloadTotal(c: Column): Column =
    greatest(length(c) - 4, lit(1))
}

/** Decode + feature-extract stage over a binary media column, as pure
  * codegen'd expressions ([[MultimodalOps.decodeStub]]'s math: header
  * u16s via `substring`/`hex`/`conv`, the byte loop as the fused
  * [[graft.functions.ByteHistogram]] pass, float normalization in array
  * expressions). Shuffle-free, row-local, and — unlike the
  * mapPartitions formulation it replaces — transparent to Catalyst:
  * column pruning and predicate pushdown cross this stage, no
  * object-boxing serialization boundary. All per-BYTE work is inside
  * the codegen'd ByteHistogram pass; only the O(bins)=16-element
  * normalization runs as an interpreted HOF (Spark HOFs never codegen
  * — bin-level, not byte-level cost). Null or short (< 4 bytes)
  * content decodes to (0, 0, zero histogram), the stub's contract. */
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
    val c = col(contentCol)
    val ok = c.isNotNull && length(c) >= 4
    // count/total ends in FLOAT exactly as the stub computes it: Spark's
    // `/` promotes to double, and a binary32 division evaluated in
    // binary64 then rounded back IS the correctly-rounded float quotient
    // (double rounding is harmless for /: 53 >= 2*24 + 2), so the cast
    // chain is bit-identical to the stub's float division
    val total = payloadTotal(c).cast("float")
    // F.transform: the HOF, disambiguated from the op's own transform
    val histF = org.apache.spark.sql.functions.transform(
      graft.functions.FastExpressions.byteHistogram(c, histBins, 4),
      x => (x.cast("float") / total).cast("float"))
    df.select(col(idCol),
      when(ok, u16(c, 1)).otherwise(lit(0)).as(outputPrefix + "width"),
      when(ok, u16(c, 3)).otherwise(lit(0)).as(outputPrefix + "height"),
      when(ok, histF).otherwise(array_repeat(lit(0f), histBins))
        .as(outputPrefix + "features"))
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
  * step, as pure codegen'd expressions: header dims divide by `factor`
  * and re-encode big-endian via `hex`/`lpad`/`unhex`, the payload
  * stride-select is the fused [[graft.functions.ByteStride]] pass.
  * STUB math like [[DecodeMedia]] (a real deployment swaps in a codec
  * resample); null or short (< 4 bytes) content passes through
  * unchanged. Output is the same media schema so resize stages
  * compose/chain, shuffle-free and Catalyst-transparent. */
case class ResizeMedia(
    idCol: String = "media_id",
    contentCol: String = "content",
    factor: Int = 2) extends EnsembleOp {

  import MultimodalOps._

  require(factor >= 1, s"$name: factor must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    require(in(contentCol).dataType == BinaryType, s"$name: $contentCol must be binary")
    StructType(Seq(in(idCol), StructField(contentCol, BinaryType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val c = col(contentCol)
    // u16 <= 65535 is exact in double, so /-then-truncate == int division
    def scaled(pos: Int): Column = (u16(c, pos) / factor).cast("int")
    def be16(x: Column): Column = lpad(hex(x), 4, "0")
    val resized = concat(
      unhex(concat(be16(scaled(1)), be16(scaled(3)))),
      graft.functions.FastExpressions.byteStride(c, 4, factor))
    // a null length (null content) fails the predicate -> passthrough
    df.select(col(idCol),
      when(length(c) >= 4, resized).otherwise(c).as(contentCol))
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
    import org.apache.spark.sql.{functions => F}
    val c = col(contentCol)
    // ONE fused byte pass builds the 16-bin histogram; each tile t is a
    // pure rotation of it — slot (t, j) counts bytes with
    // (b + t) % bins == j, i.e. hist[(j - t) mod bins] — so the tiled
    // embedding derives from the histogram by array expressions with no
    // further byte work (the stub loops the payload once per tile)
    val hist = graft.functions.FastExpressions.byteHistogram(c, histBins, 4)
    // normalized = false keeps raw integer counts (exact in Float),
    // making downstream dot scores exact doubles — the
    // hash-oracle-friendly mode
    val t0 = MultimodalOps.payloadTotal(c).cast("float")
    // the cast chain reproduces the stub's float division exactly — see
    // DecodeMedia's double-rounding note
    val histF =
      if (normalized) F.transform(hist, x => (x.cast("float") / t0).cast("float"))
      else F.transform(hist, x => x.cast("float"))
    val emb = F.flatten(F.transform(
      F.sequence(lit(0), lit(dim / histBins - 1)),
      t => F.transform(F.sequence(lit(0), lit(histBins - 1)),
        j => element_at(histF, pmod(j - t, lit(histBins)) + 1))))
    // null content -> null embedding: the sequence spine is non-null, so
    // a null histogram would flatten into an array OF nulls — guard the
    // whole column instead
    df.select(col(idCol),
      when(c.isNull, lit(null)).otherwise(emb).as(outputCol))
  }
}
