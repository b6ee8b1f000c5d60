package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for LLM-scale corpus curation (BASELINE.json
  * north star). All emit either a keep-list (exact) or a verified
  * near-duplicate pair list (approximate), with similarity reported in
  * integer basis points so downstream thresholds never touch float
  * rounding.
  *
  * Scale design: the approximate ops never form the O(n²) pair space —
  * candidates come from an inverted index (shared shingle / LSH band /
  * SimHash band), so the shuffle is proportional to true collisions, not
  * to n². The brute-force pair scan exists only inside
  * [[CosineNearDup]] with `bucketed = false` for oracle checking.
  */

/** Exact dedup by content hash-group: one keep row per distinct content,
  * keeping the smallest id. `normalized = true` dedups on the whitespace/
  * case normal form. */
case class ExactDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    normalized: Boolean = false) extends EnsembleOp {

  private def key: Column = if (normalized) T.normalize(col(textCol)) else col(textCol)

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      StructField("content_hash", StringType),
      in(idCol).copy(name = "keep_id"),
      StructField("n_copies", LongType)))
  }

  override def transform(df: DataFrame): DataFrame =
    df.groupBy(key.as("__key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(md5(col("__key")).as("content_hash"), col("keep_id"), col("n_copies"))
}

/** Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
  * explode distinct shingles → self-join on shingle → per-pair intersection
  * counts → Jaccard from set sizes. Integer threshold: `inter*10000 >=
  * thresholdBp * union`. Candidate generation cost is Σ(shingle posting
  * list²) — proportional to real overlap, not n². */
case class NgramJaccardDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    thresholdBp: Int = 8000) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol).copy(name = "doc_a"), in(idCol).copy(name = "doc_b"),
      StructField("inter", LongType), StructField("uni", LongType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(T.shingleSet(col(textCol), n)).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"), Seq("s"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnsRenamed(Map("id" -> "doc_a", "n_sh" -> "na")), Seq("doc_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "doc_b", "n_sh" -> "nb")), Seq("doc_b"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 10000 >= col("uni") * thresholdBp)
      .select("doc_a", "doc_b", "inter", "uni")
  }
}

/** MinHash + LSH banding near-dup detection: k-hash signature → `bands`
  * band keys → candidates join on (band index, band hash) → verified with
  * exact Jaccard on the shingle sets. Probability a pair with Jaccard j
  * surfaces: 1-(1-j^rows)^bands (≈0.99 at j=0.8 with 8×4). The scalable
  * default for corpus dedup: candidate volume tracks collisions only. */
case class MinHashDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    numHashes: Int = 32,
    bands: Int = 8,
    thresholdBp: Int = 8000) extends EnsembleOp {

  require(numHashes % bands == 0, s"$name: numHashes must divide into bands")
  private val rowsPerBand = numHashes / bands

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol).copy(name = "doc_a"), in(idCol).copy(name = "doc_b"),
      StructField("jaccard_bp", LongType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val docs = df.select(col(idCol).as("id"), T.shingleSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("bands", T.minhashBands(T.minhashSignature(col("sh"), numHashes), bands, rowsPerBand))
    val banded = docs.select(col("id"), col("sh"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    banded.as("a").join(banded.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("long"))
      .filter(col("inter") * 10000 >= col("uni") * thresholdBp)
      .select(col("doc_a"), col("doc_b"),
        ((col("inter") * 10000) / col("uni")).cast("long").as("jaccard_bp"))
  }
}

/** SimHash near-dup detection: 64-bit per-document hash, candidates share
  * at least one of four 16-bit bands (guaranteed complete for hamming ≤ 3,
  * high-recall beyond), verified by exact hamming distance. */
case class SimHashDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    maxHamming: Int = 8) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol).copy(name = "doc_a"), in(idCol).copy(name = "doc_b"),
      StructField("hamming", IntegerType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      T.simhash64(T.shingleSet(col(textCol), n)).as("h"))
    val bandArr = array((0 until 4).map(b =>
      concat_ws(":", lit(b),
        shiftrightunsigned(col("h"), 16 * b).bitwiseAND(lit(0xFFFFL)))): _*)
    val banded = hashed.withColumn("band", explode(bandArr))
    banded.as("a").join(banded.as("b"), Seq("band"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        T.hamming64(col("a.h"), col("b.h")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }
}

/** Embedding cosine near-duplicate pairs. `bucketed = false` scans all
  * pairs (oracle-checkable reference); the scale path is [[AnnLsh]]-style
  * hyperplane bucketing. */
case class CosineNearDup(
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    threshold: Double = 0.45) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    StructType(Seq(
      in(idCol).copy(name = "id_a"), in(idCol).copy(name = "id_b"),
      StructField("cosine", DoubleType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", V.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
