package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{transform => arrayTransform}
import org.apache.spark.sql.types._
import graft.core.{EnsembleOp, Tags}
import graft.functions.{VectorFunctions => V}

/** L2-normalization of an embedding column — the standard preprocessing
  * before cosine retrieval (normalized vectors turn cosine into a plain
  * dot product, which is what [[TopKRetrieval]]/[[AnnLsh]]/[[AnnIvf]]
  * score with). Row-local, shuffle-free, codegen'd: the norm is one
  * [[graft.functions.ArrayDotProduct]] pass and the scale-out is an array
  * `transform` — linear in (rows × dims) at any scale.
  *
  * An all-zero vector has no direction: its output is NULL (mirrored in
  * the oracle) rather than a NaN-filled array that would poison downstream
  * dot products.
  */
case class NormalizeEmbeddings(
    vecCol: String = "embedding",
    outCol: String = "embedding_norm") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    val i = requireCol(in, vecCol)
    in(i).dataType match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case t => throw new IllegalArgumentException(
        s"$name: '$vecCol' must be a float/double array, got ${t.simpleString}")
    }
    StructType(in :+ StructField(outCol, ArrayType(DoubleType),
      metadata = Tags.metadataFor(Seq(Tags.Embedding))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val v = col(vecCol)
    // the norm must be a REAL projected column, not an expression inside
    // the transform lambda: higher-order-function lambda bodies re-evaluate
    // per element and CSE does not reach into them, so an inlined norm
    // would recompute the full dot product dims times per row
    df.withColumn("__norm", sqrt(V.dot(v, v)))
      .withColumn(outCol,
        when(col("__norm") > 0,
          arrayTransform(v, x => x.cast("double") / col("__norm")))
          .as(outCol, Tags.metadataFor(Seq(Tags.Embedding))))
      .drop("__norm")
  }
}

/** Mean-pooling of embeddings per group key — centroid construction
  * (class prototypes, user profiles from item embeddings, IVF seeding).
  *
  * Exactness at scale is the design problem: float sums depend on
  * reduction order, and a shuffle reorders rows — so a naive `avg` can
  * never hash-match an oracle. The op therefore quantizes each component
  * to integer micros (`floor(x * 1e6)`) FIRST and sums longs, which is
  * order-independent and overflow-safe to ~9e12 rows per (key, dim). The
  * pooled output reports the exact integer sum and count plus the derived
  * double mean (one division — deterministic given the exact sum).
  *
  * Plan shape: posexplode (row-local) → groupBy(key, dim) with map-side
  * partial aggregation — one shuffle of (key, dim, sum, count) partials,
  * never the raw vectors. Output is #keys × #dims rows: already scalar,
  * already tiny relative to the input.
  */
case class MeanPoolEmbeddings(
    keyCol: String = "label",
    vecCol: String = "embedding") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, keyCol)
    val i = requireCol(in, vecCol)
    in(i).dataType match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case t => throw new IllegalArgumentException(
        s"$name: '$vecCol' must be a float/double array, got ${t.simpleString}")
    }
    StructType(Seq(in(keyCol),
      StructField("pos", IntegerType, nullable = false),
      StructField("n_vecs", LongType, nullable = false),
      StructField("sum_micros", LongType),
      StructField("mean", DoubleType)))
  }

  override def transform(df: DataFrame): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(keyCol), col("pos"),
        floor(col("x").cast("double") * 1e6).cast("long").as("q"))
      .groupBy(col(keyCol), col("pos"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("q")).as("sum_micros"))
      .withColumn("mean", col("sum_micros").cast("double") / col("n_vecs") / 1e6)
}
