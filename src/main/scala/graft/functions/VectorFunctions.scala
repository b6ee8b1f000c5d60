package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns using built-in higher-order
  * functions — codegen-friendly, no UDFs (SURVEY.md §7.1 design rule).
  * Accumulation is a sequential left fold in double precision, which makes
  * scores bit-deterministic regardless of partitioning.
  */
object VectorFunctions {

  /** Dot product of two array columns, accumulated in double. Backed by
    * the custom [[graft.functions.ArrayDotProduct]] expression — one tight
    * JVM loop per row; bit-identical to the HOF formulation
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` (sequential double fold). */
  def dot(a: Column, b: Column): Column = FastExpressions.arrayDot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** array<struct<d, cid>> of (rank-equivalent squared distance, centroid
    * id) per literal centroid: d²(x,c) = |x|² − 2x·c + |c|² with the
    * rank-invariant |x|² dropped. Struct ordering makes array_min /
    * array_sort pick nearest centroids with deterministic lowest-id
    * tie-breaks — the single quantizer formula shared by AnnIvf (probe
    * lists) and SemanticNearDup (cluster buckets). */
  def centroidStructs(vec: Column, centers: Seq[Seq[Double]]): Column =
    array(centers.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(vec, typedLit(c.toArray))).as("d"),
        lit(i).as("cid"))
    }: _*)

  /** Id of the nearest centroid (deterministic lowest-id tie-break) —
    * the fused [[graft.functions.NearestCids]] loop, value-identical to
    * `array_min(centroidStructs(...)).getField("cid")` on valid input
    * (CodegenSpec pins the bit-identity); the struct tree emitted one
    * dot subtree per centroid into generated code, which drops to
    * interpreted eval at serving-scale nlist (measured 215 s for one
    * occupancy report over 200k×3125 at sf1.0 vs ~1 s fused). Null
    * discipline is the PqEncode precedent: degenerate vectors (null,
    * null element, wrong length) yield NULL instead of capturing into
    * centroid 0. */
  def nearestCentroid(vec: Column, centers: Seq[Seq[Double]]): Column =
    element_at(FastExpressions.nearestCids(vec, centers, 1), 1)

  /** The `n` nearest centroid ids, (d, cid)-ascending — the probe-side
    * twin (replaces `slice(array_sort(centroidStructs(...)), 1, n)`
    * projected to cids; same fused kernel, same bit-identity pin). */
  def nearestCentroids(vec: Column, centers: Seq[Seq[Double]], n: Int): Column =
    FastExpressions.nearestCids(vec, centers, n)

  /** Seeded MLlib k-means over an ArrayType vector column, returned as
    * plain parameter doubles (trivially persistable; metadata scale) —
    * the shared fit behind AnnIvf.fit and SemanticNearDup.fit. */
  def fitCenters(df: org.apache.spark.sql.DataFrame, vecCol: String,
      k: Int, maxIter: Int, seed: Long): Seq[Seq[Double]] = {
    val assembled = df.select(
      org.apache.spark.ml.functions.array_to_vector(
        col(vecCol).cast("array<double>")).as("__features"))
    new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("__features")
      .fit(assembled)
      .clusterCenters.map(_.toArray.toSeq).toSeq
  }

  /** Per-dimension mean of a vector column, collected to the driver as a
    * literal-sized array (#dims doubles — metadata scale, like AQE stats).
    * The aggregation itself is distributed (map-side-combined avg over
    * posexploded (dim, x) rows); only the final #dims-row frame is
    * collected. Used to center LSH hyperplanes on the data. */
  def meanVector(df: org.apache.spark.sql.DataFrame, vecCol: String): Array[Double] =
    df.select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .groupBy("__d").agg(avg("__x").as("__m"))
      .orderBy("__d")
      .collect().map(_.getDouble(1))
}
