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

/** Per-vector min–max int8 quantization — the storage/bandwidth saver for
  * embedding corpora (a float32 100 TB embedding store quantizes to
  * ~25 TB plus two longs per vector). Affine codes: `code =
  * (x − min) · levels / (max − min)` per component, carried out entirely
  * in integer micros so both engines compute bit-identical codes:
  * components quantize to `floor(x · 1e6)` longs FIRST, then the code is
  * one exact integer-ratio floor (products stay far below 2^53 for any
  * realistic embedding magnitude). A constant vector (max == min) has no
  * spread: every code is 0 and dequantization returns the min. Output is
  * already scalar rows (id, min/max micros, pos, code) — the driver-
  * comparable shape, one row per component.
  *
  * Scale: row-local expressions + one posexplode, shuffle-free; the
  * explode multiplies rows ×dims but each row is 4 longs. Dequantize at
  * the cell midpoint, `(mn_micros + (code + 0.5)·(mx_micros − mn_micros)
  * / levels) / 1e6` — max error (max−min)/(2·levels) + 1e-6 (half a
  * quantization cell plus the micro round-down), asserted in
  * EmbeddingOpsSpec.
  */
case class QuantizeEmbeddings(
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    levels: Int = 255) extends EnsembleOp {

  require(levels >= 1 && levels <= 255, s"$name: levels must be in [1, 255]")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol)
    val i = requireCol(in, vecCol)
    in(i).dataType match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case t => throw new IllegalArgumentException(
        s"$name: '$vecCol' must be a float/double array, got ${t.simpleString}")
    }
    StructType(Seq(
      in(idCol),
      StructField("mn_micros", LongType),
      StructField("mx_micros", LongType),
      StructField("pos", IntegerType, nullable = false),
      StructField("code", IntegerType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val rng = col("mx_micros") - col("mn_micros")
    df.select(col(idCol),
        arrayTransform(col(vecCol),
          x => floor(x.cast("double") * 1e6).cast("long")).as("__xm"))
      .select(col(idCol), col("__xm"),
        array_min(col("__xm")).as("mn_micros"),
        array_max(col("__xm")).as("mx_micros"))
      .select(col(idCol), col("mn_micros"), col("mx_micros"),
        posexplode(arrayTransform(col("__xm"), q =>
          when(rng > 0,
            // exact: both factors are longs, the product < 2^53, and a
            // double ratio of exact longs floors identically to integer
            // division (the TextFunctions.bp discipline)
            floor((q - col("mn_micros")).cast("double") * levels / rng.cast("double")))
            .otherwise(lit(0L))
            .cast("int"))).as(Seq("pos", "code")))
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

/** PCA projection of an embedding column — the offline dimensionality
  * compression step before indexing (the linear half of FAISS-style
  * OPQ/PCA pre-transforms; classical PCA, public method). The fit is
  * MLlib's distributed PCA (covariance aggregation + local
  * eigendecomposition); what persists is ONLY the k principal axes as
  * plain parameter doubles — like IVF centroids, there is no model
  * artifact, and the projection is a pure per-row expression (k
  * [[graft.functions.ArrayDotProduct]] passes over literal axes),
  * shuffle-free and linear in rows × dims × k at any scale.
  *
  * Conventions match `ml.feature.PCAModel.transform` exactly: vectors
  * project UNCENTERED onto the axes (MLlib centers the covariance, not
  * the data — the spec pins our expression against the MLlib
  * transform on the same fit). Choose k by the fit's explained-variance
  * profile; downstream, a PCA-reduced index trades recall for memory
  * exactly like [[AnnIvfPq]]'s codes (compose: PCA → IVF-PQ).
  *
  * CAUTION for pair-join consumers: Catalyst inlines this projection
  * into whatever stage consumes it, so feeding the lazy output straight
  * into a pair scorer (broadcast-NL top-k, near-dup join) re-evaluates
  * the k axis-dots PER PAIR — measured 175 s vs ~2 s at sf0.1 on the
  * PCA-shortlist query. Persist or write the projected frame before any
  * join that multiplies rows; linear scans need no such care. */
case class PcaProject(
    components: Seq[Seq[Double]],
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    outputCol: String = "reduced") extends EnsembleOp {

  require(components.nonEmpty, s"$name: need at least one principal axis")
  require(components.map(_.size).distinct.size == 1,
    s"$name: principal axes must agree on dimensionality")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    require(!in.fieldNames.contains(outputCol),
      s"$name: output column '$outputCol' collides with the input schema")
    StructType(in :+ StructField(outputCol, ArrayType(DoubleType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val projected = array(components.map(axis => V.dot(v, typedLit(axis))): _*)
    df.withColumn(outputCol, when(col(vecCol).isNull, lit(null)).otherwise(projected))
  }
}

/** Nearest-centroid cluster assignment — the corpus-map primitive behind
  * semantic mixture design, cluster-stratified sampling and SemDeDup-style
  * bucketing (assignment half of k-means; public method). The fitted
  * centroids are offline parameters exactly like [[AnnIvf]]'s coarse
  * centers ([[graft.functions.VectorFunctions.fitCenters]]): metadata
  * scale, persistable as plain doubles, inlined as literals — so
  * assignment is one codegen'd expression per row, shuffle-free and
  * linear in rows × k × dims at any corpus size.
  *
  * Distance uses the exact expansion `d² = |v|² + |c|² − 2·v·c` with |c|²
  * precomputed in Scala — both remaining dots are sequential folds the
  * oracle replays bit-identically (the op_ann_ivf discipline). Argmin
  * tie-breaks to the lowest cluster id (struct-min over (d, cid)). */
case class ClusterAssign(
    centers: Seq[Seq[Double]],
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    withDistance: Boolean = true) extends EnsembleOp {

  require(centers.nonEmpty, s"$name: need at least one centroid")
  require(centers.map(_.size).distinct.size == 1,
    s"$name: centroids must agree on dimensionality")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    val base = in :+ StructField("cluster_id", IntegerType)
    StructType(if (withDistance) base :+ StructField("d2", DoubleType) else base)
  }

  override def transform(df: DataFrame): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // fused nearest-centroid kernel (null vectors yield NULL cluster by
    // its null discipline — the old explicit null guard's behavior);
    // the winner's distance recomputes from the elected cid with ONE
    // dot against the centroid DATA literal: `(c2 - 2*dot(v,c))` reads
    // the same driver-side c2 double and the same sequential dot fold
    // the kernel ranked with, then `+ dot(v,v)` AFTER — exactly the
    // fold order the dump-time oracle's SQL replays
    val cid = V.nearestCentroid(v, centers)
    val out = df.withColumn("cluster_id", cid)
    if (withDistance) {
      val c2Lit = typedLit(centers.map(c => c.map(x => x * x).sum).toArray)
      val cvLit = typedLit(centers.map(_.toArray).toArray)
      out.withColumn("d2",
        (element_at(c2Lit, col("cluster_id") + 1) -
          lit(2.0) * V.dot(v, element_at(cvLit, col("cluster_id") + 1))) +
          V.dot(v, v))
    } else out
  }
}

/** Frozen-quantizer drift report — the REFIT TRIGGER the streaming
  * index sinks promise ("monitor recall, refit on drift"): compare a
  * NEW batch's nearest-centroid assignment profile against the
  * REFERENCE catalog the quantizer was fitted over, per cluster, in
  * exact arithmetic. Emits one row per cluster present on either side:
  * counts, basis-point shares, the absolute share drift, the
  * reference's max in-cluster distance (`theta_d2`, the fitted
  * coverage radius), and how many new items land OUTSIDE it (`n_far` —
  * items the frozen quantizer has never seen the like of; a new item
  * in a cluster with no reference mass is far by definition). Large
  * `drift_bp` = the mixture moved; large `n_far` = the space moved;
  * either says refit + rebuild (FAISS operational practice). Scale: two
  * partial-aggregable passes collapse both sides to k rows before a
  * k-row broadcastable join — no shuffle carries vectors. Null vectors
  * carry no assignment and are excluded from both sides. */
case class QuantizerDrift(
    centers: Seq[Seq[Double]],
    reference: DataFrame,
    idCol: String = "vec_id",
    vecCol: String = "embedding") extends EnsembleOp {

  require(centers.nonEmpty, s"$name: need at least one centroid")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    StructType(Seq(
      StructField("cluster_id", IntegerType),
      StructField("ref_count", LongType),
      StructField("new_count", LongType),
      StructField("ref_share_bp", LongType),
      StructField("new_share_bp", LongType),
      StructField("drift_bp", LongType),
      StructField("theta_d2", DoubleType),
      StructField("n_far", LongType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val assign = ClusterAssign(centers, idCol, vecCol)
    val refA = assign.transform(reference.filter(col(vecCol).isNotNull))
    val newA = assign.transform(df.filter(col(vecCol).isNotNull))
    // k-row aggregates; the exact max distance is order-independent, so
    // theta_d2 replays bit-identically in any engine
    val refAgg = refA.groupBy("cluster_id")
      .agg(count(lit(1)).as("ref_count"), max(col("d2")).as("theta_d2"))
    val newAgg = newA
      .join(broadcast(refAgg.select(col("cluster_id"),
        col("theta_d2").as("__theta"))), Seq("cluster_id"), "left")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("new_count"),
        sum(when(col("__theta").isNull || col("d2") > col("__theta"), 1L)
          .otherwise(0L)).as("n_far"))
    val joined = refAgg.join(newAgg, Seq("cluster_id"), "full_outer")
      .select(col("cluster_id"),
        coalesce(col("ref_count"), lit(0L)).as("ref_count"),
        coalesce(col("new_count"), lit(0L)).as("new_count"),
        col("theta_d2"),
        coalesce(col("n_far"), lit(0L)).as("n_far"))
    // integer basis points against each side's own total (the
    // MixturePlan discipline: never a float ratio in a hashed output)
    val totals = joined.agg(sum(col("ref_count")).as("__rt"),
      sum(col("new_count")).as("__nt"))
    joined.crossJoin(broadcast(totals))
      .select(col("cluster_id"), col("ref_count"), col("new_count"),
        when(col("__rt") === 0, lit(0L))
          .otherwise(expr("ref_count * 10000 div __rt")).as("ref_share_bp"),
        when(col("__nt") === 0, lit(0L))
          .otherwise(expr("new_count * 10000 div __nt")).as("new_share_bp"),
        col("theta_d2"), col("n_far"))
      .withColumn("drift_bp", abs(col("new_share_bp") - col("ref_share_bp")))
      .select("cluster_id", "ref_count", "new_count", "ref_share_bp",
        "new_share_bp", "drift_bp", "theta_d2", "n_far")
  }
}

object PcaProject {
  /** Fit the principal axes with MLlib PCA and build the op; axes come
    * back as plain doubles (column i of the d×k loading matrix). */
  def fit(df: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", outputCol: String = "reduced"): PcaProject = {
    // null vectors cannot shape the axes (MLlib's covariance agg NPEs
    // on them — the TextQualityClassifier.train discipline)
    val assembled = df.where(col(vecCol).isNotNull).select(
      org.apache.spark.ml.functions.array_to_vector(
        col(vecCol).cast("array<double>")).as("__features"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(k).setInputCol("__features").setOutputCol("__pca")
      .fit(assembled)
    val pc = model.pc
    val comps = (0 until k).map(i =>
      (0 until pc.numRows).map(j => pc(j, i)).toSeq)
    PcaProject(comps, idCol, vecCol, outputCol)
  }
}
