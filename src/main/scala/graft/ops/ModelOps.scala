package graft.ops

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp

/** Model-scoring stages (SURVEY.md §2.1 PredictForest / PredictImplicit /
  * PredictTensorflow / TransformWorkflow → MLlib, per the approved
  * BASELINE.json approach "MLlib pipelines + DataFrame feature
  * engineering"). Each op wraps a *fitted* model; training helpers live in
  * the companions. Scoring is `model.transform` — distributed, no driver
  * loops; `recommendForUserSubset` is MLlib's blocked cross-product with
  * per-block top-k (the same bounded-heap idea as TopKAggregator).
  */

/** Forest inference (reference FIL op, fil.py:222-229): flattens feature
  * columns into a vector (`input__0` analog) and emits `output__0`. */
case class PredictForest[M <: org.apache.spark.ml.PredictionModel[org.apache.spark.ml.linalg.Vector, M]](
    model: M,
    featureCols: Seq[String],
    outputCol: String = "output__0") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    featureCols.foreach(requireCol(in, _))
    StructType(in :+ StructField(outputCol, DoubleType))
  }

  override def transform(df: DataFrame): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
      .transform(df)
    model.setFeaturesCol("__features").setPredictionCol(outputCol)
      .transform(assembled).drop("__features")
  }
}

object PredictForest {
  /** Train a seeded random-forest regressor (reference trains XGBoost /
    * LightGBM / sklearn RF; capability parity via MLlib trees). */
  def trainRegressor(
      df: DataFrame, featureCols: Seq[String], labelCol: String,
      numTrees: Int = 20, maxDepth: Int = 6, seed: Long = 42L)
      : PredictForest[org.apache.spark.ml.regression.RandomForestRegressionModel] = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features").transform(df)
    val model = new RandomForestRegressor()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assembled)
    PredictForest(model, featureCols)
  }
}

/** Forest classification (reference FIL classifier,
  * fil.py:124-210 + 291-346): `output__0` is the class id when
  * `outputClass` (binary decided by `P(class 1) >= threshold`, multiclass
  * by argmax), the full per-class probability vector when `predictProba`,
  * and the raw positive-class score otherwise. Scoring is a distributed
  * `model.transform` — no driver loops, partition-parallel at any scale. */
case class PredictForestClassifier(
    model: org.apache.spark.ml.classification.RandomForestClassificationModel,
    featureCols: Seq[String],
    predictProba: Boolean = false,
    outputClass: Boolean = true,
    threshold: Double = 0.5,
    outputCol: String = "output__0") extends EnsembleOp {

  require(threshold >= 0.0 && threshold <= 1.0,
    s"$name: threshold must be a probability in [0, 1], got $threshold")

  // Mirror the reference's fail-fast stance on unsupported shapes
  // (fil.py:360-373 rejects at wrap time, never silently degrades):
  // threshold and the raw positive-class score are BINARY semantics —
  // a multiclass model must ask for proba or argmax explicitly.
  private def validateShape(): Unit = {
    if (model.numClasses > 2) {
      require(threshold == 0.5,
        s"$name: threshold applies to binary classifiers only " +
          s"(model has ${model.numClasses} classes); use the default 0.5")
      require(predictProba || outputClass,
        s"$name: raw positive-class score is binary-only " +
          s"(model has ${model.numClasses} classes); set predictProba=true " +
          "for per-class scores or outputClass=true for argmax")
    }
  }

  override def transformSchema(in: StructType): StructType = {
    validateShape()
    featureCols.foreach(requireCol(in, _))
    val t = if (predictProba) ArrayType(DoubleType) else DoubleType
    StructType(in :+ StructField(outputCol, t))
  }

  override def transform(df: DataFrame): DataFrame = {
    validateShape()
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
      .transform(df)
    val scored = model.setFeaturesCol("__features")
      .setPredictionCol("__pred").setProbabilityCol("__prob")
      .setRawPredictionCol("__raw")
      .transform(assembled)
    val proba = org.apache.spark.ml.functions.vector_to_array(col("__prob"))
    val out =
      if (predictProba) proba
      else if (outputClass) {
        if (model.numClasses == 2)
          when(proba.getItem(1) >= threshold, 1.0).otherwise(0.0)
        else col("__pred") // multiclass: argmax (threshold is binary-only)
      } else proba.getItem(model.numClasses - 1) // raw positive-class score
    scored.withColumn(outputCol, out)
      .drop("__features", "__pred", "__prob", "__raw")
  }
}

object PredictForestClassifier {
  /** Train a seeded random-forest classifier (reference packages XGBoost /
    * LightGBM / sklearn classifiers; capability parity via MLlib trees). */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
      numTrees: Int = 20, maxDepth: Int = 6, seed: Long = 42L,
      predictProba: Boolean = false, outputClass: Boolean = true,
      threshold: Double = 0.5): PredictForestClassifier = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features").transform(df)
    val model = new org.apache.spark.ml.classification.RandomForestClassifier()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assembled)
    PredictForestClassifier(model, featureCols, predictProba, outputClass, threshold)
  }
}

/** Matrix-factorization recommend (reference PredictImplicit,
  * implicit.py:92-113): per user, top-N item ids + scores. */
case class PredictImplicit(
    userFactors: DataFrame, // (id int, features array<float>)
    itemFactors: DataFrame,
    numToRecommend: Int = 10,
    userCol: String = "user_id",
    broadcastBudgetBytes: Long = 1L << 30) extends EnsembleOp {

  // The op serves from FACTOR TABLES, not a live ALSModel — the
  // reference's exact artifact contract (implicit.py:58-71 loads
  // user/item factors from .npz; serving never touches the trainer).
  // Parquet-backed frames hold no MLlib state, so a long-lived serving
  // session's cache management can never evict them into a retrain;
  // [[PredictImplicit.fromModel]] adapts a freshly-trained ALSModel.

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, userCol)
    StructType(Seq(StructField(userCol, LongType),
      StructField("ids", ArrayType(IntegerType)),
      StructField("scores", ArrayType(FloatType))))
  }

  // Blocked top-k scoring: the packed item-factor matrix is broadcast
  // (the same replicated-index assumption as the reference's FAISS index
  // copy, faiss.py:75-78) and each user partition scores ALL items in one
  // tight primitive loop with a bounded min-heap. This is the one place a
  // per-pair relational plan is the wrong physical shape: users × items
  // pairs (300M at sf0.1) through a join + per-row aggregate costs ~1 µs
  // of iterator overhead per pair (measured 347 s), while the blocked
  // loop is pure FMA over a flat float array (measured ~2 s). MLlib's
  // recommendForUserSubset does the same blocking but re-shuffles both
  // factor tables; we inherit its semantics (top-k by dot, cold users
  // drop) with a deterministic (score desc, id asc) tie-break.
  //
  // SIZE GATE: the replicated-matrix assumption dies at a 100× catalog
  // (100M items × rank 64 ≈ 25 GB through the driver), so when the packed
  // matrix would exceed `broadcastBudgetBytes` the op falls back to
  // [[partitionedTopN]] — item factors never leave their partitions.
  // memoized: the model is immutable, so the gate's count job runs once
  // per op instance, not once per transform call
  @transient private lazy val itemCount: Long = itemFactors.count()
  /** Factor rank read from the artifact itself (one 1-row job per op
    * instance — a fit-time scalar, like the gate count above). Guarded:
    * an empty item-factor table (e.g. a bad artifact path read as zero
    * rows) must fail with an op-named error, not an opaque
    * NoSuchElementException from head(), and blockedTopN is undefined
    * over zero items anyway. */
  @transient private lazy val rank: Int = {
    require(itemCount > 0,
      s"$name: item-factor table is empty — check the factor artifact path")
    itemFactors.select(col("features")).head().getSeq[Float](0).size
  }

  override def transform(df: DataFrame): DataFrame =
    if (itemCount * rank * 4L > broadcastBudgetBytes)
      partitionedTopN(df)
    else blockedTopN(df)

  /** Requested users joined to their factors: one row per DISTINCT
    * requested user (MLlib's recommendForUserSubset contract for
    * duplicated request rows); cold users drop via the inner join. */
  private def requestedUsers(df: DataFrame): DataFrame = {
    val userF = userFactors
    df.select(col(userCol)).distinct()
      .join(userF, col(userCol).cast("int") === userF("id"))
      .select(col(userCol).cast("long").as(userCol), col("features").as("__uvec"))
  }

  /** Beyond-broadcast fallback: users × item factors as a partitioned
    * cartesian shuffle join, per-pair dot, and the bounded-heap
    * [[graft.functions.TopKAggregator]] with map-side combine — no driver
    * collect, no broadcast, no global sort; both factor tables stay
    * distributed, so the path survives any catalog size (at ~1 µs/pair
    * iterator cost: correctness headroom, not the fast path — index
    * retrieval at that scale is [[AnnIvf]]). Same (score desc, id asc)
    * order as the blocked loop; scores accumulate in double here vs float
    * there, so sub-1e-6 near-ties can order differently — the gate spec
    * pins id-level equality on real factors. */
  private def partitionedTopN(df: DataFrame): DataFrame = {
    import graft.functions.{TopKAggregator, VectorFunctions}
    val topk = udaf(new TopKAggregator(numToRecommend))
    val items = itemFactors.select(
      col("id").cast("long").as("__iid"), col("features").as("__ivec"))
    requestedUsers(df)
      .join(items) // cartesian: |users|/p × |items|/q tasks, all parallel
      .groupBy(col(userCol))
      .agg(topk(col("__iid"),
        coalesce(VectorFunctions.dot(col("__uvec"), col("__ivec")),
          lit(Double.NaN))).as("__top"))
      .select(col(userCol),
        col("__top.ids").cast("array<int>").as("ids"),
        col("__top.scores").cast("array<float>").as("scores"))
  }

  private def blockedTopN(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rank = this.rank
    val itemRows = itemFactors.select(col("id"), col("features"))
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    val n = itemRows.length
    val itemIds = new Array[Int](n)
    val itemMat = new Array[Float](n * rank)
    var i = 0
    while (i < n) {
      itemIds(i) = itemRows(i)._1
      System.arraycopy(itemRows(i)._2, 0, itemMat, i * rank, rank)
      i += 1
    }
    val bcIds = spark.sparkContext.broadcast(itemIds)
    val bcMat = spark.sparkContext.broadcast(itemMat)
    val k = math.min(numToRecommend, n)
    val joined = requestedUsers(df)
      .as[(Long, Array[Float])]
      // spread users across all cores: the upstream join is tiny, so AQE
      // would otherwise coalesce it to one partition and serialize the
      // whole scoring pass
      .repartition(spark.sparkContext.defaultParallelism)
    joined.mapPartitions { rows =>
      val ids = bcIds.value; val mat = bcMat.value
      val m = ids.length
      // USER TILING: one user's pass streams the whole packed matrix
      // (|items|·rank·4 bytes). Near this op's broadcast gate the matrix
      // is up to broadcastBudgetBytes (1 GB default) — far beyond L3 —
      // so user-at-a-time scoring re-reads it from DRAM per user
      // (~150 TB of traffic for 150k users at the ceiling); a tile of
      // users per matrix pass divides that by the tile size and keeps
      // each item row hot in L1 across the tile. At rehearsal SFs the
      // matrix fits cache and the loop is compute-bound either way
      // (measured flat at sf1.0's 6 MB matrix — the serial float fold
      // the oracle replays caps per-pair ILP), so the tile is a
      // no-cost-now, necessary-at-the-gate shape. Result-identical by
      // construction: every per-pair dot keeps the same float fold
      // (d ascending) and every user sees items in the same order
      // (j ascending) as the untiled loop — the dump-time oracle
      // replays both orders, so the hash contract is untouched.
      val tileSize = 16
      rows.grouped(tileSize).flatMap { tile =>
        val t = tile.length
        val uids = new Array[Long](t)
        val uvecs = new Array[Array[Float]](t)
        var u = 0
        while (u < t) { uids(u) = tile(u)._1; uvecs(u) = tile(u)._2; u += 1 }
        // bounded min-heap of (score, id) per user — root is the worst
        val hScore = Array.ofDim[Float](t, k)
        val hId = Array.ofDim[Int](t, k)
        val size = new Array[Int](t)
        var j = 0
        while (j < m) {
          val base = j * rank; val id = ids(j)
          u = 0
          while (u < t) {
            val uvec = uvecs(u)
            var s = 0.0f; var d = 0
            while (d < rank) { s += uvec(d) * mat(base + d); d += 1 }
            val hs = hScore(u); val hi = hId(u)
            if (size(u) < k) {
              hs(size(u)) = s; hi(size(u)) = id; size(u) += 1
              if (size(u) == k) { // heapify once full
                var p = k / 2 - 1
                while (p >= 0) { siftDown(hs, hi, p, k); p -= 1 }
              }
            } else if (s > hs(0) || (s == hs(0) && id < hi(0))) {
              hs(0) = s; hi(0) = id; siftDown(hs, hi, 0, k)
            }
            u += 1
          }
          j += 1
        }
        (0 until t).iterator.map { u =>
          // order the kept entries by (score desc, id asc)
          val idx = (0 until size(u)).sortBy(x => (-hScore(u)(x), hId(u)(x)))
          (uids(u), idx.map(hId(u)).toArray, idx.map(hScore(u)).toArray)
        }
      }
    }.toDF(userCol, "ids", "scores")
  }

  /** Min-heap by (score asc, id desc): the root is the entry to evict
    * first, i.e. lowest score, ties broken toward the LARGER id so the
    * kept set prefers smaller ids deterministically. */
  private def siftDown(score: Array[Float], id: Array[Int], from: Int, size: Int): Unit = {
    var p = from
    var continue = true
    while (continue) {
      val l = 2 * p + 1; val r = l + 1
      var worst = p
      if (l < size && (score(l) < score(worst) ||
        (score(l) == score(worst) && id(l) > id(worst)))) worst = l
      if (r < size && (score(r) < score(worst) ||
        (score(r) == score(worst) && id(r) > id(worst)))) worst = r
      if (worst == p) continue = false
      else {
        val ts = score(p); score(p) = score(worst); score(worst) = ts
        val ti = id(p); id(p) = id(worst); id(worst) = ti
        p = worst
      }
    }
  }
}

object PredictImplicit {
  /** Adapt a freshly-trained (or MLlib-loaded) ALSModel to the
    * factor-table serving contract. */
  def fromModel(model: ALSModel, numToRecommend: Int = 10,
      userCol: String = "user_id",
      broadcastBudgetBytes: Long = 1L << 30): PredictImplicit =
    PredictImplicit(model.userFactors, model.itemFactors,
      numToRecommend, userCol, broadcastBudgetBytes)

  /** Train seeded implicit-feedback ALS on (user, item, strength) rows. */
  def train(interactions: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int = 8, maxIter: Int = 5, seed: Long = 42L): ALSModel = {
    val model = new ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setRank(rank).setMaxIter(maxIter).setSeed(seed)
      .setImplicitPrefs(true).setColdStartStrategy("drop")
      .fit(interactions)
    // Materialize both factor tables NOW, while ALS's internal rating/
    // block caches are hot. They are persisted at finalRDDStorageLevel,
    // but lazily: left unmaterialized, the first downstream action —
    // possibly two independent ones, e.g. a broadcast of item factors and
    // a join on user factors — replays the whole training lineage per
    // reference (measured 163 s instead of 12 s for ml_als_recommend at
    // sf0.1 before these counts).
    model.userFactors.count(); model.itemFactors.count()
    model
  }
}

/** Fitted feature-engineering workflow as a stage (reference
  * TransformWorkflow, workflow.py:86-112): wraps an MLlib PipelineModel;
  * schema propagation delegates to the model's own transformSchema. */
case class TransformWorkflow(model: PipelineModel) extends EnsembleOp {
  override def transformSchema(in: StructType): StructType = model.transformSchema(in)
  override def transform(df: DataFrame): DataFrame = model.transform(df)
}

object TransformWorkflow {
  /** Load the fitted workflow a registry entry points at (reference
    * `from_model_registry`, model_registry.py:14-19). */
  def fromRegistry(registry: graft.core.ModelRegistry): TransformWorkflow =
    TransformWorkflow(PipelineModel.load(registry.artifactUri))

  /** Categorify + scale, the canonical NVTabular serving workflow shape
    * (conftest.py:54-186): StringIndexer per cat col + StandardScaler via
    * our native ops happens in Categorify/StandardScale; this MLlib
    * variant exists for PipelineModel.save/load parity. */
  def fit(df: DataFrame, catCols: Seq[String], contCols: Seq[String]): TransformWorkflow = {
    val indexers = catCols.map(c =>
      new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol(c).setOutputCol(c + "_idx").setHandleInvalid("keep")
        .setStringOrderType("frequencyDesc"))
    val assembler = new VectorAssembler()
      .setInputCols(contCols.toArray).setOutputCol("__cont")
    val scaler = new org.apache.spark.ml.feature.StandardScaler()
      .setInputCol("__cont").setOutputCol("cont_scaled").setWithMean(true)
    val pipe = new Pipeline().setStages((indexers :+ assembler :+ scaler).toArray)
    TransformWorkflow(pipe.fit(df))
  }
}

/** Classifier scoring over an embedding array column (capability stand-in
  * for PredictTensorflow / PredictPyTorch: schema-driven batched model
  * scoring; payload is an MLlib model per BASELINE.json). */
case class PredictClassifier(
    model: org.apache.spark.ml.classification.LogisticRegressionModel,
    featuresArrayCol: String,
    outputCol: String = "prediction") extends EnsembleOp {

  private def withVec(df: DataFrame): DataFrame =
    df.withColumn("__features",
      org.apache.spark.ml.functions.array_to_vector(
        col(featuresArrayCol).cast("array<double>")))

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, featuresArrayCol)
    StructType(in :+ StructField(outputCol, DoubleType))
  }

  override def transform(df: DataFrame): DataFrame = {
    // MLlib's prediction UDF NPEs on a null feature vector (null text /
    // zero-vector upstream): score the non-null rows, carry null rows
    // through with a NULL prediction — the family's scoring contract
    val scored = model.setFeaturesCol("__features").setPredictionCol(outputCol)
      .setProbabilityCol("__prob").setRawPredictionCol("__raw")
      .transform(withVec(df.where(col(featuresArrayCol).isNotNull)))
      .drop("__features", "__prob", "__raw")
    scored.unionByName(df.where(col(featuresArrayCol).isNull)
      .withColumn(outputCol, lit(null).cast(DoubleType)))
  }
}

object PredictClassifier {
  def trainLogistic(df: DataFrame, featuresArrayCol: String, labelCol: String,
      maxIter: Int = 20): PredictClassifier = {
    // null feature rows cannot vote in the fit (MLlib NPEs on them)
    val prep = df.where(col(featuresArrayCol).isNotNull)
      .withColumn("__features",
        org.apache.spark.ml.functions.array_to_vector(
          col(featuresArrayCol).cast("array<double>")))
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol).setMaxIter(maxIter)
      .fit(prep)
    PredictClassifier(lr, featuresArrayCol)
  }
}

/** Score calibration via isotonic regression — the serving-side step that
  * turns a ranker's raw scores into usable probabilities (classic Platt/
  * isotonic calibration; public method, Zadrozny & Elkan 2002). The fit
  * is MLlib's distributed PAV ([[CalibrateScores.train]]); what persists
  * is ONLY the fitted (boundaries, predictions) step function as plain
  * doubles — metadata scale, literal-inlined at scoring time, the
  * PcaProject/ClusterAssign discipline.
  *
  * Scoring replays MLlib's `IsotonicRegressionModel.predict` EXACTLY
  * (spec-pinned equal on the same fit): clamp outside the boundary
  * range, exact boundary hits return their prediction, interior points
  * interpolate `y1 + ((y2 − y1) · (s − x1)) / (x2 − x1)` — one
  * literal-array fold per row, shuffle-free, codegen'd, and the same
  * arithmetic the dump-time DuckDB oracle replays (bit-identical
  * doubles). Boundaries must be strictly increasing: a model with
  * duplicated boundaries (a PAV jump discontinuity) is rejected fast
  * because interpolation at the duplicate would divide by zero and
  * binary-search tie-break semantics are not portable. */
case class CalibrateScores(
    boundaries: Seq[Double],
    predictions: Seq[Double],
    scoreCol: String = "score",
    outputCol: String = "calibrated") extends EnsembleOp {

  require(boundaries.nonEmpty, s"$name: empty fitted boundaries")
  require(boundaries.size == predictions.size,
    s"$name: ${boundaries.size} boundaries vs ${predictions.size} predictions")
  require(boundaries.sliding(2).forall(s => s.size < 2 || s(0) < s(1)),
    s"$name: boundaries must be strictly increasing (duplicated boundaries " +
      "mark a PAV jump; re-fit with pooled scores or deduplicate upstream)")

  override def transformSchema(in: StructType): StructType = {
    val i = requireCol(in, scoreCol)
    require(in(i).dataType.isInstanceOf[NumericType],
      s"$name: '$scoreCol' must be numeric")
    require(!in.fieldNames.contains(outputCol),
      s"$name: output column '$outputCol' collides with the input schema")
    StructType(in :+ StructField(outputCol, DoubleType))
  }

  override def transform(df: DataFrame): DataFrame = {
    val bl = typedLit(boundaries.toArray)
    val pl = typedLit(predictions.toArray)
    val s = col(scoreCol).cast("double")
    val b = boundaries.size
    // idx = #{i : boundary_i <= s} — one literal-array fold (1-based)
    val idx = size(filter(bl, x => s >= x))
    val x1 = element_at(bl, idx); val x2 = element_at(bl, idx + 1)
    val y1 = element_at(pl, idx); val y2 = element_at(pl, idx + 1)
    val interp = y1 + ((y2 - y1) * (s - x1)) / (x2 - x1)
    df.withColumn(outputCol,
      when(s.isNull, lit(null))
        // MLlib's binarySearch ranks NaN above every boundary: predict
        // returns predictions.last — mirror it or the spec-pinned
        // replay-equality breaks on the first NaN score
        .when(isnan(s), element_at(pl, b))
        .when(idx === 0, element_at(pl, 1))     // clamp below the range
        .when(idx === b, element_at(pl, b))     // clamp above / exact last
        .when(x1 === s, y1)                     // exact boundary hit
        .otherwise(interp))
  }
}

object CalibrateScores {
  /** Fit with MLlib isotonic regression (distributed PAV) and capture the
    * step function as plain parameters. `isotonic = false` fits an
    * antitonic (decreasing) calibration. */
  def train(df: DataFrame, labelCol: String, scoreCol: String,
      isotonic: Boolean = true, outputCol: String = "calibrated"): CalibrateScores = {
    val m = new org.apache.spark.ml.regression.IsotonicRegression()
      .setIsotonic(isotonic)
      .setLabelCol(labelCol).setFeaturesCol(scoreCol)
      .fit(df.select(col(labelCol).cast("double").as(labelCol),
        col(scoreCol).cast("double").as(scoreCol)))
    CalibrateScores(m.boundaries.toArray.toSeq, m.predictions.toArray.toSeq,
      scoreCol, outputCol)
  }
}
