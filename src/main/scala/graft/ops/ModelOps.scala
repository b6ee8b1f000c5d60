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

  override def transformSchema(in: StructType): StructType = {
    featureCols.foreach(requireCol(in, _))
    val t = if (predictProba) ArrayType(DoubleType) else DoubleType
    StructType(in :+ StructField(outputCol, t))
  }

  override def transform(df: DataFrame): DataFrame = {
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
case class PredictImplicit(model: ALSModel, numToRecommend: Int = 10,
    userCol: String = "user_id") extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, userCol)
    StructType(Seq(in(userCol),
      StructField("ids", ArrayType(IntegerType)),
      StructField("scores", ArrayType(FloatType))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val users = df.select(col(userCol).cast("int").as(model.getUserCol))
    model.recommendForUserSubset(users, numToRecommend)
      .select(col(model.getUserCol).cast("long").as(userCol),
        expr(s"transform(recommendations, r -> r.${model.getItemCol})").as("ids"),
        expr("transform(recommendations, r -> r.rating)").as("scores"))
  }
}

object PredictImplicit {
  /** Train seeded implicit-feedback ALS on (user, item, strength) rows. */
  def train(interactions: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int = 8, maxIter: Int = 5, seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setRank(rank).setMaxIter(maxIter).setSeed(seed)
      .setImplicitPrefs(true).setColdStartStrategy("drop")
      .fit(interactions)
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

  override def transform(df: DataFrame): DataFrame =
    model.setFeaturesCol("__features").setPredictionCol(outputCol)
      .setProbabilityCol("__prob").setRawPredictionCol("__raw")
      .transform(withVec(df))
      .drop("__features", "__prob", "__raw")
}

object PredictClassifier {
  def trainLogistic(df: DataFrame, featuresArrayCol: String, labelCol: String,
      maxIter: Int = 20): PredictClassifier = {
    val prep = df.withColumn("__features",
      org.apache.spark.ml.functions.array_to_vector(
        col(featuresArrayCol).cast("array<double>")))
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol).setMaxIter(maxIter)
      .fit(prep)
    PredictClassifier(lr, featuresArrayCol)
  }
}
