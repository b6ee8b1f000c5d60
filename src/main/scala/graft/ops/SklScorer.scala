package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.core.EnsembleOp

/** Expression-based scorer for scikit-learn RandomForest models exported
  * to JSON — the third portable forest family the reference's FIL wrapper
  * serves (`SKLearnRandomForest`/`CUMLRandomForest`,
  * /root/reference/merlin/systems/dag/ops/fil.py:452-530). sklearn
  * persists forests as Python pickles, which a JVM engine cannot (and
  * should not) unpickle; instead this op reads a five-line JSON export of
  * the PUBLIC `tree_` attribute arrays (children_left / children_right /
  * feature / threshold / value — the documented sklearn tree structure).
  * The README's "Forest models" section carries the export snippet; cuML
  * forests expose the same arrays via `convert_to_treelite` →
  * `to_sklearn`-style dumps, so one schema covers both families.
  *
  * Semantics follow sklearn's public predict contract, which differs from
  * boosting exactly where it matters:
  *
  *  - split decision is `x <= threshold` → left (xgboost uses `<`);
  *    thresholds are stored as `Math.nextUp(t)` so [[XgbTree]]'s `<`
  *    comparison reproduces `<=` EXACTLY for finite doubles (the same
  *    trick [[LgbForest]] uses);
  *  - trees AVERAGE rather than sum: a regressor predicts the mean of
  *    per-tree leaf values; a classifier averages per-leaf class
  *    distributions and predicts `classes[argmax]` (ties to the lowest
  *    class index, numpy argmax parity). Leaf value rows are normalized
  *    to distributions at parse time, so exports of either raw counts
  *    (sklearn < 1.4's default `value`) or normalized frequencies
  *    (>= 1.4) score identically;
  *  - missing values: exports carrying sklearn 1.3+'s per-node
  *    `missing_go_to_left` route null/NaN by it; without the array a
  *    null comparison is false and rows route RIGHT — sklearn itself
  *    refuses NaN at predict time for such models, so this op requires
  *    (and documents) non-null features rather than silently choosing a
  *    direction: pass `failOnNull = true` (default) to raise on the
  *    first null/NaN feature, or opt out for pre-validated inputs.
  *
  * Output (FIL param parity, fil.py:124-210): `predictProba` → per-class
  * probability array; else a classifier predicts the class LABEL (from
  * `classes`, as double) and a regressor the mean value.
  */
case class SklForest(
    trees: Vector[Vector[XgbTree]], // trees(t)(c): tree t scoring class c
    classes: Vector[Double], // empty for regressors
    featureCols: Seq[String],
    predictProba: Boolean = false,
    failOnNull: Boolean = true,
    outputCol: String = "output__0") extends EnsembleOp {

  require(trees.nonEmpty, s"$name: model has no trees")
  private def nClass: Int = if (classes.isEmpty) 1 else classes.length
  require(trees.forall(_.length == nClass),
    s"$name: every tree must carry $nClass per-class value columns")
  require(!predictProba || classes.nonEmpty,
    s"$name: predictProba requires a classifier (no classes in export)")

  /** Per-class mean over trees, folded in model order (the exact
    * left-to-right sum the oracle SQL mirrors), divided once at the end —
    * one division keeps the double result bit-identical cross-engine. */
  private def means(in: Seq[Column]): Seq[Column] =
    (0 until nClass).map { c =>
      trees.map(_(c).expr(in)).reduceLeft(_ + _) / lit(trees.length.toDouble)
    }

  override def transformSchema(in: StructType): StructType = {
    featureCols.foreach(requireCol(in, _))
    val t = if (predictProba) ArrayType(DoubleType, containsNull = false)
      else DoubleType
    StructType(in :+ StructField(outputCol, t))
  }

  override def transform(df: DataFrame): DataFrame = {
    val in: Seq[Column] = featureCols.map { c =>
      val f = col(c).cast("double")
      // the null contract lives HERE, not per tree node: one guard per
      // feature column, shared by every tree expression via CSE
      if (failOnNull)
        when(f.isNull || isnan(f), raise_error(lit(
          s"$name: null/NaN in feature '$c' — sklearn forests without " +
            "missing_go_to_left refuse missing values; impute upstream " +
            "or pass failOnNull = false")))
          .otherwise(f)
      else f
    }
    val ms = means(in)
    val out: Column =
      if (classes.isEmpty) ms.head
      else if (predictProba) array(ms: _*)
      else if (classes.length == 1) lit(classes.head) // greatest() needs 2+ args
      else {
        // argmax by mean probability, ties to the LOWEST class index
        // (numpy argmax returns the first maximum)
        val pairs = ms.zipWithIndex.map { case (m, c) =>
          struct(m.as("m"), lit(-c).as("nc")) }
        val idx = -greatest(pairs: _*).getField("nc")
        element_at(array(classes.map(lit): _*), idx + 1)
      }
    df.withColumn(outputCol, out)
  }
}

object SklForest {
  /** Parse the documented JSON export of a fitted sklearn RandomForest
    * (see README "Forest models" for the 5-line Python export snippet):
    *
    * {{{
    * {"model_type": "RandomForestClassifier",   // or ...Regressor
    *  "n_features": 3,
    *  "classes": [0.0, 1.0, 2.0],               // classifier only
    *  "trees": [{"children_left": [...], "children_right": [...],
    *             "feature": [...], "threshold": [...],
    *             "value": [[...], ...],          // [node][class] or [node][1]
    *             "missing_go_to_left": [...]}]}  // optional, sklearn >= 1.3
    * }}}
    *
    * `children_left[i] == -1` marks a leaf (sklearn's TREE_LEAF); leaf
    * `value` rows hold class counts or frequencies (normalized here) for
    * classifiers, the leaf mean for regressors. Categorical splits do not
    * exist in sklearn trees, so no rejection path is needed — every
    * exported split is numeric by construction. */
  def fromJson(json: String, featureCols: Seq[String],
      predictProba: Boolean = false, failOnNull: Boolean = true,
      outputCol: String = "output__0"): SklForest = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val modelType = (root \ "model_type").extract[String]
    val isClassifier = modelType.contains("Classifier")
    require(isClassifier || modelType.contains("Regressor"),
      s"SklForest: unsupported model_type '$modelType' (RandomForest" +
        "Classifier/Regressor and ExtraTrees exports are supported)")
    val nFeature = (root \ "n_features").extractOpt[Int].getOrElse(featureCols.length)
    require(featureCols.length == nFeature,
      s"SklForest: model expects $nFeature features, got ${featureCols.length}")
    val classes =
      if (isClassifier) (root \ "classes").extract[Vector[Double]]
      else Vector.empty[Double]
    require(!isClassifier || classes.nonEmpty,
      "SklForest: classifier export has no classes array")
    val nClass = if (isClassifier) classes.length else 1
    val trees = (root \ "trees").extract[Vector[JObject]].map { t =>
      val left = (t \ "children_left").extract[Vector[Int]]
      val right = (t \ "children_right").extract[Vector[Int]]
      val feature = (t \ "feature").extract[Vector[Int]]
      val threshold = (t \ "threshold").extract[Vector[Double]]
      val value = (t \ "value").extract[Vector[Vector[Double]]]
      val n = left.length
      require(Seq(right, feature, threshold, value).forall(_.length == n),
        s"SklForest: tree arrays misaligned (children_left=$n, " +
          s"children_right=${right.length}, feature=${feature.length}, " +
          s"threshold=${threshold.length}, value=${value.length})")
      val missingLeft = (t \ "missing_go_to_left").toOption
        .map(_.extract[Vector[Int]].map(_ != 0))
        .getOrElse(Vector.fill(n)(false))
      require(missingLeft.length == n,
        s"SklForest: missing_go_to_left length ${missingLeft.length} != $n nodes")
      // normalize leaf rows to distributions (idempotent when the export
      // already carries frequencies); regressor rows are length-1 means
      val leafVals: Vector[Vector[Double]] = value.zipWithIndex.map { case (row, i) =>
        if (!isClassifier) {
          require(row.length == 1,
            s"SklForest: regressor leaf $i has ${row.length} outputs " +
              "(multi-output forests are not supported)")
          row
        } else {
          require(row.length == nClass,
            s"SklForest: leaf $i has ${row.length} class values, expected $nClass")
          val s = row.sum
          if (left(i) == -1) {
            require(s > 0.0, s"SklForest: leaf $i has zero total class weight")
            row.map(_ / s)
          } else row // internal rows are never read
        }
      }
      (0 until nClass).map { c =>
        XgbTree(
          left, right,
          feature.map(f => if (f < 0) 0 else f),
          // `<=` → `<` via nextUp at internal nodes; leaf slots carry the
          // class-c leaf value (the [[XgbTree]] leaf convention)
          left.indices.map(i =>
            if (left(i) == -1) leafVals(i)(if (isClassifier) c else 0)
            else Math.nextUp(threshold(i))).toVector,
          missingLeft)
      }.toVector
    }
    SklForest(trees, classes, featureCols, predictProba, failOnNull, outputCol)
  }
}
