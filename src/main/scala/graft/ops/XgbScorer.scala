package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.core.EnsembleOp

/** One tree of an XGBoost model, scored as a nested CASE expression.
  *
  * Node layout follows the public XGBoost JSON model schema (the
  * `xgboost.json` dump the reference's FIL wrapper saves and reloads,
  * /root/reference/merlin/systems/dag/ops/fil.py:349-415): parallel
  * arrays indexed by node id; `left_children[i] == -1` marks a leaf, in
  * which case `split_conditions[i]` holds the leaf VALUE; otherwise the
  * decision is `x[split_indices[i]] < split_conditions[i]` → left, and a
  * missing (null) feature follows `default_left[i]`.
  *
  * Scoring an expression tree instead of looping nodes keeps the whole
  * forest inside Catalyst: codegen'd, shuffle-free, map-side at any
  * scale — and, unlike the trained-MLlib queries, exactly mirrorable by
  * CASE SQL, which finally puts forest inference SEMANTICS (margin sum,
  * threshold, missing-value routing) under the hash oracle.
  */
case class XgbTree(
    leftChildren: Vector[Int],
    rightChildren: Vector[Int],
    splitIndices: Vector[Int],
    splitConditions: Vector[Double],
    defaultLeft: Vector[Boolean]) {

  def expr(features: Seq[Column]): Column = node(0, features)

  // Each node emits exactly one `when` over its two child subtrees, so the
  // expression is LINEAR in node count. A third explicit-null branch that
  // re-inlined the default child's subtree would grow ~3^depth — a
  // depth-10, 500-tree model would explode into tens of millions of
  // Catalyst nodes. Null routing costs nothing extra: a null comparison
  // predicate is null, which `when` treats as false and falls through to
  // `otherwise` — already the right direction for default-right; for
  // default-left the isNull disjunct redirects it.
  private def node(i: Int, features: Seq[Column]): Column =
    if (leftChildren(i) == -1) lit(splitConditions(i))
    else {
      val f = features(splitIndices(i))
      // missing = null OR NaN (xgboost treats NaN as missing); NaN needs
      // its own disjunct on the left-default branch because NaN < cond is
      // false, which would otherwise silently route it right
      val goLeft =
        if (defaultLeft(i)) f.isNull || isnan(f) || f < lit(splitConditions(i))
        else f < lit(splitConditions(i))
      when(goLeft, node(leftChildren(i), features))
        .otherwise(node(rightChildren(i), features))
    }
}

/** Expression-based scorer for public XGBoost JSON model dumps — the
  * portable-artifact half of the reference's forest surface: FIL loads
  * `xgboost.json` (fil.py:349-415); we compile the same file into
  * per-tree Catalyst CASE expressions and score with plain column math.
  * [[PredictForest]] remains the trained-in-Spark path; this op covers
  * models trained elsewhere.
  *
  * Supported objectives: `reg:*` (margin = Σ leaf + base_score),
  * `binary:logistic` (probability = sigmoid(Σ leaf + logit(base_score)),
  * class = margin >= logit(threshold) — threshold applied in margin
  * space, so class output involves no transcendental at score time),
  * and `multi:softmax`/`multi:softprob` (per-class margins via
  * `tree_info`, argmax class, softmax probabilities). Mirroring the
  * reference's explicit rejections (fil.py:360-373): `binary:hinge` and
  * multi-target models fail fast at parse time with the same contract.
  *
  * Output (FIL param parity, fil.py:124-210, plus xgboost's public
  * `output_margin` predict flag): `outputMargin` → raw margin (per-class
  * array for multiclass); else `predictProba` → per-class probability
  * array; else `outputClass` → class id; else the objective's natural
  * prediction — probability for binary:logistic, margin for reg, the
  * argmax class id for multi:softmax and the probability array for
  * multi:softprob (exactly xgboost's default `predict` per objective).
  */
case class XgbForest(
    trees: Vector[XgbTree],
    treeInfo: Vector[Int],
    baseScore: Double,
    objective: String,
    numClass: Int,
    featureCols: Seq[String],
    predictProba: Boolean = false,
    outputClass: Boolean = false,
    threshold: Double = 0.5,
    outputMargin: Boolean = false,
    outputCol: String = "output__0") extends EnsembleOp {

  require(trees.nonEmpty, s"$name: model has no trees")
  require(treeInfo.length == trees.length,
    s"$name: tree_info length ${treeInfo.length} != tree count ${trees.length}")
  // fail at construction, not as an empty.reduceLeft inside transform:
  // every class must score through at least one tree
  require(numClass < 2 || !objective.startsWith("multi:") ||
    (0 until numClass).forall(treeInfo.contains),
    s"$name: multiclass model is missing trees for " +
      s"classes ${(0 until numClass).filterNot(treeInfo.contains).mkString(",")}")
  require(threshold >= 0.0 && threshold <= 1.0,
    s"$name: threshold must be a probability in [0, 1], got $threshold")
  require(objective != "binary:hinge",
    s"$name: objective binary:hinge is not supported. Only sigmoid and " +
      "identity values of pred_transform are supported for binary classification.")
  require(objective.startsWith("reg:") || objective == "binary:logistic" ||
    objective.startsWith("multi:"),
    s"$name: unsupported objective '$objective'")
  require(!predictProba || !objective.startsWith("reg:"),
    s"$name: predictProba requires a classification objective")

  private def isMulti: Boolean = numClass >= 2 && objective.startsWith("multi:")

  /** Per-class raw margins (a single margin for non-multiclass models).
    * Trees sum in model order — the exact left-to-right fold the oracle
    * SQL mirrors, so the double result is bit-identical cross-engine. */
  def margins(in: Seq[Column]): Seq[Column] =
    if (isMulti)
      (0 until numClass).map { c =>
        treeInfo.zipWithIndex.collect { case (ci, t) if ci == c => trees(t).expr(in) }
          .reduceLeft(_ + _) + lit(baseScore)
      }
    else Seq(trees.map(_.expr(in)).reduceLeft(_ + _) + lit(intercept))

  private def intercept: Double = objective match {
    case "binary:logistic" => math.log(baseScore / (1.0 - baseScore))
    case _ => baseScore
  }

  /** The class-decision margin cut for binary:logistic: `P(1) >= t` is
    * exactly `margin >= ln(t/(1-t))` — exposed so oracle SQL can embed
    * the precomputed constant instead of re-deriving ln cross-engine.
    * The cut lives in EXACT margin space: t = 0 → -Inf (always class 1),
    * t = 1 → +Inf (never class 1 — in exact math no finite margin reaches
    * probability 1, even where the double sigmoid saturates). */
  def thresholdMargin: Double = math.log(threshold / (1.0 - threshold))

  override def transformSchema(in: StructType): StructType = {
    featureCols.foreach(requireCol(in, _))
    val arrayOut =
      if (outputMargin) isMulti
      else predictProba ||
        (isMulti && !outputClass && objective == "multi:softprob")
    val t = if (arrayOut) ArrayType(DoubleType, containsNull = false) else DoubleType
    StructType(in :+ StructField(outputCol, t))
  }

  override def transform(df: DataFrame): DataFrame = {
    val in = featureCols.map(c => col(c).cast("double"))
    val ms = margins(in)
    val out: Column =
      if (outputMargin) {
        if (isMulti) array(ms: _*) else ms.head
      } else if (isMulti) {
        val exps = ms.map(exp(_))
        val z = exps.reduceLeft(_ + _)
        // argmax by margin, ties to the lowest class id
        val pairs = ms.zipWithIndex.map { case (m, c) => struct(m.as("m"), lit(-c).as("nc")) }
        // negate the INT, then cast: unary minus after the double cast
        // turned class 0 into -0.0 (locally == 0.0, but a distinct value
        // at any format-sensitive layer — burned two driver-hash rounds)
        val argmax = (-greatest(pairs: _*).getField("nc")).cast("double")
        if (predictProba) array(exps.map(_ / z): _*)
        else if (outputClass) argmax
        // no flags → the objective's natural predict: softmax returns the
        // class id, softprob the probability vector (xgboost parity)
        else if (objective == "multi:softprob") array(exps.map(_ / z): _*)
        else argmax
      } else objective match {
        case "binary:logistic" =>
          val p = lit(1.0) / (lit(1.0) + exp(-ms.head))
          if (predictProba) array(lit(1.0) - p, p)
          else if (outputClass) when(ms.head >= lit(thresholdMargin), 1.0).otherwise(0.0)
          else p
        case _ => ms.head
      }
    df.withColumn(outputCol, out)
  }
}

/** Parser for public LightGBM `model.txt` dumps — the other portable
  * forest artifact the reference's FIL wrapper exchanges
  * (/root/reference/merlin/systems/dag/ops/fil.py:418-449 saves/loads
  * `model.txt`). The text model is translated into an [[XgbForest]], so
  * both portable formats share one expression scorer:
  *
  *  - LightGBM decides `x <= threshold` → left; xgboost decides
  *    `x < threshold`. `x <= t` ⇔ `x < nextUp(t)` EXACTLY for finite
  *    doubles, so thresholds are stored as `Math.nextUp(t)` — no
  *    epsilon, no behavior change.
  *  - Children encode leaves as negative ids (`-1` = leaf 0, `-2` =
  *    leaf 1, …); they are re-indexed to xgboost's layout (leaves
  *    appended after the internal nodes, value in `split_conditions`).
  *  - `decision_type` bit 0 marks a categorical split (rejected fast);
  *    bit 1 is the default-left direction; bits 2-3 are the missing
  *    type: NaN (2) routes nulls by the default bit, None (0) means
  *    LightGBM converts missing to 0.0 and compares — emulated by
  *    resolving the null direction to (0 <= threshold) at parse time.
  *    Zero (1) treats literal zero VALUES as missing, which an
  *    expression comparing the raw column cannot reproduce — rejected
  *    fast rather than silently mis-routed.
  *  - Objectives: `regression` → margin sum; `binary` → sigmoid;
  *    `multiclass` → round-robin trees per class (num_tree_per_iteration
  *    = num_class), argmax/softmax. Anything else fails fast.
  */
object LgbForest {
  def fromText(modelTxt: String, featureCols: Seq[String],
      predictProba: Boolean = false, outputClass: Boolean = false,
      threshold: Double = 0.5, outputMargin: Boolean = false,
      outputCol: String = "output__0"): XgbForest = {
    val blocks = modelTxt.split("\n\\s*\n").map(_.trim).filter(_.nonEmpty)
    def kv(block: String): Map[String, String] =
      block.linesIterator.filter(_.contains("="))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    val header = kv(blocks.head)
    val objective = header.getOrElse("objective",
      throw new IllegalArgumentException("LgbForest: no objective in model.txt"))
    val (xgbObjective, baseScore) = objective.split(' ').head match {
      case "regression" | "regression_l1" | "huber" => ("reg:squarederror", 0.0)
      case "binary" => ("binary:logistic", 0.5) // logit(0.5) = 0: init is in the leaves
      case "multiclass" => ("multi:softmax", 0.0) // softmax form only:
      // multiclassova would need per-class sigmoid probabilities
      case o => throw new IllegalArgumentException(
        s"LgbForest: unsupported objective '$o' (regression, binary and " +
          "multiclass models are supported)")
    }
    val numClass = header.get("num_class").map(_.toInt).getOrElse(1)
    val numFeature = header.get("max_feature_idx").map(_.toInt + 1)
      .getOrElse(featureCols.length)
    require(featureCols.length == numFeature,
      s"LgbForest: model expects $numFeature features, got ${featureCols.length}")
    val treeBlocks = blocks.filter(_.startsWith("Tree="))
    require(treeBlocks.nonEmpty, "LgbForest: no Tree= blocks in model.txt")
    val trees = treeBlocks.map { b =>
      val t = kv(b)
      def ints(f: String): Vector[Int] =
        t.get(f).filter(_.nonEmpty).map(_.split("\\s+").map(_.toInt).toVector)
          .getOrElse(Vector.empty)
      def doubles(f: String): Vector[Double] =
        t.get(f).filter(_.nonEmpty).map(_.split("\\s+").map(_.toDouble).toVector)
          .getOrElse(Vector.empty)
      val leafValue = doubles("leaf_value")
      val splitFeature = ints("split_feature")
      val n = splitFeature.length
      if (n == 0) // single-leaf tree: a constant
        XgbTree(Vector(-1), Vector(-1), Vector(0), Vector(leafValue.head), Vector(false))
      else {
        val thresholds = doubles("threshold")
        val decisionType = ints("decision_type")
        // fail fast on ragged node arrays: a missing decision_type line
        // would misalign the leaf padding into internal-node positions
        // and silently default-right every split
        require(thresholds.length == n && decisionType.length == n,
          s"LgbForest: tree arrays misaligned (split_feature=$n, " +
            s"threshold=${thresholds.length}, decision_type=${decisionType.length})")
        decisionType.foreach(dt => require((dt & 1) == 0,
          "LgbForest: categorical splits are not supported"))
        // missing_type in bits 2-3: 0 = None, 1 = Zero, 2 = NaN
        decisionType.foreach(dt => require(((dt >> 2) & 3) != 1,
          "LgbForest: missing_type=Zero (zero_as_missing) is not supported — " +
            "an expression over the raw column cannot treat literal zeros as missing"))
        def mapChild(c: Int): Int = if (c >= 0) c else n + (-c - 1)
        val nullGoesLeft = decisionType.zip(thresholds).map { case (dt, t) =>
          if (((dt >> 2) & 3) == 2) (dt & 2) != 0 // NaN type: the default bit
          else 0.0 <= t // None type: missing becomes 0.0 and compares (<=)
        }
        XgbTree(
          ints("left_child").map(mapChild) ++ Vector.fill(leafValue.length)(-1),
          ints("right_child").map(mapChild) ++ Vector.fill(leafValue.length)(-1),
          splitFeature ++ Vector.fill(leafValue.length)(0),
          thresholds.map(Math.nextUp) ++ leafValue,
          nullGoesLeft ++ Vector.fill(leafValue.length)(false))
      }
    }.toVector
    // round-robin class assignment: tree t scores class t mod num_class
    val treeInfo =
      if (numClass > 1) trees.indices.map(_ % numClass).toVector
      else Vector.fill(trees.length)(0)
    XgbForest(trees, treeInfo, baseScore, xgbObjective,
      if (numClass > 1) numClass else 0, featureCols,
      predictProba, outputClass, threshold, outputMargin, outputCol)
  }
}

object XgbForest {
  /** Parse a public XGBoost JSON model dump (`booster.save_model("m.json")`
    * format, version 1.6+: `learner.gradient_booster.model.trees[]` with
    * parallel node arrays). Only the documented public schema is read. */
  def fromJson(json: String, featureCols: Seq[String],
      predictProba: Boolean = false, outputClass: Boolean = false,
      threshold: Double = 0.5, outputMargin: Boolean = false,
      outputCol: String = "output__0"): XgbForest = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val learner = root \ "learner"
    val lmp = learner \ "learner_model_param"
    def intOf(f: String, dflt: Int): Int =
      (lmp \ f).toOption.map(_.extract[String].toInt).getOrElse(dflt)
    require(intOf("num_target", 1) <= 1,
      "XgbForest: Only single target objectives are supported.")
    val numFeature = intOf("num_feature", featureCols.length)
    require(featureCols.length == numFeature,
      s"XgbForest: model expects $numFeature features, got ${featureCols.length}")
    val objective = (learner \ "objective" \ "name").extract[String]
    val baseScore = (lmp \ "base_score").extract[String].toDouble
    val model = learner \ "gradient_booster" \ "model"
    val treeInfo = (model \ "tree_info").extract[Vector[Int]]
    val trees = (model \ "trees").extract[Vector[JObject]].map { t =>
      // Fail fast on categorical splits (xgboost >= 1.6 enable_categorical
      // writes `split_type` 1 + `categories_nodes` per tree): the numeric
      // arrays parse fine, so without this check a categorical model would
      // route every row as if the split were `x < condition` — a silent
      // wrong answer. Mirrors LgbForest's rejection above and the
      // reference's fail-fast stance (fil.py:360-373).
      val splitTypes =
        (t \ "split_type").toOption.map(_.extract[Vector[Int]]).getOrElse(Vector.empty)
      val catNodes =
        (t \ "categories_nodes").toOption.map(_.extract[Vector[Int]]).getOrElse(Vector.empty)
      require(splitTypes.forall(_ == 0) && catNodes.isEmpty,
        "XgbForest: categorical splits are not supported — the model was " +
          "trained with enable_categorical; export it with numeric encodings instead")
      XgbTree(
        (t \ "left_children").extract[Vector[Int]],
        (t \ "right_children").extract[Vector[Int]],
        (t \ "split_indices").extract[Vector[Int]],
        (t \ "split_conditions").extract[Vector[Double]],
        (t \ "default_left").extract[Vector[Int]].map(_ != 0))
    }
    XgbForest(trees, treeInfo, baseScore, objective, intOf("num_class", 0),
      featureCols, predictProba, outputClass, threshold, outputMargin, outputCol)
  }
}

/** Path-dispatching loader over every portable forest artifact this
  * library scores — the single entry point mirroring the reference FIL
  * wrapper's 4-family dispatch (xgboost / lightgbm / sklearn / treelite,
  * /root/reference/merlin/systems/dag/ops/fil.py:291-346,496-530).
  *
  * Treelite binary checkpoints (`checkpoint.tl`) are NOT supported — the
  * format is an unversioned native memory dump with no public stable
  * spec — so they are rejected loudly here instead of mis-parsing:
  * re-export the underlying model as `xgboost.json`, LightGBM
  * `model.txt`, or the documented sklearn JSON (README "Forest models").
  */
object PortableForest {
  def load(path: String, featureCols: Seq[String],
      predictProba: Boolean = false, outputClass: Boolean = false,
      threshold: Double = 0.5, outputMargin: Boolean = false,
      outputCol: String = "output__0"): EnsembleOp = {
    val lower = path.toLowerCase
    require(!lower.endsWith(".tl") && !lower.endsWith(".tl2"),
      s"PortableForest: treelite checkpoints are not supported ($path); " +
        "supported formats: XGBoost JSON (.json), LightGBM text " +
        "(model.txt), sklearn/cuML forest JSON export (.json)")
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    if (lower.endsWith(".txt"))
      LgbForest.fromText(text, featureCols, predictProba, outputClass,
        threshold, outputMargin, outputCol)
    else if (text.contains("\"model_type\""))
      SklForest.fromJson(text, featureCols, predictProba, outputCol = outputCol)
    else
      XgbForest.fromJson(text, featureCols, predictProba, outputClass,
        threshold, outputMargin, outputCol)
  }
}
