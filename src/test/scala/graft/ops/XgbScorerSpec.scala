package graft.ops

import graft.SparkSpec

/** XgbForest semantics against hand-computed expectations: the portable
  * forest path must reproduce XGBoost's documented predict behavior
  * (margin fold, missing-value routing, sigmoid, margin-space threshold,
  * multiclass argmax) from the public JSON dump alone. */
class XgbScorerSpec extends SparkSpec {
  import spark.implicits._

  // one tree: f0 < 2 ? leaf 0.5 : (f1 < 10 ? leaf -0.25 : leaf 0.125);
  // missing f0 goes LEFT, missing f1 goes RIGHT
  private def binaryJson(objective: String = "binary:logistic") =
    s"""{"learner":{
       |"gradient_booster":{"model":{
       | "tree_info":[0,0],
       | "trees":[
       |  {"default_left":[1,0,0,0,0],
       |   "left_children":[1,-1,3,-1,-1],
       |   "right_children":[2,-1,4,-1,-1],
       |   "split_conditions":[2.0,0.5,10.0,-0.25,0.125],
       |   "split_indices":[0,0,1,0,0]},
       |  {"default_left":[0,0,0],
       |   "left_children":[1,-1,-1],
       |   "right_children":[2,-1,-1],
       |   "split_conditions":[5.0,0.0625,-0.5],
       |   "split_indices":[1,0,0]}]},
       | "name":"gbtree"},
       |"learner_model_param":{"base_score":"5E-1","num_class":"0",
       | "num_feature":"2","num_target":"1"},
       |"objective":{"name":"$objective"}},
       |"version":[2,0,0]}""".stripMargin

  private def margin(f0: Option[Double], f1: Option[Double]): Double = {
    val t0 = f0 match {
      case None => 0.5 // default_left → leaf 0.5
      case Some(x) if x < 2.0 => 0.5
      case _ => f1 match {
        case Some(y) if y < 10.0 => -0.25
        case _ => 0.125 // >= 10 or missing (default right)
      }
    }
    val t1 = f1 match {
      case Some(y) if y < 5.0 => 0.0625
      case _ => -0.5 // >= 5 or missing (default right)
    }
    t0 + t1
  }

  private val rows = Seq(
    (1L, Option(1.0), Option(3.0)),
    (2L, Option(4.0), Option(7.0)),
    (3L, Option(4.0), Option(12.0)),
    (4L, None, Option(1.0)),          // missing f0 → default left
    (5L, Option(9.0), None),          // missing f1 → default right twice
    (6L, None, None))

  test("XgbForest margin matches the hand-walked trees incl. missing-value routing") {
    val df = rows.toDF("id", "f0", "f1")
    val op = XgbForest.fromJson(binaryJson(), Seq("f0", "f1"),
      outputMargin = true, outputCol = "m")
    val got = op.transform(df).orderBy("id").select("id", "m")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, f0, f1) =>
      assert(got(id) == margin(f0, f1), s"row $id")
    }
  }

  test("XgbForest probability is sigmoid(margin); class is the margin-space threshold") {
    val df = rows.toDF("id", "f0", "f1")
    val proba = XgbForest.fromJson(binaryJson(), Seq("f0", "f1"),
      predictProba = true).transform(df).orderBy("id")
      .select("output__0").as[Seq[Double]].collect()
    rows.zip(proba).foreach { case ((_, f0, f1), p) =>
      val expect = 1.0 / (1.0 + math.exp(-margin(f0, f1)))
      assert(math.abs(p(1) - expect) < 1e-15 && math.abs(p(0) + p(1) - 1.0) < 1e-15)
    }
    val op = XgbForest.fromJson(binaryJson(), Seq("f0", "f1"),
      outputClass = true, threshold = 0.6)
    val classes = op.transform(df).orderBy("id")
      .select("output__0").as[Double].collect()
    rows.zip(classes).foreach { case ((_, f0, f1), c) =>
      val p = 1.0 / (1.0 + math.exp(-margin(f0, f1)))
      assert(c == (if (p >= 0.6) 1.0 else 0.0), s"threshold cut at p=$p")
    }
    // the margin-space cut really is logit(threshold)
    assert(math.abs(op.thresholdMargin - math.log(0.6 / 0.4)) < 1e-15)
  }

  test("XgbForest multiclass: per-class margins via tree_info, argmax class, softmax proba") {
    val json =
      """{"learner":{
        |"gradient_booster":{"model":{
        | "tree_info":[0,1,2],
        | "trees":[
        |  {"default_left":[1,0,0],"left_children":[1,-1,-1],"right_children":[2,-1,-1],
        |   "split_conditions":[3.0,0.5,-0.5],"split_indices":[0,0,0]},
        |  {"default_left":[1,0,0],"left_children":[1,-1,-1],"right_children":[2,-1,-1],
        |   "split_conditions":[6.0,0.25,0.75],"split_indices":[0,0,0]},
        |  {"default_left":[1,0,0],"left_children":[1,-1,-1],"right_children":[2,-1,-1],
        |   "split_conditions":[4.5,-0.25,1.0],"split_indices":[0,0,0]}]},
        | "name":"gbtree"},
        |"learner_model_param":{"base_score":"0","num_class":"3",
        | "num_feature":"1","num_target":"1"},
        |"objective":{"name":"multi:softmax"}},
        |"version":[2,0,0]}""".stripMargin
    val df = Seq((1L, 1.0), (2L, 5.0), (3L, 9.0)).toDF("id", "f0")
    // margins per x: x=1 → (0.5, 0.25, -0.25) argmax 0; x=5 → (-0.5, 0.25, 1.0)
    // argmax 2; x=9 → (-0.5, 0.75, 1.0) argmax 2
    val classes = XgbForest.fromJson(json, Seq("f0"), outputClass = true)
      .transform(df).orderBy("id").select("output__0").as[Double].collect()
    assert(classes.toSeq == Seq(0.0, 2.0, 2.0))
    val proba = XgbForest.fromJson(json, Seq("f0"), predictProba = true)
      .transform(df).orderBy("id").select("output__0").as[Seq[Double]].collect()
    val expect = Seq(0.5, 0.25, -0.25).map(math.exp)
    val z = expect.sum
    proba(0).zip(expect.map(_ / z)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-15) }
    // raw multiclass margins come back as an array
    val margins = XgbForest.fromJson(json, Seq("f0"), outputMargin = true)
      .transform(df).orderBy("id").select("output__0").as[Seq[Double]].collect()
    assert(margins(1).toSeq == Seq(-0.5, 0.25, 1.0))
    // no flags → the objective's NATURAL predict (xgboost parity):
    // softmax returns the argmax class id, softprob the probability vector
    val natural = XgbForest.fromJson(json, Seq("f0"))
      .transform(df).orderBy("id").select("output__0").as[Double].collect()
    assert(natural.toSeq == Seq(0.0, 2.0, 2.0))
    val softprob = XgbForest.fromJson(
      json.replace("multi:softmax", "multi:softprob"), Seq("f0"))
      .transform(df).orderBy("id").select("output__0").as[Seq[Double]].collect()
    softprob(0).zip(expect.map(_ / z)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-15) }
  }

  test("XgbForest mirrors the reference's explicit rejections") {
    // binary:hinge (fil.py:360-366)
    val hinge = intercept[IllegalArgumentException] {
      XgbForest.fromJson(binaryJson("binary:hinge"), Seq("f0", "f1"))
    }
    assert(hinge.getMessage.contains("binary:hinge is not supported"))
    // multi-target (fil.py:369-373)
    val multiTarget = binaryJson().replace("\"num_target\":\"1\"", "\"num_target\":\"2\"")
    val mt = intercept[IllegalArgumentException] {
      XgbForest.fromJson(multiTarget, Seq("f0", "f1"))
    }
    assert(mt.getMessage.contains("single target"))
    // feature arity mismatch fails at parse, not at scoring
    val arity = intercept[IllegalArgumentException] {
      XgbForest.fromJson(binaryJson(), Seq("f0"))
    }
    assert(arity.getMessage.contains("expects 2 features"))
    // unknown objective fails fast with the objective named
    val unknown = intercept[IllegalArgumentException] {
      XgbForest.fromJson(binaryJson("rank:pairwise"), Seq("f0", "f1"))
    }
    assert(unknown.getMessage.contains("rank:pairwise"))
    // categorical splits (xgboost >= 1.6 enable_categorical): the numeric
    // node arrays parse fine, so without an explicit check the model would
    // silently score every categorical split as `x < condition` — reject
    val catJson = binaryJson().replace(
      "\"split_indices\":[0,0,1,0,0]}",
      "\"split_indices\":[0,0,1,0,0],\"split_type\":[0,1,0,0,0]," +
        "\"categories_nodes\":[1],\"categories\":[3]," +
        "\"categories_segments\":[0],\"categories_sizes\":[1]}")
    val cat = intercept[IllegalArgumentException] {
      XgbForest.fromJson(catJson, Seq("f0", "f1"))
    }
    assert(cat.getMessage.contains("categorical splits are not supported"),
      cat.getMessage)
    // …but a modern dump that carries the fields with all-numeric values
    // (split_type all 0, categories_nodes empty) must still parse
    val numericJson = binaryJson().replace(
      "\"split_indices\":[0,0,1,0,0]}",
      "\"split_indices\":[0,0,1,0,0],\"split_type\":[0,0,0,0,0]," +
        "\"categories_nodes\":[]}")
    XgbForest.fromJson(numericJson, Seq("f0", "f1"))
    // a multiclass model missing all trees for some class must fail at
    // construction, not as an empty.reduceLeft inside transform
    val leaf = XgbTree(Vector(-1), Vector(-1), Vector(0), Vector(0.5), Vector(false))
    val missing = intercept[IllegalArgumentException] {
      XgbForest(Vector(leaf), Vector(0), 0.5, "multi:softmax", 2, Seq("f0"))
    }
    assert(missing.getMessage.contains("missing trees for classes 1"))
  }

  // LightGBM model.txt: tree0 = (f0 <= 2 ? 0.5 : (f1 <= 10 ? -0.25 : 0.125)),
  // tree1 = constant 0.0625. decision_type 2 = missing_type None (missing
  // compares as 0.0 → here 0 <= 2 → LEFT); decision_type 8 = missing_type
  // NaN with default bit unset (missing → RIGHT).
  private def lgbText(objective: String = "regression") =
    s"""tree
       |version=v4
       |num_class=1
       |num_tree_per_iteration=1
       |max_feature_idx=1
       |objective=$objective
       |feature_names=f0 f1
       |
       |Tree=0
       |num_leaves=3
       |num_cat=0
       |split_feature=0 1
       |threshold=2.0 10.0
       |decision_type=2 8
       |left_child=-1 -2
       |right_child=1 -3
       |leaf_value=0.5 -0.25 0.125
       |shrinkage=1
       |
       |Tree=1
       |num_leaves=1
       |leaf_value=0.0625
       |shrinkage=1
       |
       |end of trees
       |""".stripMargin

  test("LgbForest: <= split semantics, leaf re-indexing, default directions, constant trees") {
    val df = Seq(
      (1L, Option(2.0), Option(3.0)),   // f0 == threshold: <= goes LEFT (xgb < would go right)
      (2L, Option(4.0), Option(10.0)),  // f1 == 10: <= → leaf -0.25
      (3L, Option(4.0), Option(10.5)),  // f1 > 10 → leaf 0.125
      (4L, None, Option(1.0)),          // missing f0: None type, 0 <= 2 → left
      (5L, Option(9.0), None))          // missing f1: NaN type, default → right
      .toDF("id", "f0", "f1")
    val got = LgbForest.fromText(lgbText(), Seq("f0", "f1"),
      outputMargin = true, outputCol = "m").transform(df)
      .orderBy("id").select("m").as[Double].collect()
    assert(got.toSeq == Seq(
      0.5 + 0.0625, -0.25 + 0.0625, 0.125 + 0.0625,
      0.5 + 0.0625, 0.125 + 0.0625))
  }

  test("LgbForest binary objective applies the sigmoid; multiclass trees round-robin") {
    val df = Seq((1L, Option(1.0), Option(1.0))).toDF("id", "f0", "f1")
    val p = LgbForest.fromText(lgbText("binary sigmoid:1"), Seq("f0", "f1"))
      .transform(df).select("output__0").as[Double].head()
    assert(math.abs(p - 1.0 / (1.0 + math.exp(-(0.5 + 0.0625)))) < 1e-15)
    // 4 trees, num_class=2 → treeInfo 0,1,0,1
    val multi =
      """tree
        |num_class=2
        |num_tree_per_iteration=2
        |max_feature_idx=0
        |objective=multiclass num_class:2
        |
        |Tree=0
        |num_leaves=1
        |leaf_value=1.0
        |
        |Tree=1
        |num_leaves=1
        |leaf_value=2.0
        |
        |Tree=2
        |num_leaves=1
        |leaf_value=0.25
        |
        |Tree=3
        |num_leaves=1
        |leaf_value=0.5
        |
        |end of trees
        |""".stripMargin
    val margins = LgbForest.fromText(multi, Seq("f0"), outputMargin = true)
      .transform(Seq(Tuple1(1.0)).toDF("f0")).select("output__0").as[Seq[Double]].head()
    assert(margins == Seq(1.25, 2.5), "class margins sum their round-robin trees")
  }

  test("LgbForest fails fast on categorical splits and unsupported objectives") {
    val cat = lgbText().replace("decision_type=2 8", "decision_type=2 1")
    val catErr = intercept[IllegalArgumentException] {
      LgbForest.fromText(cat, Seq("f0", "f1"))
    }
    assert(catErr.getMessage.contains("categorical"), catErr.getMessage)
    // missing_type=Zero (bits 2-3 = 01) cannot be reproduced over the raw
    // column — reject, don't silently mis-route zeros
    val zero = lgbText().replace("decision_type=2 8", "decision_type=2 6")
    val zeroErr = intercept[IllegalArgumentException] {
      LgbForest.fromText(zero, Seq("f0", "f1"))
    }
    assert(zeroErr.getMessage.contains("missing_type=Zero"), zeroErr.getMessage)
    val rankErr = intercept[IllegalArgumentException] {
      LgbForest.fromText(lgbText("lambdarank"), Seq("f0", "f1"))
    }
    assert(rankErr.getMessage.contains("lambdarank"), rankErr.getMessage)
    val arityErr = intercept[IllegalArgumentException] {
      LgbForest.fromText(lgbText(), Seq("f0"))
    }
    assert(arityErr.getMessage.contains("expects 2 features"), arityErr.getMessage)
  }

  test("the shipped portable model scores lineitem identically to its CASE mirror") {
    // the ml_forest_portable query's own consistency: margin exactness
    // means re-running is bit-identical, and class follows the margin cut
    val df = Seq((1L, 1, 20.0, 0.04, 20000.0), (2L, 1, 30.0, 0.02, 40000.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")
    val op = XgbForest.fromJson(graft.queries.MlQueries.portableModelJson,
      graft.queries.MlQueries.portableFeatures, outputMargin = true, outputCol = "m")
    val got = op.transform(df).orderBy("l_orderkey").select("m").as[Double].collect()
    // row 1: t0 = (q<25, d<0.05) → 0.125; t1 = d>=0.03, q>=10 → 0.0625; t2 = e>=15000 → 0.375
    assert(got(0) == 0.125 + 0.0625 + 0.375)
    // row 2: t0 = q>=25, e>=30000 → -0.125; t1 = d<0.03 → 0.5; t2 → 0.375
    assert(got(1) == -0.125 + 0.5 + 0.375)
  }
}
