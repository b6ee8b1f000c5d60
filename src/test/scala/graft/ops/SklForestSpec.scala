package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SklForest semantics against hand-computed expectations: the sklearn
  * portable-forest path must reproduce sklearn's documented predict
  * behavior (`<=` splits, tree averaging, count normalization, classes_
  * label mapping, first-maximum argmax) from the JSON export alone. */
class SklForestSpec extends SparkSpec {
  import spark.implicits._

  // tree 0: f0 <= 2 ? [8,4,4] : (f1 <= 10 ? [2,10,4] : [4,4,8])
  // tree 1: f1 <= 5 ? [12,2,2] : [2,2,12]        (counts sum to 16)
  private val clfJson =
    """{"model_type":"RandomForestClassifier","n_features":2,
      |"classes":[10.0,20.0,30.0],
      |"trees":[
      | {"children_left":[1,-1,3,-1,-1],
      |  "children_right":[2,-1,4,-1,-1],
      |  "feature":[0,-2,1,-2,-2],
      |  "threshold":[2.0,-2.0,10.0,-2.0,-2.0],
      |  "value":[[0,0,0],[8,4,4],[0,0,0],[2,10,4],[4,4,8]]},
      | {"children_left":[1,-1,-1],
      |  "children_right":[2,-1,-1],
      |  "feature":[1,-2,-2],
      |  "threshold":[5.0,-2.0,-2.0],
      |  "value":[[0,0,0],[12,2,2],[2,2,12]]}]}""".stripMargin

  private def proba(f0: Double, f1: Double): Seq[Double] = {
    val t0 = if (f0 <= 2.0) Seq(0.5, 0.25, 0.25)
      else if (f1 <= 10.0) Seq(0.125, 0.625, 0.25)
      else Seq(0.25, 0.25, 0.5)
    val t1 = if (f1 <= 5.0) Seq(0.75, 0.125, 0.125) else Seq(0.125, 0.125, 0.75)
    t0.zip(t1).map { case (a, b) => (a + b) / 2.0 }
  }

  test("classifier: proba is the tree-mean of normalized leaf counts; <= at the boundary") {
    val df = Seq((1, 2.0, 5.0), (2, 3.0, 10.0), (3, 3.0, 11.0), (4, 0.0, 99.0))
      .toDF("id", "f0", "f1")
    val op = SklForest.fromJson(clfJson, Seq("f0", "f1"), predictProba = true)
    val rows = op.transform(df).select("id", "output__0")
      .as[(Int, Seq[Double])].collect().toMap
    // id 1 sits exactly ON both thresholds: <= must route LEFT in both trees
    assert(rows(1) == proba(2.0, 5.0) && rows(1).head == 0.625)
    assert(rows(2) == proba(3.0, 10.0))
    assert(rows(3) == proba(3.0, 11.0))
    assert(rows(4) == proba(0.0, 99.0))
  }

  test("classifier: predict maps argmax through non-contiguous classes_") {
    val df = Seq((1, 2.0, 5.0), (2, 3.0, 10.0), (3, 3.0, 11.0)).toDF("id", "f0", "f1")
    val op = SklForest.fromJson(clfJson, Seq("f0", "f1"))
    val rows = op.transform(df).select("id", "output__0")
      .as[(Int, Double)].collect().toMap
    assert(rows(1) == 10.0) // p = (.625, .1875, .1875)
    assert(rows(2) == 30.0) // p = (.125, .375, .5)
    assert(rows(3) == 30.0) // p = (.1875, .1875, .625)
  }

  test("argmax ties break to the LOWEST class index (numpy argmax parity)") {
    // single tree, single leaf with an exact two-way tie between c0 and c1
    val tieJson =
      """{"model_type":"RandomForestClassifier","n_features":1,
        |"classes":[7.0,8.0,9.0],
        |"trees":[{"children_left":[-1],"children_right":[-1],
        | "feature":[-2],"threshold":[-2.0],"value":[[6,6,4]]}]}""".stripMargin
    val op = SklForest.fromJson(tieJson, Seq("f0"))
    val out = op.transform(Seq(Tuple1(1.0)).toDF("f0"))
      .select("output__0").as[Double].head()
    assert(out == 7.0)
  }

  test("frequency exports score identically to count exports (normalization is idempotent)") {
    val freqJson = clfJson
      .replace("[8,4,4]", "[0.5,0.25,0.25]").replace("[2,10,4]", "[0.125,0.625,0.25]")
      .replace("[4,4,8]", "[0.25,0.25,0.5]").replace("[12,2,2]", "[0.75,0.125,0.125]")
      .replace("[2,2,12]", "[0.125,0.125,0.75]")
    val df = Seq((1, 2.0, 5.0), (2, 3.0, 10.0), (3, 3.0, 11.0), (4, 0.0, 99.0))
      .toDF("id", "f0", "f1")
    val a = SklForest.fromJson(clfJson, Seq("f0", "f1"), predictProba = true)
      .transform(df).select("id", "output__0").as[(Int, Seq[Double])].collect().toSet
    val b = SklForest.fromJson(freqJson, Seq("f0", "f1"), predictProba = true)
      .transform(df).select("id", "output__0").as[(Int, Seq[Double])].collect().toSet
    assert(a == b)
  }

  test("regressor: predict is the mean of per-tree leaf values") {
    val regJson =
      """{"model_type":"RandomForestRegressor","n_features":1,
        |"trees":[
        | {"children_left":[1,-1,-1],"children_right":[2,-1,-1],
        |  "feature":[0,-2,-2],"threshold":[3.0,-2.0,-2.0],"value":[[0],[1.5],[4.5]]},
        | {"children_left":[1,-1,-1],"children_right":[2,-1,-1],
        |  "feature":[0,-2,-2],"threshold":[7.0,-2.0,-2.0],"value":[[0],[2.0],[10.0]]}]}"""
        .stripMargin
    val op = SklForest.fromJson(regJson, Seq("f0"))
    val rows = op.transform(Seq((1, 2.0), (2, 5.0), (3, 8.0)).toDF("id", "f0"))
      .select("id", "output__0").as[(Int, Double)].collect().toMap
    assert(rows(1) == (1.5 + 2.0) / 2)
    assert(rows(2) == (4.5 + 2.0) / 2)
    assert(rows(3) == (4.5 + 10.0) / 2)
  }

  test("missing_go_to_left routes nulls per node; failOnNull raises without it") {
    val mglJson =
      """{"model_type":"RandomForestRegressor","n_features":1,
        |"trees":[
        | {"children_left":[1,-1,-1],"children_right":[2,-1,-1],
        |  "feature":[0,-2,-2],"threshold":[3.0,-2.0,-2.0],
        |  "missing_go_to_left":[1,0,0],"value":[[0],[100.0],[200.0]]}]}""".stripMargin
    val df = Seq((1, Some(9.0)), (2, None)).toDF("id", "f0")
    val op = SklForest.fromJson(mglJson, Seq("f0"), failOnNull = false)
    val rows = op.transform(df).select("id", "output__0")
      .as[(Int, Double)].collect().toMap
    assert(rows(1) == 200.0 && rows(2) == 100.0) // null follows the flag LEFT

    val strict = SklForest.fromJson(mglJson.replace(
      """"missing_go_to_left":[1,0,0],""", ""), Seq("f0"))
    val e = intercept[Exception] {
      strict.transform(df).collect()
    }
    assert(e.getMessage.contains("null/NaN in feature 'f0'") ||
      Option(e.getCause).exists(_.getMessage.contains("null/NaN in feature 'f0'")))
  }

  test("fail fast: wrong model_type, missing classes, misaligned arrays, feature arity") {
    val bad1 = intercept[Exception] { SklForest.fromJson(
      clfJson.replace("RandomForestClassifier", "GradientBoosting"), Seq("f0", "f1")) }
    assert(bad1.getMessage.contains("model_type"))
    val bad2 = intercept[Exception] { SklForest.fromJson(
      clfJson.replace(""""classes":[10.0,20.0,30.0],""", ""), Seq("f0", "f1")) }
    assert(bad2.getMessage.contains("classes"))
    val bad3 = intercept[Exception] { SklForest.fromJson(
      clfJson.replace(""""threshold":[5.0,-2.0,-2.0]""", """"threshold":[5.0,-2.0]"""),
      Seq("f0", "f1")) }
    assert(bad3.getMessage.contains("misaligned"))
    val bad4 = intercept[Exception] {
      SklForest.fromJson(clfJson, Seq("f0", "f1", "f2")) }
    assert(bad4.getMessage.contains("features"))
  }

  test("ensemble save/load round-trips the parsed forest without the source json") {
    import graft.core.{Ensemble, EnsemblePersistence}
    val df = Seq((1, 2.0, 5.0), (2, 3.0, 10.0), (3, 3.0, 11.0)).toDF("id", "f0", "f1")
    val op = SklForest.fromJson(clfJson, Seq("f0", "f1"), predictProba = true)
    val dir = java.nio.file.Files.createTempDirectory("skl_roundtrip").toString
    EnsemblePersistence.save(Ensemble(Seq(op), df.schema), dir, spark)
    val loaded = EnsemblePersistence.load(dir, spark)
    val a = op.transform(df).orderBy("id").collect().toSeq
    val b = loaded.transform(df).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
