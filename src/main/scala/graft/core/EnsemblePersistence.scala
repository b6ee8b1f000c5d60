package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._
import java.nio.file.{Files, Paths}
import graft.ops._

/** Ensemble save/load — the analog of the reference's cloudpickle +
  * metadata.json persistence (/root/reference/merlin/systems/dag/
  * ensemble.py:80-145), done the JVM way: a metadata.json with version
  * stamps + per-op params, and side artifacts (feature tables as parquet,
  * fitted MLlib models via their own writers) under `artifacts/`.
  * Load re-instantiates ops by type; a version-stamp mismatch warns, like
  * the reference's python-minor check (ensemble.py:123-143).
  */
object EnsemblePersistence {

  private val FormatVersion = "1"

  def save(ensemble: Ensemble, dir: String, spark: SparkSession): Unit = {
    Files.createDirectories(Paths.get(dir, "artifacts"))
    val opsJson = ensemble.ops.zipWithIndex.map { case (op, i) =>
      describe(op, i, dir, spark)
    }
    val meta: JObject =
      ("format_version" -> FormatVersion) ~
      ("engine_version" -> "0.1.0") ~
      ("spark_version" -> spark.version) ~
      // full JSON (not DDL): DDL drops StructField.metadata, which now
      // carries schema tags (Tags.Key) that must survive the round-trip
      ("input_schema_json" -> ensemble.inputSchema.json) ~
      ("ops" -> opsJson)
    Files.writeString(Paths.get(dir, "metadata.json"),
      JsonMethods.pretty(JsonMethods.render(meta)))
  }

  def load(dir: String, spark: SparkSession): Ensemble = {
    implicit val fmts: Formats = DefaultFormats
    val meta = JsonMethods.parse(Files.readString(Paths.get(dir, "metadata.json")))
    val fv = (meta \ "format_version").extract[String]
    if (fv != FormatVersion)
      System.err.println(s"[ensemble] WARNING: format version $fv != $FormatVersion; attempting load")
    val sv = (meta \ "spark_version").extract[String]
    if (sv != spark.version)
      System.err.println(s"[ensemble] WARNING: saved under Spark $sv, loading under ${spark.version}")
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      (meta \ "input_schema_json").extract[String]).asInstanceOf[StructType]
    val ops = (meta \ "ops").extract[List[JObject]].map(o => instantiate(o, spark))
    Ensemble(ops, schema)
  }

  // ---- per-op (de)serialization ---------------------------------------

  private def artifactPath(dir: String, i: Int, kind: String) =
    s"$dir/artifacts/${i}_$kind"

  private def describe(op: EnsembleOp, i: Int, dir: String,
      spark: SparkSession): JObject = op match {
    case Selection(cols) =>
      ("type" -> "Selection") ~ ("cols" -> cols)
    case SelectByTag(tags, keep) =>
      ("type" -> "SelectByTag") ~ ("tags" -> tags) ~ ("keep" -> keep)
    case Rename(m) =>
      ("type" -> "Rename") ~ ("mapping" -> m)
    case FilterCandidates(in, f, out) =>
      ("type" -> "FilterCandidates") ~ ("inputCol" -> in) ~
        ("filterCol" -> f) ~ ("outputCol" -> out)
    case SoftmaxSampling(ids, rel, t, k, seed, seedCol) =>
      ("type" -> "SoftmaxSampling") ~ ("idsCol" -> ids) ~
        ("relevanceCol" -> rel) ~ ("temperature" -> t) ~ ("topk" -> k) ~
        ("seed" -> seed) ~ ("seedCol" -> seedCol)
    case ExplodeCandidates(in, out) =>
      ("type" -> "ExplodeCandidates") ~ ("inputCol" -> in) ~ ("outputCol" -> out)
    case Padding(c, l, v) =>
      ("type" -> "Padding") ~ ("inputCol" -> c) ~ ("length" -> l) ~ ("padValue" -> v)
    case Categorify(cols, suffix) =>
      ("type" -> "Categorify") ~ ("cols" -> cols) ~ ("suffix" -> suffix)
    case StandardScale(cols, suffix) =>
      ("type" -> "StandardScale") ~ ("cols" -> cols) ~ ("suffix" -> suffix)
    case q: QueryFeatureStore =>
      val p = artifactPath(dir, i, "feature_view")
      q.features.write.mode("overwrite").parquet(p)
      ("type" -> "QueryFeatureStore") ~ ("path" -> p) ~
        ("entityCol" -> q.entityCol) ~ ("featureCols" -> q.featureCols) ~
        ("includeId" -> q.includeId) ~ ("outputPrefix" -> q.outputPrefix) ~
        ("broadcastDim" -> q.broadcastDim)
    case e: EmbeddingLookup =>
      val p = artifactPath(dir, i, "embeddings")
      e.embeddings.write.mode("overwrite").parquet(p)
      ("type" -> "EmbeddingLookup") ~ ("path" -> p) ~ ("idCol" -> e.idCol) ~
        ("embIdCol" -> e.embIdCol) ~ ("embCol" -> e.embCol) ~
        ("outputCol" -> e.outputCol)
    case u: UnrollFeatures =>
      val p = artifactPath(dir, i, "user_features")
      u.userFeatures.write.mode("overwrite").parquet(p)
      ("type" -> "UnrollFeatures") ~ ("path" -> p) ~
        ("unrollCols" -> u.unrollCols) ~ ("on" -> u.on) ~ ("prefix" -> u.prefix)
    case w: TransformWorkflow =>
      val p = artifactPath(dir, i, "pipeline_model")
      w.model.write.overwrite().save(p)
      ("type" -> "TransformWorkflow") ~ ("path" -> p)
    case other =>
      throw new IllegalArgumentException(
        s"Ensemble.save: op '${other.name}' does not support persistence")
  }

  private def instantiate(o: JObject, spark: SparkSession): EnsembleOp = {
    implicit val fmts: Formats = DefaultFormats
    def s(f: String) = (o \ f).extract[String]
    def ss(f: String) = (o \ f).extract[List[String]]
    (o \ "type").extract[String] match {
      case "Selection" => Selection(ss("cols"))
      case "SelectByTag" => SelectByTag(ss("tags"), ss("keep"))
      case "Rename" => Rename((o \ "mapping").extract[Map[String, String]])
      case "FilterCandidates" =>
        FilterCandidates(s("inputCol"), s("filterCol"), s("outputCol"))
      case "SoftmaxSampling" =>
        SoftmaxSampling(s("idsCol"), s("relevanceCol"),
          (o \ "temperature").extract[Double], (o \ "topk").extract[Int],
          (o \ "seed").extract[Long], s("seedCol"))
      case "ExplodeCandidates" => ExplodeCandidates(s("inputCol"), s("outputCol"))
      case "Padding" =>
        Padding(s("inputCol"), (o \ "length").extract[Int],
          (o \ "padValue").extract[Double])
      case "Categorify" => Categorify(ss("cols"), s("suffix"))
      case "StandardScale" => StandardScale(ss("cols"), s("suffix"))
      case "QueryFeatureStore" =>
        QueryFeatureStore(spark.read.parquet(s("path")), s("entityCol"),
          ss("featureCols"), (o \ "includeId").extract[Boolean],
          s("outputPrefix"), (o \ "broadcastDim").extract[Boolean])
      case "EmbeddingLookup" =>
        EmbeddingLookup(spark.read.parquet(s("path")), s("idCol"),
          s("embIdCol"), s("embCol"), s("outputCol"))
      case "UnrollFeatures" =>
        UnrollFeatures(spark.read.parquet(s("path")), ss("unrollCols"),
          s("on"), s("prefix"))
      case "TransformWorkflow" =>
        TransformWorkflow(org.apache.spark.ml.PipelineModel.load(s("path")))
      case t => throw new IllegalArgumentException(s"Ensemble.load: unknown op type '$t'")
    }
  }
}
