package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Model-path resolution for inference ops — the reference's
  * `ModelRegistry` surface (/root/reference/merlin/systems/
  * model_registry.py:6-61): the single contract is `artifactUri`, the
  * export path an operator loads from
  * (`PredictTensorflow.from_model_registry(registry)`). The reference's
  * one backend talks to an MLflow tracking server over HTTP; the
  * Spark-native backend below resolves against any Hadoop-compatible
  * filesystem (local, HDFS, S3A, ABFS) — the registry a Spark cluster
  * actually shares. Custom registries implement the one method.
  */
trait ModelRegistry {
  /** URI of the model artifact directory (reference `get_artifact_uri`). */
  def artifactUri: String
}

/** A registry rooted at `<root>/<name>/<version>` on a Hadoop-compatible
  * FS. `version = "latest"` resolves to the greatest version directory
  * present — numerically when every version is an integer (so 10 > 9),
  * lexicographically otherwise. Resolution is one driver-side FS listing;
  * nothing touches executors.
  */
case class FileModelRegistry(root: String, name: String,
    version: String = FileModelRegistry.Latest) extends ModelRegistry {

  override def artifactUri: String = {
    val base = new Path(root, name)
    if (version != FileModelRegistry.Latest) new Path(base, version).toString
    else {
      val conf = SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = base.getFileSystem(conf)
      require(fs.exists(base), s"ModelRegistry: no model '$name' under $root")
      val versions = fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName)
      require(versions.nonEmpty, s"ModelRegistry: model '$name' has no versions")
      val latest =
        if (versions.forall(_.forall(_.isDigit))) versions.maxBy(_.toLong)
        else versions.max
      new Path(base, latest).toString
    }
  }

  /** Register: copy nothing, just the canonical target path for writers —
    * `EnsemblePersistence.save(ens, registry.pathFor("3"), spark)`. */
  def pathFor(v: String): String = new Path(new Path(root, name), v).toString
}

object FileModelRegistry {
  val Latest = "latest"
}

/** Remote registry over HTTP — the reference's MLflow-backed shape
  * (/root/reference/merlin/systems/model_registry.py:28-61): one GET to
  * the tracking server's public model-versions/get-download-uri endpoint,
  * the response's `artifact_uri` is the model path. The resolved URI is
  * whatever the server registered (absolute fs path, s3a://, hdfs://) and
  * feeds the same loaders as [[FileModelRegistry]]
  * (`TransformWorkflow.fromRegistry`, `EnsemblePersistence.load`).
  * Resolution is one driver-side request; nothing touches executors.
  */
case class HttpModelRegistry(name: String, version: String,
    trackingUri: String) extends ModelRegistry {

  override def artifactUri: String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val url = new java.net.URI(trackingUri.stripSuffix("/") +
      "/ajax-api/2.0/preview/mlflow/model-versions/get-download-uri" +
      s"?name=${enc(name)}&version=${enc(version)}").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(10000)
    try {
      require(conn.getResponseCode == 200,
        s"ModelRegistry: could not find a model version for model '$name' " +
          s"with version '$version' (HTTP ${conn.getResponseCode})")
      val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      (org.json4s.jackson.JsonMethods.parse(body) \ "artifact_uri")
        .toOption.map(_.extract[String])
        .getOrElse(throw new IllegalArgumentException(
          s"ModelRegistry: response for '$name'/'$version' has no artifact_uri"))
    } finally conn.disconnect()
  }
}

object HttpModelRegistry {
  /** Build from an MLflow-style `models:/name/version` URI. */
  def fromUri(modelsUri: String, trackingUri: String): HttpModelRegistry = {
    val rest = modelsUri.stripPrefix("models:/")
    require(rest != modelsUri && rest.contains('/'),
      s"HttpModelRegistry: expected models:/<name>/<version>, got '$modelsUri'")
    val i = rest.lastIndexOf('/')
    HttpModelRegistry(rest.take(i), rest.drop(i + 1), trackingUri)
  }
}
