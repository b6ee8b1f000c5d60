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
