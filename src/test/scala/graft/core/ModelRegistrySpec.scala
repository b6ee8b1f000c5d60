package graft.core

import graft.SparkSpec
import graft.ops.{Rename, Selection}

/** Registry resolution + ensemble loading via registry (reference
  * model_registry.py:6-61, from_model_registry). */
class ModelRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot = java.nio.file.Files.createTempDirectory("registry").toString

  test("latest resolves numerically when versions are integers") {
    val root = tmpRoot
    Seq("1", "9", "10").foreach(v =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "m", v)))
    val uri = FileModelRegistry(root, "m").artifactUri
    assert(uri.endsWith("m/10"), s"numeric latest must pick 10, got $uri")
    assert(FileModelRegistry(root, "m", "9").artifactUri.endsWith("m/9"))
  }

  test("latest falls back to lexicographic for non-numeric versions") {
    val root = tmpRoot
    Seq("v1", "v2").foreach(v =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "m", v)))
    assert(FileModelRegistry(root, "m").artifactUri.endsWith("m/v2"))
  }

  test("missing model or empty versions fail fast") {
    val root = tmpRoot
    assertThrows[IllegalArgumentException] {
      FileModelRegistry(root, "absent").artifactUri
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "empty"))
    assertThrows[IllegalArgumentException] {
      FileModelRegistry(root, "empty").artifactUri
    }
  }

  test("ensembles save to pathFor and load back through the registry") {
    val root = tmpRoot
    val input = Seq((1L, "a")).toDF("id", "s")
    val ens = Ensemble(Seq(Rename(Map("s" -> "t")), Selection(Seq("t"))), input.schema)
    val reg = FileModelRegistry(root, "pipeline")
    EnsemblePersistence.save(ens, reg.pathFor("1"), spark)
    EnsemblePersistence.save(ens, reg.pathFor("2"), spark)
    val loaded = EnsemblePersistence.load(reg, spark) // resolves version 2
    assert(loaded.transform(input).collect().map(_.getString(0)).toSeq == Seq("a"))
  }
}
