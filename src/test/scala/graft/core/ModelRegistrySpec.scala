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

  /** Stub tracking server speaking the one public endpoint the registry
    * consumes; resolves name/version → a local artifact path. */
  private def withStubServer[A](models: Map[(String, String), String])
      (body: String => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/ajax-api/2.0/preview/mlflow/model-versions/get-download-uri",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val i = kv.indexOf('=')
            java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
              java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
          }.toMap
        val resp = models.get((params.getOrElse("name", ""), params.getOrElse("version", "")))
          .map(p => (200, s"""{"artifact_uri": "$p"}"""))
          .getOrElse((404, """{"error_code": "RESOURCE_DOES_NOT_EXIST"}"""))
        val bytes = resp._2.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(resp._1, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HttpModelRegistry resolves artifact_uri from the tracking endpoint") {
    withStubServer(Map(("wf", "3") -> "/models/wf/3", ("a b", "1") -> "/models/ab/1")) { base =>
      assert(HttpModelRegistry("wf", "3", base).artifactUri == "/models/wf/3")
      assert(HttpModelRegistry("wf", "3", base + "/").artifactUri == "/models/wf/3",
        "trailing slash on the tracking uri must not double")
      // name with a space: query params must be URL-encoded
      assert(HttpModelRegistry("a b", "1", base).artifactUri == "/models/ab/1")
      // unknown version → fail fast with both coordinates named
      val e = intercept[IllegalArgumentException] {
        HttpModelRegistry("wf", "9", base).artifactUri
      }
      assert(e.getMessage.contains("wf") && e.getMessage.contains("9"))
    }
  }

  test("models:/name/version URIs parse; malformed ones fail fast") {
    val r = HttpModelRegistry.fromUri("models:/wf/3", "http://x")
    assert(r.name == "wf" && r.version == "3")
    // a name containing slashes keeps everything before the LAST segment
    val nested = HttpModelRegistry.fromUri("models:/team/wf/latest", "http://x")
    assert(nested.name == "team/wf" && nested.version == "latest")
    assertThrows[IllegalArgumentException] {
      HttpModelRegistry.fromUri("runs:/abc/model", "http://x")
    }
    assertThrows[IllegalArgumentException] {
      HttpModelRegistry.fromUri("models:/bare", "http://x")
    }
  }

  test("a fitted workflow round-trips through the remote registry") {
    val df = Seq((1L, "a", 2.0), (2L, "b", 4.0), (3L, "a", 6.0))
      .toDF("id", "cat", "cont")
    val wf = graft.ops.TransformWorkflow.fit(df, Seq("cat"), Seq("cont"))
    val dir = java.nio.file.Files.createTempDirectory("http_reg").toString + "/wf/1"
    wf.model.write.overwrite().save(dir)
    withStubServer(Map(("wf", "1") -> dir)) { base =>
      val loaded = graft.ops.TransformWorkflow.fromRegistry(
        HttpModelRegistry("wf", "1", base))
      assert(loaded.transform(df).select("cat_idx").collect().toSeq ==
        wf.transform(df).select("cat_idx").collect().toSeq)
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
