package graft.queries

import scala.collection.concurrent.TrieMap

/** The data dir a dump-time oracle should pair its fitted constants with.
  *
  * Dump-time oracles inline memoized fitted parameters (tree splits,
  * centroids, LSH centers, PCA axes) as SQL literals. The caches are
  * keyed by data dir; when queries have run for MORE than one dir in a
  * JVM, picking an arbitrary entry (TrieMap iteration order) could pair
  * one dir's fitted constants with another dir's data and fail
  * verification nondeterministically. [[graft.Verify]] declares the dir
  * it is dumping for; every oracle prefers that dir's entry and falls
  * back to the smallest key (deterministic) when unset. */
object OracleDir {
  @volatile var active: Option[String] = None

  /** Verify-dir side-artifact root (set by [[graft.Verify]] to
    * `<outDir>/_artifacts`): queries whose fitted state is a TABLE rather
    * than a few literals (ALS factor frames, BPE merge lists) persist it
    * here as parquet, and their dump-time oracle SQL replays against it
    * via DuckDB's `read_parquet`. The underscore prefix keeps the dir
    * invisible to the driver's per-query parquet reads. Unset outside
    * Verify (bench/tests pay no artifact writes). */
  @volatile var artifactDir: Option[String] = None

  /** A harness-lifetime temp directory (streaming index logs, corpus
    * state dirs): created now, recursively deleted at JVM exit by one
    * shared shutdown hook. Deletion cannot be eager — the query fns
    * return LAZY frames that read these dirs when the caller (Verify's
    * parquet write, a test's collect) finally materializes them — but a
    * long-lived harness JVM invoking many queries must not leak one
    * on-disk index copy per invocation forever (round-11 ADVICE). */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val tempDirHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      tempDirs.asScala.foreach { t =>
        if (java.nio.file.Files.exists(t))
          java.nio.file.Files.walk(t).iterator().asScala.toSeq.reverseIterator
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }))
  }

  def tempDir(prefix: String): String = {
    tempDirHook
    val t = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(t)
    t.toString
  }

  /** Eagerly delete a [[tempDir]] a repeated lifecycle query has
    * superseded — the exit hook bounds leakage per JVM, this bounds it
    * per INVOCATION (a bench run re-executes lifecycle rows several
    * times; round-13 ADVICE flagged the orphaned index dirs). */
  def dropTempDir(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val t = java.nio.file.Paths.get(path)
    tempDirs.remove(t)
    if (java.nio.file.Files.exists(t))
      java.nio.file.Files.walk(t).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** Write `df` (small, fit-sized) as a single-file parquet side artifact
    * named `name`, returning its path — only when Verify is dumping for
    * `d`. The ONE writer all artifact-backed oracles share. */
  def writeArtifact(df: org.apache.spark.sql.DataFrame, d: String,
      name: String): Option[String] =
    artifactDir.filter(_ => active.contains(d)).map { root =>
      val path = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(path)
      path
    }

  /** Preferred dir among `dirs`: the active verify dir when fitted there,
    * else the smallest — never TrieMap iteration order. */
  def pickDir(dirs: Iterable[String]): Option[String] = {
    val s = dirs.toSeq.sorted
    s.find(active.contains).orElse(s.headOption)
  }

  /** Entry from a plain dir-keyed fit cache. */
  def pick[V](cache: TrieMap[String, V]): Option[V] =
    pickDir(cache.keys).map(cache(_))

  /** Entry from a composite-keyed fit cache: `accept` filters to the
    * query's canonical parameterization, `dirOf` reads the data dir out
    * of the key. */
  def pickKey[K, V](cache: TrieMap[K, V], dirOf: K => String,
      accept: K => Boolean)(implicit ord: Ordering[K]): Option[(K, V)] = {
    val keys = cache.keys.filter(accept).toSeq.sorted
    keys.find(k => active.contains(dirOf(k))).orElse(keys.headOption)
      .map(k => k -> cache(k))
  }
}
