package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic versioned publication of tables and index state on a plain
  * filesystem — the commit protocol every maintained artifact in this
  * library shares (the streaming BM25/IVF/SQ8 index sinks, and batch
  * corpus republication via [[publish]]):
  *
  *   - each publication is a FULL new `v<n>` directory; live files are
  *     never mutated (no read-modify-write, retries idempotent by
  *     version name);
  *   - `_LATEST` is a one-line pointer file, written to a temp name and
  *     renamed — readers never observe a half-written pointer, and a
  *     reader that resolved a version keeps a consistent snapshot no
  *     matter what publishes after it;
  *   - superseded versions are reclaimed explicitly ([[vacuum]]) under a
  *     retention that must cover the longest in-flight read.
  *
  * This is the useful core of a table-format commit log (Delta/Iceberg)
  * without a dependency: at 100 TB the pattern matters because a
  * recomputed corpus or index must swap in atomically under live
  * readers, and because partial writes of a failed job must be
  * invisible (an unreferenced `v<n>` dir is garbage, not corruption —
  * the pointer never moved). Single-writer per directory is the
  * contract, exactly like a streaming sink's foreachBatch.
  */
object VersionedDir {
  def fsOf(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The live version name in `<dir>/_LATEST`, if any. */
  def latest(spark: SparkSession, dir: String): Option[String] = {
    val (fs, p) = fsOf(spark, dir)
    val ptr = new org.apache.hadoop.fs.Path(p, "_LATEST")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  /** Move `_LATEST` to `version` (write-then-rename: readers never
    * observe a half-written pointer). The version's files must be fully
    * materialized BEFORE this call — the pointer move IS the commit.
    * The rename OVERWRITES the existing pointer in one operation
    * (FileContext semantics): a delete-then-rename pair would open a
    * window with no pointer at all, where a crash loses the table and a
    * concurrent reader resolves None mid-swap. */
  def writePointer(spark: SparkSession, dir: String, version: String): Unit = {
    val (fs, p) = fsOf(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(p, s"._LATEST.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(p, "_LATEST")
    // throws on failure instead of FileSystem.rename's silent false
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, fs.getConf)
      .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** All `v<n>` version dir names under `dir`, newest first. */
  def versions(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap { n =>
        if (n.startsWith("v")) scala.util.Try(n.drop(1).toLong).toOption.map(n -> _)
        else None
      }
      .sortBy(-_._2).map(_._1)
  }

  /** The next version name in log order (max existing + 1 — INCLUDING
    * unreferenced garbage dirs, which therefore never collide with a
    * new commit). Single-writer contract: two concurrent writers could
    * race this read; the directory's owner is one process, exactly like
    * a streaming sink's foreachBatch. */
  def nextVersion(spark: SparkSession, dir: String): String =
    "v" + (versions(spark, dir).headOption
      .map(_.drop(1).toLong + 1).getOrElse(0L))

  /** Delete all but the `keep` most-recent version dirs — NEVER the
    * `_LATEST`-pointed one (force-kept even at keep = 0). Returns the
    * deleted names. Retention contract: a reader pins a version by
    * resolving `_LATEST` once at load, so `keep` must cover the longest
    * in-flight read (keep = 2 tolerates one read spanning a swap). Safe
    * to run concurrently with the single writer, which only ever
    * creates NEW dirs and moves the pointer. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2): Seq[String] = {
    require(keep >= 0, s"VersionedDir.vacuum: keep must be >= 0, got $keep")
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) return Seq.empty
    val live = latest(spark, dir)
    // retention counts POINTER-COMMITTED history only (version number <=
    // the live pointer's). A higher-numbered unreferenced dir is either
    // crash garbage or another writer's in-flight commit: it must not
    // consume a retention slot (or the slot's real version vanishes
    // under a pinned reader) and must not be deleted here (that would
    // race an in-flight commit) — once the pointer passes its number it
    // joins committed history and ages out normally. No pointer = no
    // committed history = nothing reclaimable.
    val liveN = live.flatMap(v => scala.util.Try(v.drop(1).toLong).toOption)
    val committed = liveN match {
      case Some(n) => versions(spark, dir).filter(_.drop(1).toLong <= n)
      case None => Seq.empty
    }
    val doomed = committed.drop(keep).filterNot(live.contains)
    doomed.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(p, v), true))
    doomed
  }

  /** Atomically publish `df` as the next version of a batch-maintained
    * table: write the FULL frame to a fresh `v<n>/data` (n = highest
    * existing + 1), move the pointer last, optionally vacuum. A reader
    * holding the previous version keeps its snapshot; a crash before the
    * pointer move leaves an unreferenced dir for the next vacuum, never
    * a half-visible table. Returns the published version name. */
  def publish(df: DataFrame, dir: String,
      retainVersions: Option[Int] = None): String = {
    val spark = df.sparkSession
    val next = nextVersion(spark, dir)
    df.write.mode("overwrite").parquet(s"$dir/$next/data")
    writePointer(spark, dir, next)
    retainVersions.foreach(vacuum(spark, dir, _))
    next
  }

  /** The live table published via [[publish]] (None before the first). */
  def readLatest(spark: SparkSession, dir: String): Option[DataFrame] =
    latest(spark, dir).map(v => spark.read.parquet(s"$dir/$v/data"))

  /** A specific retained version's table — time travel: audit an older
    * snapshot, or diff two versions (e.g. feed both sides to
    * SnapshotDiff). None if the version was never published or has been
    * vacuumed; retention (`vacuum`'s `keep`) bounds how far back this
    * reaches, exactly like a table format's history window. */
  def readAt(spark: SparkSession, dir: String,
      version: String): Option[DataFrame] = {
    val (fs, p) = fsOf(spark, dir)
    if (fs.exists(new org.apache.hadoop.fs.Path(p, s"$version/data")))
      Some(spark.read.parquet(s"$dir/$version/data"))
    else None
  }
}
