package graft.core

import graft.SparkSpec

/** The shared commit protocol for maintained artifacts: atomic versioned
  * publication, snapshot stability for pinned readers, crash-garbage
  * invisibility, and retention that never touches the live version. */
class VersionedDirSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("vdir_").toString

  test("publish is atomic: readLatest sees each full table, versions increment") {
    val dir = tmp()
    assert(VersionedDir.readLatest(spark, dir).isEmpty)
    val v0 = VersionedDir.publish(Seq((1L, "a")).toDF("id", "x"), dir)
    val v1 = VersionedDir.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), dir)
    assert(v0 == "v0" && v1 == "v1")
    assert(VersionedDir.readLatest(spark, dir).get.count() == 2)
    assert(VersionedDir.versions(spark, dir) == Seq("v1", "v0"))
  }

  test("a reader pinned to a version keeps its snapshot across later publishes") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "old")).toDF("id", "x"), dir)
    val pinned = VersionedDir.readLatest(spark, dir).get // resolves v0 NOW
    VersionedDir.publish(Seq((1L, "new"), (2L, "new")).toDF("id", "x"), dir)
    // the pinned frame still reads v0's files — full snapshot isolation
    assert(pinned.select("x").as[String].collect().toSeq == Seq("old"))
    assert(VersionedDir.readLatest(spark, dir).get.count() == 2)
  }

  test("an unreferenced version dir (crash before pointer move) is invisible; vacuum spares it until the pointer passes") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "live")).toDF("id", "x"), dir)
    // simulate a failed publish: v99 materialized, pointer never moved
    Seq((9L, "garbage")).toDF("id", "x")
      .write.parquet(s"$dir/v99/data")
    // readers still resolve the pointed version
    assert(VersionedDir.readLatest(spark, dir).get
      .select("x").as[String].collect().toSeq == Seq("live"))
    // vacuum must NOT touch a dir above the pointer (it cannot tell
    // crash garbage from another writer's in-flight commit), must not
    // let it consume a retention slot (or v0 — the only real history —
    // would vanish under a pinned reader), and force-keeps pointed v0
    assert(VersionedDir.vacuum(spark, dir, keep = 0).isEmpty)
    assert(VersionedDir.versions(spark, dir) == Seq("v99", "v0"))
    assert(VersionedDir.readLatest(spark, dir).get.count() == 1)
    // once the pointer passes it (next commit lands at v100 = max + 1),
    // the garbage joins committed history and ages out normally
    VersionedDir.publish(Seq((2L, "next")).toDF("id", "x"), dir)
    assert(VersionedDir.vacuum(spark, dir, keep = 1).toSet == Set("v99", "v0"))
    assert(VersionedDir.versions(spark, dir) == Seq("v100"))
  }

  test("readAt time-travels to retained versions; vacuumed history is gone") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "old")).toDF("id", "x"), dir)
    VersionedDir.publish(Seq((1L, "new")).toDF("id", "x"), dir)
    assert(VersionedDir.readAt(spark, dir, "v0").get
      .select("x").as[String].collect().toSeq == Seq("old"))
    assert(VersionedDir.readAt(spark, dir, "v1").get
      .select("x").as[String].collect().toSeq == Seq("new"))
    assert(VersionedDir.readAt(spark, dir, "v9").isEmpty)
    VersionedDir.vacuum(spark, dir, keep = 1)
    // history reaches only as far as retention keeps it
    assert(VersionedDir.readAt(spark, dir, "v0").isEmpty)
    assert(VersionedDir.readAt(spark, dir, "v1").nonEmpty)
  }

  test("an empty or missing pointer file reads as no live version") {
    val dir = tmp()
    assert(VersionedDir.latest(spark, dir).isEmpty) // no dir at all
    VersionedDir.publish(Seq((1L, "a")).toDF("id", "x"), dir)
    // truncate the pointer (a crashed writer's worst case AFTER our
    // write-then-rename protocol would still be all-or-nothing; this
    // simulates external corruption) — readers degrade to "no live
    // version", never to a partial read
    val (fs, p) = VersionedDir.fsOf(spark, dir)
    val ptr = new org.apache.hadoop.fs.Path(p, "_LATEST")
    fs.create(ptr, true).close()
    assert(VersionedDir.latest(spark, dir).isEmpty)
    assert(VersionedDir.readLatest(spark, dir).isEmpty)
    // the versions and their data are intact — repair = rewrite pointer
    VersionedDir.writePointer(spark, dir, "v0")
    assert(VersionedDir.readLatest(spark, dir).get.count() == 1)
  }

  test("racing publishers on the same version: the reservation admits exactly one") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "base")).toDF("id", "x"), dir)
    // two orchestrator-double-fired jobs read the log concurrently and
    // compute the SAME next version — the create-exclusive reservation
    // lets exactly one in, the loser throws loudly
    val contested = VersionedDir.nextVersion(spark, dir)
    assert(VersionedDir.reserve(spark, dir, contested) == contested)
    val e = intercept[VersionedDir.CommitConflictException] {
      VersionedDir.reserve(spark, dir, contested)
    }
    assert(e.getMessage.contains(contested))
    // the winner's commit completes normally through the same version
    Seq((2L, "A")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/$contested/data")
    VersionedDir.commitPointer(spark, dir, contested)
    assert(VersionedDir.readLatest(spark, dir).get
      .select("x").as[String].collect().toSeq == Seq("A"))
  }

  test("an overtaken slow writer cannot regress the pointer: exactly one commit wins") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "base")).toDF("id", "x"), dir)
    // A opens its commit first (reserves v1) then stalls; B opens (v2 —
    // the reservation dir already advances the log) and commits first
    val vA = VersionedDir.reserveNextVersion(spark, dir)
    val vB = VersionedDir.reserveNextVersion(spark, dir)
    assert(vA == "v1" && vB == "v2")
    Seq((2L, "B")).toDF("id", "x").write.mode("overwrite").parquet(s"$dir/$vB/data")
    VersionedDir.commitPointer(spark, dir, vB)
    // A wakes and tries to finish: the pointer re-read fails it LOUDLY —
    // silently renaming would regress readers onto the stale v1 snapshot
    Seq((2L, "A")).toDF("id", "x").write.mode("overwrite").parquet(s"$dir/$vA/data")
    intercept[VersionedDir.CommitConflictException] {
      VersionedDir.commitPointer(spark, dir, vA)
    }
    // the winner's commit is intact; the loser's files are unreferenced
    // garbage for vacuum, never a visible table
    assert(VersionedDir.latest(spark, dir).contains(vB))
    assert(VersionedDir.readLatest(spark, dir).get
      .select("x").as[String].collect().toSeq == Seq("B"))
  }

  test("lineage check: an interleaved commit on a LOWER number fails the derived commit") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "base")).toDF("id", "x"), dir) // v0
    // A compactor reads its base snapshot at v0 and reserves v1; an
    // appender then reserves v2 and commits FIRST. The compactor's
    // content (a republished manifest/meta derived from v0) now silently
    // lacks the appender's delta — the ORDERING check alone cannot see
    // it when the compactor's number is higher, and here it is lower:
    // cover both interleavings.
    val base = VersionedDir.latest(spark, dir)
    val vCompact = VersionedDir.reserveNextVersion(spark, dir) // v1
    val vAppend = VersionedDir.reserveNextVersion(spark, dir) // v2
    Seq((2L, "append")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/$vAppend/data")
    VersionedDir.commitPointerFrom(spark, dir, vAppend, base)
    Seq((1L, "compacted")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/$vCompact/data")
    // this interleaving (stale commit on the LOWER number) is the one
    // the plain ordering check also catches — the lineage check must
    // subsume it; the ordering-invisible case is the next test
    intercept[VersionedDir.CommitConflictException] {
      VersionedDir.commitPointerFrom(spark, dir, vCompact, base)
    }
    assert(VersionedDir.latest(spark, dir).contains(vAppend))
  }

  test("lineage check: a derived commit on a HIGHER number must not drop the interleaved delta") {
    val dir = tmp()
    VersionedDir.publish(Seq((1L, "base")).toDF("id", "x"), dir) // v0
    val base = VersionedDir.latest(spark, dir)
    // appender opens first (v1), compactor reads its base at v0 but
    // reserves AFTER the appender (v2 — a higher number, so the plain
    // ordering check of commitPointer would let it through and the
    // appender's v1 delta would vanish from the live manifest)
    val vAppend = VersionedDir.reserveNextVersion(spark, dir) // v1
    val vCompact = VersionedDir.reserveNextVersion(spark, dir) // v2
    Seq((2L, "append")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/$vAppend/data")
    VersionedDir.commitPointerFrom(spark, dir, vAppend, base)
    Seq((1L, "compacted-from-v0")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/$vCompact/data")
    intercept[VersionedDir.CommitConflictException] {
      VersionedDir.commitPointerFrom(spark, dir, vCompact, base)
    }
    // the appender's commit stays live; the stale compaction is garbage
    assert(VersionedDir.latest(spark, dir).contains(vAppend))
    // and a RE-DERIVED compaction from the NEW live snapshot succeeds
    val base2 = VersionedDir.latest(spark, dir)
    val vRetry = VersionedDir.reserveNextVersion(spark, dir)
    Seq((2L, "compacted-from-v1")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/$vRetry/data")
    VersionedDir.commitPointerFrom(spark, dir, vRetry, base2)
    assert(VersionedDir.latest(spark, dir).contains(vRetry))
  }

  test("lineage check: a first commit requires the log to still be empty") {
    val dir = tmp()
    // two bootstrap writers race an empty log: the second's content
    // assumed empty priors (docCount 0, empty manifest) — it must lose
    val vA = VersionedDir.reserveNextVersion(spark, dir) // v0
    val vB = VersionedDir.reserveNextVersion(spark, dir) // v1
    Seq((1L, "A")).toDF("id", "x").write.mode("overwrite").parquet(s"$dir/$vA/data")
    VersionedDir.commitPointerFrom(spark, dir, vA, None)
    Seq((1L, "B")).toDF("id", "x").write.mode("overwrite").parquet(s"$dir/$vB/data")
    intercept[VersionedDir.CommitConflictException] {
      VersionedDir.commitPointerFrom(spark, dir, vB, None)
    }
    assert(VersionedDir.latest(spark, dir).contains(vA))
  }

  test("publish retention vacuums superseded versions in the same call") {
    val dir = tmp()
    (0 until 4).foreach(i =>
      VersionedDir.publish(Seq((i.toLong, "r")).toDF("id", "x"), dir,
        retainVersions = Some(2)))
    assert(VersionedDir.versions(spark, dir) == Seq("v3", "v2"))
    assert(VersionedDir.readLatest(spark, dir).get
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }
}
