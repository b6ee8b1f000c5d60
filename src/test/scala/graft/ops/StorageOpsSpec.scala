package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StorageOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_storage_spec_").toString

  /** Text designed to break naive CSV/JSON handling: separators, RFC-4180
    * quotes, embedded newlines (unix and dos), unicode, null vs empty vs
    * whitespace-only. */
  private def hostile = Seq(
    (1L, "plain"),
    (2L, "comma, separated, values"),
    (3L, "a \"quoted\" phrase, with, commas"),
    (4L, "line one\nline two\r\nline three"),
    (5L, "unicode: 中文 ümläut ∑"),
    (6L, null.asInstanceOf[String]),
    (7L, ""),
    (8L, "  leading and trailing  ")
  ).toDF("id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[String]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap

  test("CSV round-trips hostile text byte-exactly, null distinct from empty") {
    val path = s"${tmp()}/csv"
    val df = hostile
    StorageOps.writeCsv(df, path)
    val back = StorageOps.readCsv(spark, path, df.schema)
    assert(asMap(back) == asMap(df),
      "CSV round trip must preserve quotes, newlines, unicode, whitespace, " +
        "and the null-vs-empty distinction")
  }

  test("JSONL round-trips hostile text byte-exactly") {
    val path = s"${tmp()}/jsonl"
    val df = hostile
    StorageOps.writeJsonl(df, path)
    val back = StorageOps.readJsonl(spark, path, df.schema)
    assert(asMap(back) == asMap(df))
  }

  test("CSV/JSONL round-trip 200 seeded-random strings (fuzz)") {
    val rnd = new scala.util.Random(11)
    def randChar: Char = rnd.nextInt(6) match {
      case 0 => ('a' + rnd.nextInt(26)).toChar
      case 1 => Seq('"', ',', '\\', '\'', '|')(rnd.nextInt(5))
      case 2 => Seq('\n', '\t', '\r')(rnd.nextInt(3))
      case 3 => (0x4E00 + rnd.nextInt(1000)).toChar // CJK block
      case 4 => (0xC0 + rnd.nextInt(0x50)).toChar   // latin-1 supplement
      case _ => ' '
    }
    def randString: String =
      (0 until rnd.nextInt(30)).map(_ => randChar).mkString
    val rows = (1L to 200L).map(i =>
      (i, if (i % 19 == 0) null else randString))
    val df = rows.toDF("id", "text")
    for ((label, write, read) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, String) => Unit,
        (String, org.apache.spark.sql.types.StructType) => org.apache.spark.sql.DataFrame)](
        ("csv", StorageOps.writeCsv, StorageOps.readCsv(spark, _, _)),
        ("jsonl", StorageOps.writeJsonl, StorageOps.readJsonl(spark, _, _)))) {
      val path = s"${tmp()}/$label"
      write(df, path)
      val back = read(path, df.schema)
      assert(asMap(back) == asMap(df),
        s"$label fuzz round trip must be lossless")
    }
  }

  test("co-bucketed join matches the plain join and runs with zero exchange") {
    val root = tmp()
    val left = (1 to 200).map(i => (i.toLong, s"L$i")).toDF("k", "lv")
    val right = (1 to 400).map(i => ((i % 220 + 1).toLong, i.toLong)).toDF("k", "rv")
    StorageOps.writeBucketed(left, "spec_bkt_left", "k", 4,
      sortCols = Seq("k"), path = Some(s"$root/left"))
    StorageOps.writeBucketed(right, "spec_bkt_right", "k", 4,
      sortCols = Seq("k"), path = Some(s"$root/right"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = StorageOps.coLocatedJoin(spark, "spec_bkt_left", "k",
        "spec_bkt_right", "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n${p.take(1200)}")
      val expected = left.join(right.withColumnRenamed("k", "k2"),
        $"k" === $"k2").select($"lv", $"rv")
      val got = joined.select($"lv", $"rv")
      assert(got.count() == expected.count())
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
      // an aggregate clustered by the bucket key inherits the distribution:
      // still no exchange anywhere in the plan
      val l = spark.table("spec_bkt_left")
      val r = spark.table("spec_bkt_right")
      val agg = l.join(r, l("k") === r("k")).groupBy(l("k"))
        .agg(count(lit(1)).as("n"))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"),
        s"bucket-clustered aggregate must not shuffle:\n${ap.take(1200)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS spec_bkt_left")
      spark.sql("DROP TABLE IF EXISTS spec_bkt_right")
    }
  }

  test("bucketed write emits one file per bucket") {
    val root = tmp()
    val df = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "v")
    StorageOps.writeBucketed(df, "spec_bkt_files", "k", 8,
      path = Some(s"$root/files"))
    try {
      val files = new java.io.File(s"$root/files").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 8,
        s"expected one file per bucket, got ${files.length}: the " +
          "pre-repartition into bucket partitions must hold")
    } finally spark.sql("DROP TABLE IF EXISTS spec_bkt_files")
  }

  test("compact merges a fragmented layout without touching content") {
    val root = tmp()
    val df = (1 to 2000).map(i => (i.toLong, s"row $i " + ("x" * 50)))
      .toDF("id", "payload")
    df.repartition(32).write.mode("overwrite").parquet(s"$root/frag")
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$root/frag") == 32, "fixture must be fragmented")
    val n = StorageOps.compact(spark, s"$root/frag", s"$root/out",
      targetBytes = 1L << 30)
    assert(n == 1, "tiny corpus fits one target-size file")
    assert(parquetFiles(s"$root/out") == 1)
    val back = spark.read.parquet(s"$root/out")
    assert(back.count() == 2000)
    assert(back.except(df).isEmpty && df.except(back).isEmpty,
      "compaction must not change content")
  }

  test("compact preserves a hive-partitioned layout and sizes per partition") {
    val root = tmp()
    // two partitions, deliberately unequal: "en" big enough for 2 target
    // files, "de" small enough for 1 — and both fragmented into 8 files
    val en = (1 to 4000).map(i => (i.toLong, "en", "pad" + ("x" * 200)))
    val de = (1 to 200).map(i => (i.toLong, "de", "pad"))
    val df = (en ++ de).toDF("id", "lang", "payload")
    df.repartition(8).write.mode("overwrite")
      .partitionBy("lang").parquet(s"$root/frag")
    def parquetFiles(p: String) = {
      val d = new java.io.File(p)
      if (!d.exists) 0 else d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(parquetFiles(s"$root/frag/lang=en") == 8, "fixture must be fragmented")
    // target sized so lang=en needs >1 file: measure its actual bytes
    val enBytes = new java.io.File(s"$root/frag/lang=en").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = enBytes / 2 + 1 // en → 2 files, de (far smaller) → 1
    val n = StorageOps.compact(spark, s"$root/frag", s"$root/out", target)
    assert(n == 3, s"expected per-partition sizing (2 + 1), got $n")
    assert(parquetFiles(s"$root/out/lang=en") == 2,
      "big partition compacts to 2 files, not the whole dataset to 1")
    assert(parquetFiles(s"$root/out/lang=de") == 1)
    // layout survives: partition column restored from the path, pruning intact
    val back = spark.read.parquet(s"$root/out")
    assert(back.columns.toSet == Set("id", "lang", "payload"))
    val filtered = back.filter($"lang" === "de")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("lang"),
      s"compacted layout must still prune on lang:\n${p.take(1200)}")
    assert(filtered.count() == 200)
    // partition columns come back LAST on read — compare by name
    val backOrdered = back.select("id", "lang", "payload")
    assert(backOrdered.except(df).isEmpty && df.except(backOrdered).isEmpty,
      "per-partition compaction must not change content")
  }

  test("z-ordered layout skips files on EVERY z column; single-column sort only on one") {
    // 64x64 uniform grid: the worst case for single-column clustering
    // (sorting by a leaves b uniformly spread in every file)
    val rows = for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b, a * 64 + b)
    val df = rows.toDF("a", "b", "payload")
    val zpath = s"${tmp()}/zorder"
    val spath = s"${tmp()}/asort"
    StorageOps.writeZOrdered(df, zpath, Seq("a", "b"), bits = 6, numFiles = 8)
    df.repartitionByRange(8, $"a").sortWithinPartitions("a")
      .write.mode("overwrite").parquet(spath)
    def fileBounds(p: String, c: String): Seq[(Long, Long)] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c)), max(col(c))).head()
          (r.getLong(0), r.getLong(1))
        }
    def matching(bounds: Seq[(Long, Long)], v: Long): Int =
      bounds.count { case (lo, hi) => lo <= v && v <= hi }
    // the a-sorted layout cannot skip ANY file for a predicate on b
    assert(matching(fileBounds(spath, "b"), 17L) == 8,
      "single-column clustering leaves the other column unskippable")
    // the z-ordered layout confines each file to a hyper-rectangle:
    // a point predicate on EITHER column skips most files
    val zb = matching(fileBounds(zpath, "b"), 17L)
    val za = matching(fileBounds(zpath, "a"), 17L)
    assert(zb <= 5 && za <= 5,
      s"z-order must bound both dimensions per file: a-match=$za b-match=$zb")
    // layout change, not content change
    val back = spark.read.parquet(zpath).select("a", "b", "payload")
    assert(back.count() == 4096 &&
      back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("zValueExpr: interleave is exact on known bit patterns") {
    // a = 0b101, b = 0b011 at 3 bits -> z = 100111 (a bits at odd
    // positions, b bits at even): a2=1,b2=0,a1=0,b1=1,a0=1,b0=1
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(StorageOps.zValueExpr(Seq(col("a"), col("b")), 3).as("z"))
      .head().getLong(0)
    assert(out == 39L, s"expected 0b100111=39, got $out")
  }

  test("writeForPointLookup emits parquet bloom filters on the key columns") {
    val root = tmp()
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(2)
    StorageOps.writeForPointLookup(df, s"$root/bloom", Seq("k"),
      expectedNdv = 5000)
    // inspect the footer: every row group must carry a bloom filter for k
    val file = new java.io.File(s"$root/bloom").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    try {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala
      assert(blocks.nonEmpty)
      blocks.foreach { b =>
        val kCol = b.getColumns.asScala
          .find(_.getPath.toDotString == "k").get
        val bloom = reader.getBloomFilterDataReader(b).readBloomFilter(kCol)
        assert(bloom != null, "row group must carry a bloom filter for k")
      }
    } finally reader.close()
    // and the lookup still answers correctly through the filtered scan
    val hit = spark.read.parquet(s"$root/bloom").filter($"k" === 4321L)
    assert(hit.select("v").as[String].collect().toSeq == Seq("v4321"))
  }

  test("partition-column filter prunes at planning time (PartitionFilters)") {
    val root = tmp()
    val df = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L),
      (4L, "fr", 40L)).toDF("id", "lang", "n")
    StorageOps.writePartitioned(df, s"$root/part", Seq("lang"))
    val filtered = StorageOps.readPartitioned(spark, s"$root/part")
      .filter($"lang" === "en")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("lang"),
      s"the lang predicate must prune partitions at the scan:\n${p.take(1200)}")
    assert(filtered.count() == 2)
    // the partition column survives the layout round trip
    assert(filtered.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("zScaleSql stays exact when the column span exceeds the 64-bit multiply range") {
    // span ~4.6e18 (microsecond epochs over decades): (v-min)*65535 wraps
    // a 64-bit long; the decimal rescale must stay exact and in-range
    val lo = 0L; val hi = 4_600_000_000_000_000_000L
    val df = Seq(lo, hi / 2, hi).toDF("v")
    val out = df.selectExpr(StorageOps.zScaleSql("v", lo, hi, 16) + " AS s")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 32767L, 65535L), s"exact decimal rescale: $out")
  }

  test("writeCsv fails fast when a cell collides with the NULL sentinel") {
    val dir = tmp()
    val bad = Seq((1L, "fine"), (2L, "\\N")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      StorageOps.writeCsv(bad, dir)
    }
    assert(e.getMessage.contains("NULL sentinel"))
    // a null round-trips; the sentinel-free frame writes normally
    val ok = Seq((1L, "fine"), (2L, null)).toDF("id", "s")
    StorageOps.writeCsv(ok, dir)
    val back = StorageOps.readCsv(spark, dir, ok.schema).orderBy("id").collect()
    assert(back(1).isNullAt(1), "a real NULL survives the round trip")
  }

  test("compact preserves partition layout for a RELATIVE input path") {
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    val base = new java.io.File("target/compact_rel_spec")
    if (base.exists()) rmTree(base)
    val in = "target/compact_rel_spec/in"
    val out = "target/compact_rel_spec/out"
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .write.partitionBy("k").parquet(in)
    StorageOps.compact(spark, in, out)
    // partition dirs must land at the OUTPUT ROOT (out/k=a, out/k=b) —
    // a mangled nested tree breaks partition discovery on read
    val sub = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(sub.contains("k=a") && sub.contains("k=b"), s"got: $sub")
    assert(spark.read.parquet(out).columns.toSet == Set("id", "k"))
    rmTree(base)
  }

  test("writeZOrdered handles an empty input without NPE") {
    val dir = tmp()
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    StorageOps.writeZOrdered(empty, dir, Seq("a", "b"))
    assert(spark.read.parquet(dir).count() == 0L)
  }
}
