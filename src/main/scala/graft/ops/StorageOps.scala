package graft.ops

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Physical data-layout operators — the storage side of the 100 TB design.
  *
  * The reference's only sinks are parquet fixtures and the Triton model
  * repository (SURVEY.md §2.6); a Spark-first engine's sink surface is
  * where most 100 TB wins actually live, because layout decisions made at
  * WRITE time delete work from every subsequent read:
  *
  *  - '''Bucketing''' ([[StorageOps.writeBucketed]]): pre-hash rows into a
  *    fixed number of buckets on the join/aggregate key. Two tables
  *    co-bucketed on the same key with the same bucket count join with
  *    ZERO exchange on either side — at 100 TB the shuffle this deletes is
  *    the single largest cost of a repeated fact-fact join (a daily
  *    events ⋈ profile at petabyte scale pays the shuffle once at write,
  *    not once per query). Aggregations clustered by the bucket key also
  *    run exchange-free.
  *  - '''Hive-style partitioning''' ([[StorageOps.writePartitioned]]):
  *    low-cardinality filter columns become directories, so a predicate on
  *    them prunes whole partitions at PLANNING time — the scan never opens
  *    the files. The 100 TB discipline: partition by the coarse,
  *    always-filtered dimensions (date, language, source), bucket or sort
  *    by the fine ones; never partition by a high-cardinality key (one
  *    directory per value kills the driver's listing).
  *  - '''Interchange formats''' ([[StorageOps.writeCsv]] /
  *    [[StorageOps.writeJsonl]] and readers): ingest/egress parity with
  *    the text formats data actually arrives in. Readers take an EXPLICIT
  *    schema (inference is a full extra pass over 100 TB) and are
  *    configured so the round trip is lossless (RFC-4180 double-quote
  *    escaping; multiLine for embedded newlines). Scale note: a multiLine
  *    CSV file is not splittable — read parallelism is the file count, so
  *    shard the write (ShardShuffle's sizing discipline). JSONL splits by
  *    line and is the preferred text interchange at scale.
  */
object StorageOps {

  /** Write `df` as a parquet table bucketed (and optionally per-bucket
    * sorted) on `bucketCol`, one file per bucket.
    *
    * The pre-`repartition` is the layout guarantee: Spark's bucket
    * assignment IS hash-partitioning on the column (same Murmur3, same
    * modulo), so shuffling into `numBuckets` partitions on the bucket
    * column first means each task holds exactly one bucket and writes
    * exactly one file — bucketed scans stay one-split-per-bucket instead
    * of tasks × buckets fragments. This write-side shuffle is the cost
    * being amortized: every future join/agg on the key skips its exchange.
    *
    * `numBuckets` sizing at scale: buckets are the join parallelism, so
    * size them like shuffle partitions for the LARGEST table sharing the
    * key (1–4 GB of data per bucket; tens of thousands at 100 TB). All
    * tables co-joining on the key must agree on the count. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    require(numBuckets > 0, s"writeBucketed: numBuckets must be positive")
    val base: DataFrameWriter[Row] = df
      .repartition(numBuckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    // an explicit path makes the table EXTERNAL: catalog entry in the
    // session, data wherever the caller owns storage (the usual cluster
    // arrangement); without it the managed warehouse dir is used
    val w = path.fold(base)(p => base.option("path", p))
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Join two co-bucketed tables on their bucket keys. When both were
    * written by [[writeBucketed]] with the SAME bucket count, the physical
    * plan carries no Exchange on either side (pinned in PlanSpec) — the
    * join runs bucket-against-bucket where the data already sits. A
    * downstream aggregate clustered by the key inherits the same
    * distribution and also runs exchange-free. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }

  /** Hive-style partitioned parquet write: each distinct combination of
    * `partitionCols` values becomes a directory; the columns move out of
    * the files and into the paths. Filters on them prune at planning time
    * (`PartitionFilters` on the scan — pinned in PlanSpec). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: need partition columns")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Read a partitioned layout back; partition columns are restored from
    * the directory names. Apply partition-column filters DIRECTLY on this
    * frame (before any transformation that hides them) so they reach the
    * scan as PartitionFilters, not data filters. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Lossless CSV write. Every default that silently corrupts a round
    * trip is overridden:
    *  - `escape = "` — RFC-4180 double-quote escaping (Spark's default
    *    backslash dialect confuses external consumers);
    *  - `ignoreLeading/TrailingWhiteSpace = false` — the WRITE defaults
    *    are true, which TRIMS field whitespace on the way out;
    *  - `nullValue = \N` — CSV cannot otherwise distinguish NULL from
    *    the empty string (both serialize as nothing); the PostgreSQL
    *    convention keeps them distinct.
    * The sentinel is the format's one irreducible ambiguity: a FIELD
    * whose actual value is the two characters `\N` writes byte-identical
    * to a real NULL (quoting does not help — the reader unquotes before
    * the null comparison), so the round trip would corrupt it to NULL.
    * Rather than ship that silently, the write FAILS FAST when any
    * string cell equals the sentinel (one cheap scan, and losslessness
    * stays a checked contract, not a hope); such data belongs in
    * parquet/ORC/JSONL, or pre-escape it. */
  def writeCsv(df: DataFrame, path: String): Unit = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => col(f.name))
    if (stringCols.nonEmpty) {
      val clash = df.filter(stringCols.map(_ === "\\N").reduce(_ || _)).limit(1)
      require(clash.isEmpty,
        "writeCsv: a string cell equals the NULL sentinel \\N — a CSV " +
          "round trip would corrupt it to NULL; use parquet/ORC/JSONL " +
          "for this data or rewrite the value")
    }
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", "\\N")
      .csv(path)
  }

  /** CSV read with an explicit schema (schema inference is a full extra
    * pass over the data — never at scale). `multiLine` makes embedded
    * newlines round-trip; it also makes a file non-splittable, so read
    * parallelism = file count — shard the write accordingly. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "\\N")
      .csv(path)

  /** JSON-lines write — the splittable text interchange (one JSON object
    * per line; any line boundary is a valid split point). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines read with an explicit schema. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Point-lookup-optimized parquet write: bloom filters on the lookup
    * key columns. A feature-store table is read by key equality
    * ([[QueryFeatureStore]]'s scan side); min/max row-group stats are
    * useless for high-cardinality keys unless the data is sorted, but a
    * bloom filter skips row groups on ANY equality probe — the parquet
    * reader consults it before decoding pages, so a 100 TB feature table
    * answers a point lookup touching only the row groups that can
    * contain the key. Size `expectedNdv` to the per-row-group distinct
    * count (over-sizing wastes footer bytes, under-sizing inflates false
    * positives); sortWithinPartitions on the key additionally tightens
    * min/max stats so both skip mechanisms engage. */
  def writeForPointLookup(df: DataFrame, path: String,
      keyCols: Seq[String], expectedNdv: Long = 1000000L): Unit = {
    require(keyCols.nonEmpty, "writeForPointLookup: need key columns")
    val sorted = df.sortWithinPartitions(keyCols.map(col): _*)
    keyCols.foldLeft(sorted.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes` files. Long-lived ingest pipelines accrete small
    * files (one per micro-batch per partition); at 100 TB the cost is
    * real — file-open overhead per task, driver listing latency, and
    * scan parallelism pinned to the file count. Sizing reads the FILE
    * SYSTEM's byte totals (metadata, no data scan); the rewrite is one
    * round-robin repartition to `ceil(bytes/target)` — the only data
    * movement, which is the point of the operation.
    *
    * Hive-partitioned layouts (subdirectories named `col=value`) are
    * compacted PER PARTITION DIRECTORY, preserving the layout: a global
    * round-robin would pull every partition's rows into common files and
    * destroy planning-time pruning, and sizing must recurse into the
    * subdirectories or a partitioned input sums to 0 bytes and collapses
    * to one file (the round-8 defect). Leaf directories are enumerated
    * driver-side — partition dirs are metadata-scale by the partitioning
    * discipline above (coarse, low-cardinality columns only), so the
    * per-leaf loop is bounded; each leaf's bytes come from one recursive
    * `getContentSummary` call and its rewrite moves only that leaf's
    * data. Files land under the same relative `col=value/...` paths, so
    * readers see an identical hive layout with fewer files.
    *
    * Returns the output file count. Target ~128 MB-1 GB on-disk per file
    * (compressed size ≈ what the next scan's splits see). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 512L << 20): Int = {
    require(targetBytes > 0, "compact: targetBytes must be positive")
    val rawPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = rawPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify NOW: listStatus returns fully-qualified absolute leaves, so
    // the relative-path stripPrefix below would be a no-op against a
    // relative inPath and the output would nest under a mangled
    // out/<cwd>/<inPath>/col=value tree that breaks partition discovery
    val hadoopPath = fs.makeQualified(rawPath)
    def visible(p: org.apache.hadoop.fs.Path): Boolean =
      // skip _SUCCESS markers AND .crc checksum shadows — counting those
      // would inflate the sizing on local filesystems
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    // recursive byte total — correct whether the data sits flat in the
    // directory or nested under partition subdirectories
    def bytesUnder(p: org.apache.hadoop.fs.Path): Long = {
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (visible(f.getPath)) total += f.getLen
      }
      total
    }
    def filesFor(bytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // hive partition dirs = subdirectories named col=value; recurse to
    // the LEAF dirs (multi-level partitioning nests key=val/key2=val2)
    def leafDirs(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val parts = fs.listStatus(p)
        .filter(s => s.isDirectory && visible(s.getPath) &&
          s.getPath.getName.contains("="))
      if (parts.isEmpty) Seq(p) else parts.toSeq.flatMap(s => leafDirs(s.getPath))
    }
    val leaves = leafDirs(hadoopPath)
    if (leaves == Seq(hadoopPath)) {
      val n = filesFor(bytesUnder(hadoopPath))
      spark.read.parquet(inPath).repartition(n)
        .write.mode("overwrite").parquet(outPath)
      n
    } else {
      // fail FAST on a mixed layout (data files at the root alongside
      // col=value dirs): the per-leaf loop would silently drop the
      // root-level files from the compacted output — a malformed hive
      // tree must be repaired, not half-copied
      val rootFiles = fs.listStatus(hadoopPath)
        .filter(s => s.isFile && visible(s.getPath)).map(_.getPath.getName)
      require(rootFiles.isEmpty,
        s"compact: mixed layout under $inPath — data files " +
        s"[${rootFiles.mkString(", ")}] sit at the root alongside " +
        "partition directories; compacting would drop them")
      leaves.map { leaf =>
        // same relative col=value/... path on the output side — the
        // compacted layout prunes exactly like the input did
        val rel = leaf.toUri.getPath.stripPrefix(hadoopPath.toUri.getPath)
          .stripPrefix("/")
        val n = filesFor(bytesUnder(leaf))
        spark.read.parquet(leaf.toString).repartition(n)
          .write.mode("overwrite").parquet(s"$outPath/$rel")
        n
      }.sum
    }
  }

  /** The z-value of pre-scaled key columns: bit j of column c lands at
    * position `j·n + (n−1−c)` — the standard Morton interleave, so
    * sorting by the result clusters rows that are close in EVERY key
    * dimension. Pure integer bit arithmetic (shift/and/or — codegen'd,
    * engine-portable, oracle-replayable); inputs must already be scaled
    * to `[0, 2^bits)` longs. `bits·n` must stay ≤ 62. */
  def zValueExpr(scaled: Seq[Column], bits: Int): Column = {
    require(scaled.nonEmpty && bits >= 1 && bits * scaled.size <= 62,
      "zValueExpr: need 1+ columns and bits*cols <= 62")
    val n = scaled.size
    val terms = for { j <- 0 until bits; c <- 0 until n } yield
      shiftleft(shiftrightunsigned(scaled(c), j).bitwiseAND(lit(1L)),
        j * n + (n - 1 - c))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Exact integer min-max scaling of a LONG column into `[0, 2^bits)`:
    * `((v − min) · (2^bits − 1)) DIV (max − min)` — the multiply runs in
    * DECIMAL(38,0), because 64-bit longs wrap once the column span
    * exceeds 2^63/(2^bits−1) (~1.4e14 at bits = 16 — microsecond epochs
    * spanning a few years already cross it), which would silently
    * destroy the clustering; a double rescale instead loses exactness
    * past 2^53 and would not replay cross-engine. Decimal keeps the
    * arithmetic exact over the full long range and DIVs back to a
    * sub-2^bits BIGINT. Constant columns scale to 0. Caller provides
    * min/max (one metadata-scale agg job). */
  def zScaleSql(colName: String, min: Long, max: Long, bits: Int): String = {
    val mask = (1L << bits) - 1
    if (max <= min) "CAST(0 AS BIGINT)"
    else s"CAST(((CAST($colName AS DECIMAL(38,0)) - ($min)) * $mask) " +
      s"DIV (CAST($max AS DECIMAL(38,0)) - ($min)) AS BIGINT)"
  }

  /** Z-order clustered parquet write — the MULTI-column data-skipping
    * layout (Morton-curve clustering; the public lakehouse technique
    * behind Delta/Iceberg OPTIMIZE ZORDER BY). A single-column sort makes
    * row-group min/max stats selective on ONE column and useless on the
    * rest; sorting by the interleaved z-value keeps every z-ordered file
    * and row group confined to a small hyper-rectangle of the key space,
    * so equality/range predicates on ANY of the z columns skip most row
    * groups at scan time (min/max zone maps — no index structure, just
    * layout). The 100 TB math: k always-filtered dimensions too
    * high-cardinality to partition by (user id × timestamp, source ×
    * score) get multiplicative skipping from ONE clustered rewrite.
    *
    * Scaling bounds come from one agg job (metadata scale); the rewrite
    * is a range partition + in-partition sort on the z-value — the same
    * shuffle a plain sorted write pays, so z-ordering is free relative
    * to single-column clustering. `zcolName` keeps the z-value in the
    * files (WritePartitionSpec reads it back for layout audits); pass
    * null-free LONG columns. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 16, numFiles: Int = 8,
      zcolName: String = "__zval"): Unit = {
    require(zCols.size >= 2, "writeZOrdered: z-ordering needs 2+ columns")
    val aggs = zCols.flatMap(c => Seq(min(col(c).cast("long")),
      max(col(c).cast("long"))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input (or an all-null column) has no bounds: write the empty
    // frame as-is instead of NPE-ing on the null aggregate below
    if (bounds.isNullAt(0)) {
      df.withColumn(zcolName, lit(0L))
        .write.mode("overwrite").parquet(path)
      return
    }
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      expr(zScaleSql(c, bounds.getLong(2 * i), bounds.getLong(2 * i + 1), bits))
    }
    df.withColumn(zcolName, zValueExpr(scaled, bits))
      .repartitionByRange(numFiles, col(zcolName))
      .sortWithinPartitions(zcolName)
      .write.mode("overwrite").parquet(path)
  }

  /** ORC write/read — the second columnar interchange Spark carries
    * natively (Hive-ecosystem egress). Same scan machinery as parquet:
    * predicate pushdown, column pruning, splittable stripes. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
