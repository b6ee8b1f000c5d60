package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.StorageOps

/** Driver-checked queries for the physical-layout operators
  * ([[graft.ops.StorageOps]]): bucketed co-located joins, hive-style
  * partition pruning, and lossless CSV/JSONL interchange. Each query
  * performs the WRITE it depends on (idempotent overwrite into a per-dir
  * scratch area), so the timed cost honestly includes the sink — the
  * write-once shuffle is exactly what bucketing amortizes.
  *
  * All layouts are content-equal to the source parquet, so every query
  * oracles against plain SQL over the original tables — the round trip
  * through the layout IS the thing under test. */
object StorageQueries {

  /** Per-data-dir scratch root for derived layouts (temp, deleted on JVM
    * exit — the artifact-dir pattern of Flagship.prewarmAlsFactors: on a
    * real cluster this would be a shared-storage URI). */
  private val scratchCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def scratch(d: String): String =
    scratchCache.getOrElseUpdate(d, {
      val t = java.nio.file.Files.createTempDirectory("graft_layout_")
      sys.addShutdownHook {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        if (Files.exists(t))
          Files.walk(t).iterator().asScala.toSeq.reverseIterator
            .foreach((p: Path) => Files.deleteIfExists(p))
      }
      t.toString
    })

  /** Catalog-safe table-name tag per data dir (two dirs in one JVM must
    * not collide on managed bucketed tables). */
  private def tag(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Co-located fact-fact join: orders and lineitem are bucketed on the
    * order key with the same bucket count, then joined and aggregated —
    * the plan carries NO exchange for the join OR the aggregate (both are
    * satisfied by the bucket distribution; pinned in PlanSpec). At 100 TB
    * this is the repeated-join shape bucketing exists for: the write-side
    * shuffle happens once, every subsequent query on the key is
    * shuffle-free. */
  def bucketedJoin(spark: SparkSession, d: String): DataFrame = {
    val t = tag(d)
    StorageOps.writeBucketed(orders(spark, d), s"graft_ord_$t", "o_orderkey", 16,
      path = Some(s"${scratch(d)}/bkt_orders"))
    StorageOps.writeBucketed(lineitem(spark, d), s"graft_li_$t", "l_orderkey", 16,
      path = Some(s"${scratch(d)}/bkt_lineitem"))
    StorageOps.coLocatedJoin(spark, s"graft_ord_$t", "o_orderkey",
        s"graft_li_$t", "l_orderkey")
      .groupBy("o_orderkey", "o_custkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
      .orderBy("o_orderkey")
  }

  /** Partition-pruned scan: documents written hive-partitioned by
    * language, then filtered on the partition column — the predicate
    * prunes directories at planning time (`PartitionFilters` on the scan,
    * pinned in PlanSpec); the non-matching partitions' files are never
    * opened. */
  def partitionPrune(spark: SparkSession, d: String): DataFrame = {
    val path = s"${scratch(d)}/docs_by_lang"
    StorageOps.writePartitioned(documents(spark, d), path, Seq("lang"))
    StorageOps.readPartitioned(spark, path)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** Lossless CSV round trip: documents → RFC-4180 CSV → read back with
    * the explicit schema → content digests. The md5-over-text output makes
    * any quoting/encoding corruption a hash mismatch, so the oracle (plain
    * SQL over the ORIGINAL parquet) certifies byte-exact text fidelity
    * through the interchange format. */
  def csvRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val path = s"${scratch(d)}/docs_csv"
    val docs = documents(spark, d)
    StorageOps.writeCsv(docs, path)
    StorageOps.readCsv(spark, path, docs.schema)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Lossless JSONL round trip — the splittable text interchange twin. */
  def jsonlRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val path = s"${scratch(d)}/docs_jsonl"
    val docs = documents(spark, d)
    StorageOps.writeJsonl(docs, path)
    StorageOps.readJsonl(spark, path, docs.schema)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Small-file compaction: fragment documents into a worst-case layout
    * (one row group per tiny file), compact back toward a byte target,
    * and prove content fidelity through the rewrite with the md5-pinned
    * roundtrip oracle. The spec additionally pins the file counts. */
  def compactFiles(spark: SparkSession, d: String): DataFrame = {
    val frag = s"${scratch(d)}/docs_frag"
    val out = s"${scratch(d)}/docs_compact"
    val docs = documents(spark, d)
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    StorageOps.compact(spark, frag, out, targetBytes = 64L << 20)
    spark.read.parquet(out)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Schema evolution across ingest batches: batch 1 writes the original
    * document schema, batch 2 adds a `quality` column; a `mergeSchema`
    * read reconciles both under one schema (nulls where the old batch
    * has no column) and the hive `batch=` directory key tells them
    * apart. This is the additive-evolution discipline a long-lived
    * 100 TB corpus needs — old data is never rewritten; readers coalesce
    * defaults. (mergeSchema costs a footer read per file at planning:
    * fine per-batch, not as a default on a million-file corpus — pin the
    * merged schema explicitly once known.) */
  def schemaEvolution(spark: SparkSession, d: String): DataFrame = {
    val path = s"${scratch(d)}/docs_evolving"
    val docs = documents(spark, d)
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$path/batch=1")
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("quality", (col("n_chars") % 100).cast("int"))
      .write.mode("overwrite").parquet(s"$path/batch=2")
    spark.read.option("mergeSchema", "true").parquet(path)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        coalesce(col("quality"), lit(-1)).as("quality"),
        col("batch").cast("int").as("batch"))
      .orderBy("doc_id")
  }

  /** Z-order clustered layout ([[StorageOps.writeZOrdered]]): orders
    * clustered on (custkey, price-cents) — two always-filtered,
    * too-high-cardinality-to-partition dimensions — then read back with
    * the layout key. The z-value is exact integer bit math over
    * SQL-recomputable min/max bounds, so the whole clustering key
    * hash-checks; StorageOpsSpec proves the multi-column row-group
    * skipping the layout exists for. */
  def zorderLayout(spark: SparkSession, d: String): DataFrame = {
    val path = s"${scratch(d)}/orders_zorder"
    val o = orders(spark, d).select(col("o_orderkey"),
      col("o_custkey").cast("long").as("ck"),
      round(col("o_totalprice") * 100).cast("long").as("pc"))
    StorageOps.writeZOrdered(o, path, Seq("ck", "pc"), bits = 16,
      numFiles = 8)
    spark.read.parquet(path)
      .select(col("o_orderkey"), col("ck"), col("pc"),
        col("__zval").as("zval"))
      .orderBy("o_orderkey")
  }

  /** Atomic versioned republication ([[graft.core.VersionedDir]]): v0
    * publishes a half-corpus, a reader pins that snapshot by resolving
    * `_LATEST`, v1 republishes the full corpus (with retention covering
    * the in-flight read) — the pinned reader still sees exactly v0's
    * rows while the live reader sees v1's. The union of both reads
    * hash-checks against plain SQL over the source table: the oracle
    * certifies that neither snapshot leaked the other's rows, which is
    * the whole point of the pointer-swap commit protocol at 100 TB
    * (recompute swaps in atomically under live readers). */
  def publishVersions(spark: SparkSession, d: String): DataFrame = {
    import graft.core.VersionedDir
    val path = s"${scratch(d)}/docs_published"
    // re-runnable: each invocation restarts the version history
    val (fs, p) = VersionedDir.fsOf(spark, path)
    fs.delete(p, true)
    val docs = documents(spark, d)
    VersionedDir.publish(docs.filter(col("doc_id") % 2 === 0), path)
    val pinned = VersionedDir.readLatest(spark, path).get // resolves v0 NOW
    // keep = 2 covers the pinned in-flight read across the swap
    VersionedDir.publish(docs, path, retainVersions = Some(2))
    val live = VersionedDir.readLatest(spark, path).get // resolves v1
    pinned.withColumn("version", lit("v0"))
      .unionByName(live.withColumn("version", lit("v1")))
      .select(col("version"), col("doc_id"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("version", "doc_id")
  }

  /** ORC round trip — the Hive-ecosystem columnar egress twin. */
  def orcRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val path = s"${scratch(d)}/docs_orc"
    val docs = documents(spark, d)
    StorageOps.writeOrc(docs, path)
    StorageOps.readOrc(spark, path, docs.schema)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_bucketed_join" -> (bucketedJoin _),
    "op_partition_prune" -> (partitionPrune _),
    "op_csv_roundtrip" -> (csvRoundtrip _),
    "op_jsonl_roundtrip" -> (jsonlRoundtrip _),
    "op_orc_roundtrip" -> (orcRoundtrip _),
    "op_compact_files" -> (compactFiles _),
    "op_schema_evolution" -> (schemaEvolution _),
    "op_zorder_layout" -> (zorderLayout _),
    "op_publish_versions" -> (publishVersions _))

  private val roundtripSql =
    """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "op_bucketed_join" ->
      """SELECT o_orderkey, o_custkey, count(*) AS n_items,
        |sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1,2 ORDER BY o_orderkey""".stripMargin,
    "op_partition_prune" ->
      """SELECT source, count(*) AS n_docs,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY source""".stripMargin,
    "op_csv_roundtrip" -> roundtripSql,
    "op_publish_versions" ->
      """SELECT 'v0' AS version, doc_id, md5(text) AS text_md5
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT 'v1' AS version, doc_id, md5(text) AS text_md5
        |FROM documents
        |ORDER BY version, doc_id""".stripMargin,
    "op_jsonl_roundtrip" -> roundtripSql,
    "op_orc_roundtrip" -> roundtripSql,
    "op_compact_files" -> roundtripSql,
    "op_schema_evolution" ->
      """SELECT doc_id, lang, n_chars,
        |CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars % 100 AS INTEGER)
        |  ELSE -1 END AS quality,
        |CAST(CASE WHEN doc_id % 2 = 1 THEN 2 ELSE 1 END AS INTEGER) AS batch
        |FROM documents ORDER BY doc_id""".stripMargin,
    "op_zorder_layout" -> {
      // the exact Morton interleave of StorageOps.zValueExpr (bits = 16,
      // 2 columns: ck bits land at 2j+1, pc bits at 2j), over the same
      // integer min-max scaling — pure bit arithmetic, no fit state
      // single line: a "\n |"-joined form would have its | operators
      // eaten by the template's stripMargin
      val zterms = (0 until 16).map(j =>
        s"(((sa >> $j) & 1) << ${2 * j + 1}) | (((sb >> $j) & 1) << ${2 * j})")
        .mkString(" | ")
      s"""WITH t AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders),
         |b AS (SELECT min(ck) AS minck, max(ck) AS maxck,
         |    min(pc) AS minpc, max(pc) AS maxpc FROM t),
         |s AS (SELECT o_orderkey, ck, pc,
         |    CASE WHEN maxck <= minck THEN 0
         |      ELSE ((ck - minck) * 65535) // (maxck - minck) END AS sa,
         |    CASE WHEN maxpc <= minpc THEN 0
         |      ELSE ((pc - minpc) * 65535) // (maxpc - minpc) END AS sb
         |  FROM t CROSS JOIN b)
         |SELECT o_orderkey, ck, pc,
         |  CAST($zterms AS BIGINT) AS zval
         |FROM s ORDER BY o_orderkey""".stripMargin
    })
}
