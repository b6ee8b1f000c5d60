package graft

import graft.SparkSpec

/** Physical-plan assertions: the shapes that must hold at 100 TB.
  * A wrong plan can still pass value checks at sf0.01 — these tests pin
  * the broadcast/pushdown/partial-agg decisions explicitly. */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts every dimension (no sort-merge join)") {
    val p = plan(queries.Relational.q2_join_agg(spark, d))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not shuffle")
  }

  test("filter query pushes predicates and prunes columns at the scan") {
    val p = plan(queries.Relational.q5_filter(spark, d))
    assert(p.contains("PushedFilters:") &&
      (p.contains("GreaterThanOrEqual(l_quantity") || p.contains("LessThan(l_shipdate")),
      "predicates must reach the parquet scan")
    assert(!p.contains("l_extendedprice"),
      "unused columns must not be read (column pruning)")
  }

  test("feature lookup is a broadcast join on the request side") {
    val p = plan(queries.OpQueries.featureLookup(spark, d))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val p = plan(queries.Relational.q1_agg(spark, d))
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "expect two-phase hash aggregation")
    assert(p.contains("Exchange hashpartitioning"),
      "single shuffle on the group keys")
  }

  test("top-k retrieval aggregates with partial top-k, not a global sort") {
    val emb = Tables.embeddings(spark, d)
    val queriesDf = emb.filter(org.apache.spark.sql.functions.col("label") === 0)
      .select("vec_id", "embedding")
    val items = emb.filter(org.apache.spark.sql.functions.col("label") =!= 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("item_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val p = plan(ops.TopKRetrieval(items, "vec_id", "embedding", k = 10)
      .transform(queriesDf))
    assert(p.contains("ObjectHashAggregate") || p.contains("partial_topkaggregator"),
      s"bounded-heap aggregate expected in plan:\n${p.take(800)}")
    assert(!p.contains("GlobalSort") && !p.contains("Sort ["),
      "no global sort for top-k")
  }

  test("incremental dedup shuffles digests only — no cartesian, no window") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
    val prior = ops.ExactDedup(normalized = true)
      .transform(docs.filter(col("doc_id") % 2 === 0)).select("content_hash")
    val p = plan(ops.IncrementalDedup(prior)
      .transform(docs.filter(col("doc_id") % 2 === 1)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "labeling is digest equi-joins only")
    assert(!p.contains("Window"), "keeper rule is an aggregate, not a window")
  }

  test("fuzzy incremental dedup joins band keys, never all-pairs; text never shuffles") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
    val idx = ops.IncrementalMinHashDedup.signatures(docs.filter(col("doc_id") % 2 === 0))
    val p = plan(ops.IncrementalMinHashDedup(idx)
      .transform(docs.filter(col("doc_id") % 2 === 1)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates come from (band_idx, band_hash) equi-joins")
    // candidate generation partitions on ids/bands/digests only — the
    // text column must never be a shuffle KEY (it rides exactly one
    // id-keyed join back onto the batch)
    val keyLines = p.split("Exchange hashpartitioning").drop(1)
      .map(_.takeWhile(_ != '\n'))
    assert(keyLines.nonEmpty && !keyLines.exists(_.contains("text")),
      s"no exchange may key on the text column: ${keyLines.mkString(" | ")}")
  }

  test("BM25 probes the postings with a broadcast term join — no all-pairs, no global sort") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
    val idx = ops.Bm25Index.fit(docs, "doc_id", "text")
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val p = plan(idx.transform(qs))
    assert(p.contains("BroadcastHashJoin"),
      "weighted query terms must broadcast onto the postings probe")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the probe is a __term equi-join — candidate rows ∝ matched postings")
    assert(p.contains("partial_topkaggregator") || p.contains("ObjectHashAggregate"),
      "per-query top-k uses the bounded heap")
    assert(!p.contains("GlobalSort"), "no global sort in BM25 top-k")
  }

  test("IVF-PQ probe joins on the list id and aggregates bounded heaps — no all-pairs, no global sort") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, d)
    val queriesDf = emb.filter(col("label") === 0).select("vec_id", "embedding")
    val items = emb.filter(col("label") =!= 0)
      .select(col("vec_id").as("item_id"), col("embedding"))
    val centers = functions.VectorFunctions.fitCenters(items, "embedding", 4, 2, 42L)
    val cbs = ops.AnnIvfPq.fitCodebooks(items, "embedding", centers, 8, 4, 2, 42L)
    val pq = ops.AnnIvfPq(items, centers, cbs, "vec_id", "embedding",
      k = 5, nprobe = 2, refine = 10)
    val p = plan(pq.transform(queriesDf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "probe must be a cid equi-join, never all-pairs")
    assert(!p.contains("GlobalSort"), "no global sort in PQ top-k")
    assert(p.contains("partial_topkaggregator") || p.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate expected in plan:\n${p.take(800)}")
  }

  test("SQ8 probe joins coded lists on the list id — no all-pairs, no global sort, no float shuffle") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, d)
    val queriesDf = emb.filter(col("label") === 0).select("vec_id", "embedding")
    val items = emb.filter(col("label") =!= 0)
      .select(col("vec_id").as("item_id"), col("embedding"))
    val centers = functions.VectorFunctions.fitCenters(items, "embedding", 4, 2, 42L)
    val (mins, maxs) = ops.AnnSq.fitRange(items, "embedding")
    val sq = ops.AnnSq(items, centers, mins, maxs, "vec_id", "embedding",
      k = 5, nprobe = 2)
    val p = plan(sq.transform(queriesDf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "probe must be a cid equi-join, never all-pairs")
    assert(!p.contains("GlobalSort"), "no global sort in SQ top-k")
    assert(p.contains("partial_topkaggregator") || p.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate expected in plan:\n${p.take(800)}")
  }

  test("SelectByTag prunes untagged columns all the way to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("tags_prune").toString
    import spark.implicits._
    val df = Seq((1L, "a", 2.0, "junk")).toDF("id", "cat", "cont", "extra")
    core.Tags.tag(df, "cat" -> Seq(core.Tags.Categorical),
      "cont" -> Seq(core.Tags.Continuous))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val p = plan(ops.SelectByTag(Seq(core.Tags.Categorical, core.Tags.Continuous))
      .transform(spark.read.parquet(s"$dir/t.parquet")))
    assert(p.contains("ReadSchema: struct<cat:string,cont:double>"),
      s"scan must read only tagged columns:\n${p.take(600)}")
    assert(!p.contains("extra"), "untagged columns must not be scanned")
  }

  test("SignalReconcile's carried path scans only the identity columns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sigrec_plan").toString
    Seq((1L, "some body text here"), (2L, "another body of text"))
      .toDF("doc_id", "text")
      .withColumn("content_hash", md5(col("text")))
      .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val sig = ops.QualitySignals(keyCols = Seq("doc_id", "content_hash"))
    val prior = sig.transform(corpus)
    val p = plan(ops.SignalReconcile(prior, sig).transform(corpus))
    // the semi-join (carried) side must read (doc_id, content_hash) only
    // — at 100 TB the carried path must never pay for document text
    assert(p.contains("ReadSchema: struct<doc_id:bigint,content_hash:string>"),
      s"carried-side corpus scan must prune to the identity columns:\n${p.take(1200)}")
  }

  test("hash split is a shuffle-free per-row projection") {
    val p = plan(ops.HashSplit("doc_id").transform(Tables.documents(spark, d)))
    assert(!p.contains("Exchange"), s"no shuffle expected:\n${p.take(600)}")
  }

  test("dynamic partition pruning: a dim-side filter prunes the partitioned fact scan at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    (1 to 10000).map(i => (i.toLong, i % 20)).toDF("id", "k")
      .write.mode("overwrite").partitionBy("k").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a SOURCE-backed relation: a local relation's filter
    // is constant-folded away by ConvertToLocalRelation, and DPP only
    // fires on a surviving selective Filter over the build side
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    (0 until 20).map(i => (i, if (i < 2) "hot" else "cold"))
      .toDF("dk", "temp").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(broadcast(dim).filter($"temp" === "hot"), $"k" === $"dk")
    val p = plan(joined)
    // Catalyst's DPP turns the dim filter into a runtime partition filter
    // on the fact scan — with our hive-partitioned layouts this is what
    // keeps a dim-filtered 100 TB fact join from scanning every partition
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"the hot-partition filter must reach the fact scan as a runtime " +
        s"partition filter:\n${p.take(1200)}")
  }

  test("cluster assignment is a shuffle-free per-row expression over literal centroids") {
    val centers = Seq(Seq(0.1, 0.2), Seq(0.3, 0.4))
    val emb = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "slice(embedding, 1, 2) AS embedding")
    val p = plan(ops.ClusterAssign(centers).transform(emb))
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n${p.take(600)}")
  }

  test("quality-classifier scoring is a shuffle-free per-row expression over literal coefficients") {
    val op = ops.TextQualityClassifier(
      (1 to 64).map(_.toDouble), 0.0)
    val p = plan(op.transform(Tables.documents(spark, d)))
    assert(!p.contains("Exchange"), s"scoring must not shuffle:\n${p.take(600)}")
  }

  test("negative sampling broadcasts the catalog index; no cartesian blowup") {
    val p = plan(queries.OpQueries.negativeSampling(spark, d))
    // the dense catalog index and the 1-row count frame must broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("CartesianProduct"),
      "candidate mapping must be an equi-join on the drawn index")
    // rank/dedup windows repartition on the pair key only — the lag-based
    // run dedup must NOT introduce a second, wider exchange on the
    // candidate column
    assert(p.contains("hashpartitioning(user_id"),
      "windows must partition on the (user, item) pair key")
    // the anti join legitimately shuffles on (user, candidate); the windows
    // must NOT add a third, wider (user, item, candidate) exchange — the
    // lag-based run dedup reuses the (user, item) one
    assert("hashpartitioning\\([^)]*item_id[^)]*__cand".r.findFirstIn(p).isEmpty,
      "dedup must reuse the pair-key window exchange, never partition by candidate")
  }

  test("salted join broadcasts the replicated dim; the fact side never re-shuffles") {
    val p = plan(queries.OpQueries.saltedJoin(spark, d))
    // the salted dim is saltBuckets x the SMALL side — it must stay the
    // broadcast build side, never flip the join to a sort-merge that
    // shuffles the fact table on (key, salt)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "salting must not demote the dim join to a fact-side shuffle")
    // the only exchange is the deterministic output orderBy's range
    // partitioning — no hashpartitioning of the fact side anywhere
    assert(!p.contains("hashpartitioning"),
      s"no hash exchange expected in a broadcast salted join:\n${p.take(800)}")
  }

  test("minhash candidate join shuffles only light band rows") {
    val docs = Tables.documents(spark, d)
    val p = plan(ops.MinHashDedup().pairPlan(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on band keys")
  }

  test("categorify and exact-dedup never shuffle wide keys or use a global window") {
    val cust = Tables.customer(spark, d)
    val p = plan(ops.Categorify(Seq("c_mktsegment")).transform(cust))
    assert(!p.contains("Window"), "dictionary ranking must not use a global window")
    assert(!p.contains("SinglePartition"),
      s"no single-partition exchange anywhere in categorify:\n${p.take(800)}")
    val docs = Tables.documents(spark, d)
    val pd = plan(ops.ExactDedup().transform(docs))
    assert(pd.contains("md5") && !pd.matches("(?s).*hashpartitioning\\(text.*"),
      "shuffle key must be the digest, not the document text")
  }

  test("cosine near-dup default path is bucketed, never an all-pairs join") {
    val emb = Tables.embeddings(spark, d)
    val p = plan(ops.CosineNearDup().pairPlan(emb))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"default must bucket, not scan n²/2 pairs:\n${p.take(800)}")
    // the exact reference path IS the nested loop — by explicit request only
    val pe = plan(ops.CosineNearDup(exact = true).pairPlan(emb))
    assert(pe.contains("BroadcastNestedLoopJoin") || pe.contains("CartesianProduct"))
  }

  test("repetition stats is a shuffle-free per-row map") {
    val p = plan(ops.RepetitionStats().transform(Tables.documents(spark, d)))
    assert(!p.contains("Exchange"), s"row-local signals must not shuffle:\n${p.take(600)}")
    assert(p.contains("repetition_signals"), "must use the one-pass expression")
  }

  test("embedding normalize is shuffle-free; mean-pool partial-aggregates") {
    val emb = Tables.embeddings(spark, d)
    val pn = plan(ops.NormalizeEmbeddings().transform(emb))
    assert(!pn.contains("Exchange"), s"normalize must not shuffle:\n${pn.take(600)}")
    val pp = plan(ops.MeanPoolEmbeddings().transform(emb))
    assert(pp.contains("partial_"), "pool must map-side combine before its shuffle")
    assert(pp.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      "exactly one shuffle: the (key, dim) aggregation")
  }

  test("portable forest scoring is a shuffle-free whole-stage-codegen'd projection") {
    val p = plan(graft.queries.MlQueries.mlForestPortable(spark, d))
    // the forest is plan-side CASE expressions: scoring itself moves no
    // data (the single exchange is the query's final presentation sort)
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"scoring must not shuffle:\n${p.take(600)}")
    // the forest lives in a single Project directly over the scan, and
    // the scan reads exactly the key + feature columns
    assert(p.contains("Project") && p.contains("FileScan parquet"))
    assert(!p.contains("l_shipdate"), "unused columns must not be read")
  }

  test("decontamination joins gram digests, never text, and never nested-loops") {
    val docs = Tables.documents(spark, d)
    val p = plan(ops.Decontaminate(docs.limit(50), n = 5).transform(docs))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"gram match must be an equi-join:\n${p.take(600)}")
    assert(p.contains("LeftSemi"), "contamination test is a semi-join")
  }

  test("lm score joins gram digests (no nested loop), aggregates partially, no global sort") {
    val docs = Tables.documents(spark, d)
    val p = plan(ops.NgramLmScore(docs, n = 2).transform(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"frequency lookup must be an equi-join:\n${p.take(600)}")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "frequency fit and scoring must map-side combine")
    assert(!p.contains("Sort [doc_id"), "no global sort in scoring")
  }

  test("shard shuffle is one hash exchange + per-shard sort, never a global sort") {
    val docs = Tables.documents(spark, d).select("doc_id", "source")
    val p = plan(ops.ShardShuffle("doc_id", shards = 8).transform(docs))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"exactly one shard-key shuffle expected:\n${p.take(800)}")
    assert(!p.contains("Exchange rangepartitioning"),
      "position must sort within shards, never range-partition globally")
  }

  test("sequence packing shuffles chunk metadata only, never the text") {
    val chunks = ops.DocumentChunks().transform(Tables.documents(spark, d))
    val p = plan(ops.PackChunks(budget = 128, shards = 8).transform(chunks))
    assert(!p.contains("chunk_text"),
      s"the fold must not carry chunk text through its shuffle:\n${p.take(800)}")
  }

  test("shared-gram scrub joins digests, never nested-loops, text crosses one join") {
    val docs = Tables.documents(spark, d)
    val p = plan(ops.ScrubSharedGrams(n = 8, minDocs = 2).transform(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"inventory and starts must be equi-joins:\n${p.take(600)}")
    assert(p.contains("LeftSemi"), "shared-gram membership is a semi-join")
  }

  test("upsample mix is a shuffle-free per-row explode") {
    val p = plan(ops.UpsampleMix("doc_id", "lang", Map("en" -> 25000))
      .transform(Tables.documents(spark, d)))
    assert(!p.contains("Exchange"), s"no shuffle expected:\n${p.take(600)}")
    assert(p.contains("Generate explode"), "mixing materializes via explode")
  }

  test("target encoding broadcasts dictionary stats; the fact table shuffles only for the fit agg") {
    val li = Tables.lineitem(spark, d).select(
      org.apache.spark.sql.functions.col("l_orderkey"),
      org.apache.spark.sql.functions.col("l_returnflag"),
      org.apache.spark.sql.functions.col("l_quantity").cast("long").as("qty"))
    val p = plan(ops.TargetEncoding(Seq("l_returnflag"), "qty").transform(li))
    assert(p.contains("BroadcastHashJoin"),
      s"dictionary-scale stats must broadcast back:\n${p.take(600)}")
    assert(!p.contains("SortMergeJoin"), "never a sort-merge of the fact table")
    // above-budget: the hinted shuffle-hash join replaces the broadcast
    val pg = plan(ops.TargetEncoding(Seq("l_returnflag"), "qty",
      broadcastBudgetBytes = 1L).transform(li))
    assert(!pg.contains("BroadcastHashJoin") && pg.contains("ShuffledHashJoin"),
      s"gated path must shuffle-hash join, not broadcast:\n${pg.take(600)}")
  }

  test("hash bucket and clip/log are shuffle-free per-row projections") {
    val pt = Tables.part(spark, d).select(
      org.apache.spark.sql.functions.col("p_partkey"),
      org.apache.spark.sql.functions.col("p_brand"),
      org.apache.spark.sql.functions.col("p_size"))
    val p = plan(ops.HashBucket(Seq("p_brand"), 50).transform(pt))
    assert(!p.contains("Exchange"), s"hashing trick must not shuffle:\n${p.take(400)}")
    val p2 = plan(ops.LogTransform(Seq("p_size")).transform(
      ops.Clip(Map("p_size" -> (Some(1.0), Some(40.0)))).transform(pt)))
    assert(!p2.contains("Exchange"), s"row-local transforms must not shuffle:\n${p2.take(400)}")
  }

  test("rrf fusion shuffles only the bounded candidate lists on the query key") {
    import org.apache.spark.sql.functions._
    val a = Tables.documents(spark, d).filter(col("doc_id") < 40)
      .select(col("doc_id").as("query_id"), col("n_chars").as("doc_id2"))
      .withColumn("doc_id", col("doc_id2")).drop("doc_id2")
      .withColumn("rank", lit(1))
    val b = a.withColumn("rank", lit(2))
    val p = plan(ops.ReciprocalRankFusion(b).transform(a))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fusion is an equi-join:\n${p.take(600)}")
  }

  test("top-fraction approx mode has no sort and broadcasts its thresholds") {
    val docs = Tables.documents(spark, d)
    val p = plan(ops.TopFractionByGroup("lang", "n_chars", "doc_id",
      Map("en" -> 4000), defaultBp = 7000, approx = true).transform(docs))
    assert(!p.toLowerCase.contains("sort "),
      s"the 100 TB path must never sort:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"), "thresholds join must broadcast")
    // exact mode pays exactly one stratum shuffle (window sort), no more
    val pe = plan(ops.TopFractionByGroup("lang", "n_chars", "doc_id",
      Map("en" -> 4000), defaultBp = 7000).transform(docs))
    assert("Exchange hashpartitioning".r.findAllIn(pe).length == 1,
      s"one shuffle on the stratum key:\n${pe.take(800)}")
  }

  test("semantic decontamination: exact scan is one broadcast NL over MB-scale eval + partial agg") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, d)
    val op = ops.SemanticDecontaminate(emb.filter(col("vec_id") % 10 === 0),
      threshold = 0.40)
    val p = plan(op.transform(emb.filter(col("vec_id") % 10 =!= 0)))
    // the cross join is the DECLARED scan of the broadcast eval side —
    // it must be the broadcast flavor, never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"eval side must broadcast:\n${p.take(600)}")
    assert(p.contains("HashAggregate") && p.contains("partial_max"),
      s"per-id aggregate must partial-combine before the exchange:\n${p.take(600)}")
    // the probed path replaces the scan with a centroid equi-join
    val probed = ops.SemanticDecontaminate(emb.filter(col("vec_id") % 10 === 0),
      threshold = 0.40, centers = Seq(Seq.fill(64)(0.1), Seq.fill(64)(-0.1)),
      nprobe = 1)
    val pp = plan(probed.transform(emb.filter(col("vec_id") % 10 =!= 0)))
    assert(!pp.contains("BroadcastNestedLoopJoin") && !pp.contains("CartesianProduct"),
      s"probed path is an equi-join on the centroid id:\n${pp.take(600)}")
  }

  test("prefix dedup is one partial aggregate on the digest — no window, no text shuffle") {
    val p = plan(ops.PrefixDedup(n = 8).transform(Tables.documents(spark, d)))
    assert(!p.contains("Window"), "keeper election rides the aggregate, not a window")
    // the struct-min keeper buffer forces SortAggregate (per-partition
    // local sort, no extra exchange) — what matters at scale is that it
    // still PARTIAL-aggregates before the one digest-keyed shuffle
    assert(p.contains("partial_min"),
      s"keeper election must map-side combine:\n${p.take(800)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"one exchange on the prefix digest:\n${p.take(800)}")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"),
      s"no exchange may carry the text column:\n$exchanges")
  }

  test("purge index retirement digests the corpus once — single md5 pass, one digest exchange") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = Tables.documents(spark, d)
    val index = docs.select(md5(col("text")).as("content_hash")).distinct()
      .localCheckpoint(true) // freeze: the INDEX side's md5 must not count
    val tomb = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
    val p = plan(ops.Purge(tomb, normalized = false).updatedIndex(index, docs))
    // the retirement decision is one tombstone-flagged digest projection
    // + a partial-aggregable groupBy — the old semi+anti formulation
    // scanned and hashed the corpus text twice
    val digestProjects = p.linesIterator
      .filter(l => l.contains("Project") && l.contains("md5(cast(text")).toSeq
    assert(digestProjects.length == 1,
      s"corpus text must be digested in exactly one projection, " +
        s"got ${digestProjects.length}:\n${digestProjects.mkString("\n")}\n${p.take(900)}")
    assert(p.contains("partial_min"),
      s"retirement must map-side combine per digest:\n${p.take(900)}")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"),
      s"no exchange may carry the text column:\n$exchanges")
  }

  test("snapshot diff shuffles (id, digest) only — text is projected away before the join") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
    val old = docs.filter(col("doc_id") % 10 =!= 3)
    val p = plan(ops.SnapshotDiff(old).transform(docs.filter(col("doc_id") % 9 =!= 4)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "full-outer diff is an equi-join on the id")
    // every exchange in the plan carries only id + md5 digest columns:
    // the raw text column must not appear downstream of its own md5
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"),
      s"no exchange may carry the text column:\n$exchanges")
  }

  test("fuzzy decontamination exact mode joins shingle digests — no pair-space cross join") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
    val op = ops.FuzzyDecontaminate(docs.filter(col("source") === "src0"),
      n = 3, thresholdBp = 5000)
    val p = plan(op.transform(docs.filter(col("source") =!= "src0")))
    // the one BNLJ allowed is the 1-row eval-count broadcast; the pair
    // space itself must come from the postings equi-join
    assert(!p.contains("CartesianProduct"),
      s"no cartesian pair space:\n${p.take(600)}")
    assert(p.contains("partial_count") || p.contains("partial_max"),
      "per-pair and per-doc aggregates must map-side combine")
  }

  test("mixture plan and skew report collapse to strata/key frames — partial aggs, no global sort") {
    val docs = Tables.documents(spark, d)
    val mp = plan(ops.MixturePlan("lang", "n_chars", Map("en" -> 5000), 1000L)
      .transform(docs))
    assert(mp.contains("partial_count") || mp.contains("partial_sum"),
      s"corpus collapse must map-side combine:\n${mp.take(600)}")
    assert(!mp.contains("CartesianProduct"), "declared-strata join is not a cartesian")
    val sk = plan(ops.SkewReport(Seq("lang"), topK = 5).transform(docs))
    assert(sk.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not a global sort:\n${sk.take(600)}")
    assert(sk.contains("partial_count"), "key counting must map-side combine")
  }

  test("lateral join with per-row LIMIT decorrelates to a window rank, not a per-row loop") {
    val p = plan(queries.Relational.q23_lateral(spark, d))
    assert(p.contains("Window"),
      s"lateral LIMIT must rewrite to a partitioned rank:\n${p.take(800)}")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"no per-row execution of the lateral subquery:\n${p.take(800)}")
  }

  test("pca projection is a shuffle-free per-row expression") {
    val emb = Tables.embeddings(spark, d)
    val p = plan(ops.PcaProject(Seq(Seq.fill(64)(0.1), Seq.fill(64)(-0.1)))
      .transform(emb))
    assert(!p.contains("Exchange"), s"no shuffle expected:\n${p.take(600)}")
  }

  test("pq codebook drift shuffles only (subspace, code) keys — vectors never move") {
    val emb = Tables.embeddings(spark, d)
    val centers = Seq(Seq.fill(64)(0.1), Seq.fill(64)(-0.1))
    val codebooks = Seq.fill(8)(Seq(Seq.fill(8)(0.05), Seq.fill(8)(-0.05)))
    val p = plan(ops.PqCodebookDrift(centers, codebooks,
      reference = emb.filter(org.apache.spark.sql.functions.col("label") =!= 0))
      .transform(emb.filter(org.apache.spark.sql.functions.col("label") === 0)))
    // encode + explode are map-side; the only hash exchanges carry the
    // m·ksub-key aggregates and the m-row totals — no exchange may carry
    // an embedding column (the vectors stay where they were scanned)
    assert(p.contains("HashAggregate"), p.take(600))
    val exchanges = "Exchange [^\\n]*".r.findAllIn(p).toList
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.contains("embedding")),
      s"no exchange may carry vectors:\n${exchanges.mkString("\n")}")
    assert(p.contains("BroadcastExchange"),
      "theta and per-subspace totals must broadcast back, not shuffle")
  }

  test("sampled dedup truth is an inverted-index equi-join — no pair-space NL sweep") {
    val p = plan(queries.CurationQueries.dedupMinhashRecallSampledTruthPlan(spark, d))
    assert(!p.contains("CartesianProduct"),
      s"truth must not be an all-pairs product:\n${p.take(800)}")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"truth must equi-join on the shingle, not NL over pairs:\n${p.take(800)}")
    assert(p.contains("partial_count"),
      "|A∩B| must arrive as a map-side-combined group count")
  }
}
