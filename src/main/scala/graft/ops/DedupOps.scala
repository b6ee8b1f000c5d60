package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EnsembleOp
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for LLM-scale corpus curation (BASELINE.json
  * north star). All emit either a keep-list (exact) or a verified
  * near-duplicate pair list (approximate), with similarity reported in
  * integer basis points so downstream thresholds never touch float
  * rounding.
  *
  * Scale design: the approximate ops never form the O(n²) pair space —
  * candidates come from an inverted index (shared shingle / LSH band /
  * SimHash band), so the shuffle is proportional to true collisions, not
  * to n². The brute-force pair scan exists only inside
  * [[CosineNearDup]] with `exact = true` for oracle checking.
  */

/** Exact dedup by content hash-group: one keep row per distinct content,
  * keeping the smallest id. `normalized = true` dedups on the whitespace/
  * case normal form. */
case class ExactDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    normalized: Boolean = false) extends EnsembleOp {

  private def key: Column = if (normalized) T.normalize(col(textCol)) else col(textCol)

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      StructField("content_hash", StringType),
      in(idCol).copy(name = "keep_id"),
      StructField("n_copies", LongType)))
  }

  // group by the 32-byte digest, never the text: the shuffle key for a
  // 100 TB corpus must not carry the corpus (the digest IS the dedup
  // identity we emit anyway)
  override def transform(df: DataFrame): DataFrame =
    df.groupBy(md5(key).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}

/** Exact n-gram Jaccard near-dup pairs with AllPairs/PPJoin-style prefix
  * filtering (Bayardo et al., "Scaling Up All Pairs Similarity Search",
  * WWW'07 — public algorithm): under any global total order on shingles,
  * two sets with Jaccard ≥ t must share a shingle within their first
  * ⌊(1−t)·|d|⌋+1 shingles. We order by (global doc-frequency ASC, shingle)
  * so the indexed prefix holds each document's *rarest* shingles — posting
  * lists stay short even on low-entropy corpora where a naive shingle
  * inverted index explodes. Candidates are then verified with the exact
  * Jaccard (array_intersect on full shingle sets), so the result is
  * EXACT: every pair with `inter*10000 >= thresholdBp*union`, no recall
  * loss. */
case class NgramJaccardDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    thresholdBp: Int = 8000) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol).copy(name = "doc_a"), in(idCol).copy(name = "doc_b"),
      StructField("inter", LongType), StructField("uni", LongType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val (result, cached) = build(df)
    // the pair list is tiny (collisions only) — materialize it eagerly so
    // the corpus-sized shingle cache can be released instead of leaking
    // across queries in a long-lived session. persist+count, NOT an eager
    // localCheckpoint: checkpointing a plan that holds a broadcast
    // exchange can deadlock on Spark's process-global RDDCheckpointData
    // monitor against the broadcast thread's own doCheckpoint (lock
    // inversion — observed twice in this suite). Materialization is the
    // point here, not lineage truncation; persisted blocks free via
    // ContextCleaner once the frame is unreachable.
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cached.unpersist()
    out
  }

  /** The lazy pair plan (pre-materialization) — PlanSpec asserts on this. */
  private[graft] def pairPlan(df: DataFrame): DataFrame = build(df)._1

  private def build(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // the shingle table feeds three plan branches (freq, prefix, verify) —
    // cache it so shingling runs once
    val docs = df.select(col(idCol).as("id"), T.shingleSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // n_sh as LONG: the size-compatibility and prefix filters multiply
    // it by basis points — 32-bit math wraps negative at ~215k shingles
    // (a long book) and silently drops true duplicate pairs
    val sh = docs.select(col("id"),
      size(col("sh")).cast("long").as("n_sh"), explode(col("sh")).as("s"))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    // prefix length ⌊(1−t)·|d|⌋+1 under (df ASC, shingle ASC) global order;
    // prefix rows are light (no arrays) — candidates dedupe before any
    // array is shuffled. rn (the shingle's position in the doc's global
    // order) rides along for the positional filter below.
    val w = Window.partitionBy("id").orderBy(asc("df"), asc("s"))
    val prefix = sh.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= floor(col("n_sh") * (10000 - thresholdBp) / 10000) + 1)
      .select(col("id"), col("n_sh"), col("s"), col("rn").cast("long"))
    val cand = prefix.as("a").join(prefix.as("b"), Seq("s"))
      .filter(col("a.id") < col("b.id"))
      // size-compatibility: Jaccard ≥ t ⇒ t ≤ min(|A|,|B|)/max(|A|,|B|)
      .filter(col("a.n_sh") * thresholdBp <= col("b.n_sh") * 10000 &&
        col("b.n_sh") * thresholdBp <= col("a.n_sh") * 10000)
      // positional filter (PPJoin, Xiao et al. TODS'11 — public algorithm):
      // Jaccard ≥ t needs overlap o ≥ ⌈t/(1+t)·(|A|+|B|)⌉, and a match at
      // positions (pa,pb) bounds o ≤ 1+min(|A|−pa,|B|−pb) — valid for the
      // pair's FIRST common shingle, which for any true pair lies in both
      // prefixes (tokens before it are non-shared, so a deeper position
      // would force Jaccard < t). Keeping pairs with ANY surviving match
      // row therefore loses nothing, and on low-entropy corpora it cuts
      // verified candidates ~3× (measured: 5.59M→1.95M at 50k docs) —
      // the verify stage shuffles full shingle arrays, so pruning here is
      // the lever. Integer bp form; n_sh/rn are LONG so no 32-bit wrap.
      .filter((lit(1L) + least(col("a.n_sh") - col("a.rn"),
          col("b.n_sh") - col("b.rn"))) * (10000 + thresholdBp) >=
        (col("a.n_sh") + col("b.n_sh")) * thresholdBp)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val result = cand
      .join(docs.select(col("id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(docs.select(col("id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("long"))
      .filter(col("inter") * 10000 >= col("uni") * thresholdBp)
      .select("doc_a", "doc_b", "inter", "uni")
    (result, docs)
  }
}

/** MinHash + LSH banding near-dup detection: k-hash signature → `bands`
  * band keys → candidates join on (band index, band hash) → verified with
  * exact Jaccard on the shingle sets. Probability a pair with Jaccard j
  * surfaces: 1-(1-j^r)^b with r = numHashes/bands rows per band. The
  * default 16 bands × 4 rows gives P ≈ 0.9998 at j = 0.8 (the default
  * threshold) — near-threshold duplicates are not silently dropped; the
  * exact-Jaccard verification keeps precision at 1.0 regardless. The
  * scalable default for corpus dedup: candidate volume tracks collisions
  * only. */
case class MinHashDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    numHashes: Int = 64,
    bands: Int = 16,
    thresholdBp: Int = 8000) extends EnsembleOp {

  require(numHashes % bands == 0, s"$name: numHashes must divide into bands")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      in(idCol).copy(name = "doc_a"), in(idCol).copy(name = "doc_b"),
      StructField("jaccard_bp", LongType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val (result, cached) = build(df)
    // eager pair materialization → release the corpus-sized cache;
    // persist+count, not localCheckpoint (the broadcast-vs-checkpoint
    // lock-inversion deadlock — see NgramJaccardDedup.transform)
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cached.unpersist()
    out
  }

  /** The lazy pair plan (pre-materialization) — PlanSpec asserts on this. */
  private[graft] def pairPlan(df: DataFrame): DataFrame = build(df)._1

  private def build(df: DataFrame): (DataFrame, DataFrame) = {
    import graft.functions.FastExpressions
    val docs = df.select(col(idCol).as("id"), T.shingleSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // light (id, band) rows only — the shingle arrays join back in AFTER
    // candidate pairs are deduped, so band collisions never shuffle arrays.
    // 16 bands × 4 rows: recall ≈ 0.9998 at j = 0.8; the cost is more noise
    // candidates (P ≈ 0.49 at j = 0.45), all killed by the exact verify.
    val banded = docs.select(col("id"),
      posexplode(FastExpressions.minhashBandKeys(col("sh"), numHashes, bands))
        .as(Seq("band_idx", "band_hash")))
    val cand = banded.as("a").join(banded.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val result = cand
      .join(docs.select(col("id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(docs.select(col("id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("long"))
      .filter(col("inter") * 10000 >= col("uni") * thresholdBp)
      .select(col("doc_a"), col("doc_b"),
        ((col("inter") * 10000) / col("uni")).cast("long").as("jaccard_bp"))
    (result, docs)
  }
}

/** Connected components over a near-duplicate PAIR list → per-document
  * cluster assignment — the step that turns any pair-emitting dedup op
  * ([[NgramJaccardDedup]], [[MinHashDedup]], [[SimHashDedup]],
  * [[CosineNearDup]]) into a keep/drop decision: `cluster_id` is the
  * minimum doc id in the component and `is_keeper = (doc_id ==
  * cluster_id)` marks the canonical copy (the public fuzzy-dedup recipe:
  * LSH pairs → transitive closure → keep one per cluster).
  *
  * Algorithm: iterative min-label propagation over the symmetric edge
  * list with pointer-doubling — each round every node takes the min of
  * its own and its neighbours' labels, then compresses label ← label(label)
  * (valid because every label is a node id of the same component), so
  * convergence takes O(log diameter) rounds; dedup graphs are
  * band-induced near-cliques, so that is 1–3 rounds in practice. Each
  * round is one shuffle of (id, label) longs; labels are
  * localCheckpoint'ed to cut lineage (the standard Spark iterative-graph
  * pattern), and convergence is detected by an exact decimal label-sum
  * checksum every second round (labels only ever decrease, so equal sum
  * ⇔ fixpoint; the 2-round cadence halves job-launch overhead, which
  * dominates below cluster scale) — no driver-side collect of nodes.
  *
  * `allDocs` adds the full document table so untouched docs emit
  * singleton clusters; without it only docs appearing in pairs are
  * labeled.
  *
  * Size gate (same discipline as the ALS scorer's broadcast gate): the
  * dup graph is edge METADATA — two ids per pair, not documents — and in
  * a deduped corpus it is orders of magnitude smaller than the corpus.
  * When the persisted edge list holds at most `edgeBudget` pairs, the op
  * collects the id pairs to the driver in one job and runs exact
  * union-find (path compression + min-root, O(E α)) — no iteration, no
  * per-round scheduler overhead.
  * Above the budget it switches to the distributed propagation, whose
  * state stays ∝ |dup graph|. At the 4 M-pair default the union-find
  * map holds a few million entries (tens of MB of driver heap) — far
  * inside headroom even for a default driver — while a 100 TB corpus
  * whose dup graph exceeds the budget gets the iterative path
  * automatically. */
case class DupClusters(
    allDocs: Option[DataFrame] = None,
    docIdCol: String = "doc_id",
    aCol: String = "doc_a",
    bCol: String = "doc_b",
    maxIters: Int = 25,
    edgeBudget: Long = 4000000L) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, aCol); requireCol(in, bCol)
    require(in(aCol).dataType == in(bCol).dataType,
      s"$name: pair columns disagree on dtype (${in(aCol).dataType.simpleString} " +
        s"vs ${in(bCol).dataType.simpleString})")
    // both paths ORDER ids (min-root union / min-label propagation), but
    // only the distributed one would handle a non-Comparable JVM type —
    // the driver path casts to Comparable and an array/struct/binary id
    // would throw an opaque ClassCastException on the below-budget path
    // only. Validate once, schema-time, with the op named.
    val dt = in(aCol).dataType
    val orderableAtomic = dt match {
      case _: NumericType => true
      case StringType | BooleanType | DateType | TimestampType => true
      case _ => false
    }
    require(orderableAtomic,
      s"$name: doc id dtype ${dt.simpleString} is not an orderable atomic " +
        "type — use a numeric/string/date id (binary, array and struct ids " +
        "are not supported)")
    StructType(Seq(
      in(aCol).copy(name = docIdCol),
      in(aCol).copy(name = "cluster_id"),
      StructField("is_keeper", BooleanType, nullable = false)))
  }

  /** Exact driver-side union-find over the UN-doubled pair list (the
    * below-budget path; union-find is direction-agnostic, so collecting
    * the symmetric edge list would double the transfer for nothing).
    * One `collect()`, one job: the `edgeBudget` gate already bounds the
    * transfer (≤4M pairs ≈ low hundreds of MB of Rows, transient), and
    * the earlier per-partition `toLocalIterator` ran a separate Spark job
    * per partition — in a long-lived session whose per-job scheduling
    * latency has grown (listener bus, GC debt), that multiplied into a
    * 12 s → 38 s swing on an unchanged query (measured, bench r6).
    * Min-root union keeps `cluster_id` = the component's minimum id —
    * identical semantics to the propagation. */
  private def driverClusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val idField = pairs.schema(aCol)
    def cmp(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r).exists(_ != r)) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.select(col(aCol), col(bCol)).na.drop().collect()
      .foreach { row =>
        val a = row.get(0); val b = row.get(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (cmp(ra, rb) <= 0) parent(rb) = ra else parent(ra) = rb
        }
      }
    val rows = parent.keysIterator
      .map(k => org.apache.spark.sql.Row(k, find(k))).toSeq
    val schema = StructType(Seq(
      idField.copy(name = docIdCol), idField.copy(name = "cluster_id")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1 + rows.length / 500000), schema)
  }

  override def transform(pairs: DataFrame): DataFrame = {
    transformSchema(pairs.schema) // id-dtype validation for direct callers
    import org.apache.spark.storage.StorageLevel
    // persist the LIGHT pair projection once: the count that decides the
    // path and whichever path runs must not re-evaluate an expensive
    // upstream pair generator (PPJoin etc.)
    val light = pairs.select(col(aCol), col(bCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (light.count() <= edgeBudget) {
      val clustered = driverClusters(light)
      light.unpersist()
      return finish(clustered)
    }
    val edges = light.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(light.select(col(bCol).as("src"), col(aCol).as("dst")))
    // iterate ONLY over nodes that appear in some pair: the propagation
    // state is ∝ |dup graph|, not |corpus| — singletons (the vast
    // majority of a deduped corpus) join in once at the end
    val nodes = edges.select(col("src").as("node")).distinct()
    def checksum(l: DataFrame): java.math.BigDecimal = {
      // hash the label before summing: a direct numeric cast is NULL for
      // string/date ids (transformSchema blesses them), which made every
      // round's sum normalize to ZERO and convergence fire after two
      // rounds with wide components still unresolved. xxhash64 works for
      // any id type; the decimal sum cannot overflow. (With numeric
      // labels the old sum was monotone under min-propagation; the hash
      // sum instead changes with overwhelming probability whenever any
      // label changes — a 2^-64-class collision is the accepted risk.)
      // sum over zero rows is NULL → normalize so an empty pair list
      // converges on the first round instead of NPE-ing the comparison
      val v = l.agg(sum(xxhash64(col("label")).cast("decimal(38,0)")))
        .head().getDecimal(0)
      if (v == null) java.math.BigDecimal.ZERO else v
    }
    // lazy localCheckpoint: the checksum action both materializes the
    // round's labels AND tests convergence
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(false)
    var prevSum = checksum(labels)
    var converged = false
    var iters = 0
    // shuffle_hash hints on every in-loop join: the round's plan gets
    // localCheckpoint'ed, and checkpointing a plan that holds a
    // BROADCAST exchange can deadlock on Spark's process-global
    // RDDCheckpointData monitor against the broadcast thread's own
    // doCheckpoint (lock inversion — reproduced in this op's 60-node
    // chain spec). Checkpointing here is non-negotiable (lineage must
    // truncate across rounds), so the broadcast is what goes; at scale
    // shuffle-hash is the right strategy for these label-map joins
    // anyway, and AQE cannot override an explicit strategy hint.
    while (!converged && iters < maxIters) {
      val prop = edges.join(
          labels.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node")).agg(min("label").as("nlabel"))
      // every paired node has ≥1 neighbour, so the propagation covers all
      // of `labels`; inner-join + least keeps the node's own label in play
      val combined = labels.join(prop.hint("shuffle_hash"), Seq("node"))
        .select(col("node"), least(col("label"), col("nlabel")).as("label"))
      // pointer-doubling shortcut: label ← label(label). Every label value
      // IS a node of the same component (labels start as node ids and only
      // min-combine within edges), so the self-join compresses two hops
      // into one round — rounds ∝ log(diameter), not diameter. The left
      // join + coalesce only guards the impossible miss.
      val next = combined
        .join(combined.select(col("node").as("label"), col("label").as("__ll"))
            .hint("shuffle_hash"),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("__ll"), col("label")).as("label"))
        .localCheckpoint(false)
      labels = next
      iters += 1
      // labels only ever decrease, so a checksum action every SECOND round
      // still detects the fixpoint exactly — at half the per-round job cost
      // (small-scale rounds are dominated by job overhead, not data)
      if (iters % 2 == 0 || iters == maxIters) {
        val nextSum = checksum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
      }
    }
    if (!converged)
      System.err.println(s"[$name] WARNING: labels not converged after " +
        s"$maxIters rounds — components wider than $maxIters hops keep " +
        "partial (still valid, non-minimal) cluster ids")
    light.unpersist()
    finish(labels.select(col("node").as(docIdCol), col("label").as("cluster_id")))
  }

  /** Shared tail: fold in singleton docs and mark the canonical copy. */
  private def finish(clustered: DataFrame): DataFrame = {
    val full = allDocs match {
      case Some(d) =>
        d.select(col(docIdCol)).join(clustered, Seq(docIdCol), "left")
          .select(col(docIdCol),
            coalesce(col("cluster_id"), col(docIdCol)).as("cluster_id"))
      case None => clustered
    }
    full.withColumn("is_keeper", col(docIdCol) === col("cluster_id"))
  }
}

/** SimHash near-dup detection: 64-bit per-document hash, banded so the
  * candidate join is COMPLETE for the requested radius (pigeonhole: with
  * `maxHamming+1` or more bands, any pair within `maxHamming` flips must
  * share an untouched band). Exactly `maxHamming+1` bands are used — the
  * MINIMAL complete count, hence the WIDEST bands (64 bits split as
  * evenly as possible) and the fewest false collisions: a 4-bit band has
  * only 16 values, so every extra band split multiplies candidate pairs
  * quadratically. hamming ≤ 3 (Manku et al.'s web-dedup operating point,
  * the default) gets 4×16-bit bands; ≤ 8 gets 9 bands of 7–8 bits.
  * Candidates are verified by exact hamming distance.
  *
  * `hashCol` supplies a precomputed 64-bit hash column instead of hashing
  * `textCol` (for pipelines that persist signatures — and for tests that
  * plant exact bit flips). */
case class SimHashDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    maxHamming: Int = 3,
    hashCol: Option[String] = None) extends EnsembleOp {

  require(maxHamming >= 0 && maxHamming <= 15,
    s"$name: maxHamming in [0, 15] (wider radii make banding collision-bound)")

  /** Minimal complete band count; 64 bits split as evenly as possible
    * (e.g. 9 bands → one 8-bit + eight 7-bit). */
  private val numBands = maxHamming + 1
  private val widths: Seq[Int] = {
    val base = 64 / numBands; val rem = 64 % numBands
    Seq.tabulate(numBands)(b => if (b < rem) base + 1 else base)
  }
  private val offsets: Seq[Int] = widths.scanLeft(0)(_ + _)

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, hashCol.getOrElse(textCol))
    StructType(Seq(
      in(idCol).copy(name = "doc_a"), in(idCol).copy(name = "doc_b"),
      StructField("hamming", IntegerType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val hash = hashCol.map(col).getOrElse(
      graft.functions.FastExpressions.simhash64(T.shingleSet(col(textCol), n)))
    val hashed = df.select(col(idCol).as("id"), hash.as("h"))
    val bandArr = array((0 until numBands).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1
      concat_ws(":", lit(b),
        shiftrightunsigned(col("h"), offsets(b)).bitwiseAND(lit(mask)))
    }: _*)
    val banded = hashed.withColumn("band", explode(bandArr))
    banded.as("a").join(banded.as("b"), Seq("band"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        T.hamming64(col("a.h"), col("b.h")).as("hamming"))
      // hamming is deterministic per pair (pure function of the two
      // hashes), so filtering BEFORE the dedupe exchange is equivalent —
      // and essential at scale: on low-entropy corpora band buckets get
      // dense and false collisions dwarf true pairs, so the dropDuplicates
      // shuffle must carry only survivors (Catalyst cannot push a filter
      // on a non-key column through the dedupe aggregate itself)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }
}

/** Embedding cosine near-duplicate pairs. The default path buckets both
  * sides with mean-centered sign-projection LSH ([[graft.functions.LshBucket]])
  * across `numTables` independent hyperplane tables (OR-amplification, the
  * cosine analog of MinHash banding: a pair is a candidate if it collides
  * in ANY table), pair-joins light (id, table-bucket) rows, dedupes
  * candidates, then verifies the exact cosine — candidate volume tracks
  * bucket collisions, never n²/2. With P(bit agree) = 1 − θ/π per
  * hyperplane, recall ≈ 1 − (1 − p^numBits)^numTables: more tables →
  * higher recall, fewer bits → more (verified) noise candidates. Size
  * `numBits` ~ log2(n/targetBucket) and `numTables` to the recall target
  * at your threshold; precision is exactly 1.0 regardless (every emitted
  * pair is verified).
  *
  * `exact = true` scans all pairs (broadcast nested loop) — the
  * oracle-checkable reference path, only for data that fits one executor. */
case class CosineNearDup(
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    threshold: Double = 0.45,
    exact: Boolean = false,
    numBits: Int = 8,
    numTables: Int = 8,
    center: Option[Seq[Double]] = None) extends EnsembleOp {

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    StructType(Seq(
      in(idCol).copy(name = "id_a"), in(idCol).copy(name = "id_b"),
      StructField("cosine", DoubleType)))
  }

  private def cosine(va: Column, na: Column, vb: Column, nb: Column): Column =
    when(na * nb === 0, 0.0).otherwise(V.dot(va, vb) / (na * nb))

  override def transform(df: DataFrame): DataFrame =
    if (exact) transformExact(df) else transformBucketed(df)

  /** Brute force: every pair scored. Same bits as the bucketed verify. */
  private def transformExact(df: DataFrame): DataFrame = {
    // norms once per vector (not once per pair), dot via the codegen-free
    // tight-loop expression — same bits as sqrt-of-self-dot per pair
    val prepped = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(V.dot(col(vecCol), col(vecCol))).as("norm"))
    // the streamed side inherits the SCAN's partitioning, and an exact
    // sweep's input is catalog-scale (one small parquet split): without a
    // repartition the n²/2 pair loop runs in ONE task while every other
    // core idles (JobShapeProbe r14: multimodal_neardup wall 6.7 s ≈ one
    // 6.5 s task on local[32]). Round-robin to the cluster's parallelism;
    // the shuffled bytes are the n input vectors — noise next to the n²/2
    // pair scores this path exists to pay (bucketed mode is the scale path)
    val a = prepped.select(col("id").as("id_a"), col("v").as("va"), col("norm").as("na"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val b = prepped.select(col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Scale path: LSH-bucketed candidates, exact verification. */
  private def transformBucketed(df: DataFrame): DataFrame = {
    val (result, cached) = buildBucketed(df)
    // eager pair materialization → release the corpus-sized cache;
    // persist+count, not localCheckpoint (the broadcast-vs-checkpoint
    // lock-inversion deadlock — see NgramJaccardDedup.transform)
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cached.unpersist()
    out
  }

  /** The lazy pair plan (pre-materialization) — PlanSpec asserts on this. */
  private[graft] def pairPlan(df: DataFrame): DataFrame =
    if (exact) transformExact(df) else buildBucketed(df)._1

  private def buildBucketed(df: DataFrame): (DataFrame, DataFrame) = {
    import graft.functions.FastExpressions
    val prepped = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(V.dot(col(vecCol), col(vecCol))).as("norm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // mean-centered hyperplanes (clustered embeddings would otherwise
    // collapse into a handful of buckets — see LshBucket scaladoc); the
    // mean is a literal: #dims doubles, metadata scale. Fit-time `center`
    // wins when given (the AnnLsh discipline: persisted/oracled uses MUST
    // pass it — a recomputed mean drifts in the last bits under double
    // partial-agg merge order, flipping borderline bucket signs).
    val mu = typedLit(center.map(_.toArray).getOrElse(
      graft.functions.VectorFunctions.meanVector(df, vecCol)))
    // one bucket per table, each table seeded with its own hyperplanes;
    // the join key packs (table, bucket) so tables never collide
    val tableBuckets = array((0 until numTables).map(t =>
      (lit(t.toLong * (1L << 32))
        + FastExpressions.lshBucket(col("v"), mu, numBits, seed = 42L + t)
          .cast("long"))): _*)
    // light (id, bucket) rows; vectors join back AFTER candidate dedupe
    val buckets = prepped.select(col("id"), explode(tableBuckets).as("__bucket"))
    val cand = buckets.as("a").join(buckets.as("b"), Seq("__bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val result = cand
      .join(prepped.select(col("id").as("id_a"), col("v").as("va"), col("norm").as("na")), Seq("id_a"))
      .join(prepped.select(col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb")), Seq("id_b"))
      .withColumn("cosine", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
    (result, prepped)
  }
}

/** Semantic near-duplicate pairs, SemDeDup-style (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" — public method): k-means clusters bucket the
  * embeddings, and only WITHIN-cluster pairs are scored — candidates ∝
  * Σ|cluster|², never n². Pairs whose members land in different clusters
  * are the method's (documented) recall loss, exactly as in the paper;
  * every emitted pair is exactly verified, so precision is 1.0.
  *
  * This is the third candidate-generation geometry in the family:
  * [[CosineNearDup]] buckets by fixed hyperplanes (no fit, multi-table
  * recall), [[SemanticNearDup]] by trained centroids (adapts to clustered
  * corpora, one bucket per vector — cheapest shuffle), [[MinHashDedup]] /
  * [[SimHashDedup]] by text. `centers` of size 1 degenerates to the exact
  * all-pairs scan, which puts the full machinery under the hash oracle.
  *
  * Scale shape: centroid assignment is a per-row expression over literal
  * centers (metadata scale); the pair join is a shuffle equi-join on the
  * cluster id carrying each vector ONCE PER SIDE (2× the corpus through
  * the shuffle — fine because the expensive term is the |cluster|²
  * verification fan-out, not the linear shuffle). Size nlist so clusters
  * average ~√(pair budget).
  */
case class SemanticNearDup(
    centers: Seq[Seq[Double]],
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    threshold: Double = 0.45) extends EnsembleOp {

  require(centers.nonEmpty, s"$name: need at least one centroid")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, vecCol)
    StructType(Seq(
      in(idCol).copy(name = "id_a"), in(idCol).copy(name = "id_b"),
      StructField("cosine", DoubleType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val prepped = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(V.dot(col(vecCol), col(vecCol))).as("norm"),
      V.nearestCentroid(col(vecCol), centers).as("__cid"))
    val a = prepped.select(col("__cid"), col("id").as("id_a"),
      col("v").as("va"), col("norm").as("na"))
    val b = prepped.select(col("__cid"), col("id").as("id_b"),
      col("v").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("__cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        when(col("na") * col("nb") === 0, 0.0)
          .otherwise(V.dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}

object SemanticNearDup {
  /** Fit the cluster buckets (seeded MLlib k-means, like [[AnnIvf.fit]])
    * and build the op; centroids persist as plain parameter doubles. */
  def fit(df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.45, nlist: Int = 32, maxIter: Int = 10,
      seed: Long = 42L): SemanticNearDup = {
    // nlist=1: assignment is constant whatever the center, and MLlib
    // k-means requires k >= 2 — the mean is the natural single center
    if (nlist == 1)
      return SemanticNearDup(Seq(V.meanVector(df, vecCol).toSeq),
        idCol, vecCol, threshold)
    SemanticNearDup(V.fitCenters(df, vecCol, nlist, maxIter, seed),
      idCol, vecCol, threshold)
  }
}

/** Incremental exact dedup: label a NEW ingest batch against the digest
  * index of the already-accepted corpus, never touching the corpus
  * itself. At 100 TB the corpus cannot be re-paired on every ingest —
  * the accepted state must live as a digest index (16-byte identities,
  * ~1/6000th of the text) that each incoming batch joins against. The
  * batch also dedups WITHIN itself (first occurrence by smallest id
  * wins, matching [[ExactDedup]]'s keeper rule), so `dup_kind` is:
  * `'index'` (content already accepted in a prior ingest), `'batch'`
  * (dup of an earlier row in this ingest), or NULL for keepers.
  *
  * Physical shape: one groupBy + two equi-joins, all keyed on the md5
  * digest [pinned: the text never shuffles — only digests do]. No
  * windows. Null-text rows have no content identity: they pass through
  * as keepers with a null digest (joins skip null keys by SQL
  * semantics — each caller decides their fate downstream).
  *
  * [[updatedIndex]] closes the ingest loop: prior digests ∪ the batch's
  * newly-accepted ones — the state to persist for the next batch.
  */
case class IncrementalDedup(
    index: DataFrame,
    indexDigestCol: String = "content_hash",
    idCol: String = "doc_id",
    textCol: String = "text",
    normalized: Boolean = true) extends EnsembleOp {

  require(index.schema.fieldNames.contains(indexDigestCol),
    s"$name: index is missing digest column '$indexDigestCol' in " +
      index.schema.simpleString)

  private def key: Column = if (normalized) T.normalize(col(textCol)) else col(textCol)

  /** The op's content digest as a column — md5 over the (optionally
    * normalized) text, EXACTLY the `content_hash` [[transform]] assigns.
    * Exposed so callers that pre-screen a batch against index sidecars
    * (the ingest sink's bloom gate) share this one key definition. */
  def contentHash: Column = IncrementalDedup.contentHash(textCol, normalized)

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    Seq("content_hash", "dup_kind").foreach(c =>
      require(!in.fieldNames.contains(c),
        s"$name: output column '$c' collides with the input schema"))
    StructType(in ++ Seq(
      StructField("content_hash", StringType),
      StructField("dup_kind", StringType)))
  }

  override def transform(df: DataFrame): DataFrame = {
    transformSchema(df.schema)
    val hashed = df.withColumn("content_hash", contentHash)
    // keeper per digest within the ingest — a digest-keyed partial agg,
    // the same shape (and often the same exchange) as the label join
    val keepers = hashed.groupBy(col("content_hash").as("__kh"))
      .agg(min(col(idCol)).as("__keep_id"))
    val idx = index.select(col(indexDigestCol).as("__ih")).distinct()
    hashed
      .join(keepers, col("content_hash") === col("__kh"), "left")
      .join(idx, col("content_hash") === col("__ih"), "left")
      .withColumn("dup_kind",
        when(col("__ih").isNotNull, lit("index"))
          .when(col(idCol) =!= col("__keep_id"), lit("batch"))
          .otherwise(lit(null).cast(StringType)))
      .drop("__kh", "__keep_id", "__ih")
  }

  /** The accepted-corpus digest index after this ingest: prior digests
    * plus the batch's newly-accepted ones (distinct — a digest-keyed
    * partial agg, ready to persist for the next batch). */
  def updatedIndex(df: DataFrame): DataFrame =
    index.select(col(indexDigestCol))
      .union(transform(df).filter(col("dup_kind").isNull)
        .filter(col("content_hash").isNotNull)
        .select(col("content_hash").as(indexDigestCol)))
      .distinct()
}

object IncrementalDedup {
  /** The content-digest definition [[IncrementalDedup.transform]]
    * assigns, as a standalone column — callers that pre-screen a batch
    * before constructing the op (the ingest sink's bloom gate) must hash
    * exactly the way the op will. */
  def contentHash(textCol: String, normalized: Boolean): Column =
    md5(if (normalized) T.normalize(col(textCol)) else col(textCol))
}

/** Incremental FUZZY (MinHash) dedup: label a new ingest batch against
  * the accepted corpus's SIGNATURE index — the near-dup counterpart of
  * [[IncrementalDedup]], same never-re-pair-the-corpus contract. The
  * persisted index holds one fixed-size MinHash signature per accepted
  * document (8·numHashes bytes, independent of document length — the
  * whole fuzzy identity of a 100 TB corpus fits in a few hundred GB),
  * built by [[IncrementalMinHashDedup.signatures]].
  *
  * Decision rule: signature slot-agreement `est_bp = 10000·matches/k`
  * (the unbiased MinHash Jaccard estimator) at `thresholdBp`. Candidate
  * generation is banded exactly like [[MinHashDedup]]: both sides derive
  * band keys — the batch live from text via `MinHashBandKeys`, the index
  * from stored signatures via `SigBandKeys` (the folds are identical, so
  * keys collide exactly when they should; pinned in SketchSpec) — and
  * only band-colliding pairs compare signatures. Light (id, band) rows
  * shuffle; signatures join back per candidate pair; text never moves.
  *
  * `dup_kind`: `'near_index'` (≥ threshold vs an accepted doc),
  * `'near_batch'` (≥ threshold vs an earlier row of this ingest — greedy
  * by id like every LSH dedup keeper rule; [[DupClusters]] exists for
  * transitive closure), or NULL for keepers. `matched_id` reports the
  * smallest matching doc id of the winning kind. Docs with fewer than
  * `n` tokens have no shingle identity and pass through as keepers. */
case class IncrementalMinHashDedup(
    index: DataFrame, // (indexIdCol, indexSigCol: array<long>(numHashes))
    indexIdCol: String = "doc_id",
    indexSigCol: String = "minhash_sig",
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 3,
    numHashes: Int = 64,
    bands: Int = 16,
    thresholdBp: Int = 8000) extends EnsembleOp {

  require(numHashes % bands == 0, s"$name: numHashes must divide into bands")
  require(thresholdBp >= 1 && thresholdBp <= 10000, s"$name: thresholdBp in [1, 10000]")
  Seq(indexIdCol, indexSigCol).foreach(c =>
    require(index.schema.fieldNames.contains(c),
      s"$name: index is missing column '$c' in ${index.schema.simpleString}"))

  import graft.functions.FastExpressions

  private def estBp(a: Column, b: Column): Column =
    FastExpressions.arrayAgreeCount(a, b).cast("long") * 10000 / lit(numHashes)

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    Seq("minhash_sig", "dup_kind", "matched_id").foreach(c =>
      require(!in.fieldNames.contains(c),
        s"$name: output column '$c' collides with the input schema"))
    StructType(in ++ Seq(
      StructField("minhash_sig", ArrayType(LongType)),
      StructField("dup_kind", StringType),
      in(idCol).copy(name = "matched_id", nullable = true)))
  }

  override def transform(df: DataFrame): DataFrame = {
    transformSchema(df.schema)
    // shingle once; null/short texts get a null signature (no identity).
    // persist, NOT localCheckpoint: the lineage is one shallow projection
    // (no truncation needed), and checkpoint materialization takes the
    // process-global RDDCheckpointData lock, which can deadlock against a
    // broadcast-exchange thread's own doCheckpoint (observed live in the
    // suite) — cache-block locks cannot. The cache is RELEASED below once
    // the dup-count-sized match table materializes.
    def signed(frame: DataFrame): DataFrame = frame
      .withColumn("__sh", T.shingleSet(col(textCol), n))
      .withColumn("minhash_sig",
        when(size(col("__sh")) > 0,
          FastExpressions.minhashSignature(col("__sh"), numHashes)))
      .drop("__sh")
    val sigged = signed(df)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bsig = sigged.select(col(idCol).as("__bid"), col("minhash_sig").as("__bsig"))
      .filter(col("__bsig").isNotNull)
    val bband = bsig.select(col("__bid"),
      posexplode(FastExpressions.sigBandKeys(col("__bsig"), bands))
        .as(Seq("band_idx", "band_hash")))
    // --- vs the accepted index -----------------------------------------
    // index ids cast to the BATCH id's type (matched_id's declared type):
    // the old unconditional cast("long") silently nulled string ids,
    // which emptied the band join's key and labeled every re-ingested
    // near-duplicate of an accepted doc a keeper
    val isig = index.select(
      col(indexIdCol).cast(df.schema(idCol).dataType).as("__iid"),
      col(indexSigCol).as("__isig"))
    val iband = isig.select(col("__iid"),
      posexplode(FastExpressions.sigBandKeys(col("__isig"), bands))
        .as(Seq("band_idx", "band_hash")))
    val vsIndex = bband.join(iband, Seq("band_idx", "band_hash"))
      .select("__bid", "__iid").distinct()
      .join(bsig, Seq("__bid")).join(isig, Seq("__iid"))
      .filter(estBp(col("__bsig"), col("__isig")) >= thresholdBp)
      .groupBy(col("__bid")).agg(min(col("__iid")).as("__idx_match"))
    // --- within the batch (earlier id wins, greedy) --------------------
    val vsBatch = bband.as("a")
      .join(bband.select(col("__bid").as("__aid"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .filter(col("__aid") < col("__bid"))
      .select("__bid", "__aid").distinct()
      .join(bsig, Seq("__bid"))
      .join(bsig.select(col("__bid").as("__aid"), col("__bsig").as("__asig")), Seq("__aid"))
      .filter(estBp(col("__bsig"), col("__asig")) >= thresholdBp)
      .groupBy(col("__bid")).agg(min(col("__aid")).as("__batch_match"))
    // merge the two (id, match) tables FIRST — they are dup-count-sized,
    // two ids per row — so the batch (with its text) crosses exactly
    // ONE join, the ScrubSharedGrams discipline. Materializing the tiny
    // match table is also what lets the batch-sized signature cache be
    // RELEASED here instead of leaking across queries in a long-lived
    // session (the final projection re-derives signatures in one fresh
    // row-local pass — a recompute, not a cache).
    val matches = vsIndex.join(vsBatch, Seq("__bid"), "full_outer")
      .localCheckpoint(true)
    sigged.unpersist()
    signed(df)
      .join(matches, col(idCol) === matches("__bid"), "left").drop("__bid")
      .withColumn("dup_kind",
        when(col("__idx_match").isNotNull, lit("near_index"))
          .when(col("__batch_match").isNotNull, lit("near_batch"))
          .otherwise(lit(null).cast(StringType)))
      .withColumn("matched_id",
        coalesce(col("__idx_match"), col("__batch_match")))
      .drop("__idx_match", "__batch_match")
  }

  /** The signature index AFTER this ingest: prior signatures plus the
    * batch keepers' (the state to persist for the next batch). */
  def updatedIndex(df: DataFrame): DataFrame =
    index.select(col(indexIdCol), col(indexSigCol))
      .unionByName(transform(df)
        .filter(col("dup_kind").isNull && col("minhash_sig").isNotNull)
        .select(col(idCol).as(indexIdCol), col("minhash_sig").as(indexSigCol)))
}

object IncrementalMinHashDedup {
  /** Build the fixed-size signature index for an accepted corpus — the
    * artifact [[IncrementalMinHashDedup]] labels future ingests against. */
  def signatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 64): DataFrame = {
    import graft.functions.FastExpressions
    docs.select(col(idCol), T.shingleSet(col(textCol), n).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol),
        FastExpressions.minhashSignature(col("__sh"), numHashes).as("minhash_sig"))
  }
}

/** Prefix dedup: collapse documents whose normalized first-`n`-token
  * prefix is identical — the truncated-duplicate family exact dedup
  * cannot see (the same page captured to different depths by different
  * crawls, a document re-ingested with its tail cut at a size limit,
  * partial re-scrapes). Two such copies differ as whole texts but agree
  * on every leading token, so keying on the prefix groups them; the
  * keeper is the copy with the MOST tokens (ties → smallest id) — the
  * opposite of [[ExactDedup]]'s min-id rule, deliberately: among
  * truncations of one document, the longest copy carries the most
  * content, while among exact copies any one is as good as another.
  *
  * Documents shorter than `n` tokens key on their whole token sequence
  * (their prefix is themselves), so short exact duplicates still group
  * while a short document never collides with a longer one sharing its
  * opening — their prefixes differ in length. Null texts digest to a
  * null hash and collapse into the one null group, exactly as they do
  * under [[ExactDedup]] — content-free rows have one shared non-identity.
  *
  * Scale shape: identical to [[ExactDedup]] — one hash-aggregate keyed
  * on the 32-byte prefix digest (map-side partial, then one exchange of
  * one row per GROUP); the text never shuffles, and the keeper election
  * rides the same aggregate as a (token_count DESC, id ASC) struct min,
  * no window. */
case class PrefixDedup(
    idCol: String = "doc_id",
    textCol: String = "text",
    n: Int = 32) extends EnsembleOp {

  require(n >= 1, s"$name: n must be >= 1")

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, idCol); requireCol(in, textCol)
    StructType(Seq(
      StructField("prefix_hash", StringType),
      in(idCol).copy(name = "keep_id"),
      StructField("keep_tokens", LongType),
      StructField("n_copies", LongType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val toks = T.words(col(textCol))
    val prefix = md5(array_join(slice(toks, 1, n), " "))
    val nTokens = T.tokenCount(col(textCol)).cast("long")
    df.select(prefix.as("prefix_hash"), col(idCol), nTokens.as("__nt"))
      .groupBy("prefix_hash")
      .agg(
        min(struct((-col("__nt")).as("neg"), col(idCol).as("id"))).as("__k"),
        count(lit(1)).as("n_copies"))
      .select(col("prefix_hash"), col("__k.id").as("keep_id"),
        (-col("__k.neg")).as("keep_tokens"), col("n_copies"))
  }
}
