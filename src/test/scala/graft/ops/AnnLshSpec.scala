package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Recall of bucketed ANN vs brute-force ground truth on driver data. */
class AnnLshSpec extends SparkSpec {
  import spark.implicits._

  test("AnnLsh recall@10 vs brute force is reasonable and rises with nprobe") {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(30).cache()
    val items = emb.filter($"label" =!= 0).select($"vec_id".as("item_id"), $"embedding").cache()

    val truth = TopKRetrieval(items, "vec_id", "embedding", k = 10, metric = "cosine")
      .transform(queries)
      .select($"vec_id", $"candidate_ids").as[(Long, Seq[Long])].collect().toMap

    def recall(nprobe: Int): Double = {
      val approx = AnnLsh(items, "vec_id", "embedding", k = 10,
        numBits = 4, nprobe = nprobe, metric = "cosine")
        .transform(queries)
        .select($"vec_id", $"candidate_ids").as[(Long, Seq[Long])].collect().toMap
      val hits = truth.map { case (q, t) =>
        approx.get(q).map(a => a.toSet.intersect(t.toSet).size).getOrElse(0)
      }.sum
      hits.toDouble / (truth.size * 10)
    }

    val r1 = recall(1)
    val r5 = recall(5)
    assert(r5 >= r1, s"recall should not fall with more probes: $r1 -> $r5")
    assert(r5 >= 0.25, s"multi-probe recall@10 too low: $r5")
  }

  test("AnnLsh candidates always come from the item set") {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.filter($"label" === 0).select($"vec_id", $"embedding").limit(5)
    val items = emb.filter($"label" === 1).select($"vec_id".as("item_id"), $"embedding")
    val itemIds = items.select($"item_id").as[Long].collect().toSet
    val out = AnnLsh(items, "vec_id", "embedding", k = 5, numBits = 6, nprobe = 4)
      .transform(queries)
      .select(explode($"candidate_ids")).as[Long].collect()
    assert(out.forall(itemIds.contains))
  }

  test("LshSkewReport: degenerate one-bucket catalog maxes skew; spread catalog spreads") {
    // every vector identical → all land in ONE bucket: max_count = n,
    // the worst case the monitor exists to flag
    val same = (1L to 40L).map(i => (i, Seq(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("item_id", "embedding")
    val mu = Seq(0.0, 0.0, 0.0, 0.0)
    val r1 = LshSkewReport(mu, numBits = 4).transform(same).head()
    assert(r1.getLong(0) == 40L) // n_items
    assert(r1.getLong(1) == 16L) // n_buckets
    assert(r1.getLong(2) == 1L)  // n_occupied
    assert(r1.getLong(3) == 40L) // max_count
    assert(r1.getLong(4) == 3L)  // uniform_count = ceil(40/16)
    assert(r1.getLong(5) == 40L * 10000L / 3L) // skew_bp
    // a gaussian spread occupies many buckets and pulls skew down
    val rnd = new scala.util.Random(11)
    val spread = (1L to 400L).map(i =>
      (i, Seq.fill(4)(rnd.nextGaussian().toFloat))).toDF("item_id", "embedding")
    val r2 = LshSkewReport(mu, numBits = 4).transform(spread).head()
    assert(r2.getLong(2) > 8L, s"expected many occupied buckets: ${r2.getLong(2)}")
    assert(r2.getLong(5) < r1.getLong(5),
      "spread catalog must report lower skew than the degenerate one")
    // null vectors are excluded, empty catalog reports zeros
    val r3 = LshSkewReport(mu, numBits = 4)
      .transform(Seq((1L, null: Seq[Float])).toDF("item_id", "embedding")).head()
    assert((0 until 6).filter(_ != 1).forall(i => r3.getLong(i) == 0L),
      s"empty catalog must report zeros: $r3")
  }

  test("ProbeCost: candidates = Σ probes(b)·|b|, against the ceil-uniform baseline") {
    // items 30 in list 0, 10 in list 1; a query workload probing ONLY
    // the heavy list costs 1.5× what uniform sizing predicts
    val items = ((1L to 30L).map(i => (i, Seq(1.0f, 0.0f))) ++
      (31L to 40L).map(i => (i, Seq(0.0f, 5.0f)))).toDF("item_id", "embedding")
    val centers = Seq(Seq(1.0, 0.0), Seq(0.0, 5.0))
    val hot = (1L to 10L).map(i => (i, Seq(1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val r = IvfProbeCost(items, centers, nprobe = 1,
      queryVecCol = "embedding").transform(hot).head()
    assert(r.getAs[Long]("n_items") == 40L)
    assert(r.getAs[Long]("n_probes") == 10L)
    assert(r.getAs[Long]("candidates") == 300L) // = 10 × |list 0|
    assert(r.getAs[Long]("max_probed_count") == 30L) // heaviest PROBED list
    assert(r.getAs[Long]("uniform_count") == 20L)
    assert(r.getAs[Long]("uniform_candidates") == 200L)
    assert(r.getAs[Long]("cost_bp") == 15000L) // 1.5× uniform
    // a full probe (nprobe = nlist) costs exactly uniform by construction
    val full = IvfProbeCost(items, centers, nprobe = 2,
      queryVecCol = "embedding").transform(hot).head()
    assert(full.getAs[Long]("candidates") == 400L &&
      full.getAs[Long]("cost_bp") == 10000L &&
      full.getAs[Long]("max_probed_count") == 30L)
    // a workload probing ONLY the light list: volume low AND the heavy
    // list never enters max_probed_count (probed, not global — the
    // over-trigger distinction the tier decision relies on)
    val cold = (1L to 5L).map(i => (i, Seq(0.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val light = IvfProbeCost(items, centers, nprobe = 1,
      queryVecCol = "embedding").transform(cold).head()
    assert(light.getAs[Long]("max_probed_count") == 10L,
      s"global heavy list must not leak into the probed max: $light")
    // the LSH twin emits the same shape over sign buckets
    val mu = Seq(0.0, 0.0)
    val l = LshProbeCost(items, mu, numBits = 2, nprobe = 2,
      queryVecCol = "embedding").transform(hot).head()
    assert(l.getAs[Long]("n_items") == 40L && l.getAs[Long]("n_buckets") == 4L &&
      l.getAs[Long]("n_probes") == 20L)
    assert(l.getAs[Long]("candidates") >= 0L && l.getAs[Long]("cost_bp") >= 0L &&
      l.getAs[Long]("max_probed_count") >= 0L)
  }

  test("IvfSkewReport: list occupancy over fixed centroids, lowest-cid tie-break") {
    // two centroids; 30 items near c0, 10 near c1 → counts (30, 10)
    val items = ((1L to 30L).map(i => (i, Seq(1.0f, 0.0f))) ++
      (31L to 40L).map(i => (i, Seq(0.0f, 5.0f)))).toDF("item_id", "embedding")
    val centers = Seq(Seq(1.0, 0.0), Seq(0.0, 5.0))
    val r = IvfSkewReport(centers).transform(items).head()
    assert(r.getLong(0) == 40L) // n_items
    assert(r.getLong(1) == 2L)  // n_buckets = nlist
    assert(r.getLong(2) == 2L)  // n_occupied
    assert(r.getLong(3) == 30L) // max_count
    assert(r.getLong(4) == 20L) // uniform_count
    assert(r.getLong(5) == 15000L) // skew_bp = 30*10000/20
  }
}
