package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.core.Ensemble
import graft.functions.VectorFunctions
import graft.ops._

/** The canonical 4-stage recommender pipeline (reference README.md:59-103,
  * FIXTURES.md F10) re-expressed Spark-first over the driver testdata:
  *
  *   interactions (orders⋈lineitem) ──ALS──▶ user/item factor tables
  *   requests ─▶ user features ─▶ user vector ─▶ top-k retrieval (ANN
  *   analog) ─▶ filter seen items ─▶ item features + user-feature unroll
  *   ─▶ ranking score ─▶ softmax sampling ─▶ (ordered_ids, ordered_scores)
  *
  * Every stage is one of our EnsembleOps; the whole flow is a single lazy
  * plan per stage group, shuffling only at the ALS fit, the retrieval
  * groupBy and the final per-user collect.
  */
object Flagship {

  def recommend(spark: SparkSession, d: String, retrievalK: Int = 100,
      finalK: Int = 10): DataFrame = {
    // stage 0: implicit-feedback ALS on purchase strength
    val interactions = orders(spark, d)
      .join(lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .agg(sum("l_quantity").cast("float").as("strength"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // feeds ALS fit + seen-set
    val als = PredictImplicit.train(interactions, "user", "item", "strength",
      maxIter = 3)

    val userVecs = als.userFactors.select(col("id").as("user_id"),
      col("features").as("user_vec"))
    val itemVecs = als.itemFactors.select(col("id").as("item_id"),
      col("features").as("embedding"))

    // per-user already-seen items (the FilterCandidates dependency input)
    val seen = interactions.groupBy(col("user").cast("long").as("user_id"))
      .agg(sort_array(collect_set(col("item").cast("long"))).as("seen_ids"))

    // stage 1: requests = all users, with profile features attached
    val requests = customer(spark, d)
      .select(col("c_custkey").cast("long").as("user_id"),
        col("c_mktsegment"), col("c_acctbal"))
    val withVec = Ensemble(Seq(
      QueryFeatureStore(userVecs, "user_id", Seq("user_vec"), includeId = true)),
      requests.schema).transform(requests)
      .filter(col("user_vec").isNotNull) // cold users have no factors

    // stage 2: top-k retrieval against the item-factor "index" via LSH
    // buckets (the 100 TB path: candidates per user ≈ items/2^bits ×
    // nprobe, not |items| — brute force here would score |users|·|items|
    // pairs, which already times out at sf0.1). Bucket bits scale with the
    // catalog so buckets average ~64 items at any scale factor.
    val nItems = itemVecs.count()
    val numBits = math.max(4, math.min(12,
      (math.log(math.max(1L, nItems / 64).toDouble) / math.log(2)).round.toInt))
    val retrieved = AnnLsh(itemVecs, "user_id", "user_vec",
      k = retrievalK, numBits = numBits, nprobe = 4, metric = "dot").transform(withVec)

    // stage 3: drop seen items, re-attach profile, rank by dot score
    val filtered = Ensemble(Seq(
      QueryFeatureStore(seen, "user_id", Seq("seen_ids"), includeId = true),
      FilterCandidates("candidate_ids", "seen_ids"),
      ExplodeCandidates("filtered_ids", "item_id")),
      retrieved.drop("candidate_scores").schema)
      .transform(retrieved.drop("candidate_scores"))

    val ranked = Ensemble(Seq(
      QueryFeatureStore(itemVecs, "item_id", Seq("embedding"), includeId = true),
      QueryFeatureStore(userVecs, "user_id", Seq("user_vec"), includeId = true),
      UnrollFeatures(requests, Seq("c_mktsegment"), on = "user_id")),
      filtered.schema).transform(filtered)
      .withColumn("rank_score",
        VectorFunctions.dot(col("user_vec"), col("embedding")))

    // stage 4: per-user candidate arrays → seeded softmax sampling
    val perUser = ranked.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("item_id"), col("rank_score")))).as("ps"))
      .select(col("user_id").as("requestId"),
        expr("transform(ps, p -> p.item_id)").as("candidate_ids"),
        expr("transform(ps, p -> p.rank_score)").as("relevance"))
    SoftmaxSampling("candidate_ids", "relevance", temperature = 20.0,
      topk = finalK).transform(perUser)
      .withColumnRenamed("requestId", "user_id")
      .orderBy("user_id")
  }
}
