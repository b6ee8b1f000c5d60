package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Categorify, EmbeddingLookup, QueryFeatureStore, SelectByTag, StandardScale}

/** Schema tags in StructField.metadata — the reference's `merlin.schema.Tags`
  * + `select_by_tag` + `get_embedding_sizes` surface
  * (/root/reference/merlin/systems/workflow/base.py:50-51,
  * workflow/__init__.py:18-65). */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users = Seq(
    (1L, "gold", 31, Array(0.1, 0.2)),
    (2L, "silver", 45, Array(0.3, 0.4)),
    (3L, "gold", 22, Array(0.5, 0.6))
  ).toDF("user_id", "tier", "age", "profile_vec")

  test("tag/selectByTag round-trip and accumulation") {
    val tagged = Tags.tag(users,
      "tier" -> Seq(Tags.Categorical),
      "age" -> Seq(Tags.Continuous))
    assert(Tags.of(tagged.schema("tier")) == Set(Tags.Categorical))
    // re-tagging accumulates, not clobbers
    val twice = Tags.tag(tagged, "tier" -> Seq(Tags.Id))
    assert(Tags.of(twice.schema("tier")) == Set(Tags.Categorical, Tags.Id))
    assert(Tags.columnsByTag(tagged.schema, Tags.Categorical) == Seq("tier"))
    assert(Tags.selectByTag(tagged, Tags.Categorical, Tags.Continuous)
      .columns.toSeq == Seq("tier", "age"))
  }

  test("tags survive select, filter and join") {
    val tagged = Tags.tag(users, "age" -> Seq(Tags.Continuous))
    val other = Seq((1L, "US"), (2L, "DE")).toDF("user_id", "country")
    val out = tagged.filter($"age" > 25).join(other, Seq("user_id"))
      .select($"age", $"country")
    assert(Tags.of(out.schema("age")) == Set(Tags.Continuous))
  }

  test("QueryFeatureStore tags fetched features by dtype") {
    val req = Seq(Tuple1(1L), Tuple1(2L)).toDF("user_id")
    val out = QueryFeatureStore(users, "user_id", includeId = true).transform(req)
    assert(Tags.of(out.schema("tier")) == Set(Tags.Categorical))
    assert(Tags.of(out.schema("age")) == Set(Tags.Continuous))
    assert(Tags.of(out.schema("profile_vec")) == Set(Tags.Embedding))
    // declared schema agrees with the runtime frame
    val declared = QueryFeatureStore(users, "user_id", includeId = true)
      .transformSchema(req.schema)
    assert(Tags.columnsByTag(declared, Tags.Embedding) == Seq("profile_vec"))
  }

  test("Categorify tags codes categorical and reports embedding sizes") {
    val cat = Categorify(Seq("tier"))
    val out = cat.transform(users)
    assert(Tags.of(out.schema("tier_idx")) == Set(Tags.Categorical))
    assert(Tags.of(cat.transformSchema(users.schema)("tier_idx")) == Set(Tags.Categorical))

    val sizes = cat.embeddingSizes(users)
    assert(sizes("tier_idx")._1 == 2L) // gold, silver
    assert(sizes("tier_idx")._2 == Tags.defaultDim(2L))

    val withSizes = cat.transformWithSizes(users)
    val f = withSizes.schema("tier_idx")
    assert(Tags.embeddingSize(f).contains((2L, Tags.defaultDim(2L))))
  }

  test("StandardScale and EmbeddingLookup tag their outputs") {
    val out = StandardScale(Seq("age")).transform(users)
    assert(Tags.of(out.schema("age_scaled")) == Set(Tags.Continuous))

    val embs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val looked = EmbeddingLookup(embs, "user_id").transform(users.select($"user_id"))
    assert(Tags.of(looked.schema("embedding")) == Set(Tags.Embedding))
  }

  test("SelectByTag as a graph op with schema propagation") {
    val ens = Ensemble(Seq(
      Categorify(Seq("tier")),
      StandardScale(Seq("age")),
      SelectByTag(Seq(Tags.Categorical, Tags.Continuous), keep = Seq("user_id"))
    ), users.schema)
    // declared output: keep ++ tagged (tier is StringType → untagged here;
    // age numeric columns tagged via op outputs only)
    val out = ens.transform(users)
    assert(out.columns.toSet == Set("user_id", "tier_idx", "age_scaled"))
    assert(ens.outputSchema.fieldNames.toSet == Set("user_id", "tier_idx", "age_scaled"))
  }

  test("tags survive parquet and ensemble persistence") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tags").toString
    Tags.tag(users, "age" -> Seq(Tags.Continuous)).write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val back = spark.read.parquet(s"$dir/t.parquet")
    assert(Tags.of(back.schema("age")) == Set(Tags.Continuous))

    val ens = Ensemble(Seq(SelectByTag(Seq(Tags.Continuous))),
      Tags.tagSchema(users.schema, "age" -> Seq(Tags.Continuous)))
    EnsemblePersistence.save(ens, s"$dir/ens", spark)
    val loaded = EnsemblePersistence.load(s"$dir/ens", spark)
    assert(loaded.outputSchema.fieldNames.toSeq == Seq("age"))
    assert(loaded.transform(Tags.tag(users, "age" -> Seq(Tags.Continuous)))
      .columns.toSeq == Seq("age"))
  }

  test("defaultDim heuristic bounds") {
    assert(Tags.defaultDim(2) == 8)
    assert(Tags.defaultDim(10000) == 50)
    assert(Tags.defaultDim(100000000000L) >= 512)
  }
}
