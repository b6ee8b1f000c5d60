package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column tags carried in `StructField.metadata` — the Spark-native home
  * for the reference's `merlin.schema.Tags` + column properties
  * (SURVEY.md §1.2). The reference selects model inputs by tag
  * (cats/conts, /root/reference/merlin/systems/workflow/base.py:50-51) and
  * reads `embedding_sizes` properties off categorical columns
  * (/root/reference/merlin/systems/workflow/__init__.py:18-65); here the
  * same facts ride the schema itself, so they survive every select/join
  * and persist into parquet footers for free.
  */
object Tags {
  /** Metadata key holding the string-array of tags. */
  val Key = "graft.tags"
  /** Properties (reference `embedding_sizes`): dictionary cardinality and
    * suggested embedding dimension, attached to categorical columns. */
  val CardinalityKey = "graft.cardinality"
  val DimensionKey = "graft.dimension"

  val Categorical = "categorical"
  val Continuous = "continuous"
  val Embedding = "embedding"
  val Id = "id"
  val Target = "target"
  val Text = "text"

  /** Tags of a field (empty when untagged). */
  def of(f: StructField): Set[String] =
    if (f.metadata.contains(Key)) f.metadata.getStringArray(Key).toSet
    else Set.empty

  /** Metadata carrying `tags` (+ optional long properties), merged over
    * `existing` so repeated tagging accumulates rather than clobbers. */
  def metadataFor(tags: Seq[String], existing: Metadata = Metadata.empty,
      props: Map[String, Long] = Map.empty): Metadata = {
    val prior =
      if (existing.contains(Key)) existing.getStringArray(Key).toSeq else Seq.empty
    val b = new MetadataBuilder().withMetadata(existing)
    b.putStringArray(Key, (prior ++ tags).distinct.toArray)
    props.foreach { case (k, v) => b.putLong(k, v) }
    b.build()
  }

  /** Re-alias selected columns of a frame with extra tags; other columns
    * pass through untouched (tags propagate through select/join because
    * they live on the output attribute). */
  def tag(df: DataFrame, colTags: (String, Seq[String])*): DataFrame = {
    val m = colTags.toMap
    df.select(df.schema.map { f =>
      m.get(f.name) match {
        case Some(ts) => col(f.name).as(f.name, metadataFor(ts, f.metadata))
        case None => col(f.name)
      }
    }: _*)
  }

  /** Apply `metadataFor` to schema declarations (transformSchema twin). */
  def tagSchema(in: StructType, colTags: (String, Seq[String])*): StructType = {
    val m = colTags.toMap
    StructType(in.map { f =>
      m.get(f.name) match {
        case Some(ts) => f.copy(metadata = metadataFor(ts, f.metadata))
        case None => f
      }
    })
  }

  /** Columns carrying ANY of `tags` (reference
    * `schema.select_by_tag(Tags.CATEGORICAL)`). */
  def columnsByTag(schema: StructType, tags: String*): Seq[String] = {
    val want = tags.toSet
    schema.filter(f => of(f).intersect(want).nonEmpty).map(_.name).toSeq
  }

  def selectByTag(df: DataFrame, tags: String*): DataFrame = {
    val cols = columnsByTag(df.schema, tags: _*)
    require(cols.nonEmpty,
      s"no columns tagged [${tags.mkString(",")}] in ${df.schema.simpleString}")
    df.select(cols.map(col): _*)
  }

  /** (cardinality, dimension) of a tagged categorical/embedding column —
    * the reference's `get_embedding_sizes` per-column entry. */
  def embeddingSize(f: StructField): Option[(Long, Long)] =
    if (f.metadata.contains(CardinalityKey)) {
      val card = f.metadata.getLong(CardinalityKey)
      val dim =
        if (f.metadata.contains(DimensionKey)) f.metadata.getLong(DimensionKey)
        else defaultDim(card)
      Some((card, dim))
    } else None

  /** NVTabular's published heuristic dim ≈ 5·card^0.25, clamped to 512. */
  def defaultDim(cardinality: Long): Long =
    math.min(512L, math.max(8L, (5.0 * math.pow(cardinality.toDouble, 0.25)).round))

  /** Default tags implied by a column's type — how the reference's feature
    * fetch labels returned columns (numeric → continuous, string →
    * categorical, vector → embedding). */
  def forType(dt: org.apache.spark.sql.types.DataType): Seq[String] = dt match {
    case _: org.apache.spark.sql.types.NumericType => Seq(Continuous)
    case org.apache.spark.sql.types.StringType => Seq(Categorical)
    case org.apache.spark.sql.types.ArrayType(_: org.apache.spark.sql.types.NumericType, _) =>
      Seq(Embedding)
    case _ => Seq.empty
  }
}
