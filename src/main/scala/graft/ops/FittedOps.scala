package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Ensemble, EnsembleOp, Tags}

/** Fit-once / serve-many for the fitted feature-engineering ops — the
  * reference's actual TransformWorkflow contract (merlin/systems/dag/ops/
  * workflow.py:24-116 serves a PRE-fitted NVTabular workflow; fitting
  * happens offline, never per request batch). Our fitted ops historically
  * folded the fit into `transform` — correct, but every serve re-paid the
  * fit's eager driver jobs (Categorify's dictionary rank + size gate,
  * TargetEncoding's prior + gate, FillMissing's percentile), and a chain
  * of k fitted ops re-planned and re-scanned the upstream frame O(k)
  * times per pass. At 100 TB that is k full input scans a serving pass
  * must never pay; on the bench host it made the FE pipeline rows pure
  * driver/job-overhead measurements (round-14 adjudication, SCALE.md).
  *
  * [[FittableOp.fit]] runs the fit ONCE and returns a bound twin whose
  * `transform` builds a single lazy plan — zero eager jobs, fitted
  * statistics carried as literals (scalar fits) or stable dictionary
  * frames (table fits). With `artifactDir` set, dictionary frames are
  * written to parquet and served from the files (the prewarmAlsFactors
  * offline-artifact discipline: no live cached state for inter-query
  * cache clearing to evict; on a cluster, pass shared storage). The
  * broadcast-vs-shuffle side decision is ALSO resolved at fit time — the
  * size gate's measurement job belongs to the fit, not the serve.
  */
trait FittableOp extends EnsembleOp {
  /** Fit this op's statistics over `df`, returning a bound op whose
    * `transform` schedules no eager jobs and produces bit-identical
    * output to the unfitted `transform(df)`. */
  def fit(df: DataFrame, artifactDir: Option[String] = None): EnsembleOp
}

private[ops] object FittedState {
  /** Stabilize a fitted dictionary frame: parquet round-trip under the
    * artifact dir when given (survives cache clearing, shareable across
    * executors on real storage), else as-is (lazy recompute — still
    * eager-job-free at serve). */
  def stabilize(dict: DataFrame, artifactDir: Option[String],
      name: String): DataFrame = artifactDir match {
    case Some(dir) =>
      val path = s"$dir/$name"
      dict.write.mode("overwrite").parquet(path)
      dict.sparkSession.read.parquet(path)
    case None => dict
  }

  /** Fit-time side decision for a dictionary join: measure the payload
    * once (one dictionary-scale job) and remember whether it fits the
    * broadcast budget. */
  def broadcastDecision(grp: DataFrame, keyCol: String, valueBytes: Long,
      budget: Long): Boolean = {
    val payload = grp.schema(keyCol).dataType match {
      case StringType | BinaryType => avg(octet_length(col(keyCol).cast("string")))
      case dt => avg(lit(dt.defaultSize.toDouble))
    }
    val row = grp.agg(count(lit(1)).as("n"), payload.as("b")).head()
    val bytes = row.getLong(0) *
      (valueBytes + (if (row.isNullAt(1)) 8L else row.getDouble(1).toLong))
    bytes <= budget
  }

  def side(dict: DataFrame, broadcastIt: Boolean): DataFrame =
    if (broadcastIt) broadcast(dict) else dict.hint("shuffle_hash")
}

/** [[Categorify]] bound to its fitted frequency dictionaries: join-only
  * serving, side decision prefixed at fit time. */
case class CategorifyBound(cols: Seq[String], suffix: String,
    dicts: Map[String, (DataFrame, Boolean)]) extends EnsembleOp {
  override def name: String = "Categorify(bound)"

  override def transformSchema(in: StructType): StructType = {
    cols.foreach(requireCol(in, _))
    StructType(in ++ cols.map(c => StructField(c + suffix, IntegerType,
      metadata = Tags.metadataFor(Seq(Tags.Categorical)))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val encoded = cols.foldLeft(df) { (d, c) =>
      val (dict, bc) = dicts(c)
      d.join(FittedState.side(dict, bc), Seq(c), "left")
        .withColumn(c + suffix, coalesce(col(c + suffix), lit(-1)))
    }
    Tags.tag(encoded, cols.map(c => (c + suffix) -> Seq(Tags.Categorical)): _*)
  }
}

/** [[TargetEncoding]] bound to its fitted prior + per-column group
  * statistics. The encoding expression is IDENTICAL to the unfitted
  * op's (same double math, same LOO branches) — only the statistics'
  * provenance changes. */
case class TargetEncodingBound(catCols: Seq[String], targetCol: String,
    smoothing: Double, leaveOneOut: Boolean, suffix: String,
    prior: Double, integral: Boolean,
    dicts: Map[String, (DataFrame, Boolean)]) extends EnsembleOp {
  override def name: String = "TargetEncoding(bound)"

  override def transformSchema(in: StructType): StructType = {
    catCols.foreach(requireCol(in, _))
    requireCol(in, targetCol)
    StructType(in ++ catCols.map(c => StructField(c + suffix, DoubleType,
      metadata = Tags.metadataFor(Seq(Tags.Continuous)))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val y = if (integral) col(targetCol) else col(targetCol).cast("double")
    catCols.foldLeft(df) { (d, c) =>
      val (dict, bc) = dicts(c)
      val joined = d.join(FittedState.side(dict, bc), Seq(c), "left")
      val s = coalesce(col(s"__te_s_$c").cast("double"), lit(0.0))
      val n = coalesce(col(s"__te_n_$c").cast("double"), lit(0.0))
      val enc =
        if (leaveOneOut)
          when(col(c).isNull, lit(prior))
            .when(y.isNull && n > 0.0,
              (s + lit(prior) * lit(smoothing)) / (n + lit(smoothing)))
            .when(n <= 1.0, lit(prior))
            .otherwise(
              (s - y.cast("double") + lit(prior) * lit(smoothing)) /
                (n - lit(1.0) + lit(smoothing)))
        else
          when(col(c).isNull, lit(prior)).otherwise(
            (s + lit(prior) * lit(smoothing)) / (n + lit(smoothing)))
      Tags.tag(
        joined.withColumn(c + suffix, enc).drop(s"__te_s_$c", s"__te_n_$c"),
        (c + suffix) -> Seq(Tags.Continuous))
    }
  }
}

/** [[JoinGroupby]] bound to its fitted per-key statistics table. */
case class JoinGroupbyBound(keyCol: String, outFields: Seq[StructField],
    dict: DataFrame, broadcastIt: Boolean) extends EnsembleOp {
  override def name: String = "JoinGroupby(bound)"

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, keyCol)
    outFields.foreach(f => require(!in.fieldNames.contains(f.name),
      s"$name: output column '${f.name}' collides with the input schema"))
    StructType(in ++ outFields)
  }

  override def transform(df: DataFrame): DataFrame =
    df.join(FittedState.side(dict, broadcastIt), Seq(keyCol), "left")
}

/** [[FillMissing]] bound to its fitted medians (constants were never a
  * fit). Fill expressions identical to the unfitted op's. */
case class FillMissingBound(constants: Map[String, Any],
    medians: Map[String, Double], medianCols: Seq[String], suffix: String)
    extends EnsembleOp {
  override def name: String = "FillMissing(bound)"

  override def transformSchema(in: StructType): StructType = {
    (constants.keys ++ medianCols).foreach(requireCol(in, _))
    StructType(in ++
      (constants.keys.toSeq.sorted ++ medianCols).map { c =>
        val t = if (medianCols.contains(c)) DoubleType else in(c).dataType
        StructField(c + suffix, t, nullable = false)
      })
  }

  override def transform(df: DataFrame): DataFrame = {
    val constFilled = constants.keys.toSeq.sorted.foldLeft(df) { (d, c) =>
      d.withColumn(c + suffix,
        coalesce(col(c), lit(constants(c)).cast(df.schema(c).dataType)))
    }
    medianCols.foldLeft(constFilled) { (d, c) =>
      d.withColumn(c + suffix, coalesce(col(c).cast("double"), lit(medians(c))))
    }
  }
}

/** [[StandardScale]] bound to its fitted moments: a pure literal
  * projection — the broadcast stats row (and its aggregate subtree)
  * leaves the serving plan entirely. The double math is unchanged:
  * mean/std here are the SAME doubles the unfitted op derives from its
  * exact integer sums, so scaled outputs stay bit-identical. */
case class StandardScaleBound(cols: Seq[String], suffix: String,
    moments: Map[String, (Double, Double)]) extends EnsembleOp {
  override def name: String = "StandardScale(bound)"

  override def transformSchema(in: StructType): StructType = {
    cols.foreach(requireCol(in, _))
    StructType(in ++ cols.map(c => StructField(c + suffix, DoubleType,
      metadata = Tags.metadataFor(Seq(Tags.Continuous)))))
  }

  override def transform(df: DataFrame): DataFrame = {
    val scaled = cols.foldLeft(df) { (d, c) =>
      val (mean, std) = moments(c)
      d.withColumn(c + suffix,
        (col(c) - lit(mean)) / lit(if (std == 0) 1.0 else std))
    }
    Tags.tag(scaled, cols.map(c => (c + suffix) -> Seq(Tags.Continuous)): _*)
  }
}

/** Fit helpers shared by the ops' `fit` implementations and
  * [[graft.core.Ensemble]]-level fitting. */
object FittedOps {
  /** Fit every fittable stage of a linear chain, threading each bound
    * op's transform into the next fit — the NVTabular `workflow.fit`
    * analog. Returns an ensemble of bound ops serving with ZERO eager
    * jobs. `artifactDir` scopes per-op parquet artifacts (`op<i>_...`).
    *
    * The input frame is persisted for the duration of the fit (each
    * fitted stage aggregates over its input once; without the persist a
    * chain of k fits re-scans the raw input O(k) times — the difference
    * between k passes and one cached scan at 100 TB is the fit's whole
    * cost). */
  def fitEnsemble(ens: Ensemble, df: DataFrame,
      artifactDir: Option[String] = None): Ensemble = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cur: DataFrame = cached
      val bound = ens.ops.zipWithIndex.map { case (op, i) =>
        val b = op match {
          case f: FittableOp => f.fit(cur, artifactDir.map(d => s"$d/op$i"))
          case e: Ensemble => fitEnsemble(e, cur, artifactDir.map(d => s"$d/op$i"))
          case o => o
        }
        cur = b.transform(cur)
        b
      }
      Ensemble(bound, ens.inputSchema)
    } finally cached.unpersist()
  }
}
