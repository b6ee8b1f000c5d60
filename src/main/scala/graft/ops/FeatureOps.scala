package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{EnsembleOp, Tags}

/** Shared broadcast-vs-shuffle gate for fitted dictionary joins (the
  * PredictImplicit/NegativeSampling size-gate discipline): per-key
  * payloads are MEASURED for string/binary keys (a flat defaultSize
  * estimate would let 15M × 400-byte keys through a 1 GiB budget) and
  * cardinality comes from an HLL sketch — gate-grade estimates folded
  * into the op's single eager fit job, so the expensive exact groupBy
  * runs once, lazily, inside the join. */
private[ops] object SizeGate {
  /** Aggregate columns measuring one key column: (approx cardinality,
    * mean payload bytes). */
  def measures(df: DataFrame, c: String): Seq[Column] = {
    val payload = df.schema(c).dataType match {
      case StringType | BinaryType => avg(octet_length(col(c).cast("string")))
      case dt => avg(lit(dt.defaultSize.toDouble))
    }
    Seq(approx_count_distinct(col(c)).as(s"__sg_k_$c"), payload.as(s"__sg_b_$c"))
  }

  /** Estimated broadcast bytes for `keys` dictionary rows carrying
    * `valueBytes` of statistics each, given the measured key payload. */
  def estBytes(row: org.apache.spark.sql.Row, c: String, valueBytes: Long): Long = {
    val keys = row.getAs[Long](s"__sg_k_$c")
    val keyBytes = row.getAs[Any](s"__sg_b_$c") match {
      case null => 8L
      case d: Double => d.toLong
      case other => other.toString.toDouble.toLong
    }
    keys * (keyBytes + valueBytes)
  }

  /** Broadcast under the budget; hinted shuffle-hash above it (never a
    * planner re-broadcast, never a sort-merge of the fact table). */
  def side(grp: DataFrame, bytes: Long, budget: Long): DataFrame =
    if (bytes <= budget) broadcast(grp) else grp.hint("shuffle_hash")

  /** Measure an already-FITTED dictionary frame directly (one count +
    * mean-key-payload job at dictionary scale — exact, not sketched) and
    * pick its join side; `valueBytes` = the per-key statistics payload.
    * The one gate every fitted-dictionary join routes through
    * (TargetEncoding, JoinGroupby, Categorify) — one estimate to fix,
    * not three drifting copies. */
  def gateGrouped(grp: DataFrame, keyCol: String, valueBytes: Long,
      budget: Long): DataFrame = {
    val payload = grp.schema(keyCol).dataType match {
      case StringType | BinaryType => avg(octet_length(col(keyCol).cast("string")))
      case dt => avg(lit(dt.defaultSize.toDouble))
    }
    val row = grp.agg(count(lit(1)).as("n"), payload.as("b")).head()
    val bytes = row.getLong(0) *
      (valueBytes + (if (row.isNullAt(1)) 8L else row.getDouble(1).toLong))
    side(grp, bytes, budget)
  }
}

/** Smoothed target (mean) encoding of categorical columns — the
  * TargetEncoding stage of the reference's fitted feature-engineering
  * workflow (`TransformWorkflow`, /root/reference/merlin/systems/dag/ops/
  * workflow.py:24-116 serves fitted NVTabular workflows, whose op set
  * includes TargetEncoding alongside the Categorify/Bucketize/scaling
  * stages already covered).
  *
  * Encoding: `te(v) = (sum_y(v) + prior * smoothing) / (n(v) + smoothing)`
  * where `prior = mean(y)` over the fit data — the standard empirical-
  * Bayes shrinkage (Micci-Barreca, SIGKDD Explorations 2001). With
  * `leaveOneOut=true` each TRAINING row is excluded from its own group
  * statistic (`(sum_y(v) - y_i + prior*smoothing) / (n(v) - 1 + smoothing)`)
  * so the feature never contains the row's own label — the within-fit
  * leakage guard NVTabular implements via kfold; LOO is its exact
  * k=n limit and needs no fold bookkeeping.
  *
  * Scale: the fit is one partial-aggregated groupBy per column at
  * DICTIONARY (distinct-value) scale plus a single 1-row global aggregate;
  * encodings join back broadcast (dictionaries are tiny vs the data) or,
  * above `broadcastBudgetBytes` of estimated dictionary payload, as a
  * shuffle-hash equi-join on the category key — the fact table is never
  * shuffled in the broadcast regime. Integral targets aggregate as exact
  * long sums, so the fitted statistics (and hence the encoded doubles)
  * are bit-deterministic across engines and partitionings.
  *
  * Null categories get the prior (an unseen-value fallback, matching
  * Categorify's unseen → -1 stance but in mean space); null targets are
  * excluded from the fit sums (count counts only non-null y).
  */
case class TargetEncoding(
    catCols: Seq[String],
    targetCol: String,
    smoothing: Double = 20.0,
    leaveOneOut: Boolean = false,
    suffix: String = "_te",
    broadcastBudgetBytes: Long = 1L << 30) extends FittableOp {

  require(catCols.nonEmpty, s"$name: at least one categorical column required")
  require(smoothing >= 0, s"$name: smoothing must be >= 0, got $smoothing")

  override def transformSchema(in: StructType): StructType = {
    catCols.foreach(requireCol(in, _))
    requireCol(in, targetCol)
    require(in(targetCol).dataType.isInstanceOf[NumericType],
      s"$name: target '$targetCol' must be numeric, got ${in(targetCol).dataType.sql}")
    catCols.foreach(c => require(!in.fieldNames.contains(c + suffix),
      s"$name: output column '${c + suffix}' collides with the input schema"))
    StructType(in ++ catCols.map(c => StructField(c + suffix, DoubleType,
      metadata = Tags.metadataFor(Seq(Tags.Continuous)))))
  }

  /** Whether the target sums stay exact (long) vs double partials. */
  private def integral(df: DataFrame): Boolean = df.schema(targetCol).dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def transform(df: DataFrame): DataFrame = {
    val y = if (integral(df)) col(targetCol) else col(targetCol).cast("double")
    // one 1-row job for the prior; exact integer sums for integral targets
    val totRow = df.agg(sum(y).as("s"), count(y).as("n")).head()
    require(totRow.getLong(1) > 0, s"$name: no non-null target values to fit on")
    val prior =
      if (integral(df)) totRow.getLong(0).toDouble / totRow.getLong(1)
      else totRow.getDouble(0) / totRow.getLong(1)
    catCols.foldLeft(df) { (d, c) =>
      val grp = df.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(sum(y).as(s"__te_s_$c"), count(y).as(s"__te_n_$c"))
      val dict = dictSide(grp, c)
      val joined = d.join(dict, Seq(c), "left")
      val s = coalesce(col(s"__te_s_$c").cast("double"), lit(0.0))
      val n = coalesce(col(s"__te_n_$c").cast("double"), lit(0.0))
      val enc =
        if (leaveOneOut)
          // the row's own label leaves its group statistic; groups of one
          // collapse to the prior (n-1+smoothing keeps the denominator
          // positive for smoothing > 0, and the when-guard covers s=0).
          // An UNLABELED row (null target) contributed nothing to s/n —
          // there is nothing to leave out, so it gets the full smoothed
          // group statistic (blind subtraction would null its encoding)
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

  /** Broadcast the per-value statistics when the measured dictionary
    * payload fits the budget; shuffle-hash join otherwise (a 1B-key
    * id column would kill a driver broadcast — the PredictImplicit /
    * NegativeSampling size-gate discipline). */
  private def dictSide(grp: DataFrame, c: String): DataFrame =
    SizeGate.gateGrouped(grp, c, valueBytes = 16L, broadcastBudgetBytes)

  /** Fit prior + per-column group statistics once → join-only bound
    * serving with the prior as a literal. */
  override def fit(df: DataFrame, artifactDir: Option[String] = None): EnsembleOp = {
    val intg = integral(df)
    val y = if (intg) col(targetCol) else col(targetCol).cast("double")
    val totRow = df.agg(sum(y).as("s"), count(y).as("n")).head()
    require(totRow.getLong(1) > 0, s"$name: no non-null target values to fit on")
    val prior =
      if (intg) totRow.getLong(0).toDouble / totRow.getLong(1)
      else totRow.getDouble(0) / totRow.getLong(1)
    val dicts = catCols.map { c =>
      val grp = df.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(sum(y).as(s"__te_s_$c"), count(y).as(s"__te_n_$c"))
      val dict = FittedState.stabilize(grp, artifactDir, s"te_$c")
      c -> (dict, FittedState.broadcastDecision(dict, c, valueBytes = 16L,
        broadcastBudgetBytes))
    }.toMap
    TargetEncodingBound(catCols, targetCol, smoothing, leaveOneOut, suffix,
      prior, intg, dicts)
  }
}

/** Per-group statistics joined back as features — NVTabular's
  * `JoinGroupby` inside the reference's served workflows (workflow.py:
  * 24-116): for each key value, compute `count/sum/mean/min/max` of the
  * value columns over the fit data and attach them to every row with that
  * key. Output columns are named `<key>_<value>_<stat>` (count is
  * `<key>_count`, once).
  *
  * Scale: identical shape to [[TargetEncoding]] — partial-agged groupBy at
  * dictionary scale, broadcast back under the budget, shuffle-hash above.
  * Long inputs keep exact long sums; mean is declared double.
  */
case class JoinGroupby(
    keyCol: String,
    valueCols: Seq[String],
    stats: Seq[String] = Seq("count", "sum", "mean"),
    broadcastBudgetBytes: Long = 1L << 30) extends FittableOp {

  private val allowed = Set("count", "sum", "mean", "min", "max")
  require(valueCols.nonEmpty, s"$name: at least one value column required")
  require(stats.nonEmpty && stats.forall(allowed), s"$name: stats must be " +
    s"among ${allowed.mkString(",")}, got ${stats.mkString(",")}")
  require(stats.distinct == stats, s"$name: duplicate stats")

  private def outCols(in: StructType): Seq[StructField] = {
    val perValue = valueCols.flatMap { v =>
      val vt = in(v).dataType
      val sumT = vt match {
        case ByteType | ShortType | IntegerType | LongType => LongType
        case FloatType | DoubleType => DoubleType
        case d: DecimalType => DecimalType(math.min(38, d.precision + 10), d.scale)
        case other => other
      }
      stats.filterNot(_ == "count").map {
        case "sum" => StructField(s"${keyCol}_${v}_sum", sumT)
        case "mean" => StructField(s"${keyCol}_${v}_mean", DoubleType)
        case st => StructField(s"${keyCol}_${v}_$st", vt)
      }
    }
    val cnt = if (stats.contains("count"))
      Seq(StructField(s"${keyCol}_count", LongType)) else Seq.empty
    cnt ++ perValue
  }

  override def transformSchema(in: StructType): StructType = {
    requireCol(in, keyCol)
    valueCols.foreach { v =>
      requireCol(in, v)
      require(in(v).dataType.isInstanceOf[NumericType],
        s"$name: value column '$v' must be numeric, got ${in(v).dataType.sql}")
    }
    outCols(in).foreach(f => require(!in.fieldNames.contains(f.name),
      s"$name: output column '${f.name}' collides with the input schema"))
    StructType(in ++ outCols(in))
  }

  /** The fitted per-key statistics frame (lazy). */
  private def grouped(df: DataFrame): DataFrame = {
    val aggs: Seq[Column] = {
      val perValue = valueCols.flatMap { v =>
        // integral means derive from the EXACT long sum (one double
        // division at the end): summing per-row double casts is
        // accumulation-order-dependent past 2^53, which would break the
        // op's own exact-long-sums determinism claim cross-engine
        val meanNum = df.schema(v).dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            sum(col(v)).cast("double")
          case _ => sum(col(v).cast("double"))
        }
        // integral sums accumulate in DECIMAL(38,0) and fail LOUDLY if
        // the total leaves BIGINT range — at 100 TB a per-key int sum
        // can pass 2^63, where the native long sum wraps silently under
        // non-ANSI mode (the StandardScale lesson); output stays BIGINT
        val sumCol = df.schema(v).dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            val s = sum(col(v).cast("decimal(38,0)"))
            when(s > lit(Long.MaxValue) || s < lit(Long.MinValue),
              raise_error(lit(s"$name: sum($v) overflows BIGINT — " +
                "keep the DECIMAL stat instead")))
              .otherwise(s.cast("long"))
          case _ => sum(col(v))
        }
        stats.filterNot(_ == "count").map {
          case "sum" => sumCol.as(s"${keyCol}_${v}_sum")
          case "mean" => (meanNum / count(col(v)))
            .as(s"${keyCol}_${v}_mean")
          case "min" => min(col(v)).as(s"${keyCol}_${v}_min")
          case "max" => max(col(v)).as(s"${keyCol}_${v}_max")
        }
      }
      val cnt = if (stats.contains("count"))
        Seq(count(lit(1)).as(s"${keyCol}_count")) else Seq.empty
      cnt ++ perValue
    }
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  private def statWidth: Int =
    stats.count(_ != "count") * valueCols.length + (if (stats.contains("count")) 1 else 0)

  override def transform(df: DataFrame): DataFrame = {
    val side = SizeGate.gateGrouped(grouped(df), keyCol,
      valueBytes = 8L * statWidth, broadcastBudgetBytes)
    df.join(side, Seq(keyCol), "left")
  }

  /** Fit the per-key statistics once → join-only bound serving. */
  override def fit(df: DataFrame, artifactDir: Option[String] = None): EnsembleOp = {
    val dict = FittedState.stabilize(grouped(df), artifactDir,
      s"joingroupby_$keyCol")
    JoinGroupbyBound(keyCol, outCols(df.schema), dict,
      FittedState.broadcastDecision(dict, keyCol, valueBytes = 8L * statWidth,
        broadcastBudgetBytes))
  }
}

/** Hashing-trick categorical bucketing — NVTabular's `HashBucket` stage
  * (served through the reference's TransformWorkflow like Categorify):
  * `bucket = md5(value ":" salt)[0,8) mod numBuckets`. Unlike Categorify
  * there is no fitted dictionary at all — the encoding is stateless and
  * identical on any engine, which is exactly why the hashing trick is the
  * 100 TB default for ultra-high-cardinality ids: zero fit job, zero
  * dictionary broadcast, row-local and codegen'd.
  *
  * md5 (not xxhash64/murmur) so the DuckDB oracle mirrors the exact
  * bucket: `('0x' || substring(md5(v || ':' || salt),1,8))::BIGINT % n`.
  * Null values → bucket -1 (nulls are "unseen", Categorify parity).
  */
case class HashBucket(
    cols: Seq[String],
    numBuckets: Int,
    salt: String = "graft-hash",
    suffix: String = "_hb") extends EnsembleOp {

  require(cols.nonEmpty, s"$name: at least one column required")
  require(numBuckets >= 1, s"$name: numBuckets must be >= 1, got $numBuckets")

  private def meta = Tags.metadataFor(Seq(Tags.Categorical),
    props = Map(Tags.CardinalityKey -> numBuckets.toLong))

  override def transformSchema(in: StructType): StructType = {
    cols.foreach(requireCol(in, _))
    cols.foreach(c => require(!in.fieldNames.contains(c + suffix),
      s"$name: output column '${c + suffix}' collides with the input schema"))
    StructType(in ++ cols.map(c =>
      StructField(c + suffix, IntegerType, metadata = meta)))
  }

  override def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val bucket = (conv(substring(md5(
        concat(col(c).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
        .cast("long") % numBuckets).cast("int")
      d.withColumn(c + suffix,
        when(col(c).isNull, -1).otherwise(bucket).as(c + suffix, meta))
    }
}

/** Null imputation — NVTabular's `FillMissing` / `FillMedian` stages.
  * Constant fills are row-local; median fills fit `percentile(c, 0.5)`
  * (linear interpolation, the same definition as DuckDB's
  * `quantile_cont`) in ONE aggregate job for all fitted columns, then
  * apply row-locally. At 100 TB the exact percentile is a sort-based
  * aggregate of the single column — swap `approxMedian=true` to fit
  * `percentile_approx` (a fixed-size sketch, one pass, no sort) when the
  * fit data is the full corpus rather than a sample.
  */
case class FillMissing(
    constants: Map[String, Any] = Map.empty,
    medianCols: Seq[String] = Seq.empty,
    approxMedian: Boolean = false,
    suffix: String = "_filled") extends FittableOp {

  require(constants.nonEmpty || medianCols.nonEmpty,
    s"$name: nothing to fill — give constants and/or medianCols")
  require(constants.keySet.intersect(medianCols.toSet).isEmpty,
    s"$name: a column cannot have both a constant and a median fill")

  private def outT(in: StructType, c: String): DataType = in(c).dataType match {
    case t if medianCols.contains(c) => t match {
      case _: NumericType => DoubleType // percentile returns double
      case other => other
    }
    case t => t
  }

  override def transformSchema(in: StructType): StructType = {
    (constants.keys ++ medianCols).foreach(requireCol(in, _))
    // the declared output type is the INPUT column's; a constant whose
    // literal type would widen the coalesce (double const on an int
    // column) must be rejected here, not silently truncated by the
    // runtime cast below or silently widened against this declaration
    constants.foreach { case (c, v) =>
      val litT = org.apache.spark.sql.catalyst.expressions.Literal(v).dataType
      val colT = in(c).dataType
      require(org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findTightestCommonType(litT, colT).contains(colT),
        s"$name: constant for '$c' has type ${litT.sql}, which does not " +
          s"fit ${colT.sql} losslessly")
    }
    medianCols.foreach(c => require(in(c).dataType.isInstanceOf[NumericType],
      s"$name: median fill needs a numeric column, '$c' is ${in(c).dataType.sql}"))
    (constants.keys ++ medianCols).foreach(c =>
      require(!in.fieldNames.contains(c + suffix),
        s"$name: output column '${c + suffix}' collides with the input schema"))
    StructType(in ++
      (constants.keys.toSeq.sorted ++ medianCols).map(c =>
        StructField(c + suffix, outT(in, c), nullable = false)))
  }

  private def fitMedians(df: DataFrame): Map[String, Double] =
    if (medianCols.isEmpty) Map.empty
    else {
      val aggs = medianCols.map { c =>
        if (approxMedian) percentile_approx(col(c).cast("double"), lit(0.5), lit(10000)).as(c)
        else percentile(col(c).cast("double"), lit(0.5)).as(c)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      medianCols.zipWithIndex.map { case (c, i) =>
        require(!row.isNullAt(i), s"$name: column '$c' is entirely null — no median to fit")
        c -> row.getDouble(i)
      }.toMap
    }

  /** Fit the medians once → a literal-fill bound op. */
  override def fit(df: DataFrame, artifactDir: Option[String] = None): EnsembleOp =
    FillMissingBound(constants, fitMedians(df), medianCols, suffix)

  override def transform(df: DataFrame): DataFrame = {
    val medians = fitMedians(df)
    val constFilled = constants.keys.toSeq.sorted.foldLeft(df) { (d, c) =>
      // cast the (schema-validated lossless) literal to the column type
      // so the runtime type equals transformSchema's declaration
      d.withColumn(c + suffix,
        coalesce(col(c), lit(constants(c)).cast(df.schema(c).dataType)))
    }
    medianCols.foldLeft(constFilled) { (d, c) =>
      d.withColumn(c + suffix, coalesce(col(c).cast("double"), lit(medians(c))))
    }
  }
}

/** Range clamping — NVTabular's `Clip` stage. Row-local, codegen'd;
  * nulls pass through (clip does not impute — compose with
  * [[FillMissing]] for that). */
case class Clip(
    bounds: Map[String, (Option[Double], Option[Double])],
    suffix: String = "_clip") extends EnsembleOp {

  require(bounds.nonEmpty, s"$name: at least one column required")
  bounds.foreach { case (c, (lo, hi)) =>
    require(lo.nonEmpty || hi.nonEmpty, s"$name: '$c' has neither bound")
    for (l <- lo; h <- hi) require(l <= h, s"$name: '$c' min $l > max $h")
  }

  override def transformSchema(in: StructType): StructType = {
    bounds.keys.foreach { c =>
      requireCol(in, c)
      require(in(c).dataType.isInstanceOf[NumericType],
        s"$name: '$c' must be numeric, got ${in(c).dataType.sql}")
      require(!in.fieldNames.contains(c + suffix),
        s"$name: output column '${c + suffix}' collides with the input schema")
    }
    StructType(in ++ bounds.keys.toSeq.sorted.map(c =>
      StructField(c + suffix, DoubleType,
        metadata = Tags.metadataFor(Seq(Tags.Continuous)))))
  }

  override def transform(df: DataFrame): DataFrame =
    bounds.keys.toSeq.sorted.foldLeft(df) { (d, c) =>
      val x = col(c).cast("double")
      val (lo, hi) = bounds(c)
      val clipped = (lo, hi) match {
        case (Some(l), Some(h)) => least(greatest(x, lit(l)), lit(h))
        case (Some(l), None) => greatest(x, lit(l))
        case (None, Some(h)) => least(x, lit(h))
        case _ => x
      }
      // greatest/least SKIP nulls (SQL semantics), so a null input would
      // silently clip to the bound — impute explicitly via FillMissing
      d.withColumn(c + suffix, when(x.isNull, lit(null)).otherwise(clipped))
    }
}

/** Log transform — NVTabular's `LogOp` stage: `ln(x + 1)` (written
  * exactly so, not `log1p`, because the oracle mirrors `ln(x + 1)` and
  * the two differ in double math near zero). Negative inputs (x <= -1)
  * produce null, matching SQL's ln-of-nonpositive. Row-local. */
case class LogTransform(cols: Seq[String], suffix: String = "_log") extends EnsembleOp {

  require(cols.nonEmpty, s"$name: at least one column required")

  override def transformSchema(in: StructType): StructType = {
    cols.foreach { c =>
      requireCol(in, c)
      require(in(c).dataType.isInstanceOf[NumericType],
        s"$name: '$c' must be numeric, got ${in(c).dataType.sql}")
      require(!in.fieldNames.contains(c + suffix),
        s"$name: output column '${c + suffix}' collides with the input schema")
    }
    StructType(in ++ cols.map(c => StructField(c + suffix, DoubleType,
      metadata = Tags.metadataFor(Seq(Tags.Continuous)))))
  }

  override def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c + suffix, log(col(c).cast("double") + lit(1.0))))
}

/** Python-slice semantics over list columns — NVTabular's `ListSlice`
  * dataloader stage: keep `[start, end)` of each array, negative indices
  * counting from the end, out-of-range clamped (never an error).
  * Row-local `slice` arithmetic over `size(a)` — shuffle-free.
  *
  * An `end` of None means "to the end of the list" (python `a[start:]`).
  */
case class ListSlice(
    cols: Seq[String],
    start: Int,
    end: Option[Int] = None,
    suffix: String = "_slice") extends EnsembleOp {

  require(cols.nonEmpty, s"$name: at least one column required")

  override def transformSchema(in: StructType): StructType = {
    cols.foreach { c =>
      requireCol(in, c)
      require(in(c).dataType.isInstanceOf[ArrayType],
        s"$name: '$c' must be an array column, got ${in(c).dataType.sql}")
      require(!in.fieldNames.contains(c + suffix),
        s"$name: output column '${c + suffix}' collides with the input schema")
    }
    StructType(in ++ cols.map(c => in(c).copy(name = c + suffix)))
  }

  override def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val n = size(col(c))
      // python index -> clamped 0-based offset in [0, n]
      def clamp(i: Int): Column =
        if (i >= 0) least(lit(i), n)
        else greatest(n + lit(i), lit(0))
      val from = clamp(start)
      val until = end.map(clamp).getOrElse(n)
      val len = greatest(until - from, lit(0))
      // slice is 1-based; a 0 length yields the empty array
      d.withColumn(c + suffix,
        when(col(c).isNull, lit(null))
          .otherwise(slice(col(c), from + lit(1), len)))
    }
}

/** Feature-drift report — the monitoring face of the serving lifecycle:
  * compare a CURRENT snapshot's numeric feature distributions against a
  * fitted BASELINE and flag features whose distribution moved. The
  * histogram uses FIXED splits (the [[Bucketize]] discipline, with a
  * dedicated null bucket), and the distance is the L1 distance between
  * the two bucket-share vectors in integer basis points
  * (`Σ|share_base − share_cur|`, range 0–20000) — every number is BIGINT
  * arithmetic, so the report is bit-deterministic cross-engine. (PSI,
  * the usual industry score, needs `ln`, which is not bit-portable; L1
  * ranks drift the same way and is exact.)
  *
  * Scale shape: one scan per side per feature with map-side-combined
  * bucket counts; everything after the counts operates on bucket-count
  * frames (≤ splits+2 rows), so the shuffled volume is the number of
  * buckets, independent of data size. Features are independent branches
  * unioned at the end — at 100 TB the scans dominate and parallelize
  * freely; no global sort, no window, no driver collect.
  */
case class DriftReport(
    baseline: DataFrame,
    splits: Map[String, Seq[Double]],
    thresholdBp: Long = 1000L) extends EnsembleOp {

  require(splits.nonEmpty, s"$name: at least one feature required")
  require(splits.values.forall(sp => sp.nonEmpty && sp == sp.sorted),
    s"$name: every feature needs ascending, non-empty splits")
  require(thresholdBp >= 0, s"$name: thresholdBp must be >= 0")

  override def transformSchema(in: StructType): StructType = {
    splits.keys.foreach { c =>
      requireCol(in, c)
      require(in(c).dataType.isInstanceOf[NumericType],
        s"$name: '$c' must be numeric, got ${in(c).dataType.sql}")
      require(baseline.schema.fieldNames.contains(c),
        s"$name: '$c' missing in baseline frame")
    }
    StructType(Seq(
      StructField("feature", StringType, nullable = false),
      StructField("n_base", LongType, nullable = false),
      StructField("n_cur", LongType, nullable = false),
      StructField("l1_bp", LongType, nullable = false),
      StructField("drifted", BooleanType, nullable = false)))
  }

  override def transform(df: DataFrame): DataFrame = {
    val perFeature = splits.toSeq.sortBy(_._1).map { case (c, sp) =>
      // bucket = count of splits <= value; nulls get their own bucket −1
      def counts(frame: DataFrame, cnt: String): DataFrame = frame.select(
        DriftReport.bucketOf(col(c), sp).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as(cnt))
      val joined = counts(baseline, "__nb")
        .join(counts(df, "__nc"), Seq("__b"), "full_outer")
        .select(coalesce(col("__nb"), lit(0L)).as("__nb"),
          coalesce(col("__nc"), lit(0L)).as("__nc"))
      val tot = joined.agg(sum("__nb").as("__tb"), sum("__nc").as("__tc"))
      val shareB = when(col("__tb") > 0, expr("__nb * 10000 DIV __tb")).otherwise(0L)
      val shareC = when(col("__tc") > 0, expr("__nc * 10000 DIV __tc")).otherwise(0L)
      joined.crossJoin(tot) // tot is one row; the "cross" is a broadcast of 2 longs
        .agg(max("__tb").as("n_base"), max("__tc").as("n_cur"),
          sum(abs(shareB - shareC)).as("l1_bp"))
        .select(lit(c).as("feature"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"),
          coalesce(col("l1_bp"), lit(0L)).as("l1_bp"),
          (coalesce(col("l1_bp"), lit(0L)) >= thresholdBp).as("drifted"))
    }
    perFeature.reduce(_ unionByName _)
  }
}

object DriftReport {
  /** The ONE bucket definition (count of splits ≤ value, −1 for null),
    * shared by the batch op and the streaming twin so the two can never
    * disagree on which bucket a value lands in. */
  def bucketOf(c: Column, sp: Seq[Double]): Column =
    when(c.isNull, lit(-1)).otherwise(
      sp.foldLeft(lit(0))((acc, s) => acc + when(c >= s, 1).otherwise(0)))

  /** Fit the baseline bucket counts once (offline, metadata scale —
    * splits+2 longs per feature) for the streaming twin's literal
    * comparison side. */
  def fitCounts(frame: DataFrame, c: String, sp: Seq[Double]): Map[Int, Long] =
    frame.select(bucketOf(col(c), sp).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
}
