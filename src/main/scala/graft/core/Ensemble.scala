package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** A schema-propagating pipeline stage: `DataFrame in → DataFrame out`.
  *
  * Mirrors the reference operator protocol (merlin BaseOperator:
  * `compute_output_schema` / `validate_schemas` / `transform` — see
  * /root/reference/merlin/systems/dag/ops/session_filter.py:54-162) with the
  * Spark-native simplification that the logical plan IS the DAG: ops declare
  * column expressions and Catalyst handles pruning, pushdown and codegen.
  */
trait EnsembleOp extends Serializable {
  def name: String = getClass.getSimpleName.stripSuffix("$")

  /** Validate `in` and return the schema `transform` will produce.
    * Throws IllegalArgumentException on arity/type errors (the analog of the
    * reference failing fast in `Graph.construct_schema`, ensemble.py:47-48).
    */
  def transformSchema(in: StructType): StructType

  def transform(df: DataFrame): DataFrame

  protected def requireCol(in: StructType, c: String): Int = {
    require(in.fieldNames.contains(c), s"$name: missing required column '$c' in ${in.simpleString}")
    in.fieldIndex(c)
  }
}

/** A validated linear chain of [[EnsembleOp]]s (the reference `Ensemble`,
  * /root/reference/merlin/systems/dag/ensemble.py:29-78).
  *
  * Schema propagation happens eagerly at construction over the declared
  * input schema; execution stays fully lazy (one Catalyst plan end-to-end,
  * so whole-stage codegen fuses ops instead of materializing per-op tables).
  * Branching DAGs compose naturally as plain DataFrames fed into two-input
  * ops (joins); this class models the common linear spine.
  */
case class Ensemble(ops: Seq[EnsembleOp], inputSchema: StructType)
    extends EnsembleOp {
  /** Per-stage schemas; schemas(i) is the input of ops(i). */
  val schemas: Seq[StructType] =
    ops.scanLeft(inputSchema)((s, op) => op.transformSchema(s))

  def outputSchema: StructType = schemas.last

  /** An Ensemble is itself an op, so whole pipelines embed as named
    * subgraphs inside larger ones (the reference's subgraph support,
    * tests/unit/systems/ops/tf/test_ensemble.py:234-285). */
  override def transformSchema(in: StructType): StructType = {
    val missing = inputSchema.fieldNames.filterNot(in.fieldNames.contains)
    require(missing.isEmpty, s"Ensemble input missing columns: ${missing.mkString(",")}")
    ops.foldLeft(in)((s, op) => op.transformSchema(s))
  }

  def transform(df: DataFrame): DataFrame = {
    transformSchema(df.schema) // revalidate against the actual frame
    ops.foldLeft(df)((d, op) => op.transform(d))
  }
}
