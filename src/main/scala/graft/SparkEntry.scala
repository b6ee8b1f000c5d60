package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The canonical 4-stage recommender DAG (FIXTURES.md F10). */
  def entry(spark: SparkSession): DataFrame =
    Flagship.recommend(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.OpQueries.queries ++
      graft.queries.CurationQueries.queries ++ graft.queries.MlQueries.queries ++
      graft.queries.StorageQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.OpQueries.oracle ++
      graft.queries.CurationQueries.oracle ++ graft.queries.MlQueries.oracle ++
      graft.queries.StorageQueries.oracle ++
      graft.queries.OpQueries.pcaOracle ++ // dump-time: fitted literals
      graft.queries.OpQueries.ivfOracle ++
      graft.queries.OpQueries.refitOracle ++
      graft.queries.OpQueries.pqOracle ++
      graft.queries.OpQueries.sqOracle ++
      graft.queries.OpQueries.lshOracle ++
      graft.queries.MlQueries.dynamicOracle ++
      graft.queries.CurationQueries.semanticOracle ++
      graft.queries.CurationQueries.cosLshOracle ++
      graft.queries.CurationQueries.qcOracle ++
      graft.queries.CurationQueries.bpeOracle ++
      graft.queries.CurationQueries.sketchOracle ++
      graft.queries.CurationQueries.cosRecallOracle ++
      graft.queries.CurationQueries.tfRecallOracle ++
      graft.queries.CurationQueries.semProbeOracle ++
      graft.queries.OpQueries.recallOracle
}
