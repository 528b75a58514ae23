package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2): relational core
  * (RelQueries), the tgres DSL function library (TsQueries), and the
  * training-data pipeline operators (PipelineQueries). `oracleSql` maps
  * each to equivalent DuckDB SQL; queries without an entry get the
  * driver's weaker rows-only check (non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.queries("q04_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelQueries.queries ++ TsQueries.queries ++ PipelineQueries.queries ++
      RrdQueries.queries ++ DslQueries.queries ++ HwQueries.queries ++
      StatsdQueries.queries ++ SimQueries.queries ++ MultimodalQueries.queries ++
      IngestQueries.queries ++ FetchQueries.queries ++ EvQueries.queries

  def oracleSql: Map[String, String] =
    RelQueries.oracles ++ TsQueries.oracles ++ PipelineQueries.oracles ++
      RrdQueries.oracles ++ DslQueries.oracles ++ StatsdQueries.oracles ++
      SimQueries.oracles ++ MultimodalQueries.oracles ++ IngestQueries.oracles ++
      FetchQueries.oracles ++ HwQueries.oracles ++ EvQueries.oracles
}
