package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 (operator registry) and §3 (lifecycle).
  * `queries` keys mirror SURVEY.md §2 IDs; every oracle-checkable query has a
  * DuckDB-dialect twin in `oracleSql` with identical output column names.
  */
object SparkEntry {

  /** Flagship query on sf0.001 (driver smoke-checks rows > 0): the TPC-H-Q1
    * style pricing summary — scan, filter, partial+final hash agg, sort. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.agg_pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ops.Relational.queries ++ ops.Windows.queries ++ ops.Scalars.queries ++
      ops.Streaming.queries ++ ops.Llm.queries ++ ops.Sources.queries ++
      ops.Table.queries ++ ops.Graph.queries ++ ops.Quality.queries).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB 1.0 on the
    * same parquet tables. Omitted for non-SQL-expressible ops (sketches,
    * engine-specific hashes) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    (ops.Relational.oracle ++ ops.Windows.oracle ++ ops.Scalars.oracle ++
      ops.Streaming.oracle ++ ops.Llm.oracle ++ ops.Sources.oracle ++
      ops.Table.oracle ++ ops.Graph.oracle ++ ops.Quality.oracle).toMap
}
