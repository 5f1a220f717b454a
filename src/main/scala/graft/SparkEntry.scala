package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2.B registers here: a
  * `queries` entry (Spark impl) and, when SQL-expressible, a matching
  * `oracleSql` entry (DuckDB). Column names are aliased identically on
  * both sides — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregations.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Scans.queries ++
      operators.Filters.queries ++
      operators.Joins.queries ++
      operators.Graph.queries ++
      operators.Aggregations.queries ++
      operators.SetOps.queries ++
      operators.Windows.queries ++
      operators.Scalars.queries ++
      operators.TimeSeries.queries ++
      operators.LlmDedup.queries ++
      operators.LlmVector.queries ++
      operators.LlmText.queries ++
      operators.Multimodal.queries ++
      operators.Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Scans.oracle ++
      operators.Filters.oracle ++
      operators.Joins.oracle ++
      operators.Graph.oracle ++
      operators.Aggregations.oracle ++
      operators.SetOps.oracle ++
      operators.Windows.oracle ++
      operators.Scalars.oracle ++
      operators.TimeSeries.oracle ++
      operators.LlmDedup.oracle ++
      operators.LlmVector.oracle ++
      operators.LlmText.oracle ++
      operators.Multimodal.oracle ++
      operators.Sources.oracle
}
