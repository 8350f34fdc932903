package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{ExtensionQueries, ParityQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the full batch pipeline
    * (ingest → group-by-subfolder → mock enrich) over the documents table;
    * driver smoke-checks rows>0 (one result row per group).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.BatchJob.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ PipelineQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ PipelineQueries.oracleSql ++ ExtensionQueries.oracleSql
}
