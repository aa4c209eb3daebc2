package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{FunctionQueries, OpsQueries, PipelineQueries, RelationalQueries}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's canonical usage (test_metaframe.py:119):
    * pk-inferring groupBy + revenue aggregation, through the MetaFrame layer. */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables.loadMeta(spark, "/root/testdata/sf0.001", "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .df
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RelationalQueries.flagshipQueries ++
      FunctionQueries.queries ++ PipelineQueries.queries ++ OpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ RelationalQueries.flagshipOracleSql ++
      FunctionQueries.oracleSql ++ PipelineQueries.oracleSql ++ OpsQueries.oracleSql
}
