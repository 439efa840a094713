package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per-area under graft.queries.*; this object
  * just merges the registries.
  */
object SparkEntry {

  /** Full registry: name → (spark impl, optional DuckDB oracle SQL). */
  def all: Map[String, QueryDef] =
    queries_registry

  private lazy val queries_registry: Map[String, QueryDef] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.ValidationQueries.defs ++
      graft.queries.Scd2Queries.defs ++
      graft.queries.MdmQueries.defs ++
      graft.queries.LlmQueries.defs ++
      graft.queries.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("daily_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
