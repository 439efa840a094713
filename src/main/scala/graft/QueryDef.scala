package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus an
  * optional ANSI-SQL twin the driver runs in DuckDB over the same
  * parquet tables. `oracle = None` → the driver records a weaker
  * rows-only check (used for ops whose semantics aren't
  * SQL-expressible, e.g. minhash-LSH with Spark-specific hashing).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(fn: (SparkSession, String) => DataFrame, oracleSql: String): QueryDef =
    QueryDef(fn, Some(oracleSql))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
