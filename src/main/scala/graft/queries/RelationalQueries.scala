package graft.queries

import graft.QueryDef
import graft.functions.Functions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.2-§2.8) mapped onto
  * the TPC-H-ish testdata. Each query is the Spark-first rendition of
  * a reference operator; the oracle twin is ANSI SQL for DuckDB.
  *
  * Determinism discipline (SURVEY.md §7.5): double aggregates go
  * through exact decimal sums (`exactSum`) so Spark's parallel
  * aggregation and DuckDB's serial one produce bit-identical doubles.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  val defs: Map[String, QueryDef] = Map(

    // ───────── flagship: daily revenue (A3; daily_vendor_revenue.sql:29-53)
    // scan → filter → group-agg; partial (map-side) aggregation + AQE
    // handle scale: shuffle only carries (suppkey, day) partials.
    "daily_revenue" -> QueryDef.sql(
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_extendedprice") > 0)
          .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("ship_date"))
          .agg(
            exactSum(col("l_extendedprice")).as("total_revenue"),
            count(lit(1)).as("trip_count"))
      },
      """SELECT l_suppkey,
        |       CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS total_revenue,
        |       COUNT(*) AS trip_count
        |FROM lineitem
        |WHERE l_extendedprice > 0
        |GROUP BY 1, 2""".stripMargin)
  )
}
