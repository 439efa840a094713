package graft.queries

import graft.QueryDef
import graft.operators.Scd2
import graft.operators.Scd2.Config
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD2 merge semantics verified against a DuckDB twin that computes
  * the expected post-merge state from first principles (SURVEY.md §2.3
  * J6/J9, §3.4).
  *
  * Deterministic scenario built from the supplier table:
  *   t0: initial load of all suppliers.
  *   t1 batch: suppliers with key % 10 == 0 get acctbal+100 (changed),
  *             suppliers with key < 5 reappear as new keys key+1000
  *             (new), everything else arrives unchanged (hash
  *             short-circuit must no-op them).
  */
object Scd2Queries {

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")

  val conf: Config = Config(
    keyCols = Seq("s_suppkey"),
    businessCols = Seq("s_name", "s_nationkey", "bal"),
    dedupeOrder = Seq("s_name"))

  /** supplier projected to SCD business shape; acctbal pre-cast to
    * decimal so the record hash renders identically across engines.
    */
  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "supplier").select(
      col("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal").cast("decimal(18,2)").as("bal"))

  private def incoming(s: SparkSession, dir: String): DataFrame = {
    val b = base(s, dir)
    val modified = b.withColumn("bal",
      when(col("s_suppkey") % 10 === 0,
        (col("bal") + 100).cast("decimal(18,2)")).otherwise(col("bal")))
    val fresh = b.filter(col("s_suppkey") < 5).select(
      (col("s_suppkey") + 1000).as("s_suppkey"),
      concat(col("s_name"), lit(" NEW")).as("s_name"),
      col("s_nationkey"), col("bal"))
    modified.unionByName(fresh)
  }

  def merged(s: SparkSession, dir: String): DataFrame = {
    val target = Scd2.initialLoad(base(s, dir), conf, t0)
    Scd2.merge(target, incoming(s, dir), conf, t1)
  }

  private val hashedBaseSql =
    """WITH b AS (
      |  SELECT s_suppkey, s_name, s_nationkey,
      |         CAST(s_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM supplier),
      |hb AS (
      |  SELECT *, sha256(concat_ws('||',
      |      coalesce(CAST(s_name AS VARCHAR), ''),
      |      coalesce(CAST(s_nationkey AS VARCHAR), ''),
      |      coalesce(CAST(bal AS VARCHAR), ''))) AS h
      |  FROM b),
      |hm AS (
      |  SELECT s_suppkey, s_name, s_nationkey,
      |         CAST(bal + 100 AS DECIMAL(18,2)) AS bal,
      |         sha256(concat_ws('||',
      |      coalesce(CAST(s_name AS VARCHAR), ''),
      |      coalesce(CAST(s_nationkey AS VARCHAR), ''),
      |      coalesce(CAST(CAST(bal + 100 AS DECIMAL(18,2)) AS VARCHAR), ''))) AS h
      |  FROM b WHERE s_suppkey % 10 = 0)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // ───── the merge itself: full post-merge table state
    "scd2_merge" -> QueryDef.sql(
      (s, dir) =>
        merged(s, dir).select(
          col("s_suppkey"), col("s_name"), col("version_no"), col("is_current"),
          col("effective_start_ts"), col("effective_end_ts"), col("record_hash")),
      s"""$hashedBaseSql
         |SELECT s_suppkey, s_name, version_no, is_current,
         |       effective_start_ts, effective_end_ts, record_hash
         |FROM (
         |  -- original rows: changed keys expired at t1, others still open
         |  SELECT s_suppkey, s_name, CAST(1 AS INTEGER) AS version_no,
         |         (s_suppkey % 10 <> 0) AS is_current,
         |         TIMESTAMP '2024-01-01 00:00:00' AS effective_start_ts,
         |         CASE WHEN s_suppkey % 10 = 0 THEN TIMESTAMP '2024-02-01 00:00:00'
         |              ELSE TIMESTAMP '9999-12-31 00:00:00' END AS effective_end_ts,
         |         h AS record_hash
         |  FROM hb
         |  UNION ALL
         |  -- changed keys: new current version 2
         |  SELECT s_suppkey, s_name, CAST(2 AS INTEGER), TRUE,
         |         TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '9999-12-31 00:00:00', h
         |  FROM hm
         |  UNION ALL
         |  -- brand-new keys: version 1 at t1
         |  SELECT s_suppkey + 1000, s_name || ' NEW', CAST(1 AS INTEGER), TRUE,
         |         TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '9999-12-31 00:00:00',
         |         sha256(concat_ws('||',
         |           coalesce(CAST(s_name || ' NEW' AS VARCHAR), ''),
         |           coalesce(CAST(s_nationkey AS VARCHAR), ''),
         |           coalesce(CAST(bal AS VARCHAR), '')))
         |  FROM b WHERE s_suppkey < 5
         |)""".stripMargin),

    // ───── S5 time travel: table state between t0 and t1 — every
    // original key active at version 1, new keys invisible
    "scd2_asof" -> QueryDef.sql(
      (s, dir) =>
        Scd2.asOf(merged(s, dir), java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
          .select(col("s_suppkey"), col("s_name"), col("version_no")),
      """SELECT s_suppkey, s_name, CAST(1 AS INTEGER) AS version_no
        |FROM supplier""".stripMargin),

    // ───── SCD invariants over the merged table (ref
    // verify_delta_vendors_job.py:57-65): zero violations expected,
    // computed by Spark, asserted by the oracle
    "scd2_invariants" -> QueryDef.sql(
      (s, dir) => Scd2.invariants(merged(s, dir), conf),
      """SELECT 'single_current_per_key' AS rule,
        |       CAST(0 AS BIGINT) AS violations, TRUE AS passed
        |UNION ALL
        |SELECT 'contiguous_versions', CAST(0 AS BIGINT), TRUE""".stripMargin),

    // ───── table-level version audit (ref DeltaOP/delta_audit_update
    // .py: initial load, then a compliance overwrite creates a NEW
    // VERSION; delta_audit_read.py reads DESCRIBE HISTORY). The query
    // REALLY writes both versions to a versioned store and returns
    // the history the store reads back — counts are this run's data.
    "delta_audit_history" -> QueryDef.sql(
      (s, dir) => {
        import graft.sources.VersionedTable
        val base = java.nio.file.Files.createTempDirectory("graft_vt_").toString
        val supp = Tables.table(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_acctbal")
        VersionedTable.write(supp, base, "initial_load", t0)
        // compliance rule: remove non-positive balances (ref
        // delta_audit_update.py:18 fare_amount > 0)
        VersionedTable.write(supp.filter(col("s_acctbal") > 0), base,
          "compliance_filter", t1)
        VersionedTable.history(s, base)
      },
      """SELECT CAST(1 AS INTEGER) AS version, 'initial_load' AS operation,
        |  (SELECT COUNT(*) FROM supplier) AS record_count,
        |  TIMESTAMP '2024-01-01 00:00:00' AS run_timestamp
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), 'compliance_filter',
        |  (SELECT COUNT(*) FROM supplier WHERE s_acctbal > 0),
        |  TIMESTAMP '2024-02-01 00:00:00'""".stripMargin)
  )
}
