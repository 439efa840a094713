package graft.queries

import graft.QueryDef
import graft.operators.Mdm
import graft.operators.Mdm.EntitySchema
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MDM fuzzy-dedup queries over the customer table as the vendor-
  * master analog (FIXTURES.md §6): id=c_custkey, name=c_name,
  * address=c_mktsegment, blocking on (c_nationkey, c_mktsegment).
  * The DuckDB twins re-derive token_sort_ratio from the same formula
  * (levenshtein over sorted normalized tokens — SURVEY.md §2.8).
  *
  * Every downstream query (steward queue, golden records, activity,
  * scorecard) is registered THREE times: the unsuffixed default on
  * ADAPTIVE blocking (coarse block, hot blocks re-blocked on the fine
  * suffix key — bounded compute per block at any scale), a `_coarse`
  * evidence twin on the plain (nation, segment) block (recall-maximal,
  * output-quadratic by semantics), and a `_fine` twin on the
  * (nation, segment, name-suffix) block. The block schema is a
  * semantic parameter — cross-block pairs are never considered — so
  * the fine variants carry their own oracles rather than being an
  * optimization of the coarse ones. The fine block's pair space is
  * ~10× smaller (measured 4.7s vs 21.1s at 10× for the pair query);
  * the adaptive default degrades to it only inside oversized blocks.
  */
object MdmQueries {

  val schema: EntitySchema =
    EntitySchema("id", "name", "address", Seq("block_nation", "block_seg"))

  /** Fine blocking adds a character from the name's VARYING region
    * (the trailing digit — the standard fuzzy-match "blocking key"
    * move, picking whatever field slice actually discriminates; the
    * name PREFIX is constant on this fixture and would refine
    * nothing). Cuts the pair-space constant ~10×.
    */
  val fineSchema: EntitySchema =
    schema.copy(blockCols = schema.blockCols :+ "block_suffix")

  private def entities(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "customer").select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_mktsegment").as("address"),
      col("c_nationkey").as("block_nation"),
      col("c_mktsegment").as("block_seg"))

  private[graft] def entitiesFine(s: SparkSession, dir: String): DataFrame =
    entities(s, dir).withColumn("block_suffix",
      substring(graft.functions.Functions.normalizeText(col("name")), -1, 1))

  // Hot path goes through the skew guard: blocks above
  // Mdm.DefaultMaxBlockSize are excluded from the pair join (not
  // binding at test SFs — blocks are ~12 entities at sf0.01 — so the
  // oracle is unchanged; at scale it stops one hot block owning the
  // stage).
  private def scored(s: SparkSession, dir: String): DataFrame =
    Mdm.scorePairs(Mdm.candidatePairsCapped(entities(s, dir), schema))

  private def scoredFine(s: SparkSession, dir: String): DataFrame =
    Mdm.scorePairs(Mdm.candidatePairsCapped(entitiesFine(s, dir), fineSchema))

  /** Pair stream for the coarse AGGREGATE queries (activity,
    * scorecard): adaptive blocking — coarse blocks up to
    * `Mdm.AggregateMaxBlockSize` pair directly, oversized ones
    * re-block on the fine suffix key. Identical to the plain coarse
    * stream wherever the cap doesn't bind (all correctness SFs:
    * blocks are ~12 entities at sf0.01, ~120 at sf0.1, cap 1000), so
    * the coarse oracles hold; at 10×+ the hot blocks pay the fine key
    * instead of a compute-quadratic pair space that feeds a 9-row
    * aggregate.
    */
  private def scoredAdaptive(s: SparkSession, dir: String): DataFrame =
    Mdm.scorePairs(Mdm.candidatePairsAdaptive(
      entitiesFine(s, dir), schema, fineSchema))

  /** Shared oracle prelude, parameterized on the block key: entities
    * with pre-computed token-sorted normalized name/address, blocked
    * pair join, scores. `fine = true` adds the name-suffix block
    * column to the entity CTE and the join condition.
    */
  private def scoredPrelude(fine: Boolean): String = {
    val biSelect =
      if (fine)
        """
          |         right(trim(regexp_replace(regexp_replace(
          |           lower(c_name), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')), 1) AS bi,""".stripMargin
      else ""
    val biJoin = if (fine) " AND a.bi = b.bi" else ""
    s"""WITH e AS (
      |  SELECT c_custkey AS id, c_name AS name, c_mktsegment AS address,
      |         c_nationkey AS bn, c_mktsegment AS bs,$biSelect
      |         array_to_string(list_sort(string_split(trim(regexp_replace(regexp_replace(
      |           lower(c_name), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')), ' ') AS tname,
      |         array_to_string(list_sort(string_split(trim(regexp_replace(regexp_replace(
      |           lower(c_mktsegment), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')), ' ') AS taddr
      |  FROM customer),
      |p AS (
      |  SELECT a.id AS id_1, b.id AS id_2, a.name AS name_1, b.name AS name_2,
      |         a.address AS address_1, b.address AS address_2,
      |         a.tname AS tn1, b.tname AS tn2, a.taddr AS ta1, b.taddr AS ta2
      |  FROM e a JOIN e b ON a.bn = b.bn AND a.bs = b.bs$biJoin AND a.id < b.id),
      |sc AS (
      |  SELECT id_1, id_2, name_1, name_2, address_1, address_2,
      |    CASE WHEN greatest(length(tn1), length(tn2)) = 0 THEN 100.0
      |         ELSE round((1 - CAST(levenshtein(tn1, tn2) AS DOUBLE)
      |                       / CAST(greatest(length(tn1), length(tn2)) AS DOUBLE)) * 100, 1)
      |    END AS name_score,
      |    CASE WHEN greatest(length(ta1), length(ta2)) = 0 THEN 100.0
      |         ELSE round((1 - CAST(levenshtein(ta1, ta2) AS DOUBLE)
      |                       / CAST(greatest(length(ta1), length(ta2)) AS DOUBLE)) * 100, 1)
      |    END AS address_score
      |  FROM p),
      |s2 AS (
      |  SELECT *, round(0.7 * name_score + 0.3 * address_score, 2) AS final_score FROM sc),
      |s3 AS (
      |  SELECT *,
      |    CASE WHEN final_score >= 95 THEN 'HIGH'
      |         WHEN final_score >= 80 THEN 'MEDIUM' ELSE 'LOW' END AS confidence_bucket
      |  FROM s2),
      |s4 AS (
      |  SELECT *,
      |    CASE WHEN confidence_bucket = 'HIGH' THEN 'AUTO_MERGE'
      |         WHEN confidence_bucket = 'MEDIUM' THEN 'STEWARD_REVIEW'
      |         ELSE 'NO_ACTION' END AS governance_action
      |  FROM s3)""".stripMargin
  }

  private val scoredSql = scoredPrelude(fine = false)
  private val scoredFineSql = scoredPrelude(fine = true)

  /** The downstream family, registered once per block schema. The
    * Spark side composes the same Mdm operators over the supplied
    * scored frame; the oracle shares the matching prelude. `aggSc` is
    * the pair stream for the aggregate-output queries (activity,
    * scorecard) — the coarse family points it at the adaptive stream
    * since their work would otherwise be quadratic in block size with
    * zero output growth; pair-listing queries always use `sc`.
    */
  private def familyDefs(suffix: String,
                         sc: (SparkSession, String) => DataFrame,
                         aggSc: (SparkSession, String) => DataFrame,
                         prelude: String): Map[String, QueryDef] = Map(

    // ───── J10/P19/P20: blocked candidate pairs with scores & routing
    s"mdm_match_pairs$suffix" -> QueryDef.sql(
      (s, dir) =>
        sc(s, dir).select(
          "id_1", "id_2", "name_score", "address_score", "final_score",
          "confidence_bucket", "governance_action"),
      s"""$prelude
         |SELECT id_1, id_2, name_score, address_score, final_score,
         |       confidence_bucket, governance_action
         |FROM s4""".stripMargin),

    // ───── steward review queue (ref fuzzy_match.py:91-107)
    s"mdm_steward_queue$suffix" -> QueryDef.sql(
      (s, dir) => Mdm.stewardQueue(sc(s, dir)),
      s"""$prelude
         |SELECT id_1, id_2, name_1, name_2, final_score
         |FROM s4 WHERE governance_action = 'STEWARD_REVIEW'""".stripMargin),

    // ───── golden-record survivorship (ref fuzzy_match.py:121-144)
    s"mdm_golden_records$suffix" -> QueryDef.sql(
      (s, dir) => Mdm.goldenRecords(sc(s, dir)),
      s"""$prelude
         |SELECT concat_ws(',', id_1, id_2) AS source_ids,
         |  CASE WHEN length(coalesce(name_1, '')) >= length(coalesce(name_2, ''))
         |       THEN name_1 ELSE name_2 END AS golden_name,
         |  CASE WHEN length(coalesce(address_1, '')) >= length(coalesce(address_2, ''))
         |       THEN address_1 ELSE address_2 END AS golden_address,
         |  final_score
         |FROM s4 WHERE governance_action = 'AUTO_MERGE'""".stripMargin),

    // ───── A8: steward activity log (ref lifecycle_management.py:243-251)
    // The queue's reviewer/status fields are deterministic derivations
    // (reviewer assigned round-robin by id, status from the score band)
    // so the DuckDB twin re-derives them exactly.
    s"mdm_steward_activity$suffix" -> QueryDef.sql(
      (s, dir) => {
        val queue = Mdm.stewardQueue(aggSc(s, dir))
          .withColumn("reviewed_by",
            concat(lit("steward_user_"), (col("id_1") % 3 + 1).cast("string")))
          .withColumn("review_status",
            when(col("final_score") >= 90, "APPROVED")
              .when(col("final_score") >= 85, "PENDING")
              .otherwise("REJECTED"))
        Mdm.stewardActivity(queue)
      },
      s"""$prelude,
         |q AS (
         |  SELECT concat('steward_user_', CAST(id_1 % 3 + 1 AS VARCHAR)) AS reviewed_by,
         |    CASE WHEN final_score >= 90 THEN 'APPROVED'
         |         WHEN final_score >= 85 THEN 'PENDING'
         |         ELSE 'REJECTED' END AS review_status
         |  FROM s4 WHERE governance_action = 'STEWARD_REVIEW')
         |SELECT reviewed_by, review_status, COUNT(*) AS n_reviews
         |FROM q GROUP BY 1, 2""".stripMargin),

    // ───── MDM scorecard (ref fuzzy_match.py:181-199)
    s"mdm_scorecard$suffix" -> QueryDef.sql(
      (s, dir) => {
        val ents = entities(s, dir)
        Mdm.scorecard(ents.count(), aggSc(s, dir))
      },
      s"""$prelude,
         |agg AS (
         |  SELECT COUNT(*) AS pairs,
         |    CAST(SUM(CASE WHEN confidence_bucket = 'MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
         |    CAST(SUM(CASE WHEN confidence_bucket = 'HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high
         |  FROM s4),
         |tot AS (SELECT COUNT(*) AS total_records FROM customer)
         |SELECT total_records,
         |  pairs AS duplicate_candidate_pairs,
         |  round(CAST(pairs AS DOUBLE) / CAST(total_records AS DOUBLE) * 100, 2) AS duplicate_rate_percent,
         |  round(CAST(n_medium AS DOUBLE) / CAST(pairs AS DOUBLE) * 100, 2) AS steward_review_rate_percent,
         |  round(CAST(n_high AS DOUBLE) / CAST(pairs AS DOUBLE) * 100, 2) AS auto_merge_rate_percent
         |FROM agg, tot""".stripMargin)
  )

  /** Registry (VERDICT r8 #2): ADAPTIVE blocking is the default pair
    * stream for the WHOLE coarse family — pair-listing queries
    * included. The adaptive stream equals the plain coarse stream
    * wherever the block cap doesn't bind (all correctness SFs — see
    * [[scoredAdaptive]]), so the coarse oracles are unchanged; at 10×+
    * hot blocks pay the fine suffix key instead of a compute-quadratic
    * pair space. The plain coarse forms stay registered as `_coarse`
    * evidence twins — the recall-maximal shape, output-quadratic BY
    * SEMANTICS (their scale cost is the answer's size, not an
    * implementation cliff; Bench excludes `_coarse` twins from the
    * derived-scale sweeps by name and reports the exclusion).
    */
  val defs: Map[String, QueryDef] =
    familyDefs("", scoredAdaptive, scoredAdaptive, scoredSql) ++
      familyDefs("_coarse", scored, scored, scoredSql) ++
      familyDefs("_fine", scoredFine, scoredFine, scoredFineSql)
}
