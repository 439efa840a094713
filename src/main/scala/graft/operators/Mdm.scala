package graft.operators

import graft.functions.Functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MDM fuzzy-dedup subsystem — the reference's pandas/recordlinkage/
  * fuzzywuzzy path (`mdm/fuzzy_match.py`, `mdm/normalize.py`,
  * `mdm/lifecycle_management.py`) re-expressed as distributed Spark
  * plans.
  *
  * The one algorithmic optimization the reference makes — blocking to
  * bound the O(n²) pair space (`fuzzy_match.py:29-31`) — becomes an
  * equi-self-join on the block key: Catalyst turns it into a hash
  * join, so pair generation scales with Σ(block²) not n². At 100 TB
  * add a salt column to oversized blocks or cap block size upstream.
  * All scoring is composed built-ins (levenshtein & friends) — fully
  * codegen'd, no UDFs.
  */
object Mdm {

  final case class EntitySchema(
      idCol: String,
      nameCol: String,
      addressCol: String,
      blockCols: Seq[String])

  /** J10: blocked candidate self-join with `id1 < id2` pair dedupe.
    * Token-sorted name/address forms are computed ONCE per entity
    * before the join — the normalization regexes are O(entities), not
    * O(pairs); pairwise work is levenshtein only.
    *
    * The join is forced to SHUFFLE-HASH on the block key, with an
    * explicit repartition-by-num that AQE cannot coalesce. Two
    * reasons, both measured: (1) AQE sees only the tiny INPUT (the
    * entity table) and would coalesce to ~1 partition and pick
    * broadcast-hash — but the OUTPUT is the b²-per-block pair
    * explosion, which then runs serialized; (2) broadcast-hash-join's
    * codegen'd multi-match emit is ~15× slower than shuffle-hash for
    * high-fanout keys carrying string columns (4.9s vs 0.3s on the
    * sf0.1 pair stage). Shuffle-hash on the block key is also the
    * only strategy that survives 100 TB — the corpus can't be
    * broadcast.
    */
  def candidatePairs(entities: DataFrame, schema: EntitySchema): DataFrame = {
    val n = graft.functions.Functions.numShufflePartitions(entities.sparkSession)
    def side(i: Int) = entities
      .repartition(n, schema.blockCols.map(col): _*)
      .select(
        (schema.blockCols.map(col) :+
          col(schema.idCol).as(s"id_$i") :+
          col(schema.nameCol).as(s"name_$i") :+
          col(schema.addressCol).as(s"address_$i") :+
          tokenSorted(col(schema.nameCol)).as(s"_tok_name_$i") :+
          tokenSorted(col(schema.addressCol)).as(s"_tok_addr_$i")): _*)
      .hint("shuffle_hash")
    side(1).join(side(2), schema.blockCols)
      .filter(col("id_1") < col("id_2"))
  }

  /** Default block cap for [[capBlocks]]: 10k entities per block ≈
    * 50M candidate pairs from one block — the ceiling of what one
    * join task should own. Not binding at test SFs (blocks are ~12
    * entities at sf0.01, ~120 at sf0.1); at 100 TB it routes hot
    * blocks to a finer blocking key instead of letting one key own
    * the stage.
    */
  val DefaultMaxBlockSize: Int = 10000

  /** [[candidatePairs]] behind the [[capBlocks]] skew guard — the
    * registered hot-path shape. Oversized blocks are dropped from the
    * pair join; callers that need them route `capBlocks._2` to a
    * finer strategy.
    */
  def candidatePairsCapped(entities: DataFrame, schema: EntitySchema,
                           maxBlockSize: Int = DefaultMaxBlockSize): DataFrame =
    candidatePairs(capBlocks(entities, schema, maxBlockSize)._1, schema)

  /** Block cap for pair streams feeding AGGREGATE outputs (activity
    * logs, scorecards — O(reviewers×statuses) or 1 row out). A block
    * of 1000 entities already yields ~500k scored pairs; past that the
    * pairwise levenshtein work grows quadratically while the output
    * doesn't grow at all, so hot blocks should pay the finer blocking
    * key instead (see [[candidatePairsAdaptive]]). Pair-LISTING
    * queries keep [[DefaultMaxBlockSize]] — their output grows with
    * the pair space, so the work is at least proportional to the
    * answer.
    */
  val AggregateMaxBlockSize: Int = 1000

  /** [[candidatePairsCapped]] with the oversized-block route CLOSED
    * instead of dropped: blocks over `maxBlockSize` on the coarse key
    * are re-blocked on the refined key (coarse cols plus a
    * discriminating column) and paired within those finer blocks.
    * This is adaptive/progressive blocking — bounded compute per
    * block, with recall inside hot blocks degrading gracefully to the
    * refined key rather than to nothing. Refinement is one level; a
    * block still oversized under the refined key needs a further
    * compose by the caller. The two pair sets are disjoint (a pair's
    * coarse block either is or is not oversized), so the union is
    * deterministic.
    */
  def candidatePairsAdaptive(entities: DataFrame, coarse: EntitySchema,
                             refined: EntitySchema,
                             maxBlockSize: Int = AggregateMaxBlockSize): DataFrame = {
    require(refined.blockCols.startsWith(coarse.blockCols),
      s"refined block key ${refined.blockCols} must extend coarse ${coarse.blockCols}")
    val (ok, oversized) = capBlocks(entities, coarse, maxBlockSize)
    val pairCols = Seq(1, 2).flatMap(i => Seq(
      s"id_$i", s"name_$i", s"address_$i", s"_tok_name_$i", s"_tok_addr_$i"))
    candidatePairs(ok, coarse).select(pairCols.map(col): _*)
      .unionByName(candidatePairs(oversized, refined).select(pairCols.map(col): _*))
  }

  /** Skew guard for blocked self-joins: split entities into
    * (processable, rejected) by block size. A block of size b yields
    * b²/2 pairs — one hot key can dominate the whole join at scale;
    * the reference's pandas version would just OOM. Rejected blocks
    * are returned for routing to a coarser strategy (finer block key
    * or sampling), mirroring the quarantine convention.
    */
  def capBlocks(entities: DataFrame, schema: EntitySchema,
                maxBlockSize: Int): (DataFrame, DataFrame) = {
    val sizes = entities.groupBy(schema.blockCols.map(col): _*)
      .agg(count(lit(1)).as("_block_size"))
    val tagged = entities.join(broadcast(sizes), schema.blockCols)
    (tagged.filter(col("_block_size") <= maxBlockSize).drop("_block_size"),
     tagged.filter(col("_block_size") > maxBlockSize).drop("_block_size"))
  }

  /** Score pairs (`fuzzy_match.py:44-89`): token_sort_ratio on name
    * and address, weighted final score, confidence bucket, governance
    * action. Uses the precomputed token-sorted columns when
    * `candidatePairs` produced them.
    */
  def scorePairs(pairs: DataFrame, nameWeight: Double = 0.7): DataFrame = {
    val pre = pairs.columns.contains("_tok_name_1")
    val nameScore =
      if (pre) tokenSortRatioPre(col("_tok_name_1"), col("_tok_name_2"))
      else tokenSortRatio(col("name_1"), col("name_2"))
    val addrScore =
      if (pre) tokenSortRatioPre(col("_tok_addr_1"), col("_tok_addr_2"))
      else tokenSortRatio(col("address_1"), col("address_2"))
    pairs
      .withColumn("name_score", nameScore)
      .withColumn("address_score", addrScore)
      .withColumn("final_score",
        weightedScore(col("name_score"), col("address_score"), nameWeight))
      .withColumn("confidence_bucket", confidenceBucket(col("final_score")))
      .withColumn("governance_action", governanceAction(col("confidence_bucket")))
      .drop("_tok_name_1", "_tok_name_2", "_tok_addr_1", "_tok_addr_2")
  }

  /** Optimizer fence over a scored frame: identity projection whose
    * columns are `no_inline`-wrapped, so a filter ABOVE it cannot be
    * pushed below — without it, filtering on `governance_action`
    * re-inlines the whole levenshtein scoring chain into the pair
    * join's condition (every pair scored TWICE — measured 2.5–3× on
    * the steward queries at 10× scale). The scoring projection below
    * the fence stays deterministic, so it still collapses and fuses
    * for consumers like `mdm_match_pairs` that never filter.
    */
  private def fenceScores(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    scored.select(scored.columns.map(c =>
      graft.plans.NoInline(s, col(c)).as(c)): _*)
  }

  /** MEDIUM-confidence pairs routed to human review
    * (`fuzzy_match.py:91-107`; steward_review_queue.csv shape).
    */
  def stewardQueue(scored: DataFrame): DataFrame =
    fenceScores(scored).filter(col("governance_action") === "STEWARD_REVIEW")
      .select("id_1", "id_2", "name_1", "name_2", "final_score")

  /** Golden records for AUTO_MERGE pairs (`fuzzy_match.py:121-144`):
    * longest-string survivorship per field, source ids preserved as a
    * deterministic "id1,id2" key.
    */
  def goldenRecords(scored: DataFrame): DataFrame =
    fenceScores(scored).filter(col("governance_action") === "AUTO_MERGE")
      .select(
        concat_ws(",", col("id_1"), col("id_2")).as("source_ids"),
        longestString(col("name_1"), col("name_2")).as("golden_name"),
        longestString(col("address_1"), col("address_2")).as("golden_address"),
        col("final_score"))

  /** Data-quality scorecard (`fuzzy_match.py:181-199`;
    * data_quality_scorecard.csv shape). One aggregation per input —
    * entities count comes in precomputed to avoid a second scan.
    */
  def scorecard(totalRecords: Long, scored: DataFrame): DataFrame = {
    scored.agg(
      count(lit(1)).as("duplicate_candidate_pairs"),
      sum(when(col("confidence_bucket") === "MEDIUM", 1).otherwise(0)).cast("long").as("n_medium"),
      sum(when(col("confidence_bucket") === "HIGH", 1).otherwise(0)).cast("long").as("n_high"))
      .select(
        lit(totalRecords).as("total_records"),
        col("duplicate_candidate_pairs"),
        pctRatio(col("duplicate_candidate_pairs"), lit(totalRecords)).as("duplicate_rate_percent"),
        pctRatio(col("n_medium"), col("duplicate_candidate_pairs")).as("steward_review_rate_percent"),
        pctRatio(col("n_high"), col("duplicate_candidate_pairs")).as("auto_merge_rate_percent"))
  }

  // ───────────────────────── lifecycle management ─────────────────────────

  /** Master-record lifecycle states and legal transitions
    * (`lifecycle_management.py:105-165`).
    */
  val LifecycleStates: Seq[String] = Seq("PROPOSED", "ACTIVE", "DEPRECATED", "RETIRED")

  val ValidTransitions: Map[String, Set[String]] = Map(
    "PROPOSED" -> Set("ACTIVE"),
    "ACTIVE" -> Set("DEPRECATED"),
    "DEPRECATED" -> Set("RETIRED", "ACTIVE"), // reactivation allowed
    "RETIRED" -> Set.empty)

  /** Apply a state transition to the keys in `ids`; throws on an
    * illegal transition (the reference raises). Master table gains a
    * change-log-compatible update; history rows are returned alongside
    * so the caller can append them to the audit table (T2 union
    * pattern).
    */
  def transition(master: DataFrame, idCol: String, ids: Seq[Any],
                 toState: String, changedBy: String,
                 asOf: java.sql.Timestamp): (DataFrame, DataFrame) = {
    require(LifecycleStates.contains(toState), s"unknown state $toState")
    // explicit control-plane contract: `ids` compiles into the plan as
    // an isin literal list and the illegal-transition probe collects
    // O(|ids|) rows — both driver-side. Master dims are small by
    // definition (reference lifecycle_management.py works in pandas);
    // a caller holding a data-scale id set should join on a frame
    // instead of passing a literal list.
    require(ids.nonEmpty && ids.size <= 100000,
      s"transition targets must be a bounded control-plane list, got ${ids.size}")
    val targeted = master.filter(col(idCol).isin(ids: _*))
    val illegal = targeted.filter(
      !col("lifecycle_state").isin(
        ValidTransitions.filter(_._2.contains(toState)).keys.toSeq.map(lit): _*))
      .select(idCol, "lifecycle_state").collect()
    require(illegal.isEmpty,
      s"illegal transition to $toState from: ${illegal.mkString(", ")}")

    val updated = master.withColumn("lifecycle_state",
      when(col(idCol).isin(ids: _*), toState).otherwise(col("lifecycle_state")))
      .withColumn("state_changed_at",
        when(col(idCol).isin(ids: _*), lit(asOf)).otherwise(col("state_changed_at")))
    val history = targeted.select(
      col(idCol),
      col("lifecycle_state").as("from_state"),
      lit(toState).as("to_state"),
      lit(changedBy).as("changed_by"),
      lit(asOf).as("changed_at"))
    (updated, history)
  }

  /** A8: steward activity log (`lifecycle_management.py:243-251`):
    * `groupby(["reviewed_by", "review_status"]).size()` over the
    * steward queue — one map-side-combined hash agg on a tiny key
    * space (reviewers × statuses).
    */
  def stewardActivity(queue: DataFrame): DataFrame =
    queue.groupBy("reviewed_by", "review_status")
      .agg(count(lit(1)).as("n_reviews"))

  /** Lifecycle/governance metrics (`lifecycle_management.py:256-268`;
    * governance_metrics.csv shape).
    */
  def lifecycleMetrics(master: DataFrame, history: DataFrame): DataFrame = {
    val counts = master.agg(
      count(lit(1)).as("total_master_records"),
      sum(when(col("lifecycle_state") === "ACTIVE", 1).otherwise(0)).cast("long").as("active_records"),
      sum(when(col("lifecycle_state") === "RETIRED", 1).otherwise(0)).cast("long").as("retired_records"))
    counts.crossJoin(history.agg(count(lit(1)).as("lifecycle_events")))
  }
}
