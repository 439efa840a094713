package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Unpartitioned-window audit (VERDICT r13 #5).
  *
  * GraftSession scopes the WindowExec "No Partition Defined for
  * Window operation" WARN out of the engine's logs, because the
  * registry's unpartitioned windows are all BOUNDED-domain by design
  * and their spam made a REAL regression invisible. This spec is the
  * replacement signal: it walks every batch query's optimized logical
  * plan and fails on any unpartitioned Window not on the allowlist
  * below — so a new single-partition window over an UNBOUNDED frame
  * (the thing the WARN exists for) breaks `sbt test` instead of
  * scrolling past in a driver log.
  *
  * Every allowlist entry must state why the frame is bounded at any
  * corpus size (the justification IS the review record).
  */
class WindowAuditSpec extends SparkSpec {

  /** Queries whose fn() drives the real streaming engine (the plan
    * returned is a memory-sink read, and constructing it costs a full
    * streaming run) — excluded here; their state-machine plans have
    * no batch Window nodes to audit.
    */
  private def isStreaming(name: String): Boolean =
    name.contains("_stream_") || name == "corpus_stream_gate" ||
      name == "scd2_stream_merge" || name == "cdc_stream_apply" ||
      name == "mv_hll_uniques"

  /** name -> why the unpartitioned window's input is bounded
    * regardless of corpus size.
    */
  private val allowlist: Map[String, String] = Map(
    "a21_abc_analysis" ->
      "cumulative Pareto share over the SUPPLIER aggregate — entity-count-bounded, never fact rows",
    "corpus_shuffle" ->
      "offset cumsum over the 256-row hex-bucket frame (ranks are per-bucket)",
    "ev_stickiness" ->
      "day-domain running sum over the calendar-bounded daily frame",
    "p22_surrogate_ids" ->
      "master-dim sequence by DESIGN (reference does it in pandas); dim-bounded",
    "ret_hybrid_rrf" ->
      "RRF fusion over two k<=20 ranked lists — k-bounded",
    "ta_zipf_fit" ->
      "rank over the vocabulary frequency table (vocab-bounded)",
    "v12_cusum_shift" ->
      "cusum over the calendar-bounded daily frame",
    "p27_null_semantics" ->
      "global null-placement sequence over the supplier MASTER DIM - entity-bounded (the p22 note)",
    "ev_session_overlap" ->
      "concurrencyCensus per-bucket offset cumsum - O(#time-buckets) rows, calendar-bounded",
    "llm_train_prep" ->
      "shuffledPositions' 256-row hex-bucket offset cumsum (the corpus_shuffle shape)")

  test("every unpartitioned window is allowlisted with a boundedness " +
    "justification") {
    graft.plans.GraftExtensions.register(spark)
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(isStreaming)
    val found = scala.collection.mutable.SortedSet.empty[String]
    names.foreach { n =>
      val plan: LogicalPlan =
        SparkEntry.queries(n)(spark, sfDir).queryExecution.optimizedPlan
      val unpartitioned = plan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      if (unpartitioned.nonEmpty) found += n
    }
    val unexpected = found.toSet -- allowlist.keySet
    assert(unexpected.isEmpty,
      s"NEW unpartitioned window(s) — single-reducer at scale unless the " +
        s"frame is provably bounded; partition them or allowlist with a " +
        s"justification: ${unexpected.mkString(", ")}")
    val stale = allowlist.keySet -- found.toSet
    assert(stale.isEmpty,
      s"allowlist entries with no unpartitioned window anymore (remove " +
        s"them so the list stays honest): ${stale.mkString(", ")}")
  }
}
