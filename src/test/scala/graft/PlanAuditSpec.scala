package graft

import graft.plans.GraftExtensions

/** Whole-registry plan audit: every registered query's physical plan
  * is swept for the anti-patterns that silently destroy scale —
  * unbounded cartesian products and nested-loop joins. Deliberate
  * exceptions are allowlisted BY NAME with their justification, so a
  * new query (or a refactor of an old one) that slips into an
  * accidental cross join fails the suite, not the 100 TB run.
  */
class PlanAuditSpec extends SparkSpec {

  /** name → why an unbounded join shape is intentional there. */
  private val allowedCartesian: Map[String, String] = Map(
    "ann_topk" -> "deliberately-exact brute-force ANN baseline; queries broadcast",
    "ann_int8_topk" -> "same exhaustive scoring shape over int8 codes; queries broadcast",
    "ta_unigram_logprob" -> "1-row total-token frame broadcast into the LM build",
    "ta_tfidf_search" -> "1-row corpus-size frame broadcast into the IDF build",
    "corpus_mixture_temperature" ->
      "1-row decimal weight-sum frame broadcast into the strata rate table",
    "corpus_dsir_select" ->
      "1-row LM-totals frame broadcast into the vocab-bounded log-ratio table",
    "llm_curation_pipeline" ->
      "composes corpus_dsir_select + corpus_mixture_temperature: both 1-row totals frames broadcast",
    "corpus_epoch_plan" ->
      "1-row corpus-token-total frame broadcast into the strata-bounded plan table",
    "ann_projected_topk" ->
      "same exhaustive ANN baseline shape in the 16-d projected space; queries broadcast",
    "ann_pq_adc_topk" ->
      "ADC scores every candidate's 4-byte code against the broadcast query distance tables — exhaustive over codes by design (the cell-restricted variant is ann_ivfpq_topk)",
    "ta_bigram_logprob" ->
      "1-row corpus-total/vocab-size frame broadcast into the vocab-bounded LM tables",
    "a13_hll_distinct_gate" ->
      "1-row global-exact frame joined with the 1-row sketch-union estimate for the rollup gate row",
    "j15_not_in_nulls" ->
      "NOT IN with a nullable subquery REQUIRES the null-aware join (three-valued logic) — the query exists to gate exactly that plan",
    "ret_hybrid_rrf" ->
      "composes the allowlisted exhaustive ANN baseline (1-query broadcast) as its vector arm",
    "ret_bm25_topk" ->
      "1-row (N, avg-len) corpus frame broadcast into the vocab-bounded idf table",
    "graph_pagerank" ->
      "1-row vertex-count frame broadcast into each power iteration's rank update",
    "corpus_pps_sample" ->
      "1-row total-weight frame broadcast into the scan-side keep filter",
    "ta_pmi_pairs" ->
      "1-row corpus-count frame broadcast into the C(V,2)-bounded lift table",
    "a20_rfm_segments" ->
      "1-row max-date and percentile-cutoff frames broadcast into the customer scan",
    "ret_mmr_rerank" ->
      "pools via the allowlisted exhaustive ANN baseline (queries broadcast); the greedy loop itself is per-row",
    "a21_abc_analysis" ->
      "1-row revenue-total frame broadcast into the supplier-bounded cumulative frame",
    "v09_mad_outliers" ->
      "two 1-row frames (exact median, exact MAD) broadcast back over the calendar-bounded daily frame",
    "v10_distribution_drift" ->
      "1-row period-totals and 1-row TVD frames broadcast over the |bins|-bounded share table",
    "ta_heavy_tokens" ->
      "1-row token-total frame broadcast into the ≤k-candidate exact count (the MG second pass)",
    "v12_cusum_shift" ->
      "two 1-row frames (global mean, peak |cusum|) broadcast over the calendar-bounded daily frame",
    "ret_eval_recall" ->
      "composes the allowlisted exhaustive ANN baseline (queries broadcast) as the eval's ground-truth arm",
    "a24_benford_check" ->
      "1-row digit-total frame broadcast into the 9-row digit table",
    "a25_hhi_concentration" ->
      "1-row revenue-total frame broadcast into the supplier-bounded share table",
    "gov_join_cardinality" ->
      "two 1-row per-side stats frames broadcast onto the 1-row prediction")

  test("no registered query hides an unlisted cartesian or nested-loop join") {
    GraftExtensions.register(spark)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val bad = plan.linesIterator.exists(l =>
          l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin"))
        if (bad && !allowedCartesian.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unlisted cartesian/nested-loop joins in: ${offenders.mkString(", ")}")
  }
}
