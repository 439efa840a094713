package graft

import graft.plans.GraftExtensions

/** Physical-plan contracts for the headline queries: the shapes that
  * make them scale are asserted here so a refactor (or an optimizer
  * behavior change) that silently degrades a plan fails the suite,
  * not the benchmark.
  */
class PlanContractsSpec extends SparkSpec {

  private def plan(name: String): String = {
    GraftExtensions.register(spark)
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
  }

  private def countLines(p: String, needle: String): Int =
    p.linesIterator.count(_.contains(needle))

  test("e2e_curated: both dims broadcast, fact never shuffles") {
    val p = plan("e2e_curated")
    assert(countLines(p, "BroadcastHashJoin") === 2, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // every Exchange is a broadcast — the fact table itself is never
    // hash-repartitioned
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
    assert(shuffles.isEmpty, p)
  }

  test("daily_revenue: map-side partial aggregation before the one shuffle") {
    val p = plan("daily_revenue")
    assert(p.contains("partial_"), p) // partial agg on the scan side
    // exactly one KEY shuffle (the group-key exchange). A round-robin
    // exchange may additionally appear at small SF: Tables.spreadScan
    // floors the scan parallelism when the file under-splits (single
    // row group) and is the identity on any adequately-split input —
    // i.e. absent at scale — so the pinned contract is "no key
    // movement beyond the aggregation's own".
    val keyShuffles = p.linesIterator
      .filter(_.contains("Exchange")).filter(_.contains("hashpartitioning"))
    assert(keyShuffles.size === 1, p)
  }

  test("p01_cast_projection: scan prunes to the projected columns") {
    val p = plan("p01_cast_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // lineitem's wide payload must not be read for the cast projection
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("mdm_match_pairs: pair explosion runs as a shuffled hash join") {
    val p = plan("mdm_match_pairs")
    assert(countLines(p, "ShuffledHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // the block-key repartition is explicit-N so AQE can't serialize it
    assert(p.contains("REPARTITION_BY_NUM"), p)
  }

  test("dd_minhash_pairs: band join is shuffled-hash; no sort-merge anywhere") {
    val p = plan("dd_minhash_pairs")
    assert(countLines(p, "ShuffledHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // signatures are the codegen'd expression, not an explode+agg
    assert(p.contains("minhash_sigs"), p)
    assert(!p.contains("Generate explode"), p)
  }

  test("ann_int8_topk: queries broadcast to every candidate partition; one rank shuffle") {
    val p = plan("ann_int8_topk")
    // quantized queries ship as a broadcast (no candidate-side
    // shuffle for scoring); the only hash exchange is the top-k
    // window's partition on query_id
    assert(countLines(p, "BroadcastNestedLoopJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange")).toSeq
    assert(shuffles.size === 1, p)
  }

  test("ta_tfidf_search: inverted-index shape — broadcast IDF, bounded top-k sort") {
    val p = plan("ta_tfidf_search")
    // IDF joins back as a broadcast (posting lists never sort-merge)
    // and the final top-k is a bounded TakeOrderedAndProject, not a
    // global sort
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countLines(p, "rangepartitioning") === 0, p)
  }

  test("dd_ngram_prefix: candidates come from equi-joins only — no cartesian") {
    val p = plan("dd_ngram_prefix")
    // the whole point of prefix filtering: the quadratic block-
    // cartesian is replaced by shuffle-partitionable equi-joins
    assert(countLines(p, "CartesianProduct") === 0, p)
    assert(countLines(p, "BroadcastNestedLoopJoin") === 0, p)
  }

  test("corpus_shuffle: global positions with NO global sort") {
    val p = plan("corpus_shuffle")
    // the scale trap would be a rangepartitioning exchange (global
    // sort for a single row_number window); the decomposed plan ranks
    // within hash-partitioned buckets and broadcasts the offsets
    assert(countLines(p, "rangepartitioning") === 0, p)
    assert(p.contains("hashpartitioning(bucket"), p)
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
  }

  test("ta_quality_scores and ta_rolling_hash: shuffle-free projections") {
    for (name <- Seq("ta_quality_scores", "ta_rolling_hash")) {
      val p = plan(name)
      assert(countLines(p, "Exchange") === 0, s"$name:\n$p")
    }
  }

  test("dd_contamination: eval side broadcast, corpus never shuffles pre-join") {
    val p = plan("dd_contamination")
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // the only non-broadcast exchange is the (doc, eval) count agg —
    // the exploded corpus itself joins map-side
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
    assert(shuffles.size === 1, p)
  }

  test("corpus_sample and ta_pii_scrub: shuffle-free scan-side work") {
    for (name <- Seq("corpus_sample", "ta_pii_scrub")) {
      val p = plan(name)
      assert(countLines(p, "Exchange") === 0, s"$name:\n$p")
    }
  }

  test("mdm_steward_queue: scoring is fenced — no levenshtein re-inlined into the join") {
    // without the no_inline fence, the governance_action filter is
    // pushed into the pair join's condition with the whole levenshtein
    // scoring chain duplicated (every pair scored twice — 3.9× at 10×)
    val p = plan("mdm_steward_queue")
    assert(p.contains("no_inline"), p)
    // the filter compares the materialized column, not the re-inlined
    // scoring expression...
    val filterLines = p.linesIterator.filter(_.contains("Filter ")).toSeq
    assert(filterLines.exists(_.contains("STEWARD_REVIEW")), p)
    assert(!filterLines.exists(_.contains("levenshtein")),
      "scoring chain re-inlined into the filter:\n" + filterLines.mkString("\n"))
    // ...and the join stayed score-free (scores are computed above it)
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(!joinLines.exists(_.contains("levenshtein")),
      "scoring chain re-inlined into the join:\n" + joinLines.mkString("\n"))
  }

  test("j13_bucketed_join: co-located SMJ, zero shuffle below the join") {
    val p = plan("j13_bucketed_join")
    assert(countLines(p, "SortMergeJoin") === 1, p)
    // both scans read pre-bucketed layouts: all 8 buckets selected
    assert(countLines(p, "SelectedBucketsCount: 8 out of 8") === 2, p)
    // the ONLY shuffle in the whole plan is the final group-by agg —
    // the join itself is satisfied by the bucketing
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
    assert(shuffles.size === 1, p)
  }

  test("j14_multi_join_volume: all five joins broadcast, date filter pushed") {
    val p = plan("j14_multi_join_volume")
    assert(countLines(p, "BroadcastHashJoin") === 5, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // fact side never shuffles: the only shuffle is the final agg
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
    assert(shuffles.size === 1, p)
    // the orderdate range predicate reaches the orders parquet scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("ta_top_terms: top-k runs as a bounded sort, not a global one") {
    val p = plan("ta_top_terms")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_"), p) // token counts combine map-side
  }

  test("ta_unigram_logprob: LM joins back as a broadcast, corpus never shuffles for it") {
    val p = plan("ta_unigram_logprob")
    assert(countLines(p, "BroadcastHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
  }

  test("ta_chunks: chunking is a shuffle-free scan-side projection") {
    val p = plan("ta_chunks")
    assert(countLines(p, "Exchange") === 0, p)
  }

  test("dd_incremental: corpus side reduced to fingerprints before the anti-join") {
    val p = plan("dd_incremental")
    // the anti-join probe reads only doc_id+text and projects to the
    // md5 fingerprint — the seen-side ReadSchema must not carry lang
    // or other payload columns
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(!_.contains("lang")), reads.mkString("\n"))
  }

  test("dd_dup_passages: window stream joins the dup set map-side; three bounded shuffles") {
    val p = plan("dd_dup_passages")
    // count-distinct expands to two exchanges + the final per-doc agg;
    // the window stream itself joins the (small) dup-window set via
    // broadcast at this SF — it is never shuffled for the join
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
    assert(shuffles.size === 3, p)
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
  }

  test("llm_corpus_pipeline: exactly two shuffles (dedup window + lang agg)") {
    val p = plan("llm_corpus_pipeline")
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
    assert(shuffles.size === 2, p)
    assert(p.contains("partial_"), p) // lang agg combines map-side
  }

  test("corpus_split: a pure scan-side projection — zero exchanges of any kind") {
    val p = plan("corpus_split")
    assert(!p.contains("Exchange"), p)
  }

  test("ta_bpe_pair_counts: bounded top-k, map-side combine, no cartesian") {
    val p = plan("ta_bpe_pair_counts")
    // the deterministic top-50 must run as a per-partition heap +
    // driver merge, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countLines(p, "CartesianProduct") === 0, p)
    assert(p.contains("partial_"), p) // pair counts combine map-side
  }

  test("dd_incremental_bloom: the bloom predicate cuts the corpus before its shuffle") {
    val p = plan("dd_incremental_bloom")
    assert(p.contains("might_contain"), p)
    // the prefilter must sit below the anti-join, not above it: the
    // Filter line carrying might_contain appears, and the join is a
    // plain equi anti-join (no cartesian fallback)
    assert(countLines(p, "CartesianProduct") === 0, p)
  }

  test("mdm_steward_activity: adaptive pair streams shuffled-hash, size tags broadcast") {
    val p = plan("mdm_steward_activity")
    // one pair join per adaptive branch (coarse + refined), both forced
    // shuffle-hash — never sort-merge, never cartesian
    assert(countLines(p, "ShuffledHashJoin") >= 2, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "CartesianProduct") === 0, p)
    // the block-size tagging joins ride a broadcast of the tiny size
    // table — the entity stream is never shuffled just to learn sizes
    assert(countLines(p, "BroadcastHashJoin") >= 2, p)
  }

  test("dd_incremental_neardup: batch bands broadcast, corpus never shuffles pre-join") {
    val p = plan("dd_incremental_neardup")
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // the ONLY key exchange is the final pair distinct; the corpus
    // band stream reaches the join without being repartitioned BY KEY.
    // (Round-robin exchanges from Tables.spreadScan's small-SF
    // parallelism floor are not key movement and vanish at scale.)
    val keyShuffles = p.linesIterator
      .filter(_.contains("Exchange")).filter(_.contains("hashpartitioning"))
    assert(keyShuffles.size === 1, p)
  }

  test("dd_semdedup: within-cell pair join is shuffled-hash on the cell key") {
    val p = plan("dd_semdedup")
    // the quadratic pair join must be the bucketed shuffle-hash form
    // (pair-exploding joins mislead AQE's size estimates) and nothing
    // may degenerate to a cartesian
    assert(countLines(p, "ShuffledHashJoin") >= 1, p)
    assert(countLines(p, "CartesianProduct") === 0, p)
    assert(countLines(p, "BroadcastNestedLoopJoin") === 0, p)
    // the cell-key repartition is explicit-N so AQE can't coalesce it
    assert(p.contains("REPARTITION_BY_NUM"), p)
  }

  test("corpus_prune_prototypes: bounded-histogram verdicts, corpus shuffled " +
    "once on the shared (cell, cos) key") {
    val p = plan("corpus_prune_prototypes")
    // centroids are literals after the k-means build, assignment is
    // scan-side; the ONLY join is the bounded-histogram verdict frame
    // coming back — and it must be shuffled-hash on (cell, cos): the
    // histogram is ≤ 2,000,001 rows PER CELL (worst case k·2M — past
    // any broadcast budget), and a statistics-driven broadcast at
    // small SF was observed to build the CORPUS side. The tie-rank
    // window shares the join's partitioning, so the corpus pays one
    // exchange for both.
    assert(countLines(p, "ShuffledHashJoin") === 1, p)
    assert(countLines(p, "BroadcastHashJoin") === 0, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "CartesianProduct") === 0, p)
    // no exchange between the verdict join and the tie-rank window
    // (textual pin: the Window over (cell_id, centroid_cos) sits above
    // the join with only Sort/Project in between)
    val lines = p.linesIterator.toVector
    val winIdx = lines.indexWhere(l =>
      l.contains("Window") && l.contains("_brn"))
    val joinIdx = lines.indexWhere(_.contains("ShuffledHashJoin"))
    assert(winIdx >= 0 && joinIdx > winIdx, p)
    assert(!lines.slice(winIdx + 1, joinIdx).exists(_.contains("Exchange")), p)
  }

  test("corpus_mixture_temperature: rate table broadcasts back, corpus filter is scan-side") {
    val p = plan("corpus_mixture_temperature")
    // the derived rates join onto the corpus as a broadcast — the
    // corpus itself is never hash-partitioned for the sampling filter
    assert(countLines(p, "BroadcastHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "CartesianProduct") === 0, p)
  }

  test("ta_boilerplate_scrub: dictionary semi-join is shuffled-hash, not broadcast") {
    val p = plan("ta_boilerplate_scrub")
    // a template-heavy crawl can have a huge boilerplate dictionary:
    // the scrub must not depend on broadcasting it — and (r13) the
    // dictionary exchanges must move hashed LONG keys, never segment
    // strings (the r12-confirmed 10× cliff was the string-keyed form)
    assert(p.contains("LeftSemi"), p)
    assert(countLines(p, "ShuffledHashJoin") >= 2, p) // dict semi + doc re-join
    assert(countLines(p, "BroadcastHashJoin") === 0, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(p.contains("xxhash64"), p)
  }

  test("ta_gopher_rules: pure scan-side projection — zero exchanges") {
    val p = plan("ta_gopher_rules")
    assert(countLines(p, "Exchange") === 0, p)
    assert(countLines(p, "Join") === 0, p)
  }

  test("corpus_dsir_select: both LMs in one pass, log-ratio table broadcasts back") {
    val p = plan("corpus_dsir_select")
    // the token stream joins the vocab-bounded log-ratio table as a
    // broadcast — the corpus text is never shuffled at full width
    assert(countLines(p, "BroadcastHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // one combined vocab aggregate builds BOTH LMs: exactly one
    // token-keyed aggregate exchange feeds the lm subtree (raw+target
    // counts are one conditional-sum pass, not two scans)
    assert(countLines(p, "partial_count") >= 1, p)
  }

  test("lshStarPairs: star edges from one bucket window — no join anywhere") {
    import org.apache.spark.sql.functions.col
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bands = graft.operators.TextDedup.lshBands(
      graft.operators.TextDedup.minhashSignatures(corpus, "doc_id", "text"),
      "doc_id")
    val p = graft.operators.TextDedup.lshStarPairs(bands, "doc_id")
      .queryExecution.executedPlan.toString
    // the all-pairs formulation self-joins the band table; the star
    // form must not join at all — hub assignment is a window over the
    // same bucket-key partitioning the repartition establishes
    assert(countLines(p, "Join") === 0, p)
    assert(countLines(p, "Window") === 1, p)
  }

  test("ta_c4_line_rules: pure scan-side array algebra — zero exchanges") {
    val p = plan("ta_c4_line_rules")
    // C4's line rules are deliberately local: filter + reassemble
    // inside the row, no explode, nothing crosses a partition
    assert(countLines(p, "Exchange") === 0, p)
    assert(countLines(p, "Join") === 0, p)
    assert(countLines(p, "Generate") === 0, p)
  }

  test("dd_substring_scrub: canonical table aggregates map-side, joins shuffled-hash") {
    val p = plan("dd_substring_scrub")
    // the duplicated-segment table of a crawl is corpus-sized — the
    // join back must not depend on broadcasting it
    assert(countLines(p, "ShuffledHashJoin") >= 1, p)
    assert(countLines(p, "BroadcastHashJoin") === 0, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // canonical choice is an aggregate (count + min(struct)) with
    // map-side partials — never a segment-keyed window, whose hot
    // segments would all land on one reducer
    assert(countLines(p, "Window") === 0, p)
    assert(p.contains("partial_"), p)
  }

  test("dd_source_overlap: no self-join anywhere — pair expansion is array algebra") {
    val p = plan("dd_source_overlap")
    // the oracle's formulation self-joins the fingerprint table; the
    // engine's must not join at all — the distinct-source set per
    // fingerprint is |sources|-bounded and pairs expand inside the row
    assert(countLines(p, "Join") === 0, p)
    assert(countLines(p, "Generate") === 1, p) // the one pair explode
    assert(countLines(p, "Window") === 0, p)
  }

  test("ann_ivfpq_topk: cell-restricted ADC is an equi-join, codes never sort-merge") {
    val p = plan("ann_ivfpq_topk")
    // the probed-cell restriction is a hash equi-join on the cell key
    // (queries broadcast), NOT a nested-loop over all candidates
    assert(countLines(p, "BroadcastNestedLoopJoin") === 0, p)
    assert(countLines(p, "CartesianProduct") === 0, p)
    assert(countLines(p, "BroadcastHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
  }

  test("ev_funnel: one shuffle total — the per-user group; no per-stage re-shuffle") {
    val p = plan("ev_funnel")
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange"))
      .filterNot(_.contains("SinglePartition")).toSeq
    assert(shuffles.size === 1, p) // only the user_id hash shuffle
    assert(countLines(p, "SortMergeJoin") === 0, p)
  }

  test("mv_incremental_revenue: both batch states partial-aggregate before their shuffles") {
    val p = plan("mv_incremental_revenue")
    assert(p.contains("partial_"), p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
  }

  test("cdc_snapshot_diff: sides reduce to (key, hash) at the scan; join is shuffled-hash") {
    val p = plan("cdc_snapshot_diff")
    assert(countLines(p, "ShuffledHashJoin") >= 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    // the wide supplier payload must not survive to the join
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!p.contains("CartesianProduct"), p)
    assert(readSchema.nonEmpty, p)
  }

  test("ta_bigram_logprob: corpus joins the LM tables shuffled-hash, scalars broadcast") {
    val p = plan("ta_bigram_logprob")
    assert(countLines(p, "ShuffledHashJoin") >= 2, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
  }

  test("corpus_source_cap: offsets broadcast back, no stratum-global window") {
    val p = plan("corpus_source_cap")
    // ranks come from per-(stratum, bucket) windows + a broadcast
    // offset merge — the only join is that broadcast
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "ShuffledHashJoin") === 0, p)
  }

  private def hashShuffles(p: String): Seq[String] =
    p.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("BroadcastExchange"))
      .filterNot(_.contains("ReusedExchange")).toSeq

  test("v07 cutoffs: both k-th-value scans are O(n/100) TakeOrdered heaps") {
    // the winsorization cutoffs must NEVER plan as a 0.99·n heap
    // (VERDICT r8 #1): P1 comes from the ascending side, P99 from the
    // DESCENDING side with the complementary rank, so each
    // TakeOrderedAndProject limit is ≤ ⌈n/100⌉+1
    import org.apache.spark.sql.functions.col
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_extendedprice") > 0)
    val n = li.count()
    val k1 = ((n + 99) / 100).toInt
    val kTop = (n - (99 * n + 99) / 100 + 1).toInt
    val maxHeap = (n / 100).toInt + 1
    assert(k1 <= maxHeap && kTop <= maxHeap, s"n=$n k1=$k1 kTop=$kTop")
    val pAsc = graft.functions.Functions
      .kthSmallestPlan(li, col("l_extendedprice"), k1)
      .queryExecution.executedPlan.toString
    val pDesc = graft.functions.Functions
      .kthLargestPlan(li, col("l_extendedprice"), kTop)
      .queryExecution.executedPlan.toString
    assert(pAsc.contains(s"TakeOrderedAndProject(limit=$k1"), pAsc)
    assert(pDesc.contains(s"TakeOrderedAndProject(limit=$kTop"), pDesc)
  }

  test("v06_outlier_days: scan-side partial daily aggs, moments join back shuffled-hash") {
    val p = plan("v06_outlier_days")
    assert(countLines(p, "ShuffledHashJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(p.contains("partial_"), p)
    // pushdown: the price>0 filter reaches both parquet scans
    assert(countLines(p, "GreaterThan(l_extendedprice,0.0)") === 2, p)
  }

  test("v08_seasonal_outliers: ONE seasonal join, moments via window — residual frame never re-executes") {
    val p = plan("v08_seasonal_outliers")
    // daily→seasonal is the only join; the per-supplier moments read
    // through a whole-partition window (a moments-aggregate+join-back
    // formulation re-runs the daily/seasonal chain per consumer —
    // measured 3 SHJ / 4 fact scans)
    assert(countLines(p, "ShuffledHashJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "Window") === 1, p)
    assert(countLines(p, "FileScan") === 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("ev_session_overlap: merge-rank census — no cartesian/BNLJ, offsets broadcast, SHJ join-back") {
    val p = plan("ev_session_overlap")
    // the overlap count must NEVER materialize pairs: no theta join
    // shapes, the O(#buckets) offset frame broadcasts, the final
    // join-back is shuffled-hash
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "BroadcastHashJoin") >= 1, p)
    assert(countLines(p, "ShuffledHashJoin") >= 1, p)
  }

  test("a15_value_histogram: one map-side-combined shuffle, nothing else") {
    val p = plan("a15_value_histogram")
    assert(p.contains("partial_"), p)
    assert(hashShuffles(p).size === 1, p)
  }

  test("a16_exact_corr: exact moments in one pass — single shuffle, no joins") {
    val p = plan("a16_exact_corr")
    assert(p.contains("partial_"), p)
    assert(hashShuffles(p).size === 1, p)
    assert(countLines(p, "Join") === 0, p)
  }

  test("w04_rank_battery: both windows share one partition-key shuffle") {
    val p = plan("w04_rank_battery")
    assert(hashShuffles(p).size === 1, p)
    assert(countLines(p, "Window") === 2, p)
  }

  test("ev_dau_summary: two-phase distinct agg, zero joins") {
    val p = plan("ev_dau_summary")
    assert(p.contains("partial_"), p)
    assert(hashShuffles(p).size <= 2, p) // countDistinct's two phases
    assert(countLines(p, "Join") === 0, p)
  }

  test("ev_retention_cohorts: single scan, window cohort — no self-join") {
    val p = plan("ev_retention_cohorts")
    assert(countLines(p, "Scan parquet") === 1, p) // events read ONCE
    assert(countLines(p, "Join") === 0, p)
    assert(countLines(p, "Window") === 1, p)
    assert(hashShuffles(p).size <= 3, p) // distinct, user window, final agg
  }

  test("ev_session_window_agg: native session windows over one user shuffle") {
    val p = plan("ev_session_window_agg")
    assert(hashShuffles(p).size === 1, p) // the user_id shuffle
    assert(countLines(p, "Join") === 0, p)
  }

  test("a17_approx_quantile_gate: sketch agg partial+final, gate join broadcast") {
    val p = plan("a17_approx_quantile_gate")
    // the GK sketch combines map-side like any agg; the tiny per-group
    // approx values ride a broadcast back over the fact — the fact is
    // never repartitioned for the gate
    assert(p.contains("partial_approx_percentile"), p)
    assert(countLines(p, "BroadcastHashJoin") === 1, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "ShuffledHashJoin") === 0, p)
  }

  test("ret_inverted_index: one (term,doc) shuffle, everything downstream reuses the term partitioning") {
    val p = plan("ret_inverted_index")
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(countLines(p, "ShuffledHashJoin") === 1, p)
    // postings are capped by the window BEFORE collect_list — the
    // filter on _rn must sit under the list aggregation
    assert(p.contains("TakeOrderedAndProject") === false, p)
    // shuffles: (term,doc) tf + term stats + term window ≤ 4 total —
    // never one per stage
    assert(hashShuffles(p).size <= 4, p)
  }

  test("graph_pagerank: 3 iterations = 3 shuffled-hash joins over the one edge checkpoint") {
    val p = plan("graph_pagerank")
    // each power iteration joins the CHECKPOINTED edges against the
    // rank frame — the LSH band pipeline must appear zero times (it
    // ran once, eagerly, into the checkpoint)
    assert(countLines(p, "ShuffledHashJoin") === 3, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(!p.contains("minhash_sigs"), p)
    // the only non-equi joins are the 1-row vertex-count broadcasts
    assert(countLines(p, "BroadcastNestedLoopJoin") <= 4, p)
  }

  test("graph_triangle_stats: wedge census over the one oriented checkpoint — all SHJ, no cartesian") {
    val p = plan("graph_triangle_stats")
    // wedge self-join + closing semi-probe + degree/tri joins all run
    // against the CHECKPOINTED oriented edge list — the LSH band
    // pipeline must appear zero times, and every join is hinted
    // shuffle-hash (output-sized checkpoint stats would otherwise
    // bait a broadcast of the edge list)
    assert(!p.contains("minhash_sigs"), p)
    assert(countLines(p, "ShuffledHashJoin") >= 3, p)
    assert(countLines(p, "SortMergeJoin") === 0, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j16_correlated_scalar: de-correlated to ONE aggregate + ONE join — no per-row subquery") {
    val p = plan("j16_correlated_scalar")
    // Catalyst must rewrite the correlated scalar subquery into a
    // pre-aggregated outer join; a per-row re-execution shape would
    // show a subquery node repeated under the row loop
    assert(countLines(p, "HashAggregate") >= 1, p)
    assert(countLines(p, "Join") <= 2, p) // the one rewritten join (both sides listed once each)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a18/a19/w05: grouping sets, pivot, and range frame each stay one-shuffle shapes") {
    val gs = plan("a18_grouping_sets")
    // the three grouping sets expand via the Expand operator (never a
    // 3-pass union of aggregates) — and (r13) the expand sits over the
    // PRE-AGGREGATED (nation, segment) frame, so the fact-sized
    // exchange carries each row once, not ×sets
    assert(countLines(gs, "Expand") >= 1, gs)
    assert(countLines(gs, "HashAggregate") >= 3, gs) // pre-agg partial+final, then sets agg
    // pivot is a two-phase aggregate: (key, pivot-col) partial+final,
    // then pivotfirst regrouped on the key alone — 2 exchanges, both
    // map-side combined, the second over the domain-bounded frame
    val pv = plan("a19_pivot_status")
    assert(pv.contains("partial_"), pv)
    assert(pv.contains("pivotfirst"), pv)
    assert(hashShuffles(pv).size === 2, pv)
    val rf = plan("w05_range_day_frame")
    assert(countLines(rf, "Window") === 1, rf)
    assert(hashShuffles(rf).size <= 2, rf) // daily agg + supplier window
  }
}
