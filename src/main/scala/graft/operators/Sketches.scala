package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregates — the approximate-aggregation tier the
  * reference lacks (SURVEY §2.4 notes "no approx/HLL aggregates")
  * and a 100 TB engine needs: exact count-distinct shuffles every
  * distinct key; an HLL sketch is a few KB per group, combines
  * map-side, and UNIONS across partitions/days/sources without
  * rescanning — the only way a year of daily uniques rolls up in
  * O(sketch) instead of O(data). Built on Spark's own sketch
  * surface (`hll_sketch_agg`/`hll_union_agg` — Apache DataSketches
  * HLL under the hood — and `count_min_sketch`), so the aggregation
  * is codegen'd partial+final like any other agg.
  *
  * Sketch internals are implementation-specific (a DuckDB oracle
  * cannot reproduce the estimate bit-for-bit), so the driver-gated
  * query outputs EXACT values plus a BOOLEAN accuracy gate the
  * oracle pins to TRUE — the estimate must sit inside its
  * deterministic bound or the gate row breaks the hash.
  */
object Sketches {

  /** Per-stratum exact distinct + HLL estimate accuracy gate, plus
    * the merge path: per-stratum sketches are UNIONed (one
    * `hll_union_agg` over the stratum sketch rows — the rollup a
    * 100 TB pipeline does across partitions) and the global estimate
    * is gated against the exact global distinct. lgK=12 → ~1.6%
    * standard error; the 5% gate is ~3σ.
    */
  def hllDistinctGate(df: DataFrame, strataCol: String, keyCol: String,
                      lgK: Int = 12, relTol: Double = 0.05): DataFrame = {
    val perStratum = df.groupBy(col(strataCol))
      .agg(
        countDistinct(col(keyCol)).as("n_exact"),
        hll_sketch_agg(col(keyCol).cast("string"), lit(lgK)).as("_sk"))
      .withColumn("_est", hll_sketch_estimate(col("_sk")))
    // n_exact = 0 (a stratum whose keyCol is entirely NULL) would make
    // the relative-error ratio NULL — the gate must stay a genuine
    // boolean, so that case passes iff the estimate is also 0
    def withinTol = when(col("n_exact") === 0, col("_est") === 0.0)
      .otherwise(abs(col("_est") - col("n_exact")).cast("double") /
        col("n_exact").cast("double") <= relTol)
    val strat = perStratum.select(
      col(strataCol),
      col("n_exact"),
      withinTol.as("hll_within_tol"),
      lit(false).as("is_global"))
    // merge path: union the stratum sketches → global estimate; gate
    // against the exact global distinct (cross-stratum overlap would
    // break a naive sum — the union handles it sketch-side). The
    // rollup row is identified by the `is_global` BOOLEAN — the
    // "__ALL__" label is display-only and a genuine stratum of the
    // same name cannot be mistaken for it.
    val globalExact = df.agg(countDistinct(col(keyCol)).as("n_exact"))
    val globalEst = perStratum.agg(
      hll_sketch_estimate(hll_union_agg(col("_sk"), lit(true))).as("_est"))
    val global = globalExact.crossJoin(globalEst).select(
      lit("__ALL__").as(strataCol),
      col("n_exact"),
      withinTol.as("hll_within_tol"),
      lit(true).as("is_global"))
    strat.unionByName(global)
  }

  /** Mergeable HLL sketch STATE for incremental distinct-count
    * maintenance: one row per group holding the serialized sketch.
    * This is the distinct-count analogue of
    * [[graft.operators.Incremental.aggState]] — COUNT DISTINCT is not
    * algebraic (per-group counts don't merge), and the exact
    * alternative (materializing the full distinct layer, see
    * `mv_stream_dau`) carries state proportional to the number of
    * distinct keys. The sketch state is O(2^lgK) bytes per group
    * REGARDLESS of cardinality, and [[mergeSketchStates]] over any
    * batch partitioning of the input converges to the same estimate
    * as a one-shot sketch because HLL union is idempotent,
    * commutative, and associative (a register-wise max). At 100 TB:
    * a year of daily-unique rollups merges in O(days × sketch bytes)
    * without rescanning a single historical row.
    */
  def hllSketchState(df: DataFrame, keys: Seq[String], keyCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol).cast("string"), lit(lgK)).as("_sk"))

  /** Merge two HLL sketch states (same schema): register-wise union
    * per group — the same combine `hll_sketch_agg` runs map-side,
    * applied across ARRIVAL batches instead of partitions.
    */
  def mergeSketchStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("_sk"), lit(true)).as("_sk"))

  /** Finalize sketch state to (keys, estimate) rows. */
  def finalizeSketchState(state: DataFrame, estName: String): DataFrame =
    state.select(
      state.columns.filterNot(_ == "_sk").map(col) :+
        hll_sketch_estimate(col("_sk")).as(estName): _*)

  /** Exact top-k corpus terms with a count-min-sketch cross-check:
    * CMS NEVER undercounts (the deterministic one-sided guarantee —
    * estimate = min over rows of a hashed counter that every
    * occurrence incremented), so `cms_ge_exact` is gate-safe with
    * zero flake risk; the probabilistic over-estimate bound
    * (≤ exact + ε·N w.p. 1−δ) is spec-checked, not gated. The CMS
    * agg merges map-side like any sum — the heavy-hitter shuffle
    * carries one w×d counter table per task, not the token stream.
    * The k-row sketch probe on the driver is control-plane.
    */
  def cmsTopTermsGate(df: DataFrame, textCol: String, k: Int,
                      eps: Double = 0.0005, confidence: Double = 0.999,
                      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(TextAnalysis.wordTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val top = TextAnalysis.topTerms(df, textCol, k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val skBytes = toks
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed))
        .as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    top.map { case (tok, exact) =>
      (tok, exact, cms.estimateCount(tok) >= exact)
    }.toSeq.toDF("token", "n_exact", "cms_ge_exact")
  }

  /** Driver-side CMS probe for spec use: (token → estimate). */
  private[graft] def cmsEstimates(df: DataFrame, textCol: String,
                                  tokens: Seq[String], eps: Double,
                                  confidence: Double, seed: Int): Map[String, Long] = {
    val toks = df.select(explode(TextAnalysis.wordTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val skBytes = toks
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed))
        .as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    tokens.map(t => t -> cms.estimateCount(t)).toMap
  }
}
