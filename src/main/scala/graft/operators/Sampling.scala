package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation and mixing.
  *
  * Training-data sampling must be REPRODUCIBLE: re-running the
  * pipeline, changing the partitioning, or re-expressing the query in
  * another engine has to select the exact same rows (otherwise every
  * downstream ablation is uncomparable). So no `rand()` — membership
  * is a pure function of the row's key: an md5-derived bucket in
  * 0..99 compared against the sampling rate. Shuffle-free filter,
  * prunes at the scan, linear at any scale.
  */
object Sampling {

  /** Stable bucket 0..99 for a key: first 6 hex chars of md5 mod 100.
    * 24 bits of hash → bucket skew is negligible (|p−1%| < 4e−6).
    */
  def bucketOf(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long"),
      lit(100L))

  /** Uniform deterministic sample: keep rows with bucket < pct. */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.filter(bucketOf(col(keyCol)) < pct)
  }

  /** Deterministic seeded global shuffle with contiguous 1-based
    * positions — training-order randomization. Re-running, changing
    * the partitioning, or re-expressing in another engine yields the
    * SAME permutation: the order key is `md5(seed ∥ id)` (id as
    * tiebreak), a pure function of the row.
    *
    * Assigning a GLOBAL position is the scale trap here: a bare
    * `row_number() OVER (ORDER BY key)` is a global sort into a
    * single window partition — one task owns 100 TB. Instead the hex
    * PREFIX of the order key is the bucket, so bucket index order ∥
    * within-bucket key order IS the global key order, and positions
    * decompose into per-bucket ranks (one bounded shuffle on the
    * ~uniform bucket key) plus a bucket-offset cumsum over a
    * `numBuckets`-row frame (tiny by construction) broadcast back.
    * Every stage is bounded regardless of corpus size.
    */
  def shuffledPositions(df: DataFrame, idCol: String, seed: String,
                        hexPrefixLen: Int = 2): DataFrame = {
    require(hexPrefixLen >= 1 && hexPrefixLen <= 4,
      s"hexPrefixLen must be 1..4, got $hexPrefixLen")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(idCol))
      .withColumn("skey", md5(concat(lit(seed), col(idCol).cast("string"))))
      .withColumn("bucket",
        conv(substring(col("skey"), 1, hexPrefixLen), 16, 10).cast("long"))
    val ranked = keyed.withColumn("rank",
      row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(col("skey"), col(idCol))))
    val offsets = keyed.groupBy("bucket").count()
      .withColumn("offset",
        coalesce(
          sum(col("count")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bucket", "offset")
    ranked.join(broadcast(offsets), "bucket")
      .select(col(idCol), (col("offset") + col("rank")).as("pos"))
  }

  /** Per-stratum keep-rates (integer percent, the bucket granularity)
    * that make a hash-sampled corpus hit a global TOKEN budget at the
    * given stratum shares: `rate_s = min(100, ⌊100·budget·share_s /
    * tokens_s⌋)`. Token totals are MEASURED (one aggregate, collected
    * — O(|strata|) rows, so the driver hop is constant-size at any
    * corpus scale); the returned map is curation config for
    * [[stratifiedSample]]. Strata absent from `shares` or with zero
    * measured tokens get no entry (sampled at the caller's
    * defaultPct). Double math is ordered exactly as the SQL twin
    * (`100.0·budget·share/t`) so rates reproduce cross-engine.
    */
  def tokenBudgetRates(df: DataFrame, strataCol: String, tokenCol: Column,
                       budgetTokens: Long,
                       shares: Map[String, Double]): Map[String, Int] = {
    // cast IN the aggregate so the collect matches the generic Column
    // signature: a non-string strata column or a non-long token sum
    // (double weights) would otherwise ClassCastException at runtime
    val totals = df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(sum(tokenCol).cast("long").as("t"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.flatMap { case (k, share) =>
      totals.get(k).filter(_ > 0L).map { t =>
        k -> math.min(100L,
          math.floor(100.0 * budgetTokens * share / t).toLong).toInt
      }
    }
  }

  /** Temperature-scaled mixture sampling (the multilingual-pretraining
    * staple — Lample & Conneau 2019, arXiv:1901.07291 §3.1; XLM-R,
    * Conneau et al. 2020, arXiv:1911.02116): stratum keep-rates are
    * computed FROM the corpus distribution, q_i ∝ n_i^(1/τ), instead
    * of hand-set shares ([[stratifiedSample]] + [[tokenBudgetRates]]
    * cover that case). τ=1 reproduces the natural distribution, τ→∞
    * approaches uniform, τ>1 up-samples low-resource strata. The
    * stratum keep-pct is `100·budgetDocs·q_i/(Σq·n_i)` capped at 100
    * (no replication — oversubscribed strata saturate).
    *
    * Scale shape: one strata-bounded count aggregate, the rate table
    * broadcast back onto a scan-side hash filter — rates stay
    * IN-PLAN (no driver collect), the corpus never shuffles.
    * Engine-exact: the pow weight is rounded to 6 dp, the weight sum
    * is an exact decimal sum (order-free), and the pct is floored
    * only after a 6 dp round, so a sequential engine re-running the
    * recipe makes identical keep decisions.
    */
  def temperatureSampledMixture(df: DataFrame, keyCol: String,
                                strataCol: String, tau: Double,
                                budgetDocs: Long): DataFrame = {
    require(tau > 0, s"tau must be > 0, got $tau")
    require(budgetDocs >= 0, s"budgetDocs must be >= 0, got $budgetDocs")
    val q = df.groupBy(col(strataCol).as("_stratum"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_q", round(pow(col("_n").cast("double"), lit(1.0 / tau)), 6))
    val tot = q.agg(
      sum(col("_q").cast("decimal(38,12)")).cast("double").as("_qsum"))
    val rates = q.crossJoin(broadcast(tot))
      .withColumn("_pct", least(lit(100L),
        floor(round(lit(100.0) * lit(budgetDocs.toDouble) * col("_q") /
          (col("_qsum") * col("_n").cast("double")), 6))))
      .select(col("_stratum"), col("_pct"))
    df.join(broadcast(rates), col(strataCol) === col("_stratum"), "left")
      .filter(bucketOf(col(keyCol)) < coalesce(col("_pct"), lit(0L)))
      .drop("_stratum", "_pct")
  }

  /** Data-constrained epoch plan (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models", arXiv:2305.16264): when the
    * token budget exceeds the unique corpus, REPEAT data — up to ~4
    * epochs is worth nearly as much as fresh tokens, beyond that
    * returns decay fast. The planner allocates a uniform epoch count
    * e = min(maxEpochs, budget/Σ tokens) across strata (uniform
    * repetition preserves the natural mixture; compose with the
    * temperature sampler to reshape it first) and reports the
    * per-stratum plan plus the budget actually used. Engine-exact:
    * token totals are exact longs, e is floored to 6 dp before the
    * per-stratum multiply, planned tokens floored to longs.
    *
    * Scale shape: one strata-bounded aggregate + a broadcast 1-row
    * total — a pure planning query, no corpus rewrite.
    */
  def epochPlan(df: DataFrame, strataCol: String, tokenCol: Column,
                budgetTokens: Long, maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    val perStratum = df.groupBy(col(strataCol).as("stratum"))
      .agg(sum(tokenCol).cast("long").as("unique_tokens"))
    val total = perStratum.agg(sum(col("unique_tokens")).as("_total"))
    perStratum.crossJoin(broadcast(total))
      .withColumn("epochs",
        round(least(lit(maxEpochs),
          lit(budgetTokens.toDouble) / col("_total").cast("double")), 6))
      .withColumn("planned_tokens",
        floor(col("unique_tokens").cast("double") * col("epochs")).cast("long"))
      .select(col("stratum"), col("unique_tokens"), col("epochs"),
        col("planned_tokens"))
  }

  /** Deterministic train/val/test assignment — the split every
    * training pipeline needs before ablations. Each row gets exactly
    * one of `train`/`val`/`test` as a pure function of (seed, key):
    * disjoint and exhaustive by construction (one bucket, three
    * half-open ranges), reproducible across reruns, partitionings,
    * and engines, and INDEPENDENT of any sampling decision when the
    * seed differs from the sampler's (md5(seed ∥ key) and md5(key)
    * are unrelated bits). Shuffle-free scan-side projection — the
    * assignment costs one md5 per row at any corpus size; splits
    * land co-partitioned with their source, so downstream per-split
    * filters prune without a shuffle.
    */
  def splitAssign(df: DataFrame, keyCol: String, trainPct: Int, valPct: Int,
                  seed: String = ""): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percents must be >= 0 and sum <= 100, got ($trainPct, $valPct)")
    val b = bucketOf(concat(lit(seed), col(keyCol).cast("string")))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified deterministic sample — corpus MIXING: each stratum
    * (e.g. language, source, quality band) gets its own keep-rate;
    * strata absent from `rates` fall back to `defaultPct`. The rate
    * table compiles into the filter expression (it's curation config,
    * not data), so this stays a single shuffle-free scan-side filter
    * at any corpus size.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Int],
                       defaultPct: Int = 0): DataFrame = {
    (rates.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"rates must be 0..100, got $p"))
    val rateExpr = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucketOf(col(keyCol)) < rateExpr)
  }

  /** Per-stratum quota cap — at most `cap` documents per source/domain,
    * chosen by deterministic hash order (the per-domain document cap of
    * RefinedWeb, Penedo et al. 2023, arXiv:2306.01116 §3.2, and the
    * per-dump balancing of FineWeb): an over-represented template site
    * must not dominate the mixture, and the survivors must be a stable
    * pseudo-random subset, not "whatever arrived first".
    *
    * Rank within stratum is [[Skew.saltedRank]] — the bucket-rank +
    * broadcast-offset decomposition — NOT a plain per-stratum window:
    * a hot domain holding 40% of a 100 TB crawl would otherwise land
    * on a single window reducer (the one shuffle shape AQE cannot
    * split). Emits (idCol, stratumCol, pos) for survivors, pos being
    * the 1-based hash-order rank within the stratum.
    */
  def stratumCap(df: DataFrame, idCol: String, stratumCol: String,
                 cap: Int, seed: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    Skew.saltedRank(df, Seq(stratumCol), idCol, seed)
      .filter(col("pos") <= cap)
  }

  /** Deterministic probability-proportional-to-size (Poisson PPS)
    * sampling: row i with integer weight w_i is kept with probability
    * `min(1, k·w_i/W)` where `W = Σw` — the expected sample size is
    * ≈ k with long rows proportionally favored (the standard corpus-
    * mixing sampler when examples should be weighted by token count,
    * not document count).
    *
    * Determinism and cross-engine exactness: the keep decision is the
    * pure-integer inequality `h·W < w·k·2^32` with
    * `h = md5(seed ∥ id)[0:8] ∈ [0, 2^32)` — no floating point
    * anywhere in the decision. Both products are evaluated in
    * DECIMAL(38,0) (DuckDB: HUGEINT): with h < 2^32 and 38 digits of
    * headroom the products are exact for any W up to ~10^28 — far
    * past a 100 TB corpus's total token count. The reported `p_keep`
    * is display-only: one exact integer product downcast and ONE
    * correctly-rounded IEEE division.
    *
    * Scale shape: one map-side-combined aggregate computes W (a
    * 1-row frame broadcast back — the [[Graph.pageRank]] nFrame
    * pattern); the keep filter is scan-side. No shuffle of the data
    * itself, no per-row state, no order dependence — unlike
    * reservoir-style A-Res sampling there is no global top-k and
    * nothing driver-side, at the price of a ±O(√k) sample-size
    * spread (the Poisson trade every distributed sampler makes).
    */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String,
                expectK: Int, seed: String): DataFrame = {
    require(expectK >= 1, s"expectK must be >= 1, got $expectK")
    val w = col(weightCol).cast("long")
    val totalFrame = df.agg(sum(w).cast("long").as("_tw"))
    val h = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("long")
    df.crossJoin(broadcast(totalFrame))
      .filter(h.cast("decimal(38,0)") * col("_tw").cast("decimal(38,0)") <
        w.cast("decimal(38,0)") * lit(expectK) * lit(4294967296L))
      .select(col(idCol), w.as("weight"),
        least(lit(1.0),
          (w * expectK).cast("double") / col("_tw").cast("double"))
          .as("p_keep"))
  }

  /** Concat-and-chunk sequence-packing manifest — the GPT-style
    * training-batch assembly step (documents concatenated in shuffled
    * order, the token stream chunked into fixed `seqLen`-token
    * training sequences; cf. GPT-3, Brown et al. 2020,
    * arXiv:2005.14165 app. B: "documents are packed into sequences").
    * For every document it answers: which shard, at which position in
    * the shard's pack order, starting at which token offset, spanning
    * which training sequences (`first_seq..last_seq` —
    * boundary-straddling documents span several). Downstream loaders
    * read the manifest instead of re-deriving packing, and ablations
    * can cite exact (shard, seq) coordinates per document.
    *
    * Determinism: pack order is a pure function of (seed, id) —
    * shard = md5-prefix mod `shards`, in-shard order = the md5 TAIL
    * (chars 7+, disjoint bits from the shard decision) with id as
    * tiebreak — so re-runs, re-partitionings, and other engines
    * produce the identical manifest. Zero-token documents occupy one
    * slot (`greatest(tok, 1)`) so every doc has a well-defined span.
    *
    * Scale shape: packing is inherently sequential WITHIN a shard
    * (every offset depends on all predecessors), so the shard count
    * is the parallelism knob — but nothing here serializes a whole
    * shard into one reducer: like [[shuffledPositions]], the in-shard
    * cumsum decomposes into per-(shard, hex-bucket) window ranks (the
    * 2-hex prefix of the ORDER key is the bucket, so bucket order ∥
    * in-bucket order IS the shard order) plus a `shards × 256`-row
    * offset frame broadcast back. Both shuffles are fine-grained and
    * bounded at any corpus size; the offset frame is tiny by
    * construction. Sequence ids are derived with integral `DIV` (no
    * doubles — offsets past 2^53 tokens would silently round).
    */
  def packPlan(df: DataFrame, idCol: String, tokens: Column, seqLen: Int,
               shards: Int, seed: String): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(
      col(idCol),
      greatest(tokens.cast("long"), lit(1L)).as("n_tokens"),
      md5(concat(lit(seed), col(idCol).cast("string"))).as("_skey"))
      .select(
        col(idCol), col("n_tokens"),
        pmod(conv(substring(col("_skey"), 1, 6), 16, 10).cast("long"),
          lit(shards.toLong)).as("shard"),
        substring(col("_skey"), 7, 26).as("_okey"),
        conv(substring(col("_skey"), 7, 2), 16, 10).cast("long").as("_bkt"))
    val inBkt = Window.partitionBy(col("shard"), col("_bkt"))
      .orderBy(col("_okey"), col(idCol))
    val ranked = keyed.select(
      col(idCol), col("n_tokens"), col("shard"), col("_bkt"),
      row_number().over(inBkt).as("_rank"),
      coalesce(sum(col("n_tokens"))
        .over(inBkt.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("_toff"))
    val bktOrder = Window.partitionBy(col("shard")).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("shard", "_bkt")
      .agg(count(lit(1)).as("_n"), sum(col("n_tokens")).as("_t"))
      .select(col("shard"), col("_bkt"),
        coalesce(sum(col("_n")).over(bktOrder), lit(0L)).as("_roff"),
        coalesce(sum(col("_t")).over(bktOrder), lit(0L)).as("_boff"))
    ranked.join(broadcast(offsets), Seq("shard", "_bkt"))
      .select(
        col(idCol), col("shard"), col("n_tokens"),
        (col("_roff") + col("_rank")).as("pack_pos"),
        (col("_boff") + col("_toff")).as("token_offset"))
      .withColumn("first_seq", expr(s"token_offset DIV ${seqLen}L"))
      .withColumn("last_seq",
        expr(s"(token_offset + n_tokens - 1) DIV ${seqLen}L"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
  }

  /** EXACT-k weighted sampling without replacement —
    * Efraimidis–Spirakis A-ES (IPL 2006): each row draws a key
    * u^(1/w) from a deterministic md5 uniform and the k LARGEST keys
    * are the sample; at every draw inclusion probability is
    * proportional to weight. The complement of [[ppsSample]]:
    * Poisson-PPS gives an EXPECTED k with per-row independence; A-ES
    * gives exactly k (ablation batches, eval panels, fixed-budget
    * audits want the exact count).
    *
    * Engine-exact ordering: keys compare as
    * `floor(ln(u)/w · 10¹²)` BIGINTs — ln is monotone, so the order
    * is A-ES's order; md5 uniforms, ln, and one multiply/floor are
    * bit-reproducible cross-engine (ln is in the proven-exact libm
    * subset; pow, which the textbook u^(1/w) form needs, is not).
    * Ties at 10⁻¹² resolution break by id — a total order.
    *
    * Scale shape: the global top-k runs as the bounded-heap
    * `topk_pairs` aggregate — each mapper reduces its slice to k
    * pairs (O(k) heap state), only k·16 bytes per mapper cross the
    * exchange, and nothing is sorted. A window/orderBy-limit
    * formulation would range-shuffle every row; this never shuffles
    * the corpus at all. Zero-weight rows are excluded by contract
    * (their inclusion probability is 0 and ln(u)/0 is undefined).
    *
    * Weight contract: keys are clamped to ±9·10¹⁸ BEFORE the
    * long cast (identically in the oracle), so the double can never
    * exceed BIGINT range — without the clamp, weights below ~2.6·10⁻⁶
    * overflow the cast, which non-ANSI Spark clamps, ANSI Spark
    * throws on, and DuckDB errors on: three different behaviors.
    * Rows whose key clamps (w ≲ 2.6·10⁻⁶ relative to the 10¹²
    * scale) all share the floor key and tie-break by id; intended
    * weights are positive counts (chars/tokens/bytes), where the
    * clamp is never live.
    */
  def weightedSampleTopK(df: DataFrame, idCol: String, weightCol: String,
                         k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val h = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val scaled = log(u) / col(weightCol).cast("double") * lit(1.0e12)
    val key =
      floor(greatest(least(scaled, lit(9.0e18)), lit(-9.0e18))).cast("long")
    df.filter(col(weightCol) > 0)
      .select(key.as("_k"), col(idCol).cast("long").as("_id"))
      .agg(expr(s"topk_pairs(_k, _id, $k)").as("_top"))
      .select(posexplode(col("_top")))
      .select((col("pos") + 1).as("rank"),
        col("col.v").as(idCol), col("col.k").as("key_scaled"))
  }
}
