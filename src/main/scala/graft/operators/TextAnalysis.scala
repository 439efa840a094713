package graft.operators

import graft.functions.Functions.normalizeText
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: language
  * ID, quality scoring, token counting, document fingerprinting.
  * All composed built-ins (regexp_count / split / md5) — codegen'd,
  * shuffle-free per-row projections that scale linearly with corpus
  * size.
  */
object TextAnalysis {

  /** n-gram-heuristic language ID: CJK character density first, then
    * argmax of per-language stopword hit counts with a deterministic
    * tie-break order (en > es > de > fr).
    */
  val StopwordPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|for)\\b",
    "es" -> "\\b(el|la|de|que|los|las|un|una)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|zu)\\b",
    "fr" -> "\\b(le|la|les|des|est|un|une|et)\\b")

  val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  def languageId(text: Column): Column = {
    val lower_ = lower(text)
    val counts = StopwordPatterns.map { case (lang, pat) =>
      lang -> regexp_count(lower_, lit(pat))
    }.toMap
    val cjkRatio = regexp_count(text, lit(CjkPattern)).cast("double") /
      greatest(length(text), lit(1)).cast("double")
    when(cjkRatio > 0.3, "zh")
      .when(counts("en") >= greatest(counts("es"), counts("de"), counts("fr")), "en")
      .when(counts("es") >= greatest(counts("de"), counts("fr")), "es")
      .when(counts("de") >= counts("fr"), "de")
      .otherwise("fr")
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, and isolated
    * symbols each count as one token (a cheap, deterministic stand-in
    * for a real tokenizer's piece count).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality features + composite score: rewards reasonable length,
    * penalizes punctuation density (ref-style ratio scoring, cf. the
    * scorecard ratios glue_mdm.py:63-65).
    */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_m", length(t))
      .withColumn("word_count", wsTokenCount(t))
      .withColumn("punct_ratio",
        regexp_count(t, lit("[^A-Za-z0-9\\s\\x{4e00}-\\x{9fff}]")).cast("double") /
          greatest(length(t), lit(1)).cast("double"))
      // stopword density: natural prose sits ~0.2-0.5; keyword-stuffed
      // or gibberish text sits near 0 (stopword list = languageId's en set)
      .withColumn("stopword_ratio",
        round(regexp_count(lower(t), lit(StopwordPatterns.toMap.apply("en"))).cast("double") /
          greatest(wsTokenCount(t), lit(1)).cast("double"), 4))
      .withColumn("quality_score",
        round(
          least(col("word_count").cast("double") / 50.0, lit(1.0)) * 0.5 +
            (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * 0.5, 4))
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dup
    * key. (Near-dup fingerprints live in TextDedup: minhash/simhash.)
    */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  // ───────────────────────── PII scrubbing ─────────────────────────

  /** Engine-portable PII patterns (RE2-safe: no backrefs/lookaround,
    * so the DuckDB oracle runs the identical regex). Deliberately
    * C4-style coarse — a production pipeline layers locale-specific
    * patterns on the same plumbing.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** C4-style PII scrub: count then redact emails and phone numbers
    * (emails first — a phone pattern can never span a redacted email
    * but not vice versa). Pure per-row projection: shuffle-free,
    * codegen'd, linear in corpus size.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)))
      .withColumn("clean_text",
        regexp_replace(regexp_replace(t, EmailPattern, "[EMAIL]"),
          PhonePattern, "[PHONE]"))
  }

  // ─────────────────────── repetition scoring ───────────────────────

  // ─────────────────── corpus-level statistics ───────────────────

  /** Whitespace word tokens of the lowercased trimmed text — the
    * shared tokenizer for corpus statistics (case-folded so "The" and
    * "the" count together).
    */
  def wordTokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Exact corpus top-k heavy hitters: explode tokens → count →
    * top-k with a deterministic (count desc, token asc) order. The
    * count combines map-side, so the shuffle carries one row per
    * distinct token per task — bounded by vocabulary size, not corpus
    * size — and the top-k runs as TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows, never a global sort). For
    * sketch-budget variants, `count_min_sketch` runs over the same
    * exploded frame.
    */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(wordTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** CCNet-style unigram log-prob quality signal: build the corpus
    * unigram LM (token → ln(tf/total)) and score each document by the
    * mean log-probability of its tokens. Rare-token/gibberish
    * documents score far below natural prose; the signal feeds the
    * same gate as [[withQualityFeatures]].
    *
    * Scale shape: the LM is one vocabulary-bounded aggregation
    * (~100k rows regardless of corpus size) broadcast back to the
    * exploded token stream — the corpus itself is never shuffled for
    * the join, and the per-doc mean is one key shuffle. Per-token
    * log-probs are rounded then decimal-summed so the parallel mean
    * is bit-deterministic.
    */
  def withUnigramLogProb(df: DataFrame, textCol: String,
                         idCol: String): DataFrame = {
    val toks = df
      .select(col(idCol), explode(wordTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    // total token count enters the plan as a broadcast 1-row frame —
    // no driver-side collect, the LM build stays fully lazy
    val total = vocab.agg(sum(col("tf")).as("total_tf"))
    val lm = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("tf").cast("double") / col("total_tf").cast("double")), 9)
          .as("logp"))
    toks.join(broadcast(lm), Seq("token"))
      .groupBy(col(idCol))
      .agg(
        round(
          (sum(col("logp").cast("decimal(30,9)")).cast("double") /
            count(lit(1)).cast("double")), 6).as("mean_logp"),
        count(lit(1)).as("n_tokens"))
  }

  /** Sparse keyword retrieval: per-document TF-IDF score for a fixed
    * query-term set, top-k. Inverted-index shape: the exploded token
    * stream FILTERS to the query terms immediately (the "posting
    * lists" — the corpus is never shuffled at full width), per-
    * (doc, term) TF is one bounded shuffle, the |terms|-row IDF table
    * broadcasts back, and per-doc scores are one more bounded
    * shuffle. No all-pairs anywhere: at 100 TB every intermediate is
    * O(docs containing a query term), not O(corpus).
    *
    * Determinism discipline: idf = ln(N/df) rounded to 9 dp (Spark
    * `log` and DuckDB `ln` agree bit-for-bit on these inputs — NOTES
    * round-5 fact 18), per-term tf·idf rounded to 9 dp, decimal-
    * summed per doc, final score rounded to 6 dp, doc-id tiebreak —
    * so the top-k cut is engine-exact.
    */
  def tfidfRetrieve(df: DataFrame, idCol: String, textCol: String,
                    queryTerms: Seq[String], k: Int): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase)
    val toks = df
      .select(col(idCol), explode(wordTokens(col(textCol))).as("token"))
      .filter(col("token").isin(terms: _*))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // corpus size enters as a broadcast 1-row frame — no driver collect
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val idf = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("token"),
        round(log(col("n_docs").cast("double") / col("df").cast("double")), 9)
          .as("idf"))
    tf.join(broadcast(idf), Seq("token"))
      .withColumn("w", round(col("tf").cast("double") * col("idf"), 9))
      .groupBy(col(idCol))
      .agg(round(sum(col("w").cast("decimal(30,9)")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Corpus vocabulary statistics in one pass: total token instances,
    * exact distinct tokens, and docs covered. Exact distinct is the
    * verification form (one extra shuffle); at 100 TB swap
    * `approx_count_distinct` into the same agg for a single-pass
    * sketch answer — spec'd to stay within its 5% default error
    * (LlmOpsSpec).
    */
  def vocabStats(df: DataFrame, textCol: String, idCol: String,
                 approx: Boolean = false): DataFrame = {
    val toks = df
      .select(col(idCol), explode(wordTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val distinctAgg =
      if (approx) approx_count_distinct(col("token")).as("distinct_tokens")
      else countDistinct(col("token")).as("distinct_tokens")
    toks.agg(
      count(lit(1)).as("total_tokens"),
      distinctAgg,
      countDistinct(col(idCol)).as("n_docs"))
  }

  /** Token-window document chunking with overlap — training-example
    * prep (context-window packing). Tokens are windowed `chunkSize`
    * at a time advancing by `chunkSize - overlap`; the final chunks
    * may be shorter. Pure per-row array work (sequence → posexplode →
    * slice): shuffle-free, codegen'd, linear in corpus size, and
    * chunk ordinals are deterministic — no window function, no
    * driver-side loop.
    */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize); got overlap=$overlap chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    df.withColumn("_toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), col("_toks"),
        posexplode(
          sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_id", "_start")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("_toks"), col("_start") + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("_toks"), col("_start") + 1, lit(chunkSize)))
          .as("n_chunk_tokens"))
  }

  /** Greedy sequential sequence packing: assign documents to packs of
    * ~`targetTokens` by walking each stratum in deterministic id
    * order and cutting a new pack when the running token total
    * crosses a multiple of the target — constant-length training
    * batches without a bin-packing solver, reproducible across runs
    * and engines (it's just a window cumsum).
    *
    * Scale shape: packing runs INSIDE each stratum (language, shard,
    * source), so the window never needs a global order — one shuffle
    * on the stratum key, parallel across strata. For a single global
    * stream, range-shard first (`Tables.writeSharded`) and pack per
    * shard.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
                    strataCol: String, targetTokens: Int): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCountCol)).over(w))
      // the pack a doc lands in is decided by the tokens BEFORE it:
      // a doc starting inside pack k belongs to pack k even if it
      // overflows the boundary (packs can exceed target by < 1 doc)
      .withColumn("pack_id",
        floor((col("_cum") - col(tokenCountCol)) / targetTokens).cast("long"))
      .drop("_cum")
  }

  /** Gopher-style within-document repetition: 1 − distinct/total
    * character n-grams of the normalized text (0 = all unique, → 1 as
    * the doc degenerates into repeated boilerplate). Shuffle-free
    * projection; the shingle arrays never leave the row.
    */
  def repetitionRatio(df: DataFrame, textCol: String, n: Int = 5): DataFrame =
    df.withColumn("_norm", normalizeText(col(textCol)))
      .withColumn("_total", greatest(length(col("_norm")) - (n - 1), lit(1)))
      .withColumn("repetition_ratio",
        round(lit(1.0) -
          size(TextDedup.shingleExpr("_norm", n)).cast("double") /
            col("_total").cast("double"), 4))
      .drop("_norm", "_total")
}
