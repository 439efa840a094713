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
}
