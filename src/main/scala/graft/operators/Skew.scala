package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * AQE handles moderate runtime skew; these are the explicit levers
  * for the pathological cases (one key = 30% of a 100 TB table) where
  * a single reducer would stall the stage. Salting must be
  * deterministic here (oracle/replay discipline) — the salt derives
  * from a caller-chosen distribution column, not rand().
  */
object Skew {

  /** Two-phase salted aggregation: partials on (keys, salt), then
    * merge per key. Correct for decomposable aggregates — this
    * provides sum/count; extend with min/max by the same shape.
    * Phase 1 spreads a hot key over `factor` reducers; phase 2 merges
    * `factor` rows per key (trivial).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     distributeBy: Column, factor: Int = 16,
                     scale: Int = 2): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(distributeBy), lit(factor)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        sum(col(valueCol).cast(s"decimal(30,$scale)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(
        sum(col("_psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("_pcnt")).cast("long").as("count"))
  }

  /** Deterministic per-key rank WITHOUT a per-key single reducer — the
    * salted decomposition of `row_number() OVER (PARTITION BY key
    * ORDER BY md5(seed ∥ id), id)`. A plain window sends EVERY row of
    * a hot key to one task (windows have no partial aggregation — the
    * one shuffle shape AQE cannot split), so a key holding 40% of a
    * 100 TB table stalls its stage. Here the hex PREFIX of the order
    * key is a bucket: hex-string order == (bucket asc, key asc), so
    * per-(key, bucket) ranks plus a per-key running bucket-offset
    * (a |keys|×256-row control frame, broadcast back) compose the
    * EXACT same positions — the hot key now spreads over 16^prefixLen
    * tasks. Same decomposition as [[Sampling.shuffledPositions]],
    * generalized from one global partition to per-key partitions.
    */
  def saltedRank(df: DataFrame, keys: Seq[String], idCol: String,
                 seed: String, hexPrefixLen: Int = 2): DataFrame = {
    require(hexPrefixLen >= 1 && hexPrefixLen <= 4,
      s"hexPrefixLen must be 1..4, got $hexPrefixLen")
    import org.apache.spark.sql.expressions.Window
    val kCols = keys.map(col)
    val keyed = df.select((kCols :+ col(idCol)): _*)
      .withColumn("_skey", md5(concat(lit(seed), col(idCol).cast("string"))))
      .withColumn("_b",
        conv(substring(col("_skey"), 1, hexPrefixLen), 16, 10).cast("long"))
    val ranked = keyed.withColumn("_r",
      row_number().over(Window.partitionBy((kCols :+ col("_b")): _*)
        .orderBy(col("_skey"), col(idCol))))
    // per-(key, bucket) counts → per-key running offsets: bounded at
    // |keys| × 16^prefixLen rows by construction — control plane
    val offsets = keyed.groupBy((kCols :+ col("_b")): _*).count()
      .withColumn("_off",
        coalesce(
          sum(col("count")).over(Window.partitionBy(kCols: _*)
            .orderBy(col("_b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select((kCols :+ col("_b") :+ col("_off")): _*)
    ranked.join(broadcast(offsets), keys :+ "_b")
      .select((kCols :+ col(idCol) :+ (col("_off") + col("_r")).as("pos")): _*)
  }

  /** Salted broadcast-replicate join for a skewed fact⋈dim equi-join:
    * fact rows get a deterministic salt, the (small) dim is replicated
    * `factor` times, and the join key becomes (key, salt) — a hot fact
    * key now lands on `factor` tasks instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, distributeBy: Column,
                 factor: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(hash(distributeBy), lit(factor)))
    val replicatedDim = dim
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("_salt") === replicatedDim("_salt"))
      .drop("_salt")
  }
}
