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
