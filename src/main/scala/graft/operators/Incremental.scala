package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators — the lakehouse spine that keeps
  * 100 TB pipelines from recomputing the world on every arrival:
  * algebraic aggregate STATE that merges across arrival batches
  * (materialized-view maintenance), and snapshot DIFF that derives a
  * change feed from two table versions (the offline form of a Delta
  * change-data-feed). Both are pure Spark aggregates/joins — the
  * merge IS Spark's own partial-aggregation algebra, surfaced as a
  * persistable state table.
  */
object Incremental {

  /** Algebraic aggregate state for a (sum, count) metric: one row per
    * group with the EXACT decimal sum and the count. The state is
    * mergeable — `mergeAggStates` over any batch partitioning of the
    * input yields bit-identical state to a single global aggregate,
    * because decimal addition is associative-exact (a double sum
    * would drift with batch boundaries). This is materialized-view
    * maintenance: a new partition's delta state merges in O(|delta| +
    * |groups|) without touching historical data.
    */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        sum(valueCol.cast("decimal(30,2)")).as("_sum_dec"),
        count(lit(1)).as("_cnt"))

  /** Merge two aggregate states (same schema): sum-of-sums and
    * sum-of-counts per group — the same combine Spark's partial
    * aggregation runs map-side, applied across ARRIVAL batches
    * instead of partitions.
    */
  def mergeAggStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_sum_dec")).as("_sum_dec"),
        sum(col("_cnt")).as("_cnt"))

  /** Finalize a state table to the user-facing metric columns. */
  def finalizeAggState(state: DataFrame, totalName: String,
                       countName: String): DataFrame =
    state.select(
      state.columns.filterNot(Set("_sum_dec", "_cnt")).map(col) :+
        col("_sum_dec").cast("double").as(totalName) :+
        col("_cnt").as(countName): _*)

  /** Snapshot diff → change feed: compare two versions of a keyed
    * table and emit one row per changed key with `change_type` in
    * {insert, update, delete}. Unchanged keys (equal record hash)
    * produce nothing — the feed is |changes|-sized, not
    * |table|-sized.
    *
    * Scale shape: each side reduces to (key, hash) at the SCAN (the
    * wide row never shuffles), then ONE full-outer shuffled-hash
    * join on the key. At 100 TB the two scans are the cost; the
    * shuffle carries 2×(key + 32-byte hash) per row.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // Unambiguous record digest: hash each column SEPARATELY (NULL →
    // the 1-char token "n", value → "v"-prefixed string — disjoint
    // domains, so NULL ≠ '' and no value can impersonate NULL), then
    // hash the concatenation of the fixed-width per-column digests.
    // Fixed-width inner digests make field boundaries unambiguous — a
    // separator scheme would let values containing the separator shift
    // boundaries (('a||b','c') vs ('a','b||c')) and silently drop such
    // updates from the feed.
    def colDigest(c: String): Column = sha2(
      when(col(c).isNull, lit("n"))
        .otherwise(concat(lit("v"), col(c).cast("string"))), 256)
    def hashed(df: DataFrame, h: String) = df.select(
      keys.map(col) :+
        sha2(concat_ws("", compareCols.map(colDigest): _*), 256).as(h): _*)
    val joined = hashed(oldDf, "_h_old").hint("shuffle_hash")
      .join(hashed(newDf, "_h_new").hint("shuffle_hash"), keys, "full_outer")
    joined
      .withColumn("change_type",
        when(col("_h_old").isNull, "insert")
          .when(col("_h_new").isNull, "delete")
          .when(col("_h_old") =!= col("_h_new"), "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }

  /** Apply a change feed to a keyed snapshot — the consumer half of
    * the CDC pair ([[snapshotDiff]] derives a feed; this folds one
    * back in, the offline form of `MERGE INTO ... WHEN MATCHED
    * [DELETE]`). `changes` carries one row per change event with an
    * op column (`D` deletes the key; anything else upserts
    * `payloadCols`); `orderCols` must be a TOTAL order within each
    * key (e.g. event time + a unique sequence id) — the LATEST change
    * wins, later ops overwrite earlier ones within the same feed, and
    * keys untouched by the feed pass through from the snapshot.
    *
    * Scale shape: the feed first collapses to one row per changed key
    * via `max_by(payload, struct(orderCols))` — a declarative
    * aggregate, so each mapper reduces its slice to its local latest
    * BEFORE the exchange (a window `row_number` formulation would
    * shuffle and sort the entire feed instead). Then ONE shuffled-hash
    * full-outer join against the snapshot on the key; the snapshot is
    * never sorted, and the join payload is exactly the state columns.
    * Cost is O(|feed|) + O(|snapshot|) scan + one shuffle each —
    * independent of how many historical change events a key has seen.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keys: Seq[String], orderCols: Seq[String], opCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct(col(opCol).as("_op") +: payloadCols.map(col): _*),
        struct(orderCols.map(col): _*)).as("_c"))
      .hint("shuffle_hash")
    snapshot.join(latest, keys, "full_outer")
      // deletes drop the key even if the snapshot never had it (a
      // feed-only insert-then-delete key must not materialize)
      .filter(col("_c").isNull || col("_c._op") =!= "D")
      .select(keys.map(col) ++ payloadCols.map(c =>
        when(col("_c").isNotNull, col(s"_c.$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
