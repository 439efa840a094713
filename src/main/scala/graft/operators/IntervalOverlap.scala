package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join via TIME-BUCKET blocking — the scalable
  * form of the `a.start < b.end AND b.start < a.end` theta join
  * (which Spark would otherwise execute as a cartesian/BNLJ: every
  * row against every row).
  *
  * Each interval explodes to the fixed-width buckets it spans, pairs
  * form per bucket with an EQUI join, the true overlap predicate
  * filters in-bucket, and each surviving pair is emitted EXACTLY
  * ONCE at its canonical bucket — the bucket containing
  * `max(start_a, start_b)` (the overlap's first instant, guaranteed
  * inside both intervals' bucket spans, so no pair is lost and no
  * pair duplicates across buckets).
  *
  * Cost model: explode factor = ⌈interval length / bucket⌉ per row —
  * size the bucket to the TYPICAL interval (an hour bucket for
  * ~hour sessions). Pair work per bucket is quadratic in that
  * bucket's CONCURRENCY — irreducible (it bounds the output), and
  * the honest quadratic every interval join carries; the bucket
  * hash-partitions it across the cluster instead of one task.
  * All arithmetic is integer epoch-MICROSECOND floor division —
  * no timestamp/double rounding anywhere, so bucketing is
  * bit-identical cross-engine.
  */
object IntervalOverlap {

  /** Overlapping (id_1 < id_2) pairs among intervals
    * [startCol, endCol). Zero-length intervals are supported (a
    * point inside an open interval overlaps it under the strict
    * formula). `idCol` must be unique per interval.
    */
  def overlapPairs(intervals: DataFrame, idCol: String, startCol: String,
                   endCol: String, bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val bUs = bucketSeconds * 1000000L
    val us = (c: String) => unix_micros(col(c))
    val bucketed = intervals.select(
        col(idCol).as("_id"), us(startCol).as("_s"), us(endCol).as("_e"))
      .select(col("_id"), col("_s"), col("_e"),
        explode(sequence(
          expr(s"_s DIV ${bUs}L"),
          // end-exclusive: an interval ending ON a boundary does not
          // enter that bucket; greatest() keeps zero-length intervals
          // in their own bucket instead of a descending sequence
          greatest(expr(s"_s DIV ${bUs}L"), expr(s"(_e - 1) DIV ${bUs}L"))))
          .as("_b"))
    val a = bucketed.select(col("_b"), col("_id").as("id_1"),
      col("_s").as("_s1"), col("_e").as("_e1"))
    val b = bucketed.select(col("_b"), col("_id").as("id_2"),
      col("_s").as("_s2"), col("_e").as("_e2"))
    a.join(b.hint("shuffle_hash"), Seq("_b"))
      .filter(col("id_1") < col("id_2"))
      .filter(col("_s1") < col("_e2") && col("_s2") < col("_e1"))
      // canonical-bucket dedup: emit only where the overlap starts
      // (integer DIV — floor on the same epoch-micros both engines see)
      .filter(expr(s"greatest(_s1, _s2) DIV ${bUs}L") === col("_b"))
      .select(col("id_1"), col("id_2"),
        greatest(col("_s1"), col("_s2")).as("overlap_start_us"),
        least(col("_e1"), col("_e2")).as("overlap_end_us"))
  }

  /** Per-interval concurrency — how many OTHER intervals overlap
    * each one (0 for loners; every input row keeps its output row) —
    * WITHOUT enumerating pairs. Counting needs no pair join:
    *
    *   overlaps(a) = #{b : b.start < a.end} − #{b : b.end ≤ a.start}
    *                 − own(a)
    *
    * (the two exclusion sets are disjoint for any b with
    * start ≤ end, and own(a) = +1 for a nonempty interval counting
    * its own start in the first term, −1 for a zero-length point
    * counting its own end in the second). Both order-statistic
    * counts come from ONE merged event stream ranked by the
    * distributed merge-rank recipe ([[Sampling.shuffledPositions]]'s
    * pattern): starts/ends become (ts, kind, id) rows, partitioned
    * by a DETERMINISTIC time bucket (`ts DIV bucket` — a pure
    * function of the row, NOT repartitionByRange, whose sampled
    * boundaries are not guaranteed stable across the plan's two
    * executions of this frame), running conditional sums within each
    * bucket, plus a per-bucket-totals offset frame (O(#buckets) rows
    * — bounded by time span / bucket, broadcast) for exact global
    * prefix counts.
    *
    * No separate probe rows: each interval's own two event rows ARE
    * its probes. With ends (kind 0) ordered before starts (kind 1)
    * at equal ts, the start-count running sum read AT the interval's
    * end row counts exactly the starts with `ts < a.end` (same-ts
    * starts sort after every end row), and the end-count sum read AT
    * its start row counts exactly the ends with `ts ≤ a.start`
    * (same-ts ends sort before every start row) — the strict /
    * non-strict boundary pair the formula needs. Equal-(ts, kind)
    * tie order cannot matter: a row's own kind contributes nothing
    * to the counter it reads. This halves the merged stream (2 rows
    * per interval, was 4 with probes) and carries no null-padded
    * probe columns or string-cast ids — the census's GC cost at
    * sf0.1 dropped ~7× in the rewrite. Bucket width trades
    * offset-frame size against per-bucket sort size (one task sorts
    * one bucket): size it so a bucket's events fit a task, the same
    * dial every merge-rank carries.
    *
    * Every stage is linear: explode ×2, two bounded shuffles, one
    * per-id pivot, one join back — where the pair-materializing
    * census is quadratic in bucket concurrency (measured: timed out
    * at a 30× user-population sweep; this form runs it in seconds).
    * Use [[overlapPairs]] when the pairs THEMSELVES are the output.
    */
  def concurrencyCensus(intervals: DataFrame, idCol: String,
                        startCol: String, endCol: String,
                        bucketSeconds: Long = 3600): DataFrame = {
    val iv = intervals.select(col(idCol).as("_id"),
      unix_micros(col(startCol)).as("_s"), unix_micros(col(endCol)).as("_e"))
    // merged stream: kind 0 = interval end, 1 = interval start; each
    // row doubles as its interval's probe of the opposite counter
    val events = iv.select(explode(array(
        struct(col("_e").as("_ts"), lit(0).as("_k"), col("_id").as("_pid")),
        struct(col("_s").as("_ts"), lit(1).as("_k"), col("_id").as("_pid"))))
        .as("_ev"))
      .select(col("_ev.*"))
    val bUs = bucketSeconds * 1000000L
    val ranked = events.withColumn("_p", expr(s"_ts DIV ${bUs}L"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_p")).orderBy(col("_ts"), col("_k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = ranked.select(col("_p"), col("_k"), col("_pid"),
      sum(when(col("_k") === 1, 1L).otherwise(0L)).over(w).as("_ls"),
      sum(when(col("_k") === 0, 1L).otherwise(0L)).over(w).as("_le"))
    // per-bucket totals → exclusive prefix offsets (O(#buckets) rows
    // — the one single-partition window here runs over that bounded
    // frame, never the data)
    val offW = org.apache.spark.sql.expressions.Window.orderBy(col("_p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = ranked.groupBy(col("_p"))
      .agg(sum(when(col("_k") === 1, 1L).otherwise(0L)).as("_ps"),
        sum(when(col("_k") === 0, 1L).otherwise(0L)).as("_pe"))
      .select(col("_p"),
        coalesce(sum(col("_ps")).over(offW), lit(0L)).as("_os"),
        coalesce(sum(col("_pe")).over(offW), lit(0L)).as("_oe"))
    val counts = local
      .join(broadcast(offsets), Seq("_p"))
      .groupBy(col("_pid"))
      .agg(max(when(col("_k") === 0, col("_ls") + col("_os"))).as("_cntA"),
        max(when(col("_k") === 1, col("_le") + col("_oe"))).as("_cntB"))
    intervals
      .join(counts.hint("shuffle_hash"), col(idCol) === col("_pid"))
      .withColumn("n_concurrent",
        col("_cntA") - col("_cntB") -
          when(unix_micros(col(startCol)) < unix_micros(col(endCol)), 1L)
            .otherwise(-1L))
      .drop("_pid", "_cntA", "_cntB")
  }
}
