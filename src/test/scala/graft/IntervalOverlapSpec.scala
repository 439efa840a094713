package graft

import graft.operators.IntervalOverlap
import org.apache.spark.sql.functions._

/** Bucket-blocked interval join contract: strict-overlap semantics
  * (touching ≠ overlapping, points inside count), exactly-once pair
  * emission across bucket spans, loner rows kept at zero, and
  * invariance to bucket width (the blocking parameter must never
  * change the answer).
  */
class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: Seq[(String, String, String)]) =
    rows.toDF("id", "s", "e")
      .select(col("id"), col("s").cast("timestamp").as("s"),
        col("e").cast("timestamp").as("e"))

  test("overlapPairs: strict overlap, touching excluded, point-inside included, cross-bucket dedup") {
    val d = iv(Seq(
      ("a", "2024-01-01 00:10:00", "2024-01-01 05:00:00"), // long: spans 5+ hour buckets
      ("b", "2024-01-01 03:30:00", "2024-01-01 03:45:00"), // inside a
      ("c", "2024-01-01 05:00:00", "2024-01-01 06:00:00"), // touches a's end: NOT overlap
      ("d", "2024-01-01 04:00:00", "2024-01-01 04:00:00"), // zero-length point inside a
      ("e", "2024-01-02 00:00:00", "2024-01-02 01:00:00"))) // far away
    val p = IntervalOverlap.overlapPairs(d, "id", "s", "e")
      .select("id_1", "id_2").as[(String, String)].collect().toSet
    // a×b overlap spans 1 bucket; a×d is a point-in-interval; a×c touch only
    assert(p === Set(("a", "b"), ("a", "d")))
  }

  test("overlapPairs: a pair spanning many shared buckets is emitted exactly once") {
    val d = iv(Seq(
      ("x", "2024-01-01 00:00:00", "2024-01-01 10:00:00"),
      ("y", "2024-01-01 00:30:00", "2024-01-01 09:30:00"))) // shares 10 buckets with x
    val p = IntervalOverlap.overlapPairs(d, "id", "s", "e").collect()
    assert(p.length === 1)
  }

  test("concurrencyCensus: loners kept at 0; counts match the naive theta join; bucket-width invariant") {
    val d = iv(Seq(
      ("a", "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      ("b", "2024-01-01 01:00:00", "2024-01-01 03:00:00"),
      ("c", "2024-01-01 01:30:00", "2024-01-01 01:45:00"),
      ("z", "2024-01-05 00:00:00", "2024-01-05 01:00:00")))
    def census(bucket: Long) =
      IntervalOverlap.concurrencyCensus(d, "id", "s", "e", bucket)
        .select("id", "n_concurrent").as[(String, Long)].collect().toMap
    val base = census(3600)
    assert(base === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "z" -> 0L))
    // blocking parameter must not change the answer
    assert(census(60) === base)
    assert(census(86400) === base)
  }

  test("overlapPairs plan: equi joins only — never a cartesian/BNLJ theta join") {
    val d = iv(Seq(("a", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      ("b", "2024-01-01 00:30:00", "2024-01-01 01:30:00")))
    val plan = IntervalOverlap.concurrencyCensus(d, "id", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }
}
