package graft

import graft.operators.Incremental
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.table(spark, sfDir, "lineitem")
    .filter($"l_extendedprice" > 0)
    .withColumn("ship_date", to_date($"l_shipdate"))
  private val keys = Seq("l_suppkey", "ship_date")

  test("aggState merge is batch-boundary-exact for any split") {
    val full = Incremental.finalizeAggState(
      Incremental.aggState(li, keys, $"l_extendedprice"),
      "total_revenue", "trip_count")
    // 3-way split on an unrelated key, merged pairwise (associativity)
    val parts = (0 until 3).map(i =>
      Incremental.aggState(li.filter($"l_orderkey" % 3 === i), keys,
        $"l_extendedprice"))
    val merged = Incremental.finalizeAggState(
      Incremental.mergeAggStates(
        Incremental.mergeAggStates(parts(0), parts(1), keys), parts(2), keys),
      "total_revenue", "trip_count")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getDate(1).toString)
    val f = full.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3))).toMap
    val m = merged.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(m === f)
  }

  test("snapshotDiff: identical snapshots emit nothing; each change type detected once") {
    val sup = Tables.table(spark, sfDir, "supplier")
    val cols = Seq("s_name", "s_nationkey", "s_acctbal")
    assert(Incremental.snapshotDiff(sup, sup, Seq("s_suppkey"), cols).isEmpty)

    val newSnap = sup.filter($"s_suppkey" =!= 1L)                     // delete key 1
      .withColumn("s_acctbal",
        when($"s_suppkey" === 2L, $"s_acctbal" + 1.0).otherwise($"s_acctbal")) // update key 2
      .unionByName(sup.filter($"s_suppkey" === 3L).select(
        lit(999999L).as("s_suppkey"), $"s_name", $"s_nationkey", $"s_acctbal")) // insert
    val diff = Incremental.snapshotDiff(sup, newSnap, Seq("s_suppkey"), cols)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(1L -> "delete", 2L -> "update", 999999L -> "insert"))
  }

  test("snapshotDiff digest: NULL ≠ '' and separator-looking values can't shift boundaries") {
    val cols = Seq("a", "b")
    // NULL → '' flips must surface as updates (a separator+coalesce
    // digest would see the same bytes on both sides)
    val oldNull = Seq((1L, Option.empty[String], Option("x")))
      .toDF("k", "a", "b")
    val newEmpty = Seq((1L, Option(""), Option("x"))).toDF("k", "a", "b")
    val d1 = Incremental.snapshotDiff(oldNull, newEmpty, Seq("k"), cols)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d1 === Map(1L -> "update"))
    // field-boundary shift: ('a||b','c') vs ('a','b||c') concatenate
    // identically under any separator scheme — the fixed-width
    // per-column digests must still see the update
    val oldShift = Seq((1L, "a||b", "c")).toDF("k", "a", "b")
    val newShift = Seq((1L, "a", "b||c")).toDF("k", "a", "b")
    val d2 = Incremental.snapshotDiff(oldShift, newShift, Seq("k"), cols)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2 === Map(1L -> "update"))
  }
}
