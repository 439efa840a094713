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

  test("applyChanges: latest-wins, deletes, feed-only keys, pass-through") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val feed = Seq(
      // key 1: two updates — the (ts, seq)-latest wins
      (1L, 5L, 1L, "U", "a1", 11L),
      (1L, 6L, 2L, "U", "a2", 12L),
      // key 2: update then delete → absent
      (2L, 5L, 3L, "U", "b1", 21L),
      (2L, 7L, 4L, "D", "xx", 0L),
      // key 4: feed-only insert-then-delete → must NOT materialize
      (4L, 1L, 5L, "I", "d", 40L),
      (4L, 2L, 6L, "D", "xx", 0L),
      // key 5: delete-then-insert (D is EARLIER) → present
      (5L, 1L, 7L, "D", "xx", 0L),
      (5L, 2L, 8L, "I", "e", 50L),
      // key 6: same ts, seq breaks the tie
      (6L, 9L, 10L, "I", "f1", 60L),
      (6L, 9L, 11L, "U", "f2", 61L)
    ).toDF("k", "ts", "seq", "op", "s", "v")
    val got = Incremental.applyChanges(snap, feed, Seq("k"),
      Seq("ts", "seq"), "op", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got === Map(
      1L -> ("a2", 12L),  // latest update
      3L -> ("c", 30L),   // untouched pass-through
      5L -> ("e", 50L),   // re-insert after delete
      6L -> ("f2", 61L))) // seq tiebreak
  }

  test("applyChanges: snapshotDiff round-trip reconstructs the new snapshot") {
    val sup = Tables.table(spark, sfDir, "supplier")
    val cols = Seq("s_name", "s_nationkey", "s_acctbal")
    val newSnap = sup.filter($"s_suppkey" % 13 =!= 0)
      .withColumn("s_acctbal",
        when($"s_suppkey" % 7 === 0, $"s_acctbal" + 5.0)
          .otherwise($"s_acctbal"))
      .unionByName(sup.filter($"s_suppkey" < 3).select(
        ($"s_suppkey" + 10000000L).as("s_suppkey"),
        $"s_name", $"s_nationkey", $"s_acctbal"))
    // payload-carrying feed: diff gives (key, type); deletes carry no
    // payload, inserts/updates carry the NEW row
    val diff = Incremental.snapshotDiff(sup, newSnap, Seq("s_suppkey"), cols)
    val feed = diff
      .join(newSnap, Seq("s_suppkey"), "left")
      .select($"s_suppkey", lit(1L).as("seq"), lit(1L).as("seq2"),
        when($"change_type" === "delete", "D").otherwise("U").as("op"),
        $"s_name", $"s_nationkey", $"s_acctbal")
    val rebuilt = Incremental.applyChanges(sup, feed, Seq("s_suppkey"),
      Seq("seq", "seq2"), "op", cols)
    assert(rebuilt.exceptAll(newSnap.select(
      $"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")).isEmpty)
    assert(newSnap.select($"s_suppkey", $"s_name", $"s_nationkey",
      $"s_acctbal").exceptAll(rebuilt).isEmpty)
  }

  test("applyChanges is partitioning-invariant") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v")
    val feed = (1 to 500).map(i =>
      (i.toLong % 10, i.toLong, i.toLong, if (i % 17 == 0) "D" else "U",
        s"s$i", i.toLong)).toDF("k", "ts", "seq", "op", "s", "v")
    val a = Incremental.applyChanges(snap, feed.repartition(1), Seq("k"),
      Seq("ts", "seq"), "op", Seq("s", "v")).collect().toSet
    val b = Incremental.applyChanges(snap, feed.repartition(23), Seq("k"),
      Seq("ts", "seq"), "op", Seq("s", "v")).collect().toSet
    assert(a === b && a.nonEmpty)
  }
}
