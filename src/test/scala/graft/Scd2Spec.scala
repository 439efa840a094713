package graft

import graft.operators.Scd2
import graft.operators.Scd2.Config
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val conf = Config(Seq("id"), Seq("name", "city"), Seq("name"))
  private val t0 = graft.functions.Functions.utcTimestamp("2024-01-01 00:00:00")
  private val t1 = graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")
  private val t2 = graft.functions.Functions.utcTimestamp("2024-03-01 00:00:00")

  private def batch0 = Seq((1, "acme", "nyc"), (2, "globex", "la")).toDF("id", "name", "city")
  private def batch1 = Seq((1, "acme", "boston"), (2, "globex", "la"), (3, "initech", "sf"))
    .toDF("id", "name", "city")

  test("initial load stamps version 1 current rows") {
    val t = Scd2.initialLoad(batch0, conf, t0)
    assert(t.count() === 2)
    assert(t.filter($"is_current" && $"version_no" === 1).count() === 2)
    assert(t.select(max($"effective_end_ts")).collect()(0)
      .getTimestamp(0) === Scd2.SentinelEnd)
  }

  test("merge: changed key expires old row and inserts version 2; unchanged is a no-op; new key starts at 1") {
    val merged = Scd2.merge(Scd2.initialLoad(batch0, conf, t0), batch1, conf, t1)
    // id=1 changed city: two rows
    val id1 = merged.filter($"id" === 1).orderBy("version_no").collect()
    assert(id1.length === 2)
    assert(!id1(0).getAs[Boolean]("is_current") && id1(0).getAs[java.sql.Timestamp]("effective_end_ts") === t1)
    assert(id1(1).getAs[Boolean]("is_current") && id1(1).getAs[Int]("version_no") === 2)
    // id=2 unchanged: single untouched row (hash short-circuit)
    val id2 = merged.filter($"id" === 2).collect()
    assert(id2.length === 1)
    assert(id2(0).getAs[java.sql.Timestamp]("effective_start_ts") === t0)
    // id=3 new: version 1 starting t1
    val id3 = merged.filter($"id" === 3).collect()
    assert(id3.length === 1 && id3(0).getAs[Int]("version_no") === 1)
    assert(id3(0).getAs[java.sql.Timestamp]("effective_start_ts") === t1)
  }

  test("merge is idempotent: re-merging the same batch changes nothing") {
    val once = Scd2.merge(Scd2.initialLoad(batch0, conf, t0), batch1, conf, t1)
    val twice = Scd2.merge(once, batch1, conf, t2)
    assert(twice.count() === once.count())
    assert(twice.filter($"is_current").count() === once.filter($"is_current").count())
    // and no row gained a t2 timestamp
    assert(twice.filter($"effective_start_ts" === t2).count() === 0)
  }

  test("incoming duplicates dedupe deterministically before merge") {
    val dup = Seq((1, "acme", "boston"), (1, "acme", "boston"), (1, "zzz", "boston"))
      .toDF("id", "name", "city")
    val merged = Scd2.merge(Scd2.initialLoad(batch0, conf, t0), dup, conf, t1)
    // dedupeOrder desc by name → "zzz" wins
    val cur = merged.filter($"id" === 1 && $"is_current").collect()
    assert(cur.length === 1 && cur(0).getAs[String]("name") === "zzz")
  }

  test("asOf time travel reconstructs historical state") {
    val merged = Scd2.merge(Scd2.initialLoad(batch0, conf, t0), batch1, conf, t1)
    val atJan = Scd2.asOf(merged, graft.functions.Functions.utcTimestamp("2024-01-15 00:00:00"))
    assert(atJan.count() === 2) // id 3 not yet born
    assert(atJan.filter($"id" === 1).collect()(0).getAs[String]("city") === "nyc")
    val atFeb = Scd2.asOf(merged, graft.functions.Functions.utcTimestamp("2024-02-15 00:00:00"))
    assert(atFeb.count() === 3)
    assert(atFeb.filter($"id" === 1).collect()(0).getAs[String]("city") === "boston")
  }

  test("history returns ordered versions for a key") {
    val merged = Scd2.merge(Scd2.initialLoad(batch0, conf, t0), batch1, conf, t1)
    val h = Scd2.history(merged, conf, Seq(1)).select("version_no").as[Int].collect()
    assert(h.toSeq === Seq(1, 2))
  }

  test("invariants hold after merge and detect corruption") {
    val merged = Scd2.merge(Scd2.initialLoad(batch0, conf, t0), batch1, conf, t1)
    assert(Scd2.invariants(merged, conf).filter(!$"passed").count() === 0)
    // corrupt: duplicate current row
    val corrupted = merged.unionByName(merged.filter($"id" === 2))
    val bad = Scd2.invariants(corrupted, conf).filter(!$"passed").collect()
    assert(bad.map(_.getAs[String]("rule")).contains("single_current_per_key"))
  }

  test("writeAtomic swaps staging over live and survives re-write") {
    val dir = java.nio.file.Files.createTempDirectory("scd2w").toString + "/table"
    val t = Scd2.initialLoad(batch0, conf, t0)
    Scd2.writeAtomic(t, dir)
    assert(spark.read.parquet(dir).count() === 2)
    // overwrite-while-reading discipline: merge from the written table
    val merged = Scd2.merge(spark.read.parquet(dir), batch1, conf, t1)
    Scd2.writeAtomic(merged, dir)
    assert(spark.read.parquet(dir).count() === 4)
    assert(!new java.io.File(dir + ".staging").exists)
    assert(!new java.io.File(dir + ".backup").exists)
  }
}
