package graft

import graft.streaming.StateTuning

/** Pins the scale-adaptive streaming state-partition sizing (r15
  * optimization): the per-partition-per-batch state-store commit is
  * fixed overhead, so the partition count must follow input bytes —
  * floor 1 (never zero), capped (a cluster raises the cap by conf),
  * ceil division in between. Also pins that the session conf scope
  * restores `spark.sql.shuffle.partitions` even on failure — a leaked
  * tiny value would silently serialize every later batch query.
  */
class StateTuningSpec extends SparkSpec {

  test("partitionsForBytes: floor 1, ceil division, cap") {
    val m = 32L * 1024 * 1024
    assert(StateTuning.partitionsForBytes(0L, m, 4096) == 1)
    assert(StateTuning.partitionsForBytes(1L, m, 4096) == 1)
    assert(StateTuning.partitionsForBytes(m, m, 4096) == 1)
    assert(StateTuning.partitionsForBytes(m + 1, m, 4096) == 2)
    assert(StateTuning.partitionsForBytes(10 * m, m, 4096) == 10)
    // cap binds: a 100 TB input saturates the deployment cap instead
    // of requesting millions of state stores
    assert(StateTuning.partitionsForBytes(100L * 1024 * 1024 * 1024 * 1024,
      m, 4096) == 4096)
  }

  test("statePartitions derives from on-disk bytes and session-conf knobs") {
    val events = s"$sfDir/events.parquet"
    val bytes = StateTuning.inputBytes(spark, Seq(events))
    assert(bytes > 0, "events.parquet must exist and be non-empty")
    // tiny test file under the default 32 MB target → exactly 1
    assert(StateTuning.statePartitions(spark, Seq(events)) == 1)
    // knobs are read per call: 1 byte per partition forces the cap path
    spark.conf.set(StateTuning.BytesPerPartitionKey, "1")
    spark.conf.set(StateTuning.MaxPartitionsKey, "7")
    try assert(StateTuning.statePartitions(spark, Seq(events)) == 7)
    finally {
      spark.conf.unset(StateTuning.BytesPerPartitionKey)
      spark.conf.unset(StateTuning.MaxPartitionsKey)
    }
    // a missing path contributes zero bytes, not an exception
    assert(StateTuning.inputBytes(spark, Seq("/nonexistent/nope.parquet")) == 0L)
  }

  test("withStatePartitions scopes and restores spark.sql.shuffle.partitions") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val seen = StateTuning.withStatePartitions(spark,
      Seq(s"$sfDir/events.parquet")) { spark.conf.get(key) }
    assert(seen == "1") // sized to the tiny input, not the session value
    assert(spark.conf.get(key) == before)
    // restored on failure too
    intercept[RuntimeException] {
      StateTuning.withStatePartitions(spark, Seq(s"$sfDir/events.parquet")) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) == before)
  }
}
