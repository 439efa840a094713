package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The dump-layer timestamp normalization that makes the driver's
  * DuckDB compare see naive (NTZ) timestamps instead of Spark's
  * instant-semantics TimestampType.
  */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("normalizeTimestamps casts instant timestamps to NTZ, preserving wall-clock") {
    val df = Seq(("a", graft.functions.Functions.utcTimestamp("2024-03-01 12:34:56.789")))
      .toDF("k", "ts")
    val out = Verify.normalizeTimestamps(df)
    assert(out.schema("ts").dataType === TimestampNTZType)
    assert(out.schema("k").dataType === StringType)
    // UTC session: same wall-clock value survives the cast
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .first().getString(0) === "2024-03-01 12:34:56.789")
  }

  test("normalizeTimestamps reaches timestamps nested in structs and arrays") {
    val df = Seq((1, graft.functions.Functions.utcTimestamp("2024-01-01 00:00:00")))
      .toDF("id", "ts")
      .select(col("id"), struct(col("ts").as("inner")).as("s"),
        array(col("ts")).as("arr"))
    val out = Verify.normalizeTimestamps(df)
    val s = out.schema("s").dataType.asInstanceOf[StructType]
    assert(s("inner").dataType === TimestampNTZType)
    assert(out.schema("arr").dataType.asInstanceOf[ArrayType].elementType === TimestampNTZType)
  }

  test("normalizeTimestamps is identity on timestamp-free frames") {
    val df = Seq((1, "x", 2.0)).toDF("a", "b", "c")
    assert(Verify.normalizeTimestamps(df) eq df)
  }
}
