package graft

import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The events `ts` schema contract: generators have shipped
  * events.parquet as TIMESTAMP(NANOS) (legacy int64 decode) and as
  * plain timestamp[us] (TIMESTAMP_NTZ decode) in different rounds, and
  * one encoding swap once broke every events consumer at the gate.
  * This spec writes the SAME rows in all three parquet encodings —
  * true TIMESTAMP(NANOS) via parquet-mr (Spark cannot write it),
  * timestamp_ntz, and session-zoned timestamp — and pins that every
  * consumer (batch read, file-source stream, watermarked outer join)
  * analyzes and returns identical results on each.
  */
class EventsEncodingSpec extends SparkSpec {

  private val RowCount = 96

  /** Deterministic event rows: epoch micros (with sub-ms precision so
    * µs fidelity is actually exercised), 5 users, 3 event types.
    */
  private case class Ev(eventId: Long, micros: Long, userId: Long,
                        eventType: String, value: Double, props: String)

  private val baseMicros = graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")
    .getTime * 1000L // UTC session: wall-clock == instant
  private val rows: Seq[Ev] = (0 until RowCount).map { i =>
    Ev(i.toLong, baseMicros + i.toLong * 7 * 60 * 1000000L + i,
      (i % 5).toLong, Seq("click", "purchase", "view")(i % 3),
      i * 1.5, "{}")
  }

  private val dir =
    java.nio.file.Files.createTempDirectory("ev_encodings").toString

  /** True TIMESTAMP(NANOS) parquet, written with parquet-mr's example
    * API — the legacy layout the engine must keep decoding.
    */
  private def writeNanosFixture(path: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
      .named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf).withType(schema).build()
    try rows.foreach { r =>
      val g = new SimpleGroup(schema)
      g.add("event_id", r.eventId)
      g.add("ts", r.micros * 1000L)
      g.add("user_id", r.userId)
      g.add("event_type", Binary.fromString(r.eventType))
      g.add("value", r.value)
      g.add("props", Binary.fromString(r.props))
      w.write(g)
    } finally w.close()
  }

  private lazy val fixtures: Map[String, String] = {
    val base = spark.createDataFrame(rows.map { r =>
        val t = new java.sql.Timestamp(r.micros / 1000)
        t.setNanos((r.micros % 1000000L).toInt * 1000)
        (r.eventId, t, r.userId, r.eventType, r.value, r.props)
      })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    base.write.mode("overwrite").parquet(s"$dir/tz/events.parquet")
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    new java.io.File(s"$dir/nanos").mkdirs()
    writeNanosFixture(s"$dir/nanos/events.parquet")
    Map("tz" -> s"$dir/tz", "ntz" -> s"$dir/ntz", "nanos" -> s"$dir/nanos")
  }

  private def collected(df: DataFrame): Seq[String] =
    df.orderBy("event_id")
      .select(col("event_id"), col("ts").cast("string"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .collect().map(_.mkString("|")).toSeq

  test("Tables.events decodes all three encodings to identical TimestampType rows") {
    val results = fixtures.map { case (enc, d) =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"encoding=$enc")
      enc -> collected(df)
    }
    assert(results("tz").size === RowCount)
    assert(results("ntz") === results("tz"))
    assert(results("nanos") === results("tz"))
    // sub-ms precision survived (row i carries +i µs)
    assert(results("tz")(1).contains("00:07:00.000001"))
  }

  test("file-source streaming consumers agree across encodings") {
    val perEnc = fixtures.map { case (enc, d) =>
      enc -> EventStream.windowedAggAvailableNow(
          spark, s"$d/events.parquet", queryName = s"enc_wagg_$enc")
        .orderBy("window_start", "event_type")
        .collect().map(_.mkString("|")).toSeq
    }
    assert(perEnc("tz").nonEmpty)
    assert(perEnc("ntz") === perEnc("tz"))
    assert(perEnc("nanos") === perEnc("tz"))
  }

  test("watermarked outer stream join analyzes and agrees across encodings") {
    val perEnc = fixtures.map { case (enc, d) =>
      val run = EventStream.clickPurchaseOuterJoinRun(
        spark, s"$d/events.parquet", "leftOuter", s"enc_outer_$enc")
      enc -> run.result
        .orderBy("user_id", "click_id", "purchase_id")
        .collect().map(_.mkString("|")).toSeq
    }
    assert(perEnc("tz").nonEmpty)
    assert(perEnc("ntz") === perEnc("tz"))
    assert(perEnc("nanos") === perEnc("tz"))
  }
}
