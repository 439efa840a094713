package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * The Spark-side plumbing — schema, partitioning, batched
  * per-partition processing (the Scala analog of `mapInPandas`) — is
  * real and tested; the actual codec work is a clearly-marked
  * DETERMINISTIC STUB (`decodeStub`) because no image/audio libraries
  * exist in this environment. Swapping in a real decoder changes ONE
  * function body; every plan shape stays.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Deterministic fake media table from a text corpus: the UTF-8
    * bytes become the binary payload. Lets every downstream stage be
    * exercised with reproducible content.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("content"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      content_md5: String,
      frame_offsets: String,
      fake_brightness: Long)

  /** ─── STUB ─── deterministic stand-in for a real image/audio
    * decoder. Real implementation would decode `content` and emit
    * pixel/spectral features; this derives stable pseudo-features
    * from the bytes so the distributed plumbing is testable.
    */
  private def decodeStub(mediaId: Long, content: Array[Byte],
                         numFrames: Int): MediaFeatures = {
    val len = if (content == null) 0L else content.length.toLong
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(if (content == null) Array.emptyByteArray else content)
      .map("%02x".format(_)).mkString
    // frame sampling: numFrames evenly spaced byte offsets
    val offsets = (0 until numFrames).map(i => i * len / numFrames)
    MediaFeatures(mediaId, len, md5, offsets.mkString(","), len % 256)
  }

  /** Batched per-partition feature extraction — the `mapInPandas`
    * shape: partitions stream through in fixed-size batches (batch
    * boundary = where a vectorized decoder would amortize setup), no
    * driver collection, output is a typed Dataset.
    */
  def extractFeatures(media: DataFrame, numFrames: Int = 4,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.iterator.map { case (id, bytes) =>
            decodeStub(id, bytes, numFrames)
          }
        }
      }
  }

  /** Metadata-only resize stub: plumbing for a resize stage — updates
    * the typed meta struct without touching payloads (a real resize
    * rewrites `content` in the same mapPartitions shape as
    * `extractFeatures`).
    */
  def resizeMeta(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta",
      struct(
        lit(width).as("width"),
        lit(height).as("height"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.sample_rate").as("sample_rate")))
}
