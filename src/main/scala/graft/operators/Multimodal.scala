package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * The Spark-side plumbing — schema, partitioning, batched
  * per-partition processing (the Scala analog of `mapInPandas`) — is
  * real and tested. Header-level decoding (format detection + pixel
  * dimensions for PNG/JPEG/GIF) is REAL, pure-JVM byte parsing
  * ([[ImageHeader]]); only full pixel/spectral decode remains a
  * clearly-marked DETERMINISTIC STUB because no codec libraries exist
  * in this environment. Swapping in a real decoder changes ONE
  * function body; every plan shape stays.
  */
object Multimodal {

  /** Pure-JVM image header probe — PNG / JPEG / GIF format and pixel
    * dimensions read directly from the payload's leading bytes, no
    * codec library. Runs inside the same batched mapPartitions as the
    * rest of feature extraction, so cost is one O(header) scan per
    * row with zero extra shuffles.
    */
  object ImageHeader {
    final case class Info(format: String, width: Int, height: Int)

    private def u8(b: Byte): Int = b & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b(i)) << 8) | u8(b(i + 1))
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b(i)) << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))
    private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG: 8-byte signature, then the IHDR chunk — width/height are
      * big-endian 32-bit at fixed offsets 16 and 20.
      */
    private def parsePng(b: Array[Byte]): Option[Info] =
      if (b.length >= 24 && b.take(8).sameElements(PngSig))
        Some(Info("png", be32(b, 16), be32(b, 20)))
      else None

    /** JPEG: SOI then a marker stream; walk segment lengths until a
      * start-of-frame marker (C0–CF minus C4/C8/CC), whose payload
      * carries height then width as big-endian 16-bit after the
      * precision byte.
      */
    private def parseJpeg(b: Array[Byte]): Option[Info] = {
      if (b.length < 4 || u8(b(0)) != 0xff || u8(b(1)) != 0xd8) return None
      def isSof(m: Int) = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b(i)) != 0xff) return None
        var j = i
        while (j + 1 < b.length && u8(b(j + 1)) == 0xff) j += 1 // fill bytes
        val marker = u8(b(j + 1))
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i = j + 2
        else if (marker == 0xd9 || marker == 0xda) return None // EOI / entropy data, no SOF seen
        else {
          if (j + 3 >= b.length) return None
          val len = be16(b, j + 2)
          if (isSof(marker))
            return if (j + 9 <= b.length)
              Some(Info("jpeg", be16(b, j + 7), be16(b, j + 5)))
            else None
          i = j + 2 + len
        }
      }
      None
    }

    /** GIF87a/GIF89a: logical screen width/height, little-endian
      * 16-bit at offsets 6 and 8.
      */
    private def parseGif(b: Array[Byte]): Option[Info] = {
      val sigOk = b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a'
      if (sigOk) Some(Info("gif", le16(b, 6), le16(b, 8))) else None
    }

    def probe(b: Array[Byte]): Option[Info] =
      if (b == null) None
      else parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))
  }

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
      fake_brightness: Long,
      image_format: Option[String],
      width: Option[Int],
      height: Option[Int])

  /** Per-row decode: format detection and dimensions are REAL header
    * parsing ([[ImageHeader.probe]] — None for non-image payloads);
    * the pixel-level features are a ─── STUB ─── (stable
    * pseudo-features from the bytes: a real decoder would emit
    * pixel/spectral values here, and changes only this body).
    */
  private def decodeStub(mediaId: Long, content: Array[Byte],
                         numFrames: Int): MediaFeatures = {
    val len = if (content == null) 0L else content.length.toLong
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(if (content == null) Array.emptyByteArray else content)
      .map("%02x".format(_)).mkString
    // frame sampling: numFrames evenly spaced byte offsets
    val offsets = (0 until numFrames).map(i => i * len / numFrames)
    val header = ImageHeader.probe(content)
    MediaFeatures(mediaId, len, md5, offsets.mkString(","), len % 256,
      header.map(_.format), header.map(_.width), header.map(_.height))
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

  final case class MediaMeta(width: Option[Int], height: Option[Int],
                             duration_ms: Option[Long], sample_rate: Option[Int])
  final case class MediaRow(media_id: Long, kind: String,
                            content: Array[Byte], meta: MediaMeta)

  /** Fill `meta.width/height` from REAL header parsing of the binary
    * payload (PNG/JPEG/GIF). Same mapPartitions shape as
    * [[extractFeatures]]; rows whose payload isn't a recognized image
    * keep their existing meta untouched.
    */
  def withImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content", "meta").as[MediaRow]
      .mapPartitions(_.map { r =>
        ImageHeader.probe(r.content) match {
          case Some(info) => r.copy(meta =
            r.meta.copy(width = Some(info.width), height = Some(info.height)))
          case None => r
        }
      }).toDF()
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
