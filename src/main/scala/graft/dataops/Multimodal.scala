package graft.dataops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * Image decode is REAL (round 4): `javax.imageio.ImageIO` ships PNG / JPEG /
  * GIF / BMP readers in the bare JDK, so width/height extraction needs no
  * external codecs — `decode` reads the actual pixels of the payload. Audio /
  * video decode remains STUBBED with a deterministic fake (this container
  * ships no audio/video codecs): a real deployment replaces `fakeDecode`
  * for those mimes with the codec call, nothing else changes.
  * `mapPartitions` over the binary column is the Scala analogue of Python's
  * `mapInPandas` batch UDF: one decoder init per partition (not per row),
  * batch-amortized.
  */
object Multimodal {

  /** Image dimensions of the synthesized PNG for a text of `textLen` chars —
    * the construction rule the DuckDB oracle mirrors, so the REAL ImageIO
    * decode stays inside the hash-compare gate: the decoder must read back
    * exactly the dimensions the payload was built with.
    */
  def pngDims(textLen: Int): (Int, Int) =
    (1 + textLen % 16, 1 + (textLen / 16) % 16)

  /** Deterministic tiny PNG: w×h RGB, pixels derived from (id, x, y),
    * encoded by the JDK's own PNG writer. Real image bytes — `decode` reads
    * them back with ImageIO, not arithmetic.
    */
  private[dataops] def makePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 2654435761L + x * 7 + y * 131) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType)))

  /** Synthesize an assets table from documents (deterministic; real
    * pipelines read binary files): even doc_ids become REAL PNG payloads
    * (dimensions derived from the text length — see `pngDims`), odd doc_ids
    * keep the text bytes as an opaque `audio/fake` payload exercising the
    * stubbed-decoder path.
    */
  def assets(documents: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(assetSchema)
    documents.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        if (id % 2 == 0) {
          val (w, h) = pngDims(text.length)
          Row(id, makePng(id, w, h), "image/png")
        } else {
          Row(id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            "audio/fake")
        }
      }
    }(enc)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Mimes the bare JDK can genuinely decode (ImageIO built-in readers). */
  private val JdkImageMimes =
    Set("image/png", "image/jpeg", "image/gif", "image/bmp")

  /** Deterministic fake decode for mimes this container has no codec for
    * (audio/video): derives "media properties" from payload length. REPLACE
    * with a real codec call in production — the seam is `decode`, nothing
    * else changes.
    */
  private[dataops] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + n % 64, 64 + (n / 64) % 64, 1 + n % 8)
  }

  /** (width, height, n_frames): REAL ImageIO decode for JDK-supported image
    * mimes, deterministic fake for everything else.
    */
  private[dataops] def decode(mime: String, payload: Array[Byte]): (Int, Int, Int) =
    if (JdkImageMimes.contains(mime)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, s"undecodable $mime payload (${payload.length} bytes)")
      (img.getWidth, img.getHeight, 1)
    } else fakeDecode(payload)

  /** Feature extraction over partition-sized batches: one decoder per
    * partition, rows streamed through it. Output is a typed feature table.
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    assetsDf.select("asset_id", "payload", "mime").mapPartitions { rows =>
      // per-partition decoder init (expensive at per-row scope)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val (w, h, f) = decode(mime, payload)
        val checksum = md.digest(payload).map("%02x".format(_)).mkString
        md.reset()
        Row(id, mime, payload.length.toLong, checksum, w, h, f)
      }
    }(enc)
  }

  /** Deterministic frame sampling plan: every `stride`-th frame index per
    * asset — the explode pattern a video pipeline uses to fan one asset row
    * out to per-frame work items (narrow, no shuffle).
    */
  def frameSamplePlan(features: DataFrame, stride: Int = 2): DataFrame =
    features.select(col("asset_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
