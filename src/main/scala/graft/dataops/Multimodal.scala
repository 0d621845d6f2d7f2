package graft.dataops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing — schema, partition-batch iteration, output
  * shape — is real and tested; the actual media decode is STUBBED with a
  * deterministic fake (this container ships no image/audio codecs): a real
  * deployment replaces `fakeDecode` with the codec call, nothing else
  * changes. `mapPartitions` over the binary column is the Scala analogue of
  * Python's `mapInPandas` batch UDF: one decoder init per partition (not per
  * row), batch-amortized.
  */
object Multimodal {

  /** Synthesize an assets table from documents: the text bytes stand in for
    * the media payload (deterministic; real pipelines read binary files).
    */
  def assets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("mime"),
      length(col("text")).cast("long").as("n_bytes"))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Deterministic fake decode: derives "media properties" from payload
    * length/content. REPLACE with a real codec in production.
    */
  private[dataops] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + n % 64, 64 + (n / 64) % 64, 1 + n % 8)
  }

  /** Feature extraction over partition-sized batches: one "decoder" per
    * partition, rows streamed through it. Output is a typed feature table.
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    assetsDf.select("asset_id", "payload").mapPartitions { rows =>
      // per-partition decoder init would go here (expensive at per-row scope)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, f) = fakeDecode(payload)
        val checksum = md.digest(payload).map("%02x".format(_)).mkString
        md.reset()
        Row(id, payload.length.toLong, checksum, w, h, f)
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
