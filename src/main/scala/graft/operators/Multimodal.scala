package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines.
  *
  * Convention: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode/feature-extraction runs batched per partition
  * (`mapPartitions`) so codec state is amortized and the work scales with
  * input splits — the Scala analog of `mapInPandas` batch UDFs.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[DecodedStub]] derives deterministic pseudo-features
  * from the bytes. The Spark-side plumbing — schema, batch shape,
  * partition-level execution, null handling — is real and tested; wiring
  * a real decoder replaces one function.
  */
object Multimodal {

  /** media schema: (media_id, modality, bytes, meta{mime, width, height,
    * duration_ms}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  case class DecodedStub(width: Int, height: Int, channels: Int,
                         features: Array[Float])

  /** STUB decode: real implementation would call an image codec here.
    * Deterministic: features are byte-histogram statistics, so tests can
    * assert exact values. */
  private[operators] def decodeStub(bytes: Array[Byte]): DecodedStub = {
    val hist = new Array[Float](16)
    if (bytes != null) bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val n = math.max(1f, if (bytes == null) 0f else bytes.length.toFloat)
    DecodedStub(
      width = if (bytes == null) 0 else bytes.length % 1024,
      height = if (bytes == null) 0 else (bytes.length / 1024) + 1,
      channels = 3,
      features = hist.map(_ / n))
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batched per-partition decode + feature extraction. One decoder
    * instantiation per partition; rows stream through without
    * materializing the partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    media.select("media_id", "modality", "bytes").mapPartitions { it =>
      // real codecs would initialize here, once per partition
      it.map { r =>
        val d = decodeStub(r.getAs[Array[Byte]]("bytes"))
        Row(r.getLong(0), r.getString(1), d.width, d.height, d.channels,
          d.features.toSeq)
      }
    }(enc)
  }

  /** Frame sampling stub for video rows: emits every `stride`-th synthetic
    * frame reference (real impl: demux + decode). Generator shape:
    * one input row -> n frame rows, as a flatMap. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    media.filter(col("modality") === "video")
      .withColumn("n_frames",
        greatest(lit(1), (length(col("bytes")) / lit(1000)).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx", "meta")
  }
}
