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
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external dependency):
  * true width/height/channel count plus normalized per-channel intensity
  * histograms. Bytes no installed reader claims (text, audio, video,
  * exotic image formats) fall back to [[decodeStub]]'s deterministic
  * byte-histogram pseudo-features, and every output row carries its
  * `decoder` provenance so downstream filters can tell the tiers apart.
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

  /** Real image decode via the JDK's own codecs. None when no installed
    * ImageIO reader recognizes the bytes (the caller falls back to
    * [[decodeStub]]) — ImageIO rejects unknown magic without scanning
    * the payload, so the miss path is cheap for non-image rows.
    * Features: `channels` × 8-bucket intensity histograms (bucketed by
    * each band's own sample depth, so 16-bit sources bucket like 8-bit),
    * normalized by pixel count — each channel's 8 buckets sum to 1. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[DecodedStub] = {
    if (bytes == null) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val raster = im.getRaster
      val w = im.getWidth
      val h = im.getHeight
      val channels = raster.getNumBands
      // bucket = top 3 bits of the sample in its own bit depth
      val shifts = Array.tabulate(channels)(c =>
        math.max(0, raster.getSampleModel.getSampleSize(c) - 3))
      val hist = new Array[Float](channels * 8)
      // row-batched reads: one getSamples call per (band, row) instead
      // of W×H×C getSample virtual calls — same counts, same histogram
      val rowBuf = new Array[Int](w)
      var c = 0
      while (c < channels) {
        val shift = shifts(c)
        val base = c * 8
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, c, rowBuf)
          var x = 0
          while (x < w) {
            hist(base + math.min(7, rowBuf(x) >> shift)) += 1f
            x += 1
          }
          y += 1
        }
        c += 1
      }
      val n = math.max(1f, (w * h).toFloat)
      DecodedStub(w, h, channels, hist.map(_ / n))
    }
  }

  /** STUB decode — the fallback tier for bytes with no JDK codec:
    * deterministic byte-histogram statistics, so tests can assert exact
    * values and pipelines keep a uniform feature shape for non-image
    * media. */
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
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("decoder", StringType, nullable = false)))

  /** Batched per-partition decode + feature extraction. Rows stream
    * through without materializing the partition; ImageIO's reader
    * registry is JVM-global, so per-partition codec setup is free. Rows
    * ImageIO can decode get real dimensions + per-channel histograms
    * (`decoder = "imageio"`); everything else gets the deterministic
    * stub features (`decoder = "stub"`). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    media.select("media_id", "modality", "bytes").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val (d, decoder) = decodeImage(bytes) match {
          case Some(real) => (real, "imageio")
          case None => (decodeStub(bytes), "stub")
        }
        Row(r.getLong(0), r.getString(1), d.width, d.height, d.channels,
          d.features.toSeq, decoder)
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
