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

  /** COMPOSED multimodal pipeline: image near-dup by per-channel
    * histogram distance, through blocking → verify → connected
    * components → canonicalize — the consumer query for
    * [[extractFeatures]]'s output (q90).
    *
    * Blocking is EXACT by pigeonhole, not probabilistic: 4 diagonally
    * shifted grids over the 3 selected histogram components (cell
    * c = 1/cells, shift c/4 along the diagonal). Any pair within
    * L∞ < c/8 cuts at most one grid per dimension — boundaries of the
    * 4 grids are c/4 apart per dim, an interval shorter than c/8
    * contains at most one of them — so at most 3 of the 4 grids are
    * cut anywhere and some grid holds both points in one cell (the
    * rotated-prefix SimHash argument in grid form). The verify join
    * then re-checks exact |Δf| ≤ eps per dimension, so candidates are
    * only ever a superset: verdicts at eps are blocking-agnostic for
    * eps < c/8.
    *
    * Operating point: cells=128 (cell 1/128, eps ≤ 0.0009 ≈ a 0.09%
    * histogram-mass shift per bucket). Grid resolution is the
    * candidate-volume lever: at sf0.1 the word-salad corpus packs
    * 1,720 of 5,000 docs into one cells=32 bucket (4.2M candidate
    * pairs) vs 237 at cells=128 (495k) — measured in SCALE.md
    * "Round-12 new-operator shapes".
    *
    * 100 TB shape: features are map-only; each grid key is an equi-join
    * bucket (4× signature rows shuffle, never media bytes); the verify
    * join touches candidate pairs only; components is the
    * large-star/small-star loop.
    *
    * Output: (media_id, canon_id, is_dup) — every input row appears,
    * canonical rows map to themselves (min media_id per component).
    *
    * TWO modes, two cost regimes (SCALE.md "q90 at 10×"):
    *   - `mode = "ball"` (default, q90): the relation is the exact
    *     L∞-ball — every qualifying pair is enumerated and verified.
    *     Exact, but the candidate count IS the true pair count, which
    *     grows quadratically when the corpus concentrates inside eps
    *     balls (the word-salad testdata is that adversarial case: the
    *     round-18 scale suite measures 78.6× time at 10× rows —
    *     scale_suite.json q90). No pair-exact method avoids this —
    *     the relation itself is quadratically dense; past toy scale
    *     use `cell` mode (linear) or the `maxBucket` guard.
    *   - `mode = "cell"` (q91): the relation is shifted-grid EQUALITY
    *     (agree on the quantized histogram in ANY of the 4 grids) —
    *     standard perceptual-hash dedup. Bucket members are mutually
    *     dup BY DEFINITION, so each bucket contributes star edges to
    *     its min member: candidates are LINEAR in rows at any density.
    *     Coarser semantics (no eps refinement), linear scale path. */
  def histogramDedup(media: DataFrame, eps: Double = 0.0009,
                     cells: Int = 128, mode: String = "ball",
                     /** ball-mode hot-bucket guard (round 13): a grid
                       * bucket of m rows emits m²/2 candidates, and at
                       * 100× a concentrated corpus makes the eps-ball
                       * relation ITSELF quadratic — no pair-exact method
                       * avoids that. Buckets larger than this are
                       * dropped before the self-join (their members are
                       * mutually-duplicate boilerplate better served by
                       * cell mode), bounding candidates at 4 × rows ×
                       * cap. Default unlimited keeps exact semantics;
                       * cell mode ignores it (already linear). */
                     maxBucket: Long = Long.MaxValue): DataFrame = {
    require(eps < 1.0 / (8 * cells),
      s"eps=$eps breaks the 4-grid pigeonhole guarantee for cells=$cells " +
        s"(needs eps < ${1.0 / (8 * cells)})")
    import graft.util.Materialize.MatOps
    val feats = extractFeatures(media).select(col("media_id"),
        element_at(col("features"), 3).cast("double").as("f0"),
        element_at(col("features"), 7).cast("double").as("f1"),
        element_at(col("features"), 8).cast("double").as("f2"))
      .materializeOnce(eager = false) // 4 grid branches + 2 verify joins
    val shift = 1.0 / (4.0 * cells) // exact binary fraction for cells=2^k
    val keyed = (0 until 4).map { j =>
      feats.select(col("media_id"), lit(j).as("g"),
        concat_ws("_",
          floor((col("f0") + lit(j * shift)) * cells).cast("long"),
          floor((col("f1") + lit(j * shift)) * cells).cast("long"),
          floor((col("f2") + lit(j * shift)) * cells).cast("long")).as("bkt"))
    }.reduce(_ unionByName _)
    val pairs = mode match {
      case "ball" =>
        val capped =
          if (maxBucket == Long.MaxValue) keyed
          else {
            val hot = keyed.groupBy("g", "bkt").count()
              .filter(col("count") > maxBucket).select("g", "bkt")
            keyed.join(broadcast(hot), Seq("g", "bkt"), "left_anti")
          }
        val cand = capped.as("a").join(capped.as("b"),
            col("a.g") === col("b.g") && col("a.bkt") === col("b.bkt") &&
              col("a.media_id") < col("b.media_id"))
          .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
          .distinct()
        val fa = feats.select(col("media_id").as("id_a"), col("f0").as("a0"),
          col("f1").as("a1"), col("f2").as("a2"))
        val fb = feats.select(col("media_id").as("id_b"), col("f0").as("b0"),
          col("f1").as("b1"), col("f2").as("b2"))
        cand.join(fa, "id_a").join(fb, "id_b")
          .filter(abs(col("a0") - col("b0")) <= eps &&
            abs(col("a1") - col("b1")) <= eps &&
            abs(col("a2") - col("b2")) <= eps)
          .select("id_a", "id_b")
      case "cell" =>
        // star edges to each bucket's min member: one partial-aggregated
        // groupBy + one equi-join back — linear in rows, no pair blowup
        val reps = keyed.groupBy("g", "bkt")
          .agg(min(col("media_id")).as("rep"), count(lit(1)).as("n"))
          .filter(col("n") > 1)
        keyed.join(reps, Seq("g", "bkt"))
          .filter(col("media_id") =!= col("rep"))
          .select(col("rep").as("id_a"), col("media_id").as("id_b"))
          .distinct()
      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' (supported: ball, cell)")
    }
    val cc = Components.connectedComponents(pairs, "id_a", "id_b")
    feats.select("media_id")
      .join(cc.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("component"), col("media_id")).as("canon_id"))
      .withColumn("is_dup", (col("media_id") =!= col("canon_id")).cast("int"))
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
