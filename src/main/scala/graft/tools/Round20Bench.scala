package graft.tools

import graft.Tables
import graft.operators.GraphRank
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-20 measurements (VERDICT r19 #7): evidence for the
  * `spark.graft.knnEdgesExactMax` threshold (100k) that the auto edge
  * source flips on — until now a chosen constant, not a measured one.
  *
  * Two cost surfaces, both printed per corpus size:
  *
  *  1. REBUILD (the out-of-band path a growing corpus hits at every
  *     `knnEdges()` after a change): exact [[GraphRank.knnGraph]] vs
  *     the auto flip's target `ivf(nCells=16, nProbe=16)` (edge-for-
  *     edge exact, distributed) vs the explicitly bounded scale path
  *     `ivf(√n cells, 2·√nCells probes)` (approximate).
  *  2. INGEST DELTA (the per-batch hook cost): the exact
  *     decomposability pass [[GraphRank.knnGraphAppend]] vs the
  *     frozen-center [[GraphRank.knnGraphIvfAppend]] at both configs,
  *     over the SAME prior artifact, so the measured difference is
  *     the delta algorithm, not the prior's quality.
  *
  * Both exact shapes also carry a structural bound time cannot show:
  * [[GraphRank.knnGraph]] collects the corpus to the driver as the
  * broadcast query set (~n·dim·4 B; 10M × 1k dims = 40 GB — a driver
  * OOM long before the compute matters), which is why the threshold
  * exists even where exact wall-clock still wins locally.
  */
object Round20Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val k = 8
    val baseArr = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    println(s"[r20bench] base corpus n=${baseArr.length}")

    def corpusOf(n: Int): DataFrame = {
      val factor = math.ceil(n.toDouble / baseArr.length).toInt
      val rows = ScaleCorpus.interpolate(baseArr, factor).take(n)
      rows.toSeq.toDF("id", "__v").repartition(32)
    }

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[r20bench] $label%-64s $t%8.2fs ($rows rows)")
      t
    }

    // ---- 1: rebuild cost, exact vs the two ivf configs
    val rebuildSizes = Seq(8192, 16384, 32768)
    val results = scala.collection.mutable.Map
      .empty[(String, Int), Double]
    for (n <- rebuildSizes) {
      val df = corpusOf(n).cache(); df.count()
      results(("exact", n)) = timed(s"rebuild exact knnGraph        n=$n") {
        GraphRank.knnGraph(df, "id", "__v", k).count()
      }
      results(("ivf16", n)) = timed(s"rebuild ivf(16,16) exact-edges n=$n") {
        GraphRank.knnGraphIvf(df, "id", "__v", k, 16, 16).count()
      }
      val cells = math.ceil(math.sqrt(n.toDouble)).toInt
      val probes = math.min(cells,
        math.ceil(2 * math.sqrt(cells.toDouble)).toInt)
      results(("ivfSqrt", n)) =
        timed(s"rebuild ivf(sqrt: $cells,$probes) approx  n=$n") {
          GraphRank.knnGraphIvf(df, "id", "__v", k, cells, probes).count()
        }
      df.unpersist()
    }
    for (kind <- Seq("exact", "ivf16", "ivfSqrt");
         Seq(a, b) <- rebuildSizes.sliding(2)) {
      println(f"[r20bench] rebuild $kind%-8s growth $a->$b: " +
        f"${results((kind, b)) / results((kind, a))}%.2fx")
    }
    // quadratic extrapolation of the exact rebuild to the threshold
    val nBig = rebuildSizes.last
    val tBig = results(("exact", nBig))
    val extrap = tBig * math.pow(100000.0 / nBig, 2)
    println(f"[r20bench] exact rebuild extrapolated to n=100k " +
      f"(quadratic from n=$nBig): ~$extrap%.0fs")

    // ---- 2: ingest delta cost at ~100k, same prior artifact
    val nDelta = 102400
    val full = corpusOf(nDelta).cache(); full.count()
    val newIds = full.select("id").as[Long].collect().sorted
      .takeRight(512).toSeq
    val old = full.filter(!col("id").isInCollection(newIds.toSet)).cache()
    old.count()
    // bounded prior: the scale-path build (prior QUALITY is irrelevant
    // to delta COST — both deltas read the same (src,dst,cos) shape)
    val cells = math.ceil(math.sqrt(nDelta.toDouble)).toInt
    val probes = math.ceil(2 * math.sqrt(cells.toDouble)).toInt
    val centersSqrt = GraphRank.ivfCenters(
      old.select(col("id"), col("__v")), cells, 42L)
    var prior: DataFrame = null
    timed(s"prior edges: ivf($cells,$probes) build   n=${nDelta - 512}") {
      prior = GraphRank
        .ivfEdgesFrozen(old, "id", "__v", k, centersSqrt, probes, 65536)
        .cache()
      prior.count()
    }
    val centers16 = GraphRank.ivfCenters(
      old.select(col("id"), col("__v")), 16, 42L)
    val tExact = timed(s"delta exact knnGraphAppend     n=$nDelta b=512") {
      GraphRank.knnGraphAppend(prior, full, "id", "__v", k, newIds).count()
    }
    val tIvf16 = timed(s"delta ivf(16,16) frozen        n=$nDelta b=512") {
      GraphRank.knnGraphIvfAppend(prior, centers16, full, "id", "__v",
        k, 16, newIds).count()
    }
    val tIvfSq = timed(s"delta ivf($cells,$probes) frozen      n=$nDelta b=512") {
      GraphRank.knnGraphIvfAppend(prior, centersSqrt, full, "id", "__v",
        k, probes, newIds).count()
    }
    println(f"[r20bench] delta at n=$nDelta: exact ${tExact}%.2fs, " +
      f"ivf-full ${tIvf16}%.2fs, ivf-sqrt ${tIvfSq}%.2fs")
    spark.stop()
  }
}
