package graft.tools

import graft.Tables
import graft.operators.ShardedHnsw
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-19 measurements.
  *
  * 1. Map-only IVF assignment (VERDICT r18 #2): the codegen'd
  *    [[graft.plans.NearestCells]] argmin vs the old
  *    crossJoin(broadcast centers) + per-id window, on the 10×
  *    pair-interpolated corpus at build-realistic cell counts — plus
  *    an equality audit (the speedup must be free).
  * 2. Probe-pruned serving (VERDICT r18 #1): per-query latency of the
  *    persisted tier at the auto-probe default vs explicit full
  *    coverage.
  */
object Round19Bench {
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

    val baseArr = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val rows = ScaleCorpus.interpolate(baseArr, 10)
    println(s"[r19bench] corpus n=${rows.length} (${baseArr.length} base x 10)")
    val typed = rows.toSeq.toDF("id", "__v")
      .repartition(32).cache()
    typed.count()

    def timed(label: String, reps: Int = 3)(f: => Unit): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[r19bench] $label%-58s $best%8.4fs (min of $reps)")
      best
    }

    // ---- 1: assignment, old window formulation vs map-only expression
    for (nCells <- Seq(64, 256)) {
      val centers = graft.operators.GraphRank.ivfCenters(typed, nCells, 42L)
      def oldAssign: DataFrame = {
        val centersDf = spark.createDataFrame(
          centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
          .toDF("__cell", "__center")
        val probeW = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(asc("__cdist"), asc("__cell"))
        typed.crossJoin(broadcast(centersDf))
          .withColumn("__cdist", graft.functions.VectorFunctions.sqDist(
            col("__v").cast("array<double>"), col("__center")))
          .withColumn("__crn", row_number().over(probeW))
          .filter(col("__crn") === 1)
          .select(col("id"), col("__cell"))
      }
      def newAssign: DataFrame = typed.select(col("id"),
        graft.plans.NearestCells.assignCell(col("__v"), centers)
          .as("__cell"))
      val tOld = timed(s"assign nCells=$nCells crossJoin+window") {
        oldAssign.groupBy("__cell").count().collect()
      }
      val tNew = timed(s"assign nCells=$nCells NearestCells (map-only)") {
        newAssign.groupBy("__cell").count().collect()
      }
      println(f"[r19bench] assign nCells=$nCells speedup ${tOld / tNew}%.1fx")
      val diff = oldAssign.except(newAssign).count() +
        newAssign.except(oldAssign).count()
      require(diff == 0, s"assignment mismatch: $diff rows differ")
      println(s"[r19bench] assign nCells=$nCells equality audit: identical")
    }

    // ---- 2: probe-pruned serving vs full coverage on the persisted tier
    val dir = java.nio.file.Files.createTempDirectory("graft-r19bench")
    val shards = s"$dir/shards"; val meta = s"$dir/meta"
    val sh = ShardedHnsw.build(typed, "id", "__v", nCells = 64,
      maxCellSize = 4096)
    ShardedHnsw.save(sh, shards, meta)
    val re = ShardedHnsw.load(spark, shards, meta)
    val queries = rows.take(20).map(_._2)
    val auto = graft.Library.autoProbe(spark, 64)
    println(s"[r19bench] serving tier: nCells=64, auto probe = $auto")
    def serve(np: Int): Unit = queries.foreach { qv =>
      ShardedHnsw.searchSingle(re, qv, 10, np).collect()
    }
    serve(auto) // warm the decode cache + JIT once
    val tAuto = timed(s"searchSingle x20, auto probe ($auto/64)") {
      serve(auto)
    }
    val tFull = timed("searchSingle x20, full coverage (64/64)") {
      serve(64)
    }
    println(f"[r19bench] per-query: auto ${tAuto / 20 * 1000}%.1f ms, " +
      f"full ${tFull / 20 * 1000}%.1f ms (${tFull / tAuto}%.1fx)")
    val fs = graft.util.TableSwap.fileSystem(spark, shards)
    graft.util.TableSwap.delete(fs,
      new org.apache.hadoop.fs.Path(dir.toString))
    spark.stop()
  }
}
