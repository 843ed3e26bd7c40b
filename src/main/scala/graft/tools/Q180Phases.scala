package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 phase timer for q180's build→save→insert→reload→serve chain
  * (guide §1: find where the time goes before touching anything).
  * Replicates q180_sharded_serving_persisted step for step, printing
  * per-phase wall seconds. Not an artifact of record. */
object Q180Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    (1 to runs).foreach { run =>
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[q180] run$run $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val emb = graft.Tables.embeddings(spark, sfDir)
      val root = java.nio.file.Files
        .createTempDirectory("graft-q180-phase").toFile
      val shards = new java.io.File(root, "shards").getAbsolutePath
      val meta = new java.io.File(root, "meta").getAbsolutePath
      val fs = graft.util.TableSwap.fileSystem(spark, shards)
      val ids = t("ids") {
        emb.select(col("vec_id").cast("long"))
          .orderBy(desc("vec_id"))
          .limit((emb.count() / 10).toInt.max(1))
          .collect().map(_.getLong(0)).toSeq
      }
      val old = emb.filter(!col("vec_id").isInCollection(ids))
      // sub-phase: the centers fit alone (the rest of build re-runs it
      // below — acceptable double-count for a profiling tool)
      t("centers") {
        val typed = old.select(col("vec_id").cast("long").as("id"),
          col("embedding").as("__v"))
        graft.operators.GraphRank.ivfCenters(typed, 8, 42L)
      }
      val sh0 = t("build") {
        graft.operators.ShardedHnsw.build(old, "vec_id",
          "embedding", nCells = 8, maxCellSize = 64)
      }
      t("save") { graft.operators.ShardedHnsw.save(sh0, shards, meta) }
      val batch = t("batch") {
        emb.filter(col("vec_id").isInCollection(ids))
          .select(col("vec_id").cast("long"), col("embedding"))
          .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
      }
      t("insert") {
        graft.operators.ShardedHnsw.insertPersisted(spark, shards, meta, batch)
      }
      val re = t("load") { graft.operators.ShardedHnsw.load(spark, shards, meta) }
      val queries = emb.select(col("vec_id").as("qid"),
        col("embedding").as("qv")).orderBy("qid").limit(30)
      t("search") {
        graft.operators.ShardedHnsw
          .searchBatch(re, queries, "qid", "qv",
            k = 5, nProbe = re.centers.length, ef = 256, exact = true)
          .select(col("qid"), col("rn"), col("id"))
          .orderBy("qid", "rn").collect().length
      }
      graft.util.TableSwap.delete(fs,
        new org.apache.hadoop.fs.Path(root.getAbsolutePath))
      graft.util.Materialize.releaseAll(spark)
    }
    spark.stop()
  }
}
