package graft.tools

import graft.Tables
import graft.operators.{Hnsw, ShardedHnsw}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 measurements (VERDICT r17 #2): what does the primitive
  * codec + per-executor shard cache buy per streaming trigger?
  *
  * 1. blob size: v2 primitive layout vs the legacy Java object stream
  *    at the serving shape (10× pair-interpolated corpus);
  * 2. decode latency: legacy vs v2 vs a cache hit;
  * 3. per-trigger serving latency over the PERSISTED tier: cold cache
  *    (every shard decodes) vs warm (every decode is a cache hit) —
  *    the regime StreamingAnn pays once per trigger per shard
  *    without the cache. */
object Round18Bench {
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
    println(s"[r18bench] corpus n=${rows.length} (${baseArr.length} base x 10)")

    def timed(label: String, reps: Int = 1)(f: => Unit): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[r18bench] $label%-52s $best%8.4fs (min of $reps)")
      best
    }

    // ---- 1+2: codec size + decode latency on one serving-sized shard
    val shard = rows.take(2048).toSeq
    val g = Hnsw.build(shard, 16, 100)
    val v2 = ShardedHnsw.serialize(g)
    val legacy = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(g); oos.close(); bos.toByteArray
    }
    println(f"[r18bench] blob bytes: v2=${v2.length}%d legacy=${legacy.length}%d " +
      f"(${v2.length.toDouble / legacy.length}%.3fx)")
    timed("decode legacy (ObjectInputStream), 50 reps", 3) {
      (1 to 50).foreach(_ => ShardedHnsw.deserialize(legacy))
    }
    timed("decode v2 (primitive layout), 50 reps", 3) {
      (1 to 50).foreach(_ => ShardedHnsw.deserialize(v2))
    }
    ShardedHnsw.resetCache()
    ShardedHnsw.deserializeCached(v2) // prime
    timed("decode v2 through cache (hits), 50 reps", 3) {
      (1 to 50).foreach(_ => ShardedHnsw.deserializeCached(v2))
    }

    // ---- 3: per-trigger latency over the persisted tier
    val dir = java.nio.file.Files.createTempDirectory("r18tier").toString
    val (shardsPath, metaPath) = (s"$dir/shards", s"$dir/meta")
    val big = spark.createDataset(rows).repartition(32)
      .toDF("vec_id", "embedding")
    val sh = ShardedHnsw.build(big, "vec_id", "embedding", nCells = 64)
    ShardedHnsw.save(sh, shardsPath, metaPath)
    val queries = spark.createDataset(rows.take(64).toSeq)
      .toDF("qid", "qv")
    def trigger(): Unit = {
      val re = ShardedHnsw.load(spark, shardsPath, metaPath)
      ShardedHnsw.searchBatch(re, queries, "qid", "qv", k = 10,
        nProbe = 8).count()
      ()
    }
    trigger() // JIT/codegen warm
    ShardedHnsw.resetCache()
    val cold = timed("trigger, cold shard cache (every shard decodes)") {
      trigger()
    }
    val warm = timed("trigger, warm shard cache (decodes are hits)", 3) {
      trigger()
    }
    println(f"[r18bench] per-trigger delta cold->warm: ${cold - warm}%.3fs " +
      f"(${cold / warm}%.2fx)")
    spark.stop()
  }
}
