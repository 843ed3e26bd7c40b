package graft.tools

import graft.Tables
import graft.operators.ShardedHnsw
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 measurements: is the persisted sharded-HNSW maintenance
  * actually O(touched partitions) in I/O, not just in work? Builds the
  * tier over a 10x-interpolated corpus (the regime where a full-index
  * rewrite per ingest batch is the scale-killer VERDICT r16 flagged),
  * then measures one ingest batch through `insertPersisted`: wall
  * clock, cell leaves rewritten, and bytes written — against the full
  * `save` rewrite the r16 in-memory path effectively paid. */
object Round17Bench {
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

    // 10x pair-interpolated corpus (ScaleCorpus — one recipe shared
    // with GraphRankSpec's audit-fidelity-at-10x floors): copies fill
    // the space BETWEEN base vectors, so cells are honest
    val baseArr = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val rows = ScaleCorpus.interpolate(baseArr, 10)
    val big = spark.createDataset(rows).repartition(32)
      .toDF("vec_id", "embedding")
    println(s"[r17bench] corpus n=${rows.length} (${baseArr.length} base x 10)")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[r17bench] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    def dirStats(p: String): (Int, Long) = {
      val base = new java.io.File(p)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val files = walk(base).filter(_.getName.endsWith(".parquet"))
      (files.size, files.map(_.length()).sum)
    }

    // one ingest batch (20 vectors — the reference's batch regime);
    // copy 11 is outside the build's 0..9, so the vectors are NEW
    // points, not bit-twins of indexed ones (a twin would tie-break
    // the self-hit check to the smaller indexed id)
    val batch = ScaleCorpus.interpolateCopy(baseArr, 11, 90000000L)
      .take(20)

    // the touched FRACTION is the scale story: at a fixed batch size
    // it shrinks as cells grow (and at 100 TB cell count grows with
    // the corpus), while the full rewrite grows with the index
    for (nCells <- Seq(64, 256)) {
      val root = java.nio.file.Files.createTempDirectory("r17tier").toString
      val shards = s"$root/shards"; val meta = s"$root/shards_meta"
      val sh = timed(s"build ($nCells cells)") {
        val s = ShardedHnsw.build(big, "vec_id", "embedding", nCells)
        s.table.count(); s
      }
      timed(s"save (full rewrite — the r16 in-memory cost, $nCells cells)") {
        ShardedHnsw.save(sh, shards, meta)
      }
      val (nFiles, totBytes) = dirStats(shards)
      println(f"[r17bench] tier on disk: $nFiles files, ${totBytes / 1e6}%.1f MB")
      val mark = System.currentTimeMillis()
      Thread.sleep(5) // mtime resolution guard
      timed(s"insertPersisted (20-vector batch, $nCells cells)") {
        ShardedHnsw.insertPersisted(spark, shards, meta, batch)
      }
      // which leaves were rewritten?
      val touched = new java.io.File(shards).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("__cell="))
        .filter { leaf =>
          leaf.listFiles().exists(_.lastModified() >= mark) }
      val touchedBytes = touched.flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      println(f"[r17bench] leaves rewritten: ${touched.length}/$nCells " +
        f"(${touchedBytes / 1e6}%.2f MB of ${totBytes / 1e6}%.1f MB total = " +
        f"${100.0 * touchedBytes / totBytes}%.1f%%)")

      // the maintained tier still serves: every batch member finds itself
      val re = ShardedHnsw.load(spark, shards, meta)
      val q = batch.map { case (id, v) => (id, v.toSeq) }.toDF("qid", "qv")
      val self = ShardedHnsw.searchBatch(re, q, "qid", "qv", 1,
          nProbe = re.centers.length)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      require(self.length == batch.length && self.forall(p => p._1 == p._2),
        "batch members must find themselves post-insert")
      println(s"[r17bench] post-insert self-hit: ${self.length}/20")
    }
    spark.stop()
  }
}
