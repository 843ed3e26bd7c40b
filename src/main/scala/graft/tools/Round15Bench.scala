package graft.tools

import graft.Tables
import graft.operators.{GraphRank, Hnsw, IvfIndex, VectorSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 measurement run (VERDICT r14 #1/#3/#6/#7): edge-build
  * sources (exact N² vs IVF full-probe vs IVF probed), incremental
  * append vs full rebuild, batch HNSW vs the exact and IVF batch
  * paths, and the 100×-pair-density graph family on the IVF-built
  * artifact. Warm medians (n=3); run QUIET — results feed SCALE.md. */
object Round15Bench {
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

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.cache().count()
    println(s"[r15bench] corpus n=$n")

    def med(label: String)(f: => Long): Double = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[r15bench] $label%-34s ${ts(1)}%7.2fs rows=$rows")
      ts(1)
    }

    // -------- edge build: exact vs ivf full-probe vs ivf probed (k=8)
    med("edges exact N^2 (certification)") {
      GraphRank.knnGraph(emb, "vec_id", "embedding", 8).count() }
    med("edges ivf nProbe=nCells=16 (exact)") {
      GraphRank.knnGraphIvf(emb, "vec_id", "embedding", 8, 16, 16).count() }
    med("edges ivf nProbe=4/16 (scale mode)") {
      GraphRank.knnGraphIvf(emb, "vec_id", "embedding", 8, 16, 4).count() }
    // recall of the probed mode vs exact, once (deterministic)
    val exactSet = GraphRank.knnGraph(emb, "vec_id", "embedding", 8)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probedSet = GraphRank.knnGraphIvf(emb, "vec_id", "embedding", 8, 16, 4)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[r15bench] ivf 4/16 edge recall = ${
      probedSet.count(exactSet).toDouble / exactSet.size}%.3f")

    // -------- incremental append (5% batch) vs full rebuild
    val ids = emb.select("vec_id").as[Long].collect().sorted
    val batchIds = ids.takeRight((n / 20).toInt.max(1)).toSeq
    val old = emb.filter(!col("vec_id").isInCollection(batchIds))
    val oldEdges = GraphRank.knnGraph(old, "vec_id", "embedding", 8)
      .cache(); oldEdges.count()
    med("append 5% batch (delta path)") {
      GraphRank.knnGraphAppend(oldEdges, emb, "vec_id", "embedding", 8,
        batchIds).count() }
    med("append 5% batch (full rebuild)") {
      GraphRank.knnGraph(emb, "vec_id", "embedding", 8).count() }
    oldEdges.unpersist()

    // -------- batch ANN: HNSW broadcast-graph vs exact vs IVF batch
    val vecs = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val g = Hnsw.build(vecs.toSeq, m = 16, efConstruction = 100)
    val queries = emb.select(col("vec_id").as("__qid"),
      col("embedding").as("__qv")).cache(); queries.count()
    med("batch k=10: hnsw broadcast graph") {
      Hnsw.searchKnnBatch(g, queries, "__qid", "__qv", 10, ef = 64).count() }
    med("batch k=10: exact topKBatch") {
      VectorSearch.topKBatch(emb, "embedding", "vec_id", queries,
        "__qid", "__qv", 10, excludeSelf = false).count() }
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    idx.assigned.count()
    med("batch k=10: ivf topKBatch 4/16") {
      idx.topKBatch(queries, "__qid", "__qv", 10, nProbe = 4).count() }
    // hnsw batch recall vs exact, once
    val exactTop = VectorSearch.topKBatch(emb, "embedding", "vec_id",
        queries, "__qid", "__qv", 10, excludeSelf = false)
      .select(col("__qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hnswTop = Hnsw.searchKnnBatch(g, queries, "__qid", "__qv", 10, ef = 64)
      .select(col("qid"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[r15bench] hnsw batch recall@10 = ${
      hnswTop.count(exactTop).toDouble / exactTop.size}%.3f")

    // -------- 100x pair density: 10x nodes via id-shifted copies, IVF path
    val dense = (0 until 10).map(i =>
        emb.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding")))
      .reduce(_ union _).cache()
    val nDense = dense.count()
    println(s"[r15bench] dense corpus n=$nDense (pairs 100x)")
    val cells = math.max(16, math.sqrt(nDense.toDouble).toInt)
    var denseEdges: DataFrame = null
    med(s"dense edges ivf nProbe=8/$cells") {
      denseEdges = GraphRank.knnGraphIvf(dense, "vec_id", "embedding", 8,
        cells, 8).cache()
      denseEdges.count() }
    med("dense triangle census (q150 stage)") {
      GraphRank.triangleStats(dense.select("vec_id"), "vec_id",
        denseEdges, "src", "dst").count() }
    med("dense LPA communities (q161 stage)") {
      GraphRank.communityDetect(dense.select("vec_id"), "vec_id",
        denseEdges, "src", "dst", rounds = 4).count() }
    spark.stop()
  }
}
