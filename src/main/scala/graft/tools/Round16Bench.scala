package graft.tools

import graft.Tables
import graft.operators.{Hnsw, ShardedHnsw, VectorSearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 measurements: sharded HNSW serving vs the monolithic
  * broadcast graph (n=3 medians, quiet box). */
object Round16Bench {
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
    println(s"[r16bench] corpus n=$n")

    def med(label: String)(f: => Long): Unit = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[r16bench] $label%-38s ${ts(1)}%7.2fs rows=$rows")
    }

    val queries = emb.select(col("vec_id").as("qid"),
      col("embedding").as("qv")).cache(); queries.count()

    med("sharded build (16 cells)") {
      ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 16)
        .table.count() }
    val sh = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 16)
    sh.table.count()
    med("sharded batch k=10, full coverage") {
      ShardedHnsw.searchBatch(sh, queries, "qid", "qv", 10, 16).count() }
    med("sharded batch k=10, nProbe=4/16") {
      ShardedHnsw.searchBatch(sh, queries, "qid", "qv", 10, 4).count() }
    med("monolithic build (driver collect)") {
      Hnsw.build(emb.as[(Long, Array[Float])].collect().toSeq, 16, 100)
        .size.toLong }
    val mono = Hnsw.build(emb.as[(Long, Array[Float])].collect().toSeq,
      16, 100)
    med("monolithic batch k=10 (broadcast)") {
      Hnsw.searchKnnBatch(mono, queries, "qid", "qv", 10).count() }
    // recall vs exact, once each (deterministic)
    val exact = VectorSearch.topKBatch(emb, "embedding", "vec_id",
        queries.select(col("qid").as("__qid"), col("qv").as("__qv")),
        "__qid", "__qv", 10, excludeSelf = false)
      .select(col("__qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .count(exact).toDouble / exact.size
    println(f"[r16bench] sharded full recall = ${
      recall(ShardedHnsw.searchBatch(sh, queries, "qid", "qv", 10, 16))}%.4f")
    println(f"[r16bench] sharded 4/16 recall = ${
      recall(ShardedHnsw.searchBatch(sh, queries, "qid", "qv", 10, 4))}%.4f")
    println(f"[r16bench] monolithic recall   = ${
      recall(Hnsw.searchKnnBatch(mono, queries, "qid", "qv", 10))}%.4f")
    spark.stop()
  }
}
