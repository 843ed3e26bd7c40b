package graft.tools

import graft.Tables
import graft.operators.{GraphRank, VectorSearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B for the kNN-graph build (q140's dominant stage): the plain
  * ranking-window path shuffles every N² scored row; the map-side
  * partial top-k shuffles ≤ k·N·partitions. Warm medians, n=3 each. */
object GraphRankBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    emb.cache().count()

    def med(f: => Long): (Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(1), rows)
    }

    val queries = emb.select(col("vec_id").as("__qid"),
      col("embedding").as("__qv"))
    val (tw, rw) = med {
      VectorSearch.topKBatch(emb, "embedding", "vec_id", queries,
        "__qid", "__qv", 8, excludeSelf = true).count()
    }
    println(f"window path   $tw%7.2fs rows=$rw")
    val (tp, rp) = med {
      GraphRank.knnGraph(emb, "vec_id", "embedding", 8).count()
    }
    println(f"partial path  $tp%7.2fs rows=$rp")
    val (tq, _) = med {
      val edges = GraphRank.knnGraph(emb, "vec_id", "embedding", 8)
      GraphRank.pagerank(emb.select("vec_id"), "vec_id",
        edges, "src", "dst", rounds = 5).count()
    }
    println(f"full q140     $tq%7.2fs")
    spark.stop()
  }
}
