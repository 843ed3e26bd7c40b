package graft.tools

import graft.Tables
import graft.operators.{Components, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the connected-components rewrite: times the q56
  * pair generation and the component loop separately, so round-count and
  * per-phase cost are visible instead of inferred from the suite total. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { i =>
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
        "doc_id", "text", col("source"), n = 3, threshold = 0.3,
        maxLenDiff = 20).select("id_a", "id_b")
      time(s"run$i pairs-only") { pairs.count() }
      val pairs2 = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
        "doc_id", "text", col("source"), n = 3, threshold = 0.3,
        maxLenDiff = 20).select("id_a", "id_b")
      val cc = time(s"run$i cc-call") {
        Components.connectedComponents(pairs2, "id_a", "id_b")
      }
      time(s"run$i final-count") {
        cc.select(col("node").as("doc_id"), col("component"))
          .orderBy("doc_id").count()
      }
      graft.util.Materialize.releaseAll(spark)
    }
    spark.stop()
  }
}
