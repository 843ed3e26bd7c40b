package graft.tools

import graft.Tables
import graft.operators.ClusteringOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: where does the q50 k-means fit spend its time —
  * k-means|| init passes, Lloyd's iterations, or assignment? */
object KmeansProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = Tables.embeddings(spark, sfDir)
    println(s"rows=${emb.count()} dim=${emb.select(size(col("embedding"))).head().getInt(0)}")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val m1 = time("fit k=10 default (kmeans||, 100)") {
      ClusteringOps.fit(emb, "embedding", 10)
    }
    println(s"  iters=${m1.summary.numIter}")
    time("fit k=10 default again (warm)") {
      ClusteringOps.fit(emb, "embedding", 10)
    }
    val m3 = time("fit k=10 random init, 20 iter") {
      new org.apache.spark.ml.clustering.KMeans()
        .setK(10).setSeed(42L).setMaxIter(20).setInitMode("random")
        .setFeaturesCol("__features")
        .fit(emb.withColumn("__features",
          org.apache.spark.ml.functions.array_to_vector(
            col("embedding").cast("array<double>"))))
    }
    println(s"  iters=${m3.summary.numIter}")
    val cached = emb.withColumn("__features",
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>"))).cache()
    cached.count()
    val m4 = time("fit k=10 default on cached input") {
      new org.apache.spark.ml.clustering.KMeans()
        .setK(10).setSeed(42L).setMaxIter(100)
        .setFeaturesCol("__features").fit(cached)
    }
    println(s"  iters=${m4.summary.numIter}")
    time("assign + groupBy (q50 tail)") {
      ClusteringOps.assign(m1, emb, "vec_id", "embedding")
        .groupBy("clusterId").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
