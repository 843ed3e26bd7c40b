package graft.tools

import graft.Tables
import graft.operators.BpeTraining
import org.apache.spark.sql.SparkSession

/** SCALE.md evidence: batched BPE training to a real merge budget on the
  * documents corpus — wall-clock per merge count, plus job-count shape
  * (rounds × 3 jobs vs sequential's merges × 2). */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    var t0 = System.nanoTime()
    val seq40 = BpeTraining.train(docs, "text", 40)
    val tSeq40 = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val bat40 = BpeTraining.trainBatched(docs, "text", 40)
    val tBat40 = (System.nanoTime() - t0) / 1e9
    println(f"40 merges: sequential $tSeq40%.1fs, batched $tBat40%.1fs, equal=${seq40 == bat40}")

    t0 = System.nanoTime()
    val batN = BpeTraining.trainBatched(docs, "text", merges)
    val tBatN = (System.nanoTime() - t0) / 1e9
    println(f"$merges merges batched: $tBatN%.1fs (${batN.size} trained, " +
      f"${tBatN / math.max(batN.size, 1) * 1000}%.0f ms/merge)")

    t0 = System.nanoTime()
    val autoN = BpeTraining.trainAuto(docs, "text", merges)
    val tAuto = (System.nanoTime() - t0) / 1e9
    println(f"$merges merges auto(local): $tAuto%.1fs, equal=${autoN == batN}")
    spark.stop()
  }
}
