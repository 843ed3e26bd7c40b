package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B micro-bench for the md5 (oracle) vs xxh64 (production) hash
  * families on the two certified operators the md5 tax lands on:
  * MinHash LSH dedup (q23 shape) and DSIR weights (q71 shape). Runs
  * each variant `runs` times on SPARK_GRAFT_SF_DIR and prints one line
  * per (operator, family) with the median seconds — the SCALE.md
  * "hash family A/B" numbers come from here. */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm footers + codegen

    def median(fn: () => Long): (Double, Long) = {
      var rows = 0L
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        rows = fn()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.util.Materialize.releaseAll(spark)
        dt
      }.sorted
      (times(times.length / 2), rows)
    }

    Seq(TextFunctions.HashMd5, TextFunctions.HashXxh64).foreach { fam =>
      val (tDedup, nDedup) = median(() =>
        graft.operators.Dedup.minhashDupPairs(
          docs, "doc_id", "text", hashFamily = fam).count())
      println(f"[hashbench] minhash_lsh family=$fam%-5s median=$tDedup%.3f s rows=$nDedup ($runs runs)")
      val (tDsir, nDsir) = median(() =>
        graft.operators.ImportanceSampling.dsirWeights(
          docs, "doc_id", "text", col("doc_id") % 5 === 0,
          hashFamily = fam).count())
      println(f"[hashbench] dsir_weights family=$fam%-5s median=$tDsir%.3f s rows=$nDsir ($runs runs)")
    }
    spark.stop()
  }
}
