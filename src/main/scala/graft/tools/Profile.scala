package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness: times the stages of the heaviest pipelines so
  * optimization targets are measured, not guessed. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count()

    time("sig(8)") {
      Dedup.minhashSignature(docs, "doc_id", "text", 8, 5).count()
    }
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", 8, 5)
    time("cands run1") {
      Dedup.lshCandidatePairs(sig, 8, 2).count()
    }
    time("cands run2") {
      Dedup.lshCandidatePairs(sig, 8, 2).count()
    }
    val sigC = sig.cache(); sigC.count()
    time("cands cached-sig") {
      Dedup.lshCandidatePairs(sigC, 8, 2).count()
    }
    val cands = Dedup.lshCandidatePairs(sigC, 8, 2)
    time("verify cached-sig") {
      Dedup.verifyPairs(docs, "doc_id", "text", cands, 5, 0.5).count()
    }
    spark.stop()
  }
}
