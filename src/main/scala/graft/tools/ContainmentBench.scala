package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact vs prefix-filtered containment A/B on the FULL corpus —
  * the measurement behind SCALE.md's q134 row: the certified query
  * scopes to two source blocks because the exact form intersects
  * every same-block pair; this tool times both operators, full
  * corpus, and asserts identical output (the spec's equivalence,
  * re-checked on real data).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ContainmentBench
  */
object ContainmentBench {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sf)

    def run(name: String,
            f: () => org.apache.spark.sql.DataFrame): (Long, Set[String]) = {
      // warm once, then min of 3 timed runs
      val rows = f().collect()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1000000
      }
      println(f"[containment] $name%-8s min=${times.min}%5d ms  " +
        f"pairs=${rows.length}%d")
      (times.min, rows.map(r =>
        s"${r.getLong(1)}_${r.getLong(2)}_${r.getLong(3)}").toSet)
    }

    val (tExact, pExact) = run("exact", () =>
      Dedup.ngramContainmentPairs(docs, "doc_id", "text", col("source"),
        n = 3, threshold = 0.5))
    val (tFilt, pFilt) = run("filtered", () =>
      Dedup.ngramContainmentPairsFiltered(docs, "doc_id", "text",
        col("source"), n = 3, threshold = 0.5))
    require(pExact == pFilt,
      s"output mismatch: ${pExact.diff(pFilt)} / ${pFilt.diff(pExact)}")
    println(f"[containment] identical output, speedup " +
      f"${tExact.toDouble / tFilt}%.2fx")
    spark.stop()
  }
}
