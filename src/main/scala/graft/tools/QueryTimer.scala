package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: warm per-query timing for one or more named queries
  * (args: name [name...]) against SPARK_GRAFT_SF_DIR (default sf0.1),
  * n runs each (SPARK_GRAFT_BENCH_RUNS, default 5) in ONE warm JVM —
  * prints min/median per query so a before/after on a single query
  * doesn't cost a full Bench pass. NOT an artifact of record: use
  * [[graft.Bench]] for the official recording. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTimer <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.util.Materialize.releaseAll(spark)
        dt
      }.sorted
      println(f"[qtimer] $name%-30s min=${times.head}%.3fs median=${times(times.length / 2)}%.3fs n=$runs")
    }
    spark.stop()
  }
}
