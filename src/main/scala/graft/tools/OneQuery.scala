package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: run ONE named query (args: name sfDir outDir) — writes
  * `outDir/<name>` parquet and `outDir/<name>.sql` (the oracle), so
  * `tools/check.py --one` can gate a single query without the full
  * Verify pass. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[onequery] $name ran in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    graft.SparkEntry.oracleSql.get(name) match {
      case Some(sql) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
        println(s"[onequery] oracle written")
      case None => println(s"[onequery] no oracle (rows-only query)")
    }
    spark.stop()
  }
}
