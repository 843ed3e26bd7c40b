package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale validation for the curation tier (SCALE.md "Curation
  * at sf1"). Superseded for certification purposes by
  * [[SuiteScaleBench]], which measures EVERY driver query at 10× over
  * the full star schema — this tool remains as the quick (<5 min)
  * curation-only loop and the anchor for SCALE.md's historical numbers.
  * Runs the q59 training-mix and q65 end-to-end curation
  * queries at sf0.1 and at a synthesized 10× documents table, and
  * prints the median times + scale ratio.
  *
  * The 10× table is the driver's sf0.1 `documents` unioned ten times
  * with disjoint id ranges and a per-copy text suffix. The suffix
  * matters: byte-identical copies would collapse at the exact-dedup
  * stage and the downstream stages would run at 1× again — perturbed
  * text keeps every stage honestly 10×. Claims under test: the q59
  * per-source quota is two-phase (no global sort at any scale) and the
  * q65 pipeline is map-only + one keyed shuffle, so both should scale
  * ~linearly in rows on fixed cores. */
object CurationScaleBench {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val big = "/tmp/graft_sf1"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm executors

    if (!new java.io.File(s"$big/documents.parquet/_SUCCESS").exists()) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val span = docs.agg(max("doc_id")).head().getLong(0) + 1
      (0 until 10).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * span))
          .withColumn("text", concat(col("text"), lit(s" variant$i")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
    }

    def median(name: String, dir: String, runs: Int = 3): Double = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val el = (System.nanoTime() - t0) / 1e9
        graft.util.Materialize.releaseAll(spark)
        el
      }.sorted
      ts(ts.length / 2)
    }

    // q71/q72 join the round-6 additions: DSIR (one keyed shuffle of
    // bucket ints + broadcast stats) and packing (prefix sum — one range
    // shuffle + map pass) should both scale ~linearly in rows. q73 is
    // deliberately absent: its SemDeDup stage is quadratic in cluster
    // size BY DESIGN, and the deployment contract is k grows with the
    // corpus (cluster size stays ~constant) — a fixed-k 10x run would
    // measure the wrong regime.
    Seq("q59_training_mix", "q65_curation_pipeline",
        "q71_dsir_weights", "q72_sequence_packing",
        "q77_dsir_resample", "q79_line_dedup",
        "q80_ccnet_pipeline").foreach { q =>
      median(q, src, runs = 1) // warmup: codegen + footer caches
      val small = median(q, src)
      val large = median(q, big)
      println(f"$q%-24s sf0.1 $small%6.2fs   sf1(10x) $large%6.2fs   ratio ${large / small}%5.2fx")
    }
    spark.stop()
  }
}
