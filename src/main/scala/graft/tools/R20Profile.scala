package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-20 optimization profiler (guide §1: measure first).
  *
  * Usage: runMain graft.tools.R20Profile <outDir> <query> [query...]
  * (or `all` to profile every declared query).
  *
  * For each query, in ONE warm JVM:
  *  - writes `<outDir>/<name>.txt` — the full `.explain("formatted")`;
  *  - runs the bench action (`df.count()`) twice (first = warm-up of this
  *    query's own artifacts, second = measured) and prints a line with
  *    wall seconds, Spark job count, stage count, task count, shuffle
  *    bytes written, and the Exchange / WholeStageCodegen / BatchEvalPython
  *    node counts parsed out of the formatted plan.
  *
  * The job/stage/task counters come from a SparkListener scoped between
  * markers, so concurrent jobs from the profiled query are all counted.
  * NOT an artifact of record — graft.Bench stays the official recording.
  */
object R20Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R20Profile <outDir> <query|all> [more...]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (recording) jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (recording) stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (recording) {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    val names: Seq[String] =
      if (args.tail.contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.tail.toSeq

    println(f"${"query"}%-38s ${"sec"}%7s ${"jobs"}%5s ${"stg"}%5s ${"task"}%6s ${"shW(KB)"}%9s ${"Exch"}%5s ${"WSC"}%4s")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // pass 1: unmeasured warm-up (classload, per-query caches like the
      // LR fit; the bench medians exclude these too via median-of-5)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[r20profile] $name FAILED warmup: ${e.getMessage}") }
      graft.util.Materialize.releaseAll(spark)
      // capture plan
      val df = fn(spark, sfDir)
      val plan = try df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      java.nio.file.Files.write(
        new java.io.File(outDir, s"$name.txt").toPath,
        plan.getBytes("UTF-8"))
      val nExch = "(?m)^\\s*[+:]?-?\\s*\\*?\\(?\\d*\\)?\\s*Exchange".r
        .findAllIn(plan).length
      val nWsc = "WholeStageCodegen".r.findAllIn(plan).length
      graft.util.Materialize.releaseAll(spark)
      // measured pass
      jobs.set(0); stages.set(0); tasks.set(0); shufWrite.set(0); shufRead.set(0)
      recording = true
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[r20profile] $name FAILED: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      recording = false
      graft.util.Materialize.releaseAll(spark)
      println(f"$name%-38s $dt%7.3f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${shufWrite.get / 1024}%9d $nExch%5d $nWsc%4d")
    }
    spark.stop()
  }
}
