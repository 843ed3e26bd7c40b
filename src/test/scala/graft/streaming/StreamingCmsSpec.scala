package graft.streaming

import graft.SparkSpec
import graft.operators.CorpusStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}

/** Streaming CMS: counters sum commutatively, so the stream must equal
  * the BATCH cmsTable/cmsEstimate exactly — same counter grid, same
  * point estimates — under any batching or arrival order, and the
  * one-sided guarantee holds at every trigger. */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private val d = 4
  private val w = 64 // small width forces real collisions

  private def runStream(batches: Seq[Seq[String]], probes: Seq[String],
                        name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingCms.frequencyEstimate(
      stream.toDF().toDF("item"), "item", probes, d, w)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val last = rows.map(_._1).max
      (last, rows.filter(_._1 == last).map(t => t._2 -> t._3).toMap)
    } finally q.stop()
  }

  test("streaming estimates == batch cmsEstimate exactly; one-sided at every probe") {
    val rnd = new scala.util.Random(43)
    val items = (1 to 3000).map(_ => s"w${rnd.nextInt(250)}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.sorted.take(20)
    val (nSeen, got) = runStream(
      rnd.shuffle(items).grouped(700).toSeq, probes, "cms_eq")
    assert(nSeen === 3000L)
    val cms = CorpusStats.cmsTable(items.map(("s", _)).toDF("src", "it"),
      "src", col("it"), d, w)
    val want = CorpusStats.cmsEstimate(cms, "src",
        probes.map(("s", _)).toDF("src", "it"), "it")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    probes.foreach { p =>
      assert(got(p) === want(p), s"stream vs batch at $p")
      assert(got(p) >= exact(p), s"one-sided at $p")
    }
  }

  test("driver-side probe hash mirrors the in-plan portable hash") {
    val samples = Seq("alpha", "x|beta", "Ωmega", "", "7")
    val inPlan = samples.toDF("s")
      .select(col("s"),
        graft.functions.TextFunctions.portableHash32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(StreamingCms.h32(s) === inPlan(s), s))
  }

  test("mid-stream snapshots stay one-sided (prefix counters >= prefix truth)") {
    val batches = Seq(Seq("a", "a", "b"), Seq("a", "c", "c"), Seq("b"))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingCms.frequencyEstimate(
      stream.toDF().toDF("item"), "item", Seq("a", "b", "c", "zz"), d, w)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("cms_prefix").start()
    try {
      var seen = Map.empty[String, Long].withDefaultValue(0L)
      batches.foreach { b =>
        stream.addData(b); q.processAllAvailable()
        b.foreach(i => seen += i -> (seen(i) + 1))
        val n = seen.values.sum
        val snap = spark.table("cms_prefix").collect()
          .filter(_.getLong(0) == n)
          .map(r => r.getString(1) -> r.getLong(2)).toMap
        Seq("a", "b", "c", "zz").foreach(p =>
          assert(snap(p) >= seen(p), s"prefix one-sided at $p after $n"))
      }
    } finally q.stop()
  }
}
