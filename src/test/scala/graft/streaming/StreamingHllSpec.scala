package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming HLL: the register array is a commutative idempotent
  * monoid and the estimator reruns the batch arithmetic, so the
  * stream must equal the BATCH hllDistinct bit-for-bit — same n_hit,
  * n_zero, and estimate — under any batching or duplication. */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[String]], p: Int, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingHll.distinctEstimate(
      stream.toDF().toDF("item"), "item", p)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .maxBy(_._1)
    } finally q.stop()
  }

  test("streaming sketch == batch hllDistinct bit-for-bit, shuffled duplicated batches") {
    val rnd = new scala.util.Random(41)
    val items = (1 to 2500).map(_ => s"u${rnd.nextInt(900)}")
    val want = graft.operators.CorpusStats.hllDistinct(
        items.map(("s", _)).toDF("src", "it"), "src", col("it"), p = 8)
      .head()
    val got = runStream(rnd.shuffle(items).grouped(600).toSeq, p = 8,
      "hll_eq")
    assert(got._1 === 2500L)                    // every row seen
    assert(got._2 === want.getLong(1))          // n_hit
    assert(got._3 === want.getLong(2))          // n_zero
    assert(got._4 === want.getDouble(3))        // estimate, exactly
  }

  test("small streams hit the linear-counting branch with the batch value") {
    val want = graft.operators.CorpusStats.hllDistinct(
        Seq("a", "b", "c", "a", "d").map(("s", _)).toDF("src", "it"),
        "src", col("it"), p = 8).head()
    val got = runStream(Seq(Seq("a", "b", "c"), Seq("a", "d")), p = 8,
      "hll_small")
    assert(got._1 === 5L)
    assert(got._4 === want.getDouble(3))
  }
}
