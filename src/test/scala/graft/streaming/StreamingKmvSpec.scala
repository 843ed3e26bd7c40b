package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming KMV: the k-min set is a commutative idempotent monoid,
  * so the stream must equal the BATCH sketch exactly — same
  * n_tracked, same k-th hash, same estimate — under any batching. */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[String]], k: Int, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingKmv.distinctEstimate(
      stream.toDF().toDF("item"), "item", k)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .maxBy(_._1) // the final snapshot carries the max n_seen
    } finally q.stop()
  }

  test("streaming sketch == batch kmvDistinct bit-for-bit, shuffled batches") {
    val rnd = new scala.util.Random(67)
    val items = (1 to 3000).map(_ => s"item${rnd.nextInt(1200)}")
    val want = graft.operators.CorpusStats.kmvDistinct(
      items.toDF("g"), col("g"), k = 128).head()
    val got = runStream(rnd.shuffle(items).grouped(700).toSeq, k = 128,
      "kmv_eq")
    assert(got._1 === 3000L)                     // every row seen
    assert(got._2 === want.getLong(0))           // n_tracked
    assert(got._3 === want.getLong(1))           // kth_hash
    assert(got._4 === want.getDouble(2))         // estimate, exactly
  }

  test("below k the monitor reports the exact distinct count") {
    val got = runStream(Seq(Seq("a", "b", "c", "a"), Seq("b", "d")),
      k = 64, "kmv_small")
    assert(got._1 === 6L && got._2 === 4L && got._4 === 4.0)
  }
}
