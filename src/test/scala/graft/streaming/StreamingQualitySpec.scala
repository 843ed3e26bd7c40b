package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming quality gate: stateless (append mode, no watermark), and
  * row-for-row equal to the batch form over the same data — the same
  * plan runs per micro-batch. */
class StreamingQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = StreamingQualityGate.trainUnigram(
    spark.read.parquet(s"$sf/documents.parquet"), "text", vocabSize = 4096)

  private val probe = Seq(
    (1L, "merge sort join hash aggregate window filter sample"), // fluent
    (2L, "zz1 zz2 zz3 zz4 zz5 zz6"),                             // all-OOV
    (3L, "hash hash hash hash hash hash hash"),                  // repetitive
    (4L, "too short"),                                           // length gate
    (5L, ""), (6L, null.asInstanceOf[String]))

  test("streaming gate == batch gate row-for-row (append mode, stateless)") {
    val minLogp = -4.0
    val batch = StreamingQualityGate(probe.toDF("doc_id", "text"),
        "doc_id", "text", model, minLogp)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val gated = StreamingQualityGate(stream.toDF()
        .toDF("doc_id", "text"), "doc_id", "text", model, minLogp)
    val q = gated.writeStream.outputMode("append") // stateless => append OK
      .format("memory").queryName("quality_gate").start()
    try {
      stream.addData(probe.take(3))
      q.processAllAvailable()
      stream.addData(probe.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("quality_gate")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("gate semantics: LM floor, length, repetition each fire") {
    val out = StreamingQualityGate(probe.toDF("doc_id", "text"),
        "doc_id", "text", model, minLogp = -4.0)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("pass_lm"), r.getAs[Int]("pass_len"),
          r.getAs[Int]("pass_rep"), r.getAs[Int]("keep"))).toMap
    assert(out(1L) === ((1, 1, 1, 1)))      // fluent corpus-register text keeps
    assert(out(2L)._1 === 0 && out(2L)._4 === 0) // OOV spam fails the LM floor
    assert(out(3L)._3 === 0 && out(3L)._4 === 0) // repetition gate
    assert(out(4L)._2 === 0 && out(4L)._4 === 0) // length gate
    assert(out(5L)._4 === 0 && out(6L)._4 === 0) // empty/null never keep
  }
}
