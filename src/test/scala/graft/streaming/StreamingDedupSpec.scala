package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming MinHash-LSH near-dup (round 12): batch-replayable
  * semantics, cross-micro-batch state continuity, redelivery
  * idempotence. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "runs through the quiet forest before dawn every single day"
  private val docs = Seq(
    (1L, base),
    (2L, base),                      // exact dup of 1
    (3L, base + " extra trailing"),  // near dup
    (4L, "completely different content about structured streaming state " +
      "stores and watermark semantics in distributed engines"),
    (5L, base))                      // exact dup of 1/2

  private def pairSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def runBatch(d: Seq[(Long, String)]) = pairSet(
    StreamingDedup.lshDupPairsStream(d.toDF("doc_id", "text"),
      "doc_id", "text")
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "n_agree").collect())

  test("batch execution matches the independent LSH + agreement replica") {
    val df = docs.toDF("doc_id", "text")
    val got = runBatch(docs)
    // independent replica: batch signature -> batch candidate pairs ->
    // component-agreement count
    val sig = Dedup.minhashSignature(df, "doc_id", "text",
      numHashes = 8, shingleK = 5)
    val cand = Dedup.lshCandidatePairs(sig, numHashes = 8, numBands = 2)
    val sa = (0 until 8).foldLeft(
      sig.toDF(("id" +: (0 until 8).map(i => s"a$i")): _*))((d, _) => d)
    val sb = sig.toDF(("id" +: (0 until 8).map(i => s"b$i")): _*)
    val agree = (0 until 8)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    val want = pairSet(cand
      .join(sa.withColumnRenamed("id", "id_a"), "id_a")
      .join(sb.withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a"), col("id_b"), agree.cast("int").as("n_agree"))
      .filter(col("n_agree") >= 4)
      .collect())
    assert(got === want)
    assert(got.contains((1L, 2L, 8)))      // identical docs: all 8 agree
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc
  }

  test("NULL-text docs are dropped, not crashed on") {
    val withNull = docs :+ (6L, null.asInstanceOf[String])
    assert(runBatch(withNull) === runBatch(docs))
  }

  test("streaming: pairs surface across micro-batches; redelivery is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamingDedup.lshDupPairsStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    try {
      stream.addData((1L, base), (4L, docs(3)._2))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 0) // nothing to pair yet

      stream.addData((2L, base)) // must pair with doc 1 FROM STATE
      q.processAllAvailable()
      val afterB2 = pairSet(spark.table("sdedup")
        .select("id_a", "id_b", "n_agree").collect())
      assert(afterB2 === Set((1L, 2L, 8)))

      // batch 3: near-dup, another exact dup, and a REDELIVERY of doc 2
      stream.addData((3L, docs(2)._2), (5L, base), (2L, base))
      q.processAllAvailable()
      val all = spark.table("sdedup")
      val allSet = pairSet(all.select("id_a", "id_b", "n_agree").collect())
      // accumulated stream output == the batch run over the full corpus
      assert(allSet === runBatch(docs))
      // the redelivered doc 2 emitted nothing new: each (pair, band)
      // appears at most once, and no self-pairs exist
      assert(all.filter(col("id_a") === col("id_b")).count() === 0)
      val perPair = all.groupBy("id_a", "id_b").count()
        .collect().map(_.getLong(2))
      assert(perPair.forall(_ <= 2)) // <= numBands emissions per pair
    } finally q.stop()
  }
}
