package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Misra-Gries: sequential-equivalence to a driver replica
  * within a bucket, the superset guarantee under saturation, and
  * bounded state across micro-batches. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[String]], buckets: Int,
                        maxTracked: Int, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingHeavyHitters.heavyItemCandidates(
      stream.toDF().toDF("item"), "item", buckets, maxTracked)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      // update mode re-emits snapshots (and an upsert sink would keep
      // rows for items dropped later); the FINAL summary is the rows
      // carrying each bucket's final item total n
      val all = spark.table(name).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val finalN = all.groupBy(_._1).view.mapValues(_.map(_._5).max).toMap
      all.filter(t => t._5 == finalN(t._1)).toSeq
    } finally q.stop()
  }

  test("single bucket: exact MG invariants across micro-batches") {
    // MG's order-independent exact invariants (arrival order within a
    // micro-batch group is not contractual): mass conservation
    // sum(cnt) = n - dec*(k+1), the count sandwich, the dec ceiling,
    // and presence of every item with true count > dec
    val items = Seq.fill(30)("hot") ++ (1 to 25).map(i => s"rare$i") ++
      Seq.fill(10)("warm")
    val k = 5
    val got = runStream(items.grouped(13).toSeq, buckets = 1,
      maxTracked = k, "shh_seq")
    val n = items.size.toLong
    val dec = got.head._4
    assert(got.forall(_._4 === dec) && got.forall(_._5 === n))
    assert(got.map(_._3).sum === n - dec * (k + 1)) // mass conservation
    assert(dec <= n / (k + 1))
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)
    got.foreach { case (_, item, cnt, d, _) =>
      assert(cnt <= trueCounts(item) && trueCounts(item) <= cnt + d, item)
    }
    // the undroppable heavy key
    assert(trueCounts("hot") > dec)
    assert(got.exists(_._2 == "hot"))
    assert(got.size <= k)
  }

  test("stream candidates ⊇ the batch exact heavy set (recount composition)") {
    // the deployment shape: streaming summary shortlists, the batch
    // tier recounts exactly — nothing exact can be missing upstream
    val rnd = new scala.util.Random(47)
    val heavies = Seq("h1" -> 90, "h2" -> 60, "h3" -> 45)
    val items = rnd.shuffle(
      heavies.flatMap { case (w, f) => Seq.fill(f)(w) } ++
        (1 to 500).map(_ => s"n${rnd.nextInt(300)}"))
    val streamed = runStream(items.grouped(150).toSeq, buckets = 4,
      maxTracked = 12, "shh_recount").map(_._2).toSet
    val exact = graft.operators.HeavyHitters.heavyItems(
        items.toDF("item"), "item", threshold = 40)
      .collect().map(_.getString(0)).toSet
    assert(Set("h1", "h2", "h3").subsetOf(exact))
    assert(exact.subsetOf(streamed),
      s"exact heavies ${exact.diff(streamed)} missing from stream candidates")
  }

  test("superset guarantee: the flood survives summary saturation") {
    val rnd = new scala.util.Random(5)
    val noise = (1 to 400).map(_ => s"n${rnd.nextInt(200)}")
    val flood = Seq.fill(120)("FLOOD")
    val items = rnd.shuffle(noise ++ flood)
    val got = runStream(items.grouped(100).toSeq, buckets = 4,
      maxTracked = 8, "shh_flood")
    val floodRows = got.filter(_._2 == "FLOOD")
    assert(floodRows.nonEmpty, "flooding key missing from candidates")
    // bounded state: no bucket tracks more than maxTracked items
    val perBucket = got.groupBy(_._1).view.mapValues(_.size)
    assert(perBucket.values.forall(_ <= 8))
  }
}
