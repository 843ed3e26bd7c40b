package graft.streaming

import graft.SparkSpec
import graft.operators.ShardedHnsw
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN serving over the persisted sharded tier: streamed
  * answers ≡ one batch call, and leaves swapped in by a concurrent
  * persisted insert become servable at the next micro-batch. */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  private def tempTier(): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("sann").toString
    (s"$dir/shards", s"$dir/shards_meta", s"$dir/ckpt")
  }

  private type Hit = (Long, Int, Long, Double)
  private def collectHits(rows: Seq[org.apache.spark.sql.Row]): Set[Hit] =
    rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("streamed micro-batches answer identically to one batch searchBatch call") {
    val (shardsPath, metaPath, ckpt) = tempTier()
    val sh = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 8)
    ShardedHnsw.save(sh, shardsPath, metaPath)
    val queries = emb.as[(Long, Array[Float])].collect().take(40)
      .map { case (id, v) => (id, v.toSeq) }
    val results = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.searchSink(in.toDF().toDF("qid", "qv"),
        "qid", "qv", shardsPath, metaPath, k = 5, nProbe = 8, ckpt) {
      df => results.synchronized { results ++= df.collect() }
    }
    // two micro-batches
    in.addData(queries.take(20).toSeq)
    q.processAllAvailable()
    in.addData(queries.drop(20).toSeq)
    q.processAllAvailable()
    q.stop()
    val batchWant = collectHits(
      ShardedHnsw.searchBatch(
        ShardedHnsw.load(spark, shardsPath, metaPath),
        queries.toSeq.toDF("qid", "qv"), "qid", "qv", 5, 8).collect())
    assert(collectHits(results.toSeq) === batchWant)
  }

  test("a persisted insert between triggers is servable at the next micro-batch") {
    val (shardsPath, metaPath, ckpt) = tempTier()
    val sh = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 4)
    ShardedHnsw.save(sh, shardsPath, metaPath)
    // a genuinely new vector near center 0 (unique perturbation)
    val nv = sh.centers(0).map(_.toFloat)
    nv(0) += 1e-3f
    val newId = 7_700_000L
    val results = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.searchSink(in.toDF().toDF("qid", "qv"),
        "qid", "qv", shardsPath, metaPath, k = 1, nProbe = 0, ckpt) {
      df => results.synchronized { results ++= df.collect() }
    }
    // trigger 1: the new vector is NOT indexed yet — nearest is someone else
    in.addData(Seq((1L, nv.toSeq)))
    q.processAllAvailable()
    val before = results.map(r => r.getLong(2)).toSet
    assert(!before.contains(newId))
    // maintenance lands between triggers: only the routed leaf rewrites
    ShardedHnsw.insertPersisted(spark, shardsPath, metaPath,
      Seq((newId, nv)))
    results.clear()
    // trigger 2: the SAME query now finds the inserted vector itself —
    // the reload picked up the swapped leaf without a query restart
    in.addData(Seq((2L, nv.toSeq)))
    q.processAllAvailable()
    q.stop()
    assert(results.map(r => r.getLong(2)).toSet === Set(newId))
  }
}
