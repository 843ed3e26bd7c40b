package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded HNSW serving (VERDICT r15 #7): per-cell subgraphs built
  * distributed, queries shuffled to probed shards — recall parity with
  * the monolithic graph, bounded shard sizes, determinism. */
class ShardedHnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")
  private lazy val exactTop = VectorSearch.topKBatch(emb, "embedding",
      "vec_id", emb.select(col("vec_id").as("__qid"),
        col("embedding").as("__qv")), "__qid", "__qv", 10,
      excludeSelf = false)
    .select(col("__qid"), col("vec_id"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("full-coverage sharded search matches the monolithic graph's recall") {
    val sh = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 8)
    val queries = emb.select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val sharded = ShardedHnsw.searchBatch(sh, queries, "qid", "qv",
        k = 10, nProbe = 8)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mono = Hnsw.build(
      emb.as[(Long, Array[Float])].collect().toSeq, 16, 100)
    val monoTop = Hnsw.searchKnnBatch(mono, queries, "qid", "qv", 10)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shardedRecall = sharded.count(exactTop).toDouble / exactTop.size
    val monoRecall = monoTop.count(exactTop).toDouble / exactTop.size
    info(f"sharded full-coverage recall $shardedRecall%.4f, " +
      f"monolithic $monoRecall%.4f")
    assert(shardedRecall >= monoRecall - 0.005,
      s"sharded $shardedRecall < monolithic $monoRecall")
    assert(shardedRecall >= 0.99)
    // the output contract matches searchKnnBatch: rn 1..k by
    // (dist asc, id asc), k rows per query
    val rows = ShardedHnsw.searchBatch(sh, queries.limit(5), "qid", "qv",
      k = 10, nProbe = 8).collect()
    assert(rows.length === 50)
    assert(rows.groupBy(_.getLong(0)).values.forall { qs =>
      val sorted = qs.sortBy(_.getInt(1))
      sorted.map(_.getInt(1)).toSeq == (1 to 10) &&
        sorted.map(r => (r.getDouble(3), r.getLong(2))).toSeq ==
          sorted.map(r => (r.getDouble(3), r.getLong(2))).sortBy(identity).toSeq
    })
  }

  test("probed sharded search: IVF-curve recall, deterministic across builds") {
    val sh = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 8)
    val queries = emb.select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val probed = ShardedHnsw.searchBatch(sh, queries, "qid", "qv",
        k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val recall = probed.map(t => (t._1, t._3)).toSet
      .count(exactTop).toDouble / exactTop.size
    info(f"sharded nProbe=3/8 recall $recall%.3f")
    assert(recall >= 0.5, s"probed recall $recall")
    // determinism: an independent build + search returns identical rows
    val sh2 = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 8)
    val probed2 = ShardedHnsw.searchBatch(sh2, queries, "qid", "qv",
        k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(probed.sortBy(t => (t._1, t._2)).toSeq ===
      probed2.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("insert maintains the shards: only touched blobs rewrite, new vectors served at full recall") {
    val all = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val (oldRows, batch) = all.splitAt(all.length - 100)
    val oldDf = oldRows.toSeq.toDF("vec_id", "embedding")
    val sh0 = ShardedHnsw.build(oldDf, "vec_id", "embedding", nCells = 8)
    val before = sh0.table.as[(Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> java.util.Arrays.hashCode(r._3)).toMap
    val sh1 = ShardedHnsw.insert(sh0, batch.toSeq)
    val after = sh1.table.as[(Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> java.util.Arrays.hashCode(r._3)).toMap
    assert(after.keySet.size >= before.keySet.size)
    // untouched shards pass through byte-identical
    val untouched = before.keySet.filter(k => before(k) == after(k))
    assert(untouched.nonEmpty, "every shard rewrote - not a delta")
    // full-coverage search over the maintained shards serves the WHOLE
    // corpus (old + batch) at exact-parity recall
    val queries = emb.select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val served = ShardedHnsw.searchBatch(sh1, queries, "qid", "qv",
        k = 10, nProbe = 8)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = served.count(exactTop).toDouble / exactTop.size
    info(f"post-insert full-coverage recall $recall%.4f")
    assert(recall >= 0.99, s"post-insert recall $recall")
    // batch members are themselves findable (self top-1)
    val selfHits = served.count { case (q, i) => q == i }
    assert(selfHits === emb.count(), "every vector must find itself")
  }

  test("oversized cells sub-shard: per-shard memory bounded, recall kept") {
    // cap 64 forces every ~500/8-member cell layout into sub-shards
    val sh = ShardedHnsw.build(emb, "vec_id", "embedding", nCells = 4,
      maxCellSize = 64)
    // every blob's graph holds <= ~2x the cap (hash balance)
    val sizes = sh.table.select("__graph").collect().map { r =>
      val bytes = r.getAs[Array[Byte]](0)
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes))
      ois.readObject().asInstanceOf[Hnsw.Graph].size
    }
    assert(sizes.sum === emb.count())
    assert(sizes.max <= 128,
      s"shard of ${sizes.max} members exceeds the documented bound")
    val queries = emb.select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val sharded = ShardedHnsw.searchBatch(sh, queries, "qid", "qv",
        k = 10, nProbe = 4)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = sharded.count(exactTop).toDouble / exactTop.size
    info(f"sub-sharded full-coverage recall $recall%.4f")
    assert(recall >= 0.99, s"sub-sharding cost recall: $recall")
  }
}
