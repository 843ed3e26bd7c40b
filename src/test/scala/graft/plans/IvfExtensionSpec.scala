package graft.plans

import graft.SparkSpec
import graft.operators.{IvfIndex, VectorSearch}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The optimizer-rule tier: a plain declarative top-k over the persisted
  * IVF table must get rewritten into a cell-pruned probe, visible as a
  * partition filter in the physical scan, while a full probe stays exact
  * vs brute force. */
class IvfExtensionSpec extends SparkSpec {

  private def topkDf(path: String, q: Array[Float], k: Int) =
    spark.read.parquet(path)
      .withColumn("cos_sim", CosineSimilarity(col("embedding"), lit(q)))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)

  test("probe rule injects partition pruning; full probe stays exact") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val idxPath = Files.createTempDirectory("graft-ivf").toString + "/emb"
    IvfIndex.persist(emb, "vec_id", "embedding", nCells = 8,
      path = idxPath, nProbe = 2)

    spark.experimental.extraOptimizations = Seq(IvfProbeRule())
    try {
      // nProbe=2 of 8: plan must scan only the probed cells
      val pruned = topkDf(idxPath, q, 5)
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [__cell"), scan)
      val prunedIds = pruned.collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(prunedIds.contains(7L)) // query's own cell always probed

      // full probe (nProbe = nCells): rule no-ops -> identical to brute force
      IvfRegistry.register(idxPath,
        Array.fill(8)(Array.fill(64)(0.0)), nProbe = 8)
      val full = topkDf(idxPath, q, 5)
      assert(!full.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [__cell"))
      val exact = VectorSearch.topK(emb, "embedding", q.toSeq, 5, "vec_id")
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(full.collect().map(_.getAs[Long]("vec_id")).toSeq === exact)
    } finally {
      spark.experimental.extraOptimizations = Nil
      IvfRegistry.clear()
    }
  }
}
