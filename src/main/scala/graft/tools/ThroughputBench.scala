package graft.tools

import graft.Tables
import graft.operators.VectorSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vector-search throughput economics: Spark pays a fixed per-job cost
  * that dominates single-query latency at toy scale but amortizes across
  * a batch (one corpus scan serves the whole query set). This harness
  * measures sequential-loop latency vs batched amortized latency — the
  * honest comparison against the reference's per-query ANN numbers
  * (BASELINE.md: ~17 ms/query, prebuilt DiskANN index, 50k vectors). */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // SPARK_GRAFT_TB_MODE=ref: synthesize the REFERENCE's corpus shape
    // (50k × 1024-dim) so the ms/query comparison against BASELINE.md's
    // ~17 ms is like-for-like in scale, not extrapolated arithmetic.
    // SPARK_GRAFT_TB_REF_N overrides the row count (same 1024-dim
    // shape) — the IVF-vs-exact crossover study runs the identical
    // harness at 10× the reference corpus. Deterministic hash-derived
    // vectors — this measures throughput, the values only need to be
    // dense and unequal.
    val refN = sys.env.getOrElse("SPARK_GRAFT_TB_REF_N", "50000").toLong
    // SPARK_GRAFT_TB_CLUSTERED=1 plants sqrt(N) true clusters (center +
    // 10% noise) — the regime IVF exists for. Uniform hash-random
    // vectors are the degenerate opposite: k-means collapses to a few
    // giant cells (measured: 5 cells hold 99%+ of rows at 50k), so
    // cell probes prune files but not bytes. Real embedding corpora
    // cluster; both shapes stay measurable here on purpose.
    val clustered = sys.env.get("SPARK_GRAFT_TB_CLUSTERED").contains("1")
    val nPlant = math.max(8, math.sqrt(refN.toDouble).toInt)
    val emb =
      (if (sys.env.get("SPARK_GRAFT_TB_MODE").contains("ref"))
        spark.range(refN).selectExpr(
          "id AS vec_id",
          if (clustered)
            s"cast(transform(sequence(0, 1023), " +
              s"j -> pmod(xxhash64((id % $nPlant) * 1024 + j), 2000) / 1000.0 - 1.0 " +
              s"   + pmod(xxhash64(id * 1024 + j + 7777), 200) / 1000.0 - 0.1) " +
              s"AS array<float>) AS embedding"
          else
            "cast(transform(sequence(0, 1023), " +
              "j -> pmod(xxhash64(id * 1024 + j), 2000) / 1000.0 - 1.0) " +
              "AS array<float>) AS embedding")
      else Tables.embeddings(spark, sfDir)).cache()
    val n = emb.count()
    // deterministic query set: filter by id (limit() picks arbitrary
    // rows, which would make seq-vs-batch measure different workloads)
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .orderBy("qid")
      .collect()

    // warm the plan
    VectorSearch.topK(emb, "embedding",
      queries(0).getSeq[Float](1), 10, "vec_id").count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val seq10 = time {
      queries.take(10).foreach { q =>
        VectorSearch.topK(emb, "embedding", q.getSeq[Float](1), 10, "vec_id").count()
      }
    }
    import spark.implicits._
    def batch(nq: Int): Double = {
      val qdf = emb.filter(col("vec_id") < nq).select(col("vec_id").as("qid"),
        col("embedding").as("qvec"))
      time {
        VectorSearch.topKBatch(emb, "embedding", "vec_id",
          qdf, "qid", "qvec", k = 10).count()
      }
    }
    val b1 = batch(1); val b10 = batch(10); val b100 = batch(100)
    println(f"corpus=$n sequential 10 queries: $seq10%.2fs (${seq10 / 10 * 1000}%.0f ms/q)")
    println(f"batch   1: $b1%.2fs | batch 10: $b10%.2fs (${b10 / 10 * 1000}%.0f ms/q) | batch 100: $b100%.2fs (${b100 / 100 * 1000}%.0f ms/q)")

    // the indexed economics the reference's 17 ms/query actually buys
    // (DiskANN prunes its graph; IVF prunes cells): probe-map + cell
    // equi-join batch, recall measured against the exact batch on the
    // SAME corpus — pruning claims without recall numbers are noise
    if (sys.env.get("SPARK_GRAFT_TB_IVF").forall(_ != "0")) {
      val nCells = math.max(8, math.sqrt(n.toDouble).toInt)
      val idx = graft.operators.IvfIndex.build(
        emb, "vec_id", "embedding", nCells, maxIter = 5)
      idx.assigned.count() // materialize the cached assignment
      val qdf = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val exact = VectorSearch.topKBatch(emb, "embedding", "vec_id",
          qdf, "qid", "qvec", k = 10)
        .select(col("qid"), col("vec_id")).cache()
      exact.count()
      Seq(1, 4, 16).foreach { nProbe =>
        idx.topKBatch(qdf, "qid", "qvec", k = 10, nProbe).count() // warm
        val t = time {
          idx.topKBatch(qdf, "qid", "qvec", k = 10, nProbe).count()
        }
        val hits = idx.topKBatch(qdf, "qid", "qvec", k = 10, nProbe)
          .select(col("qid"), col("vec_id")).join(exact, Seq("qid", "vec_id"))
          .count()
        println(f"ivf nCells=$nCells nProbe=$nProbe batch 100: $t%.2fs " +
          f"(${t / 100 * 1000}%.0f ms/q) recall@10 ${hits / 1000.0}%.3f")
      }

      // SPARK_GRAFT_TB_DISK=1: the warehouse layout — the assignment
      // table partitioned by __cell on disk, probes pruning the SCAN
      // via DPP (ClusteringSpec pins the plan shape; this measures
      // it). The cached-index rows above can only prune compute; this
      // is where nProbe/nCells becomes an I/O fraction, and why the
      // fraction depends on the BATCH's distinct probed cells, not
      // just nProbe.
      if (sys.env.get("SPARK_GRAFT_TB_DISK").contains("1")) {
        val dir = java.nio.file.Files.createTempDirectory("tb_ivf_disk").toString
        idx.assigned.write.partitionBy("__cell").mode("overwrite").parquet(dir)
        val diskIdx = new graft.operators.IvfIndex(
          idx.model, spark.read.parquet(dir), "embedding", "vec_id")
        emb.unpersist() // the disk tier measures I/O, not cache hits
        val exactDisk = time {
          VectorSearch.topKBatch(diskIdx.assigned, "embedding", "vec_id",
            qdf, "qid", "qvec", k = 10).count()
        }
        println(f"disk exact batch 100: $exactDisk%.2fs (${exactDisk / 100 * 1000}%.0f ms/q, all $nCells cells read)")
        val cellRows = idx.assigned.groupBy("__cell").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap // bounded: nCells rows
        Seq(10, 100).foreach { nq =>
          val q = qdf.filter(col("qid") < nq)
          val cells = queries.take(nq)
            .flatMap(r => idx.centroidIdsFor(
              r.getSeq[Float](1).toArray, 4)).distinct
          val rowFrac = cells.map(cellRows.getOrElse(_, 0L)).sum * 100.0 / n
          val probed = diskIdx.topKBatch(q, "qid", "qvec", k = 10, nProbe = 4)
          probed.count() // warm
          val t = time { probed.count() }
          val dpp = probed.queryExecution.executedPlan.toString
            .contains("dynamicpruning")
          println(f"disk ivf nProbe=4 batch $nq: $t%.2fs (${t / nq * 1000}%.0f ms/q, " +
            f"${cells.length} of $nCells cells = ${cells.length * 100.0 / nCells}%.1f%% of files, " +
            f"$rowFrac%.1f%% of rows, dpp=$dpp)")
        }
      }
    }
    spark.stop()
  }
}
