package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup: cluster-blocked semantic dedup with the
  * farther-from-centroid keeper rule. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters around (1,0) and (0,1)
  private val centroids = Seq(Array(1.0, 0.0), Array(0.0, 1.0))

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("id", "vec")

  test("within-cluster near-dup pair drops the member closer to the centroid") {
    // ids 1,2 are near-identical directions in cluster 0; id 1 sits
    // farther from the centroid, so it is the survivor. id 3 is the
    // lone member of cluster 1.
    val d = df(
      (1L, Array(3.0f, 0.1f)),   // dist to (1,0) ~ 2.0
      (2L, Array(1.5f, 0.05f)),  // same direction, dist ~ 0.5
      (3L, Array(0.0f, 2.0f)))
    val out = SemDedup.semDedup(d, "id", "vec", centroids, threshold = 0.95)
      .orderBy("id").collect()
    assert(out.map(_.getInt(out.head.fieldIndex("cluster_id"))).toSeq === Seq(0, 0, 1))
    val kept = out.map(r => r.getLong(0) -> r.getAs[Int]("kept")).toMap
    assert(kept === Map(1L -> 1, 2L -> 0, 3L -> 1))
  }

  test("pairs below the threshold both survive") {
    val d = df(
      (1L, Array(1.0f, 0.3f)),  // cluster 0, cos(1,2) well below 0.99
      (2L, Array(1.0f, -0.3f)),
      (3L, Array(0.0f, 1.0f)))
    val out = SemDedup.semDedup(d, "id", "vec", centroids, threshold = 0.99)
    assert(out.filter(col("kept") === 0).count() === 0)
  }

  test("cross-cluster near-identical vectors are NOT paired (blocking contract)") {
    // both lie on the decision boundary direction but land in different
    // clusters; cosine is ~1 yet no pair forms across clusters
    val d = df(
      (1L, Array(0.9f, 1.0f)),   // assigned to cluster 1 (closer to (0,1))
      (2L, Array(1.0f, 0.9f)))   // assigned to cluster 0
    val out = SemDedup.semDedup(d, "id", "vec", centroids, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("kept")).toMap
    assert(out === Map(1L -> 1, 2L -> 1))
  }

  test("exact-tie distances keep the lower id") {
    // identical vectors: same centroid distance, cosine 1.0
    val d = df(
      (7L, Array(2.0f, 0.0f)),
      (4L, Array(2.0f, 0.0f)))
    val out = SemDedup.semDedup(d, "id", "vec", centroids, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("kept")).toMap
    assert(out === Map(4L -> 1, 7L -> 0))
  }

  test("transitive chain: domination removes every dominated member") {
    // a~b and b~c above threshold (a~c too here); farthest (a) survives
    val d = df(
      (1L, Array(4.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f)))
    val out = SemDedup.semDedup(d, "id", "vec", centroids, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("kept")).toMap
    assert(out === Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("semDedupKeep passes input columns through and is partitioning-invariant") {
    val d = df(
      (1L, Array(3.0f, 0.1f)),
      (2L, Array(1.5f, 0.05f)),
      (3L, Array(0.0f, 2.0f))).withColumn("extra", col("id") * 10)
    val kept1 = SemDedup.semDedupKeep(d, "id", "vec", centroids, 0.95)
    assert(kept1.columns.toSeq === Seq("id", "vec", "extra"))
    val ids1 = kept1.select("id").as[Long].collect().sorted.toSeq
    val ids8 = SemDedup.semDedupKeep(d.repartition(8), "id", "vec", centroids, 0.95)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 === Seq(1L, 3L))
    assert(ids8 === ids1)
  }

  test("autoK: k = ceil(n/target), guards on degenerate inputs") {
    assert(SemDedup.autoK(500L, 50L) === 10)
    assert(SemDedup.autoK(501L, 50L) === 11)
    assert(SemDedup.autoK(49L, 50L) === 1)
    assert(SemDedup.autoK(1L, 1L) === 1)
    intercept[IllegalArgumentException](SemDedup.autoK(0L, 50L))
    intercept[IllegalArgumentException](SemDedup.autoK(10L, 0L))
  }

  test("autoK bounds the max cluster at 10x rows (the executable k contract)") {
    // 1x = the real embeddings table; 10x = ten copies with disjoint
    // ids, each perturbed per copy (byte-identical copies would stack
    // on one centroid and measure a degenerate regime)
    val base = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val tenx = (0 until 10).map { c =>
      base.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + lit(c * 0.01f) * (i % 7).cast("float")).cast("float"))
          .as("embedding"))
    }.reduce(_ unionByName _)
    val target = 50L
    def maxCluster(d: org.apache.spark.sql.DataFrame): (Int, Long) = {
      val k = SemDedup.autoK(d.count(), target)
      val m = ClusteringOps.fit(d, "embedding", k,
        maxIter = 30, initMode = "random")
      val mx = ClusteringOps.assign(m, d, "vec_id", "embedding")
        .groupBy("clusterId").count().agg(max("count")).head().getLong(0)
      (k, mx)
    }
    val (k1, m1) = maxCluster(base)
    val (k10, m10) = maxCluster(tenx)
    assert(k1 === 10 && k10 === 100) // k grew with the corpus
    // the contract: 10x rows does NOT mean 10x cluster size — the max
    // stays within a small factor of the target in both regimes, so
    // the within-cluster pair join stays O(n * target), not O(n^2)
    assert(m1 <= 4 * target, s"1x max cluster $m1")
    assert(m10 <= 4 * target, s"10x max cluster $m10")
    info(s"max cluster: 1x=$m1, 10x=$m10 (target=$target)")
  }

  test("semDedupAutoK is the semDedup verdict under its own fit") {
    val base = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).limit(120)
    val out = SemDedup.semDedupAutoK(base, "vec_id", "embedding",
      targetClusterSize = 40L, threshold = 0.3)
    val rows = out.collect()
    assert(rows.length === 120) // one verdict per input row
    assert(rows.forall(r => r.getAs[Int]("kept") == 0 || r.getAs[Int]("kept") == 1))
    // replaying semDedup with the same fit's centroids is identical
    val m = ClusteringOps.fit(base, "embedding", SemDedup.autoK(120L, 40L),
      maxIter = 30, initMode = "random")
    val replay = SemDedup.semDedup(base, "vec_id", "embedding",
        m.clusterCenters.map(_.toArray).toSeq, threshold = 0.3)
      .orderBy("id").collect().toSeq
    assert(rows.sortBy(_.getLong(0)).toSeq === replay)
  }
}
