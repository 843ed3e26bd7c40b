package graft.operators

import graft.functions.VectorFunctions.sqDist
import graft.plans.CosineSimilarity
import graft.util.Materialize.MatOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, arXiv:2303.09540): cluster the corpus with k-means, then
  * within each cluster drop items whose cosine similarity to another
  * cluster member exceeds a threshold, keeping the member farthest from
  * the cluster centroid (the paper's diversity-preserving keeper rule).
  *
  * This removes *semantic* duplicates — paraphrases, re-encodings,
  * template variants — that survive every lexical tier ([[Dedup]]'s
  * MinHash/SimHash/n-gram) because their surface text differs.
  *
  * Scale design: the clustering is the blocking key, so the pair space
  * is O(sum of cluster sizes squared), never corpus-squared — the same
  * equi-join-only contract as [[VectorSearch.nearDupPairs]]. Coarse
  * assignment is one map-only pass (k sequential-fold distances per
  * row, whole-stage codegen; for k beyond a few thousand reuse an
  * [[IvfIndex]]'s coarse quantizer instead). The removal rule is a
  * per-pair domination decision — order-independent, so the result is
  * identical on any partitioning and any engine, unlike the greedy
  * sequential scan in the paper's reference implementation (which
  * depends on within-cluster iteration order). A transitive chain
  * a~b~c may drop both b and c where the greedy scan keeps c: at
  * near-dup thresholds the difference is a strict superset of removals
  * with the same canonical survivors, which is the conservative
  * direction for training-data curation.
  *
  * Float parity: per-pair cosine is the bit-parity-certified
  * [[CosineSimilarity]] fold; centroid distances are the same
  * sequential `sqDist` fold the oracle replays via `list_distance`, so
  * threshold and domination comparisons reproduce cross-engine.
  */
object SemDedup {

  /** Per-item semantic-dedup verdicts.
    *
    * Output: (id, cluster_id, centroid_dist, kept) — one row per input
    * item; `kept = 0` marks semantic duplicates to drop.
    *
    * @param centroids cluster centers, index = cluster id (e.g. from a
    *                  seeded MLlib fit's `clusterCenters`); assignment
    *                  is argmin Euclidean distance, ties to the lowest
    *                  cluster id (MLlib `findClosest` order)
    * @param threshold within-cluster cosine at or above which the pair
    *                  is a semantic duplicate
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               centroids: Seq[Array[Double]], threshold: Double): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    // map-only coarse assignment: k distances per row; array_min over
    // (dist, cid) structs = argmin with ties to the lowest cluster id
    val best = array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqrt(sqDist(col(vecCol), lit(c))).as("dist"),
        lit(i).as("cid"))
    }: _*))
    val assigned = df.select(col(idCol).as("id"), col(vecCol).as("__vec"),
        best.getField("cid").as("cluster_id"),
        best.getField("dist").as("centroid_dist"))
      .materializeOnce(eager = false) // three consumers: pair join x2 + output
    // within-cluster pairs: equi-join on the cluster id — centroid
    // distances ride along so the domination decision needs no re-join
    val a = assigned.select(col("cluster_id"), col("id").as("id_a"),
      col("__vec").as("__va"), col("centroid_dist").as("da"))
    val b = assigned.select(col("cluster_id"), col("id").as("id_b"),
      col("__vec").as("__vb"), col("centroid_dist").as("db"))
    val pairs = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(CosineSimilarity(col("__va"), col("__vb")) >= threshold)
    // keeper rule: the member FARTHER from the centroid survives
    // (diversity-preserving, per the paper); exact-tie -> keep lower id
    val removed = pairs.select(
      when(col("da") > col("db"), col("id_b"))
        .when(col("db") > col("da"), col("id_a"))
        .otherwise(greatest(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    assigned
      .join(removed.withColumn("__rm", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"), col("centroid_dist"),
        col("__rm").isNull.cast("int").as("kept"))
  }

  /** The k-grows-with-the-corpus deployment contract, as code instead
    * of prose: k = ceil(n / targetClusterSize), so EXPECTED cluster
    * size stays ~constant as the corpus grows and the within-cluster
    * pair join stays O(n · targetClusterSize) — never corpus-squared.
    * (k-means does not hard-bound the max cluster; the 1×-vs-10×
    * boundedness is measured in `SemDedupSpec` and SCALE.md.) */
  def autoK(n: Long, targetClusterSize: Long): Int = {
    require(n > 0, s"need a non-empty corpus: n=$n")
    require(targetClusterSize > 0,
      s"targetClusterSize must be positive: $targetClusterSize")
    math.min((n + targetClusterSize - 1) / targetClusterSize,
      Int.MaxValue.toLong).toInt
  }

  /** [[semDedup]] with the auto-k contract applied: count the corpus,
    * fit a seeded k-means at k = [[autoK]](n, targetClusterSize), and
    * run the per-item verdicts against the fitted centroids. The count
    * and fit are extra full passes — at pipeline scale callers that
    * already know n (or reuse a fit) should call [[semDedup]] with
    * their own centroids; this form is the self-contained contract. */
  def semDedupAutoK(df: DataFrame, idCol: String, vecCol: String,
                    targetClusterSize: Long, threshold: Double,
                    seed: Long = 42L): DataFrame = {
    val k = autoK(df.count(), targetClusterSize)
    val model = ClusteringOps.fit(df, vecCol, k, seed = seed,
      maxIter = 30, initMode = "random")
    semDedup(df, idCol, vecCol,
      model.clusterCenters.map(_.toArray).toSeq, threshold)
  }

  /** The curation-pipeline form: the input rows that survive semantic
    * dedup (a left-semi join on the kept ids — all input columns pass
    * through untouched). */
  def semDedupKeep(df: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[Array[Double]],
                   threshold: Double): DataFrame = {
    val kept = semDedup(df, idCol, vecCol, centroids, threshold)
      .filter(col("kept") === 1)
      .select(col("id").as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }
}
