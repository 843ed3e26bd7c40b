package graft.operators

import graft.plans.PqExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI 2011) — the ANN memory tier
  * above [[Quantization]]'s int8 codes: split each vector into `m`
  * subspaces, k-means each subspace to `k` centroids, store each vector
  * as m code indices (m bytes at k=256 — a 1024-dim float32 vector
  * compresses 256×). Queries score via ADC (asymmetric distance): one
  * m×k lookup table built per query on the driver, then a map-only
  * scan of the codes column summing table lookups — no float vectors
  * are read or shuffled at search time.
  *
  * At 100 TB this is the difference between an index that fits in
  * cluster memory and one that doesn't: IVF ([[IvfIndex]]) prunes which
  * partitions are SCANNED; PQ shrinks what each scanned row COSTS.
  * Composed (IVF-PQ), the probe reads nProbe/nCells of the corpus at
  * m bytes per vector.
  *
  * Training follows the FAISS playbook: collect a bounded,
  * deterministically-chosen sample (hash-ordered top-N — one
  * TakeOrdered job even over 100 TB) and run seeded Lloyd's with
  * k-means++ init per subspace on the driver. A 64k × 1024-dim float32
  * sample is 256 MB — driver-local by design; codebooks never need the
  * full corpus. Unlike the MLlib fits behind q50/q52, this training is
  * bit-deterministic (fixed sample order, seeded init, lowest-index tie
  * breaks), so codes reproduce across runs. Codebooks ride inside the
  * encode/score expressions ([[graft.plans.PqEncode]] /
  * [[graft.plans.PqAdc]]), so encode and scoring are pure narrow
  * stages. PQ queries still get rows-only driver checks (a k-means in
  * ANSI SQL is not a reasonable oracle); exactness properties (encode
  * argmin, ADC table equivalence, recall floors) are spec-asserted.
  */
object ProductQuantization {

  /** Trained codebooks: m × k_j × (dim/m). Ragged on purpose — a
    * subspace with fewer than k distinct values converges to duplicate
    * centroids, which training dedups, so k_j ≤ k. Every consumer
    * (encode argmin, ADC table) iterates `codebook(j).length`, never a
    * global k. */
  case class PqModel(codebook: Array[Array[Array[Float]]]) {
    def m: Int = codebook.length
    def k: Int = codebook.map(_.length).max
    def sub: Int = codebook(0)(0).length
    def dim: Int = m * sub
  }

  /** Train per-subspace codebooks over `vecCol` (dim must divide m).
    * One TakeOrdered job collects up to `trainSample` vectors chosen by
    * xxhash64 order (a deterministic uniform sample regardless of
    * corpus size or partition layout); Lloyd's then runs locally per
    * subspace. Identical vectors hash identically, so hash-order ties
    * only swap interchangeable rows — the trained model is a pure
    * function of (corpus contents, m, k, seed, maxIter, trainSample). */
  def train(df: DataFrame, vecCol: String, m: Int, k: Int,
            seed: Long = 42L, maxIter: Int = 20,
            trainSample: Int = 65536): PqModel = {
    require(k >= 1 && k <= Short.MaxValue,
      s"k=$k out of range: codes are stored as shorts (k <= ${Short.MaxValue})")
    val sample = df
      .select(col(vecCol).as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__h", xxhash64(col("__v")))
      .orderBy("__h")
      .limit(trainSample)
      .select("__v")
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, s"no non-null vectors in $vecCol to train on")
    val dim = sample(0).length
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(sample.forall(_.length == dim),
      s"mixed vector dimensions in $vecCol (expected $dim)")
    val sub = dim / m
    val codebook = Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      lloyd(pts, k, seed + j, maxIter)
    }
    PqModel(codebook)
  }

  /** Seeded Lloyd's with k-means++ init over an in-memory point set.
    * Deterministic end to end: seeded rng, fixed point order, argmin
    * ties to the lowest index, empty clusters keep their old center.
    * Converged duplicate centers are deduped (ragged k_j — see
    * [[PqModel]]). */
  private[operators] def lloyd(points: Array[Array[Float]], k: Int,
                               seed: Long, maxIter: Int): Array[Array[Float]] = {
    val n = points.length
    val sub = points(0).length
    def sqDist(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < sub) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
      d
    }
    val rng = new scala.util.Random(seed)
    // k-means++ seeding with a running min-distance array: O(n) per center
    val centers = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    centers += points(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var exhausted = false
    while (centers.length < k && !exhausted) {
      val last = centers.last
      var i = 0
      while (i < n) { val d = sqDist(points(i), last); if (d < minD(i)) minD(i) = d; i += 1 }
      val total = minD.sum
      if (total == 0.0) exhausted = true // every point already a center
      else {
        var r = rng.nextDouble() * total
        var idx = 0
        while (idx < n - 1 && r > minD(idx)) { r -= minD(idx); idx += 1 }
        centers += points(idx).clone()
      }
    }
    var cents = centers.toArray
    val assign = Array.fill(n)(-1)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      val sums = Array.fill(cents.length, sub)(0.0)
      val counts = new Array[Int](cents.length)
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          val d = sqDist(points(i), cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; changed = true }
        counts(best) += 1
        var dd = 0
        while (dd < sub) { sums(best)(dd) += points(i)(dd); dd += 1 }
        i += 1
      }
      var c = 0
      while (c < cents.length) {
        if (counts(c) > 0)
          cents(c) = Array.tabulate(sub)(dd => (sums(c)(dd) / counts(c)).toFloat)
        c += 1
      }
      iter += 1
    }
    cents.map(_.toSeq).distinct.map(_.toArray)
  }

  /** Append `pq_codes` (array<short>, one code per subspace). */
  def encode(df: DataFrame, vecCol: String, model: PqModel): DataFrame =
    df.withColumn("pq_codes", PqExpressions.pqEncode(col(vecCol), model.codebook))

  /** The query's ADC lookup table: squared L2 from each query subvector
    * to each centroid. Driver-side, m×k doubles. */
  def adcTable(query: Seq[Float], model: PqModel): Array[Array[Double]] = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    Array.tabulate(model.m) { j =>
      val cents = model.codebook(j)
      Array.tabulate(cents.length) { c =>
        var d = 0.0
        var i = 0
        while (i < model.sub) {
          val diff = query(j * model.sub + i).toDouble - cents(c)(i).toDouble
          d += diff * diff
          i += 1
        }
        d
      }
    }
  }

  /** ADC distance column for one query. */
  def adcDistance(codesCol: Column, query: Seq[Float], model: PqModel): Column =
    PqExpressions.pqAdc(codesCol, adcTable(query, model))

  /** Approximate top-k by ADC distance (ascending): a codes-only scan
    * compiling to TakeOrderedAndProject — k rows per partition merge,
    * no vector ever read. `df` must come from [[encode]]. */
  def topK(df: DataFrame, query: Seq[Float], model: PqModel, k: Int,
           tieCol: String): DataFrame =
    df.withColumn("adc_dist", adcDistance(col("pq_codes"), query, model))
      // NULL adc_dist marks a row whose vector was null/dim-mismatched at
      // encode time (PqEncode's quarantine contract). Ascending sort is
      // NULLS FIRST, which would put exactly those corrupt rows at the
      // top of the k — drop them before the sort (the filter keeps the
      // sort+limit eligible for TakeOrderedAndProject).
      .filter(col("adc_dist").isNotNull)
      .orderBy(asc("adc_dist"), asc(tieCol))
      .limit(k)

  /** One-time index-side encode for the IVF-PQ composition: PQ codes
    * ride next to the IVF cell id, so a probe can prune cells AND score
    * codes without touching float vectors. Built once per (index, model)
    * — at scale this is the persisted index table (reference analog:
    * DiskANN probe + `compress_neighbors=float8`,
    * /root/reference/src/services/LibSQLDatabase.ts:723-727). */
  def encodeIndex(index: IvfIndex, model: PqModel): DataFrame =
    encode(index.assigned, index.vecCol, model)

  /** IVF-PQ composed probe — the full 100 TB ANN shape:
    *
    *  1. rank coarse centroids on the driver, keep the nProbe nearest
    *     cells (partition pruning: nProbe/nCells of the corpus scanned);
    *  2. ADC-score ONLY the codes column inside those cells, shortlist
    *     the `rerank` best (codes-only TakeOrderedAndProject — m bytes
    *     read per row, no float vectors);
    *  3. exact cosine re-rank of the shortlist: a semi-join pulls the
    *     true vectors for `rerank` ids only, then the exact top-k.
    *
    * Monotone quality knobs: nProbe = nCells removes coarse pruning
    * error, rerank -> corpus size removes ADC ranking error; at those
    * limits this IS the exact scan. `encoded` must come from
    * [[encodeIndex]] over `index`. */
  def ivfPqTopK(encoded: DataFrame, index: IvfIndex, model: PqModel,
                query: Seq[Float], k: Int, nProbe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cells = index.centroidIdsFor(query.toArray, nProbe)
    val cand = encoded.filter(col("__cell").isin(cells: _*))
    val shortlist = topK(
      cand.select(col(index.idCol), col("pq_codes")), query, model,
      rerank, tieCol = index.idCol)
    val exact = cand.join(
      shortlist.select(index.idCol), Seq(index.idCol), "left_semi")
    VectorSearch.topK(exact, index.vecCol, query, k, tieCol = index.idCol)
  }

  // ---------------------------------------------------------------------
  // Residual IVF-PQ — the actual FAISS IVFPQ recipe (Jégou et al. 2011
  // §IV.C): PQ quantizes the RESIDUAL r = x − coarse_centroid(cell), not
  // the raw vector. Residuals concentrate near the origin with far less
  // variance than raw vectors, so the same m×k code budget spends its
  // centroids on the fine structure — better ADC ranking at identical
  // index bytes (spec-measured: shortlist recall strictly improves on
  // clustered corpora). All residual arithmetic is DOUBLE end-to-end
  // (float inputs widened once) so a DOUBLE[]-typed SQL oracle replays
  // encode and scoring bit-for-bit.
  // ---------------------------------------------------------------------

  /** Centroid of cell `c` as doubles (MLlib's native precision). */
  private def cellCentroid(index: IvfIndex, c: Int): Array[Double] =
    index.model.clusterCenters(c).toArray

  /** Train codebooks over RESIDUALS: same deterministic hash-ordered
    * sample as [[train]], but each sampled vector is first reduced by
    * its cell's coarse centroid. */
  def trainResidual(index: IvfIndex, m: Int, k: Int,
                    seed: Long = 42L, maxIter: Int = 20,
                    trainSample: Int = 65536): PqModel = {
    require(k >= 1 && k <= Short.MaxValue,
      s"k=$k out of range: codes are stored as shorts (k <= ${Short.MaxValue})")
    val sample = index.assigned
      .select(col(index.vecCol).as("__v"), col("__cell"))
      .where(col("__v").isNotNull)
      .withColumn("__h", xxhash64(col("__v")))
      .orderBy("__h")
      .limit(trainSample)
      .select("__v", "__cell")
      .collect()
    require(sample.nonEmpty, s"no non-null vectors in ${index.vecCol} to train on")
    val dim = sample(0).getSeq[Float](0).length
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val residuals = sample.map { r =>
      val v = r.getSeq[Float](0)
      val cent = cellCentroid(index, r.getInt(1))
      // double residual narrowed to float ONLY for Lloyd's (training
      // tolerates the rounding; encode/scoring stay double)
      Array.tabulate(dim)(i => (v(i).toDouble - cent(i)).toFloat)
    }
    val codebook = Array.tabulate(m) { j =>
      val pts = residuals.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      lloyd(pts, k, seed + j, maxIter)
    }
    PqModel(codebook)
  }

  /** Index-side residual encode: broadcast the (cell → centroid) table,
    * subtract in double, PQ-encode the residual. Narrow stages only —
    * the centroid table is nCells rows. */
  def encodeIndexResidual(index: IvfIndex, model: PqModel): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val cents = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("__cell", "__cent")
    index.assigned
      .join(broadcast(cents), Seq("__cell"))
      .withColumn("pq_codes", PqExpressions.pqEncode(
        zip_with(col(index.vecCol).cast("array<double>"), col("__cent"),
          (a, b) => a - b),
        model.codebook))
      .drop("__cent")
  }

  /** Residual ADC table for one probed cell: squared L2 from the
    * QUERY's residual against that cell to each codebook centroid. */
  def adcTableResidual(queryResidual: Array[Double], model: PqModel)
      : Array[Array[Double]] = {
    require(queryResidual.length == model.dim,
      s"query dim ${queryResidual.length} != model dim ${model.dim}")
    Array.tabulate(model.m) { j =>
      val cents = model.codebook(j)
      Array.tabulate(cents.length) { c =>
        var d = 0.0
        var i = 0
        while (i < model.sub) {
          val diff = queryResidual(j * model.sub + i) - cents(c)(i).toDouble
          d += diff * diff
          i += 1
        }
        d
      }
    }
  }

  /** Residual IVF-PQ probe — [[ivfPqTopK]] with per-cell ADC tables
    * ([[graft.plans.PqAdcByCell]]): the query's residual differs per
    * probed cell, so the driver builds one m×k table per cell
    * (nProbe × m × k doubles, closure-shipped) and one codes-only scan
    * scores every probed cell in a single pass — same partition-pruned
    * I/O as the raw probe, no per-cell unions. `encoded` must come from
    * [[encodeIndexResidual]] over `index` and `model` from
    * [[trainResidual]]. Same monotone quality knobs: nProbe = nCells
    * and rerank = corpus size recover the exact scan. */
  def ivfPqResidualTopK(encoded: DataFrame, index: IvfIndex, model: PqModel,
                        query: Seq[Float], k: Int, nProbe: Int,
                        rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cells = index.centroidIdsFor(query.toArray, nProbe)
    val tables = cells.map { c =>
      val cent = cellCentroid(index, c)
      c -> adcTableResidual(
        Array.tabulate(model.dim)(i => query(i).toDouble - cent(i)), model)
    }.toMap
    val cand = encoded.filter(col("__cell").isin(cells: _*))
    val shortlist = cand
      .withColumn("adc_dist",
        PqExpressions.pqAdcByCell(col("__cell"), col("pq_codes"), tables))
      .filter(col("adc_dist").isNotNull)
      .orderBy(asc("adc_dist"), asc(index.idCol))
      .limit(rerank)
    val exact = cand.join(
      shortlist.select(index.idCol), Seq(index.idCol), "left_semi")
    VectorSearch.topK(exact, index.vecCol, query, k, tieCol = index.idCol)
  }
}
