package graft.operators

import graft.plans.CosineSimilarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Materialize.MatOps

/** Vector similarity search over an `ArrayType(FloatType)` column.
  *
  * v1 is the exact brute-force scan: score every row against the query
  * vector and take the top k. This mirrors the semantics of the
  * reference's `vector_top_k` DiskANN probe
  * (/root/reference/src/services/LibSQLDatabase.ts:325-337) but is *exact*
  * rather than approximate. On Spark the plan is a single parquet scan ->
  * projection -> `TakeOrderedAndProject`: no shuffle of the vectors, only
  * k rows per partition travel to the driver-side merge, so it scales
  * linearly with executors. Filters passed in are applied *below* the
  * top-k (the reference over-fetches `limit×3` to post-filter,
  * LibSQLDatabase.ts:227,340 — unnecessary here because Catalyst pushes
  * the predicate under the sort).
  *
  * The scale path (IVF coarse quantization via k-means centroids +
  * probe-time partition pruning) lives in [[IvfIndex]].
  */
object VectorSearch {

  /** Literal column for a query vector (broadcast as part of the plan —
    * 64–1024 floats is negligible plan size). */
  def queryVec(v: Seq[Float]): Column = lit(v.toArray)

  /** Exact top-k by cosine similarity.
    *
    * @param df        input with `vecCol`
    * @param vecCol    embedding column name
    * @param query     query vector
    * @param k         number of neighbors
    * @param filterOpt optional predicate applied before scoring
    * @param tieCol    column providing a deterministic tie-break order
    */
  def topK(df: DataFrame, vecCol: String, query: Seq[Float], k: Int,
           tieCol: String, filterOpt: Option[Column] = None): DataFrame = {
    val base = filterOpt.map(df.filter).getOrElse(df)
    base
      .withColumn("cos_sim", CosineSimilarity(col(vecCol), queryVec(query)))
      .orderBy(desc("cos_sim"), asc(tieCol))
      .limit(k)
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein, SIGIR 1998):
    * greedily pick k results maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — relevance traded
    * against redundancy, the standard fix for top-k lists that return
    * k near-copies of the best hit.
    *
    * Scale shape: the DISTRIBUTED part is the `shortlist`-sized exact
    * top-k (TakeOrderedAndProject over the corpus); the greedy loop
    * then runs driver-side over that BOUNDED candidate set (the PQ
    * train-sample discipline — shortlist ≤ a few hundred rows at any
    * corpus size, and MMR quality only needs candidates worth
    * diversifying among). The first pick is the relevance argmax; all
    * similarity arithmetic is float-widened-to-double with ascending-
    * dimension folds — bit-identical to the engine/oracle cosine.
    *
    * Output: (id, rel, mmr_score, pick) — selection order 1..k, the
    * order a diversified result page renders. `id` keeps the input
    * column's type (long/int/string/… — ADVICE r12: this used to
    * hard-code Long and ClassCastException on anything else); ties in
    * MMR score break to the LOWEST id regardless of relevance — the
    * q113 oracle's per-pick `ORDER BY sc DESC, id LIMIT 1` semantics
    * (ADVICE r13: the doc used to claim topK-order tie-breaking, which
    * diverges from `idLt` once picks past the first can tie on score
    * with different rel). */
  def mmrTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, shortlist: Int = 50,
              lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need shortlist >= k >= 1")
    val spark = df.sparkSession
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val cand = topK(df.select(col(idCol).as("id"), col(vecCol).as("v")),
        "v", query, shortlist, tieCol = "id")
      .select("id", "v", "cos_sim").collect()
      .map(r => (r.get(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // id ordering for score ties — type-directed, matching the oracle's
    // ORDER BY id semantics for each supported id type
    def idLt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long)       => x < y
      case (x: Int, y: Int)         => x < y
      case (x: Short, y: Short)     => x < y
      case (x: String, y: String)   => x < y
      case (x: Double, y: Double)   => x < y
      case (x: Float, y: Float)     => x < y
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) < 0
      case _ => throw new IllegalArgumentException(
        s"mmrTopK: unsupported id type ${idField.dataType} for tie-break")
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Any, Double, Double)]
    val chosen = scala.collection.mutable.Set.empty[Any]
    val chosenVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    while (selected.size < math.min(k, cand.length)) {
      var bestId: Any = null; var bestVec: Array[Float] = null
      var bestRel = 0.0; var bestScore = Double.NegativeInfinity
      cand.foreach { case (id, v, rel) =>
        if (!chosen.contains(id)) {
          val maxSim =
            if (chosenVecs.isEmpty) 0.0
            else chosenVecs.map(s => cos(v, s)).max
          val score = lambda * rel - (1.0 - lambda) * maxSim
          if (score > bestScore ||
              (score == bestScore && bestId != null && idLt(id, bestId))) {
            bestScore = score; bestId = id; bestVec = v; bestRel = rel
          }
        }
      }
      selected += ((bestId, bestRel, bestScore))
      chosen += bestId
      chosenVecs += bestVec
    }
    val rows = selected.zipWithIndex.map { case ((id, rel, sc), i) =>
      org.apache.spark.sql.Row(id, rel, sc, i + 1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        idField.copy(name = "id"),
        org.apache.spark.sql.types.StructField("rel",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("mmr_score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("pick",
          org.apache.spark.sql.types.IntegerType))))
  }

  /** Batched exact top-k: score MANY query vectors in ONE corpus scan.
    * This is the engine's throughput mode — the reference answers
    * queries one at a time (~17ms each against its ANN index); here the
    * per-job cost amortizes across the whole query batch: the (small)
    * query set broadcasts, the corpus streams through once, and a
    * per-query ranking window keeps k rows each. Throughput scales with
    * executors × batch size rather than queries × per-call latency.
    *
    * @param queries     (qidCol, vecCol) — must be broadcast-sized
    * @param excludeSelf drop corpus rows whose id equals the query id —
    *                    ONLY correct when queries are drawn from the
    *                    corpus itself (self-search); external query
    *                    batches whose ids happen to collide with corpus
    *                    ids would silently lose true neighbors
    */
  def topKBatch(df: DataFrame, vecCol: String, idCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int, excludeSelf: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(desc("cos_sim"), asc(idCol))
    val paired = df.crossJoin(broadcast(queries))
    (if (excludeSelf) paired.filter(col(idCol) =!= col(qidCol)) else paired)
      .withColumn("cos_sim", CosineSimilarity(col(vecCol), col(qvecCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qidCol), col("rn"), col(idCol), col("cos_sim"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector, the `k` most similar corpus vectors with a
    * DIFFERENT label — the near-the-boundary negatives that carry the
    * training signal easy random negatives lack (the standard upgrade
    * over in-batch negatives).
    *
    * Same batch shape as [[topKBatch]] (corpus × broadcast query
    * batch, ranked per query); the label-mismatch predicate lands
    * BEFORE ranking so the window never sees positives, and the
    * per-query window partitions by qid (batch-bounded, never a
    * corpus-wide single partition).
    *
    * Output: (qidCol, rn, idCol, labelCol, cos_sim). */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queries: DataFrame, qidCol: String,
                    qvecCol: String, qlabelCol: String, k: Int)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(desc("cos_sim"), asc(idCol))
    df.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qidCol) &&
        col(labelCol) =!= col(qlabelCol))
      .withColumn("cos_sim", CosineSimilarity(col(vecCol), col(qvecCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qidCol), col("rn"), col(idCol), col(labelCol),
        col("cos_sim"))
  }

  /** All pairs within a partition-key block whose cosine similarity
    * meets `threshold` — embedding-based near-duplicate detection.
    *
    * The `blockCol` equi-join key keeps the pair space tractable: the
    * join is a shuffle hash join on the block key instead of a full
    * cartesian product, which is the difference between O(n²) and
    * O(sum of block²) at 100 TB. Callers choose the blocking key (an LSH
    * bucket, a coarse cluster id, a label...).
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("block"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"))
    val b = df.select(col(blockCol).as("block"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", CosineSimilarity(col("vec_a"), col("vec_b")))
      .filter(col("cos_sim") >= threshold)
      .select("block", "id_a", "id_b", "cos_sim")
  }

  /** Embedding near-duplicate pairs with NO caller-supplied blocking
    * key: sign-random-projection (hyperplane) LSH generates the blocks.
    *
    * Pipeline: one map-only pass computes a `bits`-bit SRP signature
    * per vector ([[graft.plans.HyperplaneSignature]]); the signature
    * splits into `numBands` byte-ish bands; vectors agreeing on ANY
    * band become candidates via a per-band equi-join (never a
    * cartesian product); exact cosine then verifies candidates against
    * `threshold`. Collision probability per bit is 1-θ/π, so a
    * 32-bit/4-band default gives ~90% recall at cos≥0.95 while a
    * random pair passes a band at ~0.4% — the verify join stays tiny.
    * Recall rises with more bands (more tables), precision with more
    * bits per band; both are caller-tunable.
    *
    * Scale design mirrors [[Dedup.lshCandidatePairs]]: the banded rows
    * are (id, band_key) only — vectors do NOT travel to the candidate
    * join; the two-phase hot-bucket guard (map-side count, broadcast
    * anti-join) drops degenerate buckets (e.g. the all-zeros signature
    * from null-ish embeddings) before the self-join can square them;
    * the verify stage joins vectors back for candidate ids only.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, threshold: Double,
                      bits: Int = 32, numBands: Int = 4,
                      maxBucketSize: Int = 10000): DataFrame = {
    require(bits % numBands == 0, "bands must tile the signature")
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val sig = df.select(col(idCol).as("id"),
      graft.plans.HyperplaneSignature(col(vecCol), bits, dim).as("__sig"))
    val keys = (0 until numBands).map { b =>
      concat_ws("_", lit(b.toString),
        (shiftright(col("__sig"), b * bandBits).bitwiseAND(lit(mask))).cast("string"))
    }
    // tiny (id, band_key) rows materialize once: they feed the hot-key
    // count AND both sides of the candidate self-join
    val banded = sig.filter(col("__sig").isNotNull)
      .select(col("id"), explode(array(keys: _*)).as("band_key"))
      .materializeOnce(eager = false)
    val hotKeys = banded.groupBy("band_key").count()
      .filter(col("count") > maxBucketSize)
      .select("band_key")
    val capped = banded.join(broadcast(hotKeys), Seq("band_key"), "left_anti")
    val cands = capped.select(col("band_key"), col("id").as("id_a"))
      .join(capped.select(col("band_key"), col("id").as("id_b")), Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // verify: vectors join back for candidate ids only
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("__v"))
    cands
      .join(vecs.withColumnRenamed("id", "id_a").withColumnRenamed("__v", "__va"), "id_a")
      .join(vecs.withColumnRenamed("id", "id_b").withColumnRenamed("__v", "__vb"), "id_b")
      .withColumn("cos_sim", CosineSimilarity(col("__va"), col("__vb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Element-wise centroid (mean vector) per group.
    * Output: (groupCol, pos, centroid_val).
    *
    * Double summation is partition-order-sensitive, so small groups
    * collect (orderId, value) and fold in orderId order — a
    * deterministic left-fold, bit-reproducible run-to-run and
    * engine-to-engine. That buffer is the cluster-member count, which
    * at corpus scale can be millions of structs in ONE aggregation
    * buffer (OOM, not slowness) — so groups larger than
    * `maxExactGroup` route to a streaming `avg` instead: O(1) memory,
    * map-side partial, order-sensitive only in the last ulp. The size
    * gate is a cheap pre-agg on the UNEXPLODED rows (one narrow row
    * per member), and the two branches union — per-group routing, not
    * a global mode switch. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String,
                orderCol: String, maxExactGroup: Long = 1000000L): DataFrame = {
    val sizes = df.groupBy(groupCol).agg(count(lit(1)).as("__gn"))
    val tagged = df.select(col(groupCol), col(orderCol).as("__ord"), col(vecCol))
      .join(sizes, Seq(groupCol)) // AQE broadcasts the (tiny) size side
    val exploded = tagged
      .select(col(groupCol), col("__ord"), col("__gn"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
    val small = exploded.filter(col("__gn") <= maxExactGroup)
      .groupBy(groupCol, "pos")
      .agg(
        sort_array(collect_list(struct(col("__ord"), col("v")))).as("vs"),
        count(lit(1)).as("n"))
      .select(col(groupCol), col("pos"),
        (aggregate(col("vs"), lit(0.0),
          (acc, x) => acc + x.getField("v").cast("double")) /
          col("n").cast("double")).as("centroid_val"))
    val large = exploded.filter(col("__gn") > maxExactGroup)
      .groupBy(groupCol, "pos")
      .agg(avg(col("v").cast("double")).as("centroid_val"))
      .select(col(groupCol), col("pos"), col("centroid_val"))
    small.unionByName(large)
  }
}
