package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAPTOR-style clustering (reference M1-M7) on MLlib.
  *
  * The reference hand-rolls Lloyd's k-means, a mini-batch variant, and
  * LIMIT/OFFSET streaming purely because it is single-node
  * (/root/reference/src/services/Clustering.ts:233-508,624-648). MLlib
  * KMeans is already distributed (k-means|| init ≈ k-means++), so the
  * mini-batch/pagination machinery disappears; everything is seeded for
  * reproducibility (SURVEY.md §7.3).
  */
object ClusteringOps {

  /** Fit k-means over an Array[Float] embedding column.
    *
    * `initMode` "k-means||" (default) buys better centroids at the cost
    * of extra full passes over the data; "random" skips them — the right
    * trade for index-build artifacts (IVF cells, cluster histograms)
    * where each pass is a full distributed scan at corpus scale and
    * centroid quality only shifts cell balance, not correctness. */
  def fit(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
          maxIter: Int = 100, initMode: String = "k-means||"): KMeansModel =
    new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setInitMode(initMode)
      .setFeaturesCol("__features")
      .fit(df.withColumn("__features",
        array_to_vector(col(vecCol).cast("array<double>"))))

  /** Hard assignments with distance to centroid — the reference's
    * `chunk_clusters` rows (chunkId, clusterId, distance). */
  def assign(model: KMeansModel, df: DataFrame, idCol: String,
             vecCol: String): DataFrame = {
    val withPred = model.transform(
      df.withColumn("__features", array_to_vector(col(vecCol).cast("array<double>"))))
    val centers = withPred.sparkSession.sparkContext
      .broadcast(model.clusterCenters)
    val dist = udf { (v: Seq[Double], c: Int) =>
      math.sqrt(Vectors.sqdist(Vectors.dense(v.toArray), centers.value(c)))
    }
    withPred.select(
      col(idCol).as("chunkId"),
      col(model.getPredictionCol).as("clusterId"),
      dist(col(vecCol).cast("array<double>"), col(model.getPredictionCol))
        .as("distance"))
  }

  /** BIC for model selection over k (reference A5/M4,
    * Clustering.ts:336-359): n·ln(RSS/n) + p·ln(n), p = k·dim + k. RSS =
    * KMeans trainingCost (sum of squared distances). */
  def bic(model: KMeansModel, n: Long, dim: Int): Double = {
    val rss = math.max(model.summary.trainingCost, 1e-10)
    val p = model.getK * dim + model.getK
    n * math.log(rss / n) + p * math.log(n.toDouble)
  }

  /** Try k in [2, maxK], return the model minimizing BIC (driver loop —
    * each fit is a distributed job). */
  def fitBestK(df: DataFrame, vecCol: String, maxK: Int,
               seed: Long = 42L): KMeansModel = {
    val cached = df.cache()
    val n = cached.count()
    val dim = cached.select(size(col(vecCol))).head().getInt(0)
    val best = (2 to math.min(maxK, n.toInt)).map { k =>
      val m = fit(cached, vecCol, k, seed)
      m -> bic(m, n, dim)
    }.minBy(_._2)._1
    cached.unpersist()
    best
  }

  /** Soft membership probabilities (reference M3): softmax over negative
    * distances with temperature, keep p >= minProbability. One row per
    * (id, clusterId) retained membership. */
  def softAssign(model: KMeansModel, df: DataFrame, idCol: String,
                 vecCol: String, temperature: Double = 0.5,
                 minProbability: Double = 0.01): DataFrame = {
    val centers = df.sparkSession.sparkContext.broadcast(
      model.clusterCenters.map(_.toArray))
    val probs = udf { (v: Seq[Double]) =>
      val ds = centers.value.map(c => math.sqrt(Vectors.sqdist(
        Vectors.dense(v.toArray), Vectors.dense(c))))
      val exps = ds.map(d => math.exp(-d / temperature))
      val z = exps.sum
      exps.map(_ / z)
    }
    df.select(col(idCol).as("chunkId"),
      posexplode(probs(col(vecCol).cast("array<double>")))
        .as(Seq("clusterId", "probability")))
      .filter(col("probability") >= minProbability)
  }

  /** M6 cluster->concept mapping (reference ClusterConceptMapper.ts:
    * 76-118): cosine between each cluster centroid and every concept
    * embedding (both tiny — broadcast cross join), keep the best match
    * at/above `threshold`, otherwise suggest a label from the cluster
    * summary's first sentence trimmed to 50 chars. Output one row per
    * cluster: (clusterId, conceptId?, similarity?, suggestedLabel?). */
  def mapClustersToConcepts(centroids: DataFrame, // (clusterId, centroid)
                            summaries: DataFrame, // (clusterId, summary)
                            conceptEmbeddings: DataFrame, // (conceptId, embedding)
                            threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("clusterId")
      .orderBy(desc("similarity"), asc("conceptId"))
    val best = centroids
      .crossJoin(broadcast(conceptEmbeddings))
      .withColumn("similarity", graft.plans.CosineSimilarity(
        col("centroid").cast("array<float>"), col("embedding")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("clusterId"), col("conceptId"), col("similarity"))
    summaries.join(best, Seq("clusterId"), "left_outer")
      .withColumn("matched", col("similarity").isNotNull &&
        col("similarity") >= threshold)
      .select(col("clusterId"),
        when(col("matched"), col("conceptId")).as("conceptId"),
        when(col("matched"), col("similarity")).as("similarity"),
        when(!col("matched"),
          substring(trim(split(col("summary"), "[.!?]").getItem(0)), 1, 50))
          .as("suggestedLabel"))
  }

  /** True probabilistic soft clustering via MLlib GaussianMixture — the
    * alternative SURVEY §2.9 M3 notes; the k-means+softmax port above is
    * the output-parity default, GMM is the statistically-grounded
    * option. */
  def gmmAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                seed: Long = 42L): DataFrame = {
    val gmm = new org.apache.spark.ml.clustering.GaussianMixture()
      .setK(k).setSeed(seed).setFeaturesCol("__features")
      .fit(df.withColumn("__features",
        array_to_vector(col(vecCol).cast("array<double>"))))
    gmm.transform(df.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>"))))
      .select(col(idCol).as("chunkId"),
        col("prediction").as("clusterId"),
        vector_to_array(col("probability")).as("probabilities"))
  }

  /** M5 primary tier: LLM abstractive summary of one cluster's combined
    * chunk text (reference ClusterSummarizer.ts:110-178). */
  case class AbstractiveSummary(summary: String, keyTopics: Seq[String],
                                representativeQuote: Option[String])

  /** The abstractive prompt (ClusterSummarizer.ts:149-157); `combined`
    * is the "[Chunk i]\n..." concatenation already cut to the reference's
    * 6000-char context budget. */
  def summaryPrompt(combined: String): String =
    s"""Analyze these document chunks from a knowledge library cluster and create an abstractive summary.
       |
       |$combined
       |
       |Return ONLY a JSON object with these fields:
       |- "summary": a cohesive 2-4 sentence summary that captures the main themes and insights
       |- "keyTopics": 3-6 key topics or concepts covered across these chunks
       |- "representativeQuote": (optional) the most representative or impactful quote from the chunks
       |
       |Focus on synthesizing ideas across chunks, not just listing them.""".stripMargin

  /** Parse an LLM summary response; the reference gets schema enforcement
    * from `generateObject`, so the parse contract is: X21 repair first, a
    * non-empty `summary` string is required, topics default empty, quote
    * optional. None -> caller falls back to the extractive tier. */
  def parseSummary(raw: String): Option[AbstractiveSummary] =
    TextEnrichment.repairLlmJson(raw).toOption.flatMap { json =>
      val node = try new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json) catch { case _: Exception => null }
      Option(node).filter(_.isObject).flatMap { n =>
        Option(n.get("summary")).filter(_.isTextual).map(_.asText)
          .filter(_.nonEmpty).map { s =>
            import scala.jdk.CollectionConverters._
            val topics = Option(n.get("keyTopics")).filter(_.isArray)
              .map(_.elements().asScala.toSeq.filter(_.isTextual).map(_.asText))
              .getOrElse(Nil)
            val quote = Option(n.get("representativeQuote"))
              .filter(_.isTextual).map(_.asText).filter(_.nonEmpty)
            AbstractiveSummary(s, topics, quote)
          }
      }
    }

  /** The reference's per-cluster extractive fallback
    * (ClusterSummarizer.ts:76-106): first sentence of each sampled chunk,
    * keep sentences > 10 chars, take 3. Pure — runs executor-side under
    * [[abstractiveSummaries]]. */
  private[operators] def extractiveFallback(chunks: Seq[String]): String = {
    val sentences = chunks.map(_.split("[.!?]")(0).trim)
      .filter(_.length > 10).take(3)
    if (sentences.nonEmpty) s"This cluster covers: ${sentences.mkString(". ")}."
    else "Cluster contains very short text fragments."
  }

  /** M5 primary tier, distributed: one [[graft.sources.ChatModel]]
    * completion per CLUSTER (not per chunk — k completions total), each
    * over up to `maxChunks` lowest-id members cut to the reference's
    * 6000-char budget. Any failure (transport, JSON, schema) falls back
    * to [[extractiveFallback]] for that cluster only — the E6 pattern
    * ([[graft.AutoEnricher]]): the LLM tier can never fail the build.
    *
    * Scale shape: the member sample rides a window top-n (no full-text
    * groupBy), completions run inside `mapGroups` so k clusters spread
    * across executors, and `chunkCount` aggregates separately over ALL
    * assignments (the reference counts the whole cluster, not the
    * sample). Output: (clusterId, summary, keyTopics,
    * representativeQuote, tier, chunkCount). */
  def abstractiveSummaries(assignments: DataFrame, corpus: DataFrame,
                           idCol: String, textCol: String,
                           chat: graft.sources.ChatModel,
                           maxChunks: Int = 20): DataFrame = {
    val spark = assignments.sparkSession
    import spark.implicits._
    val joined = assignments
      .join(corpus.select(col(idCol).as("chunkId"), col(textCol).as("__text")),
        Seq("chunkId"))
    val counts = joined.groupBy("clusterId")
      .agg(count(lit(1)).as("chunkCount"))
    val w = Window.partitionBy("clusterId").orderBy("chunkId")
    val sampled = joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxChunks)
      .select(col("clusterId").cast("int"), col("rn"), col("__text"))
      .as[(Int, Int, String)]
    val c = chat
    val out = sampled.groupByKey(_._1).mapGroups { (cid, it) =>
      val chunks = it.toSeq.sortBy(_._2).map(_._3)
      val combined = chunks.zipWithIndex
        .map { case (t, i) => s"[Chunk ${i + 1}]\n$t" }
        .mkString("\n\n").take(6000)
      val llm =
        try parseSummary(c.complete(summaryPrompt(combined)))
        catch { case scala.util.control.NonFatal(_) => None }
      llm match {
        case Some(a) =>
          (cid, a.summary, a.keyTopics, a.representativeQuote, "llm")
        case None =>
          (cid, extractiveFallback(chunks), Seq.empty[String],
            None: Option[String], "extractive")
      }
    }.toDF("clusterId", "summary", "keyTopics", "representativeQuote", "tier")
    out.join(counts, Seq("clusterId"))
  }

  /** Extractive cluster summaries (reference M5 fallback,
    * ClusterSummarizer.ts:150-196): first sentence of up to `take`
    * lowest-id members, "This cluster covers: ..." prefix. */
  def extractiveSummaries(assignments: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          take: Int = 3): DataFrame = {
    val w = Window.partitionBy("clusterId").orderBy("chunkId")
    assignments
      .join(corpus.select(col(idCol).as("chunkId"), col(textCol).as("__text")),
        Seq("chunkId"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= take)
      .withColumn("first_sentence",
        trim(split(col("__text"), "[.!?]").getItem(0)))
      .groupBy("clusterId")
      .agg(
        concat(lit("This cluster covers: "),
          concat_ws(" ", collect_list(col("first_sentence")))).as("summary"),
        count(lit(1)).as("sampled"))
  }
}

/** IVF (inverted-file) approximate nearest neighbor index — the scale
  * path replacing the reference's DiskANN `vector_top_k` probe (K2).
  *
  * Build: k-means over the corpus -> coarse centroids; every vector is
  * assigned to its nearest centroid (one int column). At 100 TB the
  * assignment table is *partitioned by centroid id*, so a probe scans
  * only nProbe/k of the data — partition pruning does the work, no
  * bespoke index structure.
  *
  * Query: rank centroids against the query vector (driver-side — k is
  * small), take the nProbe nearest, filter the corpus to those cells
  * (partition-pruned scan), exact cosine top-k inside. `nProbe = k`
  * degenerates to the exact brute-force scan (test mode).
  */
class IvfIndex(val model: KMeansModel, val assigned: DataFrame,
               val vecCol: String, val idCol: String) {

  def centroidIdsFor(query: Array[Float], nProbe: Int): Seq[Int] = {
    val q = Vectors.dense(query.map(_.toDouble))
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => i -> Vectors.sqdist(q, c) }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq
  }

  def topK(query: Array[Float], k: Int, nProbe: Int): DataFrame = {
    val cells = centroidIdsFor(query, nProbe)
    VectorSearch.topK(
      assigned.filter(col("__cell").isin(cells: _*)),
      vecCol, query.toSeq, k, tieCol = idCol)
  }

  /** Batched ANN: one job answers the whole query set, each query
    * scanning only its nProbe cells — the probed analog of
    * [[VectorSearch.topKBatch]], which pairs every query with the FULL
    * corpus. Fully distributed: the probe map (qid → cell) is computed
    * in-plan by ranking the broadcast centroid table per query (nq ×
    * nCells pairs — centroids are broadcast-sized by construction, √N
    * at the 100 TB design point), so the query set never collects to
    * the driver. Candidates then form via an equi-join on `__cell`
    * against the broadcast probe map: the corpus × queries cross join
    * never exists, and the candidate set is nq · n · (nProbe/nCells)
    * rows before the per-query top-k window. `nProbe = nCells`
    * degenerates to exact — the oracle mode (q81), same contract as
    * the single-query probe (q51).
    *
    * Over a `__cell`-partitioned warehouse table the probe-map join
    * reaches the scan as a DYNAMIC partition filter (Spark DPP reuses
    * the broadcast), so a batch reads only the union of probed cells'
    * files — the 100 TB I/O bound for the batch path, pinned by the
    * `dynamicpruning` plan assertion in `ClusteringSpec`. No static
    * cell collect is needed; the query set never touches the driver.
    *
    * Ties break like every other ANN surface: score desc, then id asc —
    * and the probe ranking breaks centroid-distance ties on cell id,
    * matching [[graft.plans.IvfRegistry.probeCells]]. */
  def topKBatch(queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int, nProbe: Int): DataFrame = {
    // map-only probe ranking (VERDICT r18 #2): the codegen'd
    // top-nProbe expression replaces crossJoin(broadcast)+window —
    // same (dist asc, cell asc) ordering, zero exchange on the query
    // set before the pruning join below
    val probes = queries
      .select(col(qidCol),
        explode(graft.plans.NearestCells(col(qvecCol),
          model.clusterCenters.map(_.toArray), nProbe)).as("__cell"))
    val w = Window.partitionBy(qidCol).orderBy(desc("cos_sim"), asc(idCol))
    assigned.join(broadcast(probes), Seq("__cell"))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("cos_sim",
        graft.plans.CosineSimilarity(col(vecCol), col(qvecCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qidCol), col("rn"), col(idCol), col("cos_sim"))
  }
}

object IvfIndex {
  /** `cache = false` for write-through builds ([[persist]]): the
    * assignment table is consumed exactly once by the write, and a
    * cached copy would pin executor memory for the session lifetime
    * after the handle is dropped. */
  def build(df: DataFrame, idCol: String, vecCol: String, nCells: Int,
            seed: Long = 42L, maxIter: Int = 100,
            cache: Boolean = true): IvfIndex = {
    val model = ClusteringOps.fit(df, vecCol, nCells, seed, maxIter)
    val assigned0 = model.transform(
      df.withColumn("__features", array_to_vector(col(vecCol).cast("array<double>"))))
      .withColumnRenamed("prediction", "__cell")
      .drop("__features")
    new IvfIndex(model, if (cache) assigned0.cache() else assigned0, vecCol, idCol)
  }

  /** Persist the index as a hive-partitioned table (one directory per
    * cell) and register it with [[graft.plans.IvfRegistry]]: any
    * `ORDER BY cosine_similarity(vec, q) DESC LIMIT k` over the path is
    * then rewritten by [[graft.plans.IvfProbeRule]] into a cell-pruned
    * probe — partition pruning skips (nCells - nProbe)/nCells of the
    * files. */
  def persist(df: DataFrame, idCol: String, vecCol: String, nCells: Int,
              path: String, nProbe: Int, seed: Long = 42L): IvfIndex = {
    val idx = build(df, idCol, vecCol, nCells, seed, cache = false)
    idx.assigned.write.mode("overwrite").partitionBy("__cell").parquet(path)
    graft.plans.IvfRegistry.register(path,
      idx.model.clusterCenters.map(_.toArray), nProbe, idCol, vecCol)
    idx
  }
}
