package graft.tools

import graft.Tables
import graft.operators.{GraphRank, IvfIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling: substage timings of the knnGraphIvf full-probe build
  * so the exact-vs-ivf gap is measured, not guessed. */
object IvfEdgeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    emb.cache().count()

    def med(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[ivfprof] $label%-40s ${ts(1)}%7.2fs")
    }

    val typed = emb.select(col("vec_id").cast("long").as("id"),
      col("embedding").as("__v"))
    val idx = IvfIndex.build(typed, "id", "__v", 16, 42L, cache = false)
    val centersDf = spark.createDataFrame(
      idx.model.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("__cell", "__center")
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(asc("__cdist"), asc("__cell"))
    val probes = typed
      .crossJoin(broadcast(centersDf))
      .withColumn("__cdist", graft.functions.VectorFunctions.sqDist(
        col("__v").cast("array<double>"), col("__center")))
      .withColumn("__crn", row_number().over(probeW))
      .filter(col("__crn") <= 16)
      .select(col("id").as("src"), col("__v").as("__qv"), col("__cell"))
    val assigned = idx.assigned
      .select(col("id").as("dst"), col("__v").as("__cv"), col("__cell"))
    med("kmeans assign only") { idx.assigned.count() }
    med("IvfIndex.build fit maxIter=100") {
      IvfIndex.build(typed, "id", "__v", 16, 42L, cache = false)
        .assigned.count() }
    med("IvfIndex.build fit maxIter=20") {
      IvfIndex.build(typed, "id", "__v", 16, 42L, maxIter = 20,
        cache = false).assigned.count() }
    med("probes (N x centroids window)") { probes.count() }
    val cand = probes.join(assigned, Seq("__cell"))
      .filter(col("src") =!= col("dst"))
      .withColumn("cos_sim",
        graft.plans.CosineSimilarity(col("__cv"), col("__qv")))
    med("candidate join + cosine (count)") { cand.count() }
    med("join + cosine + 3-col agg probe") {
      cand.select("src", "dst", "cos_sim")
        .groupBy("src").agg(max("cos_sim")).count() }
    val topkCol = org.apache.spark.sql.GraftBridge.column(
      graft.plans.TopKEdges(
        org.apache.spark.sql.GraftBridge.expression(col("dst").cast("long")),
        org.apache.spark.sql.GraftBridge.expression(col("cos_sim").cast("double")),
        8).toAggregateExpression())
    med("join + cosine + TopKEdges agg") {
      cand.select("src", "dst", "cos_sim").groupBy("src")
        .agg(topkCol.as("__top")).count() }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
    med("same, fallbackThreshold=100000") {
      cand.select("src", "dst", "cos_sim").groupBy("src")
        .agg(topkCol.as("__top")).count() }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    med("full knnGraphIvf 16/16") {
      GraphRank.knnGraphIvf(emb, "vec_id", "embedding", 8, 16, 16).count() }
    med("full knnGraphIvf 16/16 nosplit") {
      GraphRank.knnGraphIvf(emb, "vec_id", "embedding", 8, 16, 16,
        maxCellSize = 0).count() }
    med("profile-pipeline + perSrcTopK shape") {
      cand.select("src", "dst", "cos_sim").groupBy("src")
        .agg(topkCol.as("__top"))
        .select(col("src"), explode(col("__top")).as("__e"))
        .select(col("src"), col("__e.dst").as("dst"),
          col("__e.cos_sim").as("cos_sim")).count() }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
    med("same shape, fallbackThreshold=100k") {
      cand.select("src", "dst", "cos_sim").groupBy("src")
        .agg(topkCol.as("__top"))
        .select(col("src"), explode(col("__top")).as("__e"))
        .select(col("src"), col("__e.dst").as("dst"),
          col("__e.cos_sim").as("cos_sim")).count() }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    med("exact knnGraph") {
      GraphRank.knnGraph(emb, "vec_id", "embedding", 8).count() }
    spark.stop()
  }
}
