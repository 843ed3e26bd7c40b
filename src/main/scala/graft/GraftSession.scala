package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface setup: register the testdata tables as temp views and
  * the engine's native functions, so the whole operator surface is
  * reachable from plain `spark.sql(...)` — e.g.
  *
  *   SELECT vec_id FROM embeddings
  *   ORDER BY cosine_similarity(embedding, (SELECT embedding FROM
  *     embeddings WHERE vec_id = 0)) DESC LIMIT 10
  */
object GraftSession {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { t =>
      // events must go through Tables.events (nanos timestamp handling);
      // a raw read of it throws during schema inference.
      try {
        val df = if (t == "events") Tables.events(spark, dir)
                 else Tables.table(spark, dir, t)
        df.createOrReplaceTempView(t)
      } catch {
        case e: Exception =>
          System.err.println(s"[graft] registerViews: skipping '$t': ${e.getMessage}")
      }
    }

  def registerFunctions(spark: SparkSession): Unit = {
    graft.plans.CosineSimilarity.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => graft.plans.MinHashSignature(exprs.head, 5, 8), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_set",
      exprs => graft.plans.ShingleSet(exprs.head, 5), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_jaccard",
      exprs => graft.plans.ArrayJaccard(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash",
      exprs => graft.plans.SimHash(exprs.head, 32), "scala_udf")
  }

  def setup(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    registerFunctions(spark)
  }
}
