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
      // Tables.table routes events through the nanos-timestamp workaround
      try Tables.table(spark, dir, t).createOrReplaceTempView(t)
      catch {
        case e: Exception =>
          System.err.println(s"[graft] registerViews: skipping '$t': ${e.getMessage}")
      }
    }

  /** An optional trailing integer argument (e.g. `simhash(text, 16)`)
    * must be honored — silently dropping it would return values the
    * caller's parameters say are impossible to compare against. */
  private def intArg(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                     pos: Int, default: Int, fn: String): Int =
    exprs.lift(pos) match {
      case None => default
      case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }

  def registerFunctions(spark: SparkSession): Unit = {
    // cosine_similarity + nearest_cells/assign_cell + the ann_topk
    // table function — the same surface graft.plans.GraftExtensions
    // injects at session build (VERDICT r19 #6)
    graft.plans.GraftSqlFunctions.registerOn(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => graft.plans.MinHashSignature(exprs.head,
        intArg(exprs, 1, 5, "minhash_signature"),
        intArg(exprs, 2, 8, "minhash_signature")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_set",
      exprs => graft.plans.ShingleSet(exprs.head,
        intArg(exprs, 1, 5, "shingle_set")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_jaccard",
      exprs => graft.plans.ArrayJaccard(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash",
      exprs => graft.plans.SimHash(exprs.head,
        intArg(exprs, 1, 32, "simhash")), "scala_udf")
  }

  def setup(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    registerFunctions(spark)
  }
}
