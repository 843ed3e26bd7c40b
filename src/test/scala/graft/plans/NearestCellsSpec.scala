package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The map-only assignment/probe expression must be BIT-IDENTICAL to
  * the crossJoin(broadcast centers) + window formulation it replaced
  * (VERDICT r18 #2) — including the (dist asc, cell asc) tie-break on
  * duplicated centers — and its plan must carry NO Window and NO
  * Exchange: the whole point is removing the N·nCells vector-carrying
  * shuffle from every IVF build path. */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-19 formulation, verbatim: the reference the
    * expression must match rank-for-rank. */
  private def windowRanked(typed: DataFrame, centers: Array[Array[Double]],
                           nProbe: Int): DataFrame = {
    val centersDf = spark.createDataFrame(
      centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
      .toDF("__cell", "__center")
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(asc("__cdist"), asc("__cell"))
    typed
      .crossJoin(broadcast(centersDf))
      .withColumn("__cdist", VectorFunctions.sqDist(
        col("__v").cast("array<double>"), col("__center")))
      .withColumn("__crn", row_number().over(probeW))
      .filter(col("__crn") <= nProbe)
      .select(col("id"), col("__cell"), col("__crn"))
  }

  private def exprRanked(typed: DataFrame, centers: Array[Array[Double]],
                         nProbe: Int): DataFrame =
    typed.select(col("id"),
      posexplode(NearestCells(col("__v"), centers, nProbe))
        .as(Seq("__pos", "__cell")))
      .select(col("id"), col("__cell"), (col("__pos") + 1).as("__crn"))

  private def asMap(df: DataFrame): Map[(Long, Int), Int] =
    df.collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getInt(1)).toMap

  test("rank-for-rank identical to the window formulation on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").as("__v"))
    val centers = emb.orderBy("id").limit(7).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (nProbe <- Seq(1, 3, 7)) {
      assert(asMap(exprRanked(emb, centers, nProbe))
        === asMap(windowRanked(emb, centers, nProbe)),
        s"nProbe=$nProbe diverged from the window formulation")
    }
  }

  test("tie-break: duplicated centers rank by cell id asc, exactly like the window") {
    // centers 1 and 3 are byte-identical: every vector's distance ties
    // — the window breaks on __cell asc; the expression must too
    val base = Array(
      Array(0.0, 0.0), Array(1.0, 1.0), Array(5.0, 5.0),
      Array(1.0, 1.0), Array(0.0, 0.0))
    val vecs = (0L until 40L).map(i =>
      (i, Array(((i * 13 % 11).toFloat - 5f) / 3f,
        ((i * 7 % 17).toFloat - 8f) / 4f))).toDF("id", "__v")
    for (nProbe <- Seq(1, 2, 5)) {
      assert(asMap(exprRanked(vecs, base, nProbe))
        === asMap(windowRanked(vecs, base, nProbe)))
    }
  }

  test("large-probe sort branch agrees with the selection branch ordering") {
    // > 64 probes routes through the comparator sort — same ordering
    val centers = (0 until 80).map(i =>
      Array((i % 9).toDouble / 3.0, (i % 7).toDouble / 2.0)).toArray
    val vecs = (0L until 25L).map(i =>
      (i, Array((i % 5).toFloat, (i % 3).toFloat))).toDF("id", "__v")
    assert(asMap(exprRanked(vecs, centers, 80))
      === asMap(windowRanked(vecs, centers, 80)))
  }

  test("dim mismatch yields NULL (no silent prefix assignment); interpreted eval matches") {
    val centers = Array(Array(0.0, 0.0, 0.0))
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f)))
      .toDF("id", "__v")
    val out = df.select(col("id"),
      NearestCells(col("__v"), centers, 1).as("cells")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) === true, "mismatched dim must be NULL")
    assert(out(2L) === false)
    // interpreted path (eval) — same kernel, same answer
    val expr = NearestCells(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(Array(0.5f, 0.5f, 0.5f)),
      Array(0.0, 0.0, 0.0), 3, 1)
    val r = expr.eval(null)
    assert(r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq === Seq(0))
  }

  test("plan guard: the assignment stage has no Window and no Exchange") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").as("__v"))
    val centers = emb.limit(4).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val assigned = emb.select(col("id"),
      NearestCells.assignCell(col("__v"), centers).as("__cell"))
    val plan = assigned.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), s"assignment plan shuffles:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment plan shuffles:\n$plan")
    // whole-stage codegen spans print as `*(n)` in the plan string
    assert(plan.contains("*("),
      s"assignment must stay inside codegen:\n$plan")
  }
}
