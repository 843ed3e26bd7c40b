package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{asc, col, desc, lit}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, NumericType, StringType}

/** The SQL surface of the ANN tier (VERDICT r19 #6): the same pruned
  * plans the Scala facade builds, reachable from plain `spark.sql`.
  *
  *   - `nearest_cells(vec, centers [, nProbe])` — the map-only IVF
  *     assignment/probe expression ([[NearestCells]]). `centers` must
  *     be a FOLDABLE `array<array<double>>` (the centroid table is
  *     driver-known and √N-sized by construction — exactly the Scala
  *     API's contract); it is evaluated once at resolution time and
  *     rides into codegen as one referenced flat array, so the SQL
  *     plan has NO Window and NO Exchange, same as the Scala path
  *     (plan-guarded in `GraftSqlExtensionSpec`).
  *   - `assign_cell(vec, centers)` — `element_at(nearest_cells(…,1),1)`
  *     convenience: the assignment cell as an int.
  *   - `ann_topk(path, query, k [, nProbe])` — table-valued IVF probe
  *     over a table persisted by
  *     [[graft.operators.IvfIndex.persist]]: ranks the registered
  *     centroids driver-side, injects the `__cell IN (...)` partition
  *     filter (delta bucket always included, like [[IvfProbeRule]]),
  *     scores cosine and takes the top k — the scan reads only probed
  *     cells' files, sorted through `TakeOrderedAndProject` with no
  *     Window and no per-row shuffle. `nProbe` defaults to the
  *     registered value; `nProbe >= nCells` is the exact full probe
  *     (no filter, provably identical to brute force).
  *
  * Wire-up: `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) for new sessions — this
  * also injects [[IvfProbeRule]], so declarative `ORDER BY
  * cosine_similarity(...) DESC LIMIT k` SQL over a persisted index is
  * rewritten to the pruned probe too. For an ALREADY-built session,
  * [[graft.GraftSession.registerFunctions]] registers the same
  * functions on the live registries.
  */
object GraftSqlFunctions {

  private def intArg(exprs: Seq[Expression], pos: Int, default: Int,
                     fn: String): Int =
    exprs.lift(pos) match {
      case None => default
      case Some(Literal(v: Int, IntegerType)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }

  /** A foldable vector argument as doubles (query points / centroid
    * rows are driver-side literals in SQL, like in the Scala API).
    * Bare SQL numerics like `array(0.1, 0.2)` parse as decimals —
    * cast any numeric element type to double before evaluating. */
  private def foldableDoubles(e: Expression, what: String): Array[Double] = {
    require(e.foldable, s"$what must be a literal (foldable), got $e")
    val casted = e.dataType match {
      case ArrayType(DoubleType, _) => e
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.expressions.Cast(e, ArrayType(DoubleType))
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric array, got ${other.catalogString}")
    }
    val data = casted.eval(null).asInstanceOf[ArrayData]
    require(data != null, s"$what must not be null")
    data.toDoubleArray()
  }

  /** `nearest_cells(vec, centers [, nProbe])`. */
  def nearestCells(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2 || exprs.size == 3,
      s"nearest_cells(vec, centers [, nProbe]) takes 2-3 args, got ${exprs.size}")
    val centersE = exprs(1)
    require(centersE.foldable,
      "nearest_cells: centers must be a literal (foldable) " +
        "array<array<double>> — the centroid table is driver-known")
    val casted = centersE.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => centersE
      case ArrayType(ArrayType(_: NumericType, _), _) =>
        org.apache.spark.sql.catalyst.expressions.Cast(centersE,
          ArrayType(ArrayType(DoubleType)))
      case other => throw new IllegalArgumentException(
        "nearest_cells: centers must be array<array<double>>, got " +
          other.catalogString)
    }
    val data = casted.eval(null).asInstanceOf[ArrayData]
    require(data != null && data.numElements() > 0,
      "nearest_cells: need at least one center")
    val rows = (0 until data.numElements()).map(i =>
      data.getArray(i).toDoubleArray())
    val dim = rows.head.length
    require(rows.forall(_.length == dim),
      "nearest_cells: ragged centroid table")
    val flat = new Array[Double](rows.size * dim)
    rows.zipWithIndex.foreach { case (r, i) =>
      System.arraycopy(r, 0, flat, i * dim, dim) }
    val nProbe = intArg(exprs, 2, 1, "nearest_cells")
    require(nProbe >= 1, s"nearest_cells: nProbe must be >= 1, got $nProbe")
    NearestCells(exprs.head, flat, dim, math.min(nProbe, rows.size))
  }

  /** `assign_cell(vec, centers)` = `nearest_cells(vec, centers, 1)[1]`. */
  def assignCell(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"assign_cell(vec, centers) takes 2 args, got ${exprs.size}")
    org.apache.spark.sql.catalyst.expressions.ElementAt(
      nearestCells(exprs :+ Literal(1)), Literal(1))
  }

  /** `ann_topk(path, query, k [, nProbe])` — table-valued. */
  def annTopk(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3 || exprs.size == 4,
      s"ann_topk(path, query, k [, nProbe]) takes 3-4 args, got ${exprs.size}")
    val path = exprs.head match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"ann_topk: path must be a string literal, got $other")
    }
    val entry = IvfRegistry.lookup(Seq(path)).getOrElse(
      throw new IllegalArgumentException(
        s"ann_topk: '$path' is not a registered IVF index — persist one " +
          "with IvfIndex.persist(...) (or IvfRegistry.register) first"))
    val query = foldableDoubles(exprs(1), "ann_topk: query")
    require(entry.centers.isEmpty ||
        entry.centers.head.length == query.length,
      s"ann_topk: query dim ${query.length} != index centroid dim " +
        s"${entry.centers.headOption.map(_.length).getOrElse(0)}")
    val k = intArg(exprs, 2, -1, "ann_topk")
    require(k >= 1, s"ann_topk: k must be >= 1, got $k")
    val nProbe = intArg(exprs, 3, entry.nProbe, "ann_topk")
    val spark = SparkSession.active
    var df = spark.read.parquet(path)
    // partial probe: rank centroids driver-side and prune the scan to
    // the probed cells' directories (+ the delta bucket, so appended
    // vectors stay visible — the IvfProbeRule contract); a full probe
    // adds no filter and is exact
    if (nProbe < entry.centers.length) {
      val cells = IvfRegistry.probeCells(entry.centers, query, nProbe)
      df = df.filter(col("__cell")
        .isin((cells :+ IvfRegistry.DeltaCell).map(Int.box): _*))
    }
    df.withColumn("cos_sim", CosineSimilarity(
        col(entry.vecCol).cast(ArrayType(FloatType)),
        lit(query.map(_.toFloat))))
      .orderBy(desc("cos_sim"), asc(entry.idCol))
      .limit(k)
      .queryExecution.logical
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.plans.GraftSqlFunctions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  val scalarFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b)"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2,
          s"cosine_similarity takes 2 args, got ${exprs.size}")
        CosineSimilarity(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("nearest_cells"),
      info("nearest_cells", "nearest_cells(vec, centers [, nProbe])"),
      nearestCells _),
    (FunctionIdentifier("assign_cell"),
      info("assign_cell", "assign_cell(vec, centers)"),
      assignCell _))

  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("ann_topk"),
      info("ann_topk", "ann_topk(path, query, k [, nProbe])"),
      annTopk _))

  /** Register on a LIVE session's registries (for sessions built
    * without the extension — the [[graft.GraftSession]] path). */
  def registerOn(spark: SparkSession): Unit = {
    scalarFunctions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf") }
    tableFunctions.foreach { case (id, _, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf") }
  }
}

/** Full SQL surface: the IVF probe optimizer rule + the ANN scalar and
  * table functions. `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => IvfProbeRule())
    GraftSqlFunctions.scalarFunctions.foreach(e.injectFunction)
    GraftSqlFunctions.tableFunctions.foreach(e.injectTableFunction)
  }
}
