package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Map-only IVF cell assignment / probe ranking as a native Catalyst
  * expression (VERDICT r18 #2).
  *
  * `nearest_cells(vec)` returns the `nProbe` nearest centroid ids to
  * `vec` by squared Euclidean distance, ties to the lower cell id —
  * exactly the ordering of the crossJoin(broadcast centers) +
  * `row_number() over (partition by id order by __cdist asc, __cell
  * asc)` formulation every IVF build path used before round 19, but
  * with ZERO shuffle: the centers ride into codegen as a referenced
  * flat array and each row is assigned where it sits. At 10⁹ rows ×
  * 10⁴ cells the window formulation exchanges N·nCells vector-carrying
  * rows just to pick rn ≤ nProbe; this expression removes that
  * exchange from every build path ([[graft.operators.ShardedHnsw]]
  * assignment + probe ranking, [[graft.operators.GraphRank]] IVF edge
  * builds, [[graft.operators.IvfIndex.topKBatch]] probe ranking).
  *
  * Bit-identity with the window formulation: the distance is the same
  * sequential index-order fold of `(x.toDouble − c(d))²` as
  * [[graft.functions.VectorFunctions.sqDist]] over the
  * `array<double>`-cast column (IEEE negation is exact, so the operand
  * order inside the square cannot change bits), and the (dist asc,
  * cell asc) tie-break matches the window's sort — property-pinned in
  * `NearestCellsSpec`, duplicate centers included. The driver-side
  * twins ([[graft.operators.ShardedHnsw]]'s `cellOf`,
  * [[IvfRegistry.nearestCell]]) fold in the same order.
  *
  * Output: `array<int>` of length `min(nProbe, nCells)` in probe-rank
  * order (element 1 = the assignment cell). A vector whose length
  * differs from the centroid dim yields NULL — a silent prefix
  * distance would file vectors in wrong cells forever (same guard as
  * [[IvfRegistry.probeCells]]).
  */
case class NearestCells(child: Expression, centersFlat: Array[Double],
                        dim: Int, nProbe: Int)
    extends UnaryExpression {

  require(dim > 0 && centersFlat.length % dim == 0,
    s"centersFlat length ${centersFlat.length} not a multiple of dim $dim")
  require(nProbe >= 1, s"need nProbe >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // null only for a dim-mismatched vector (and null input)
  override def nullable: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs array<float> or array<double>, got " +
            other.catalogString)
    }

  override def nullSafeEval(input: Any): Any =
    NearestCells.select(input.asInstanceOf[ArrayData], isFloat,
      centersFlat, dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the centers travel as ONE referenced object shared by every row
    // of the generated code — no literal blow-up, no broadcast join
    val flatRef = ctx.addReferenceObj("centersFlat", centersFlat, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.NearestCells.select(
        $c, $isFloat, $flatRef, $dim, $nProbe);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  // value equality over the centroid array (ADVICE r19): the generated
  // case-class equals compares Array[Double] by REFERENCE, so two
  // semantically identical instances would never be equal —
  // canonicalization / common-subexpression elimination could not
  // dedupe them, and each would serialize its own centroid copy into
  // the plan. Content equality restores both.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCells =>
      dim == o.dim && nProbe == o.nProbe && child == o.child &&
        java.util.Arrays.equals(centersFlat, o.centersFlat)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim),
      Integer.valueOf(nProbe),
      Integer.valueOf(java.util.Arrays.hashCode(centersFlat)))

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  /** Column API: `nProbe` nearest cells of `vec` among `centers`. */
  def apply(vec: Column, centers: Array[Array[Double]], nProbe: Int): Column = {
    require(centers.nonEmpty, "need at least one center")
    val dim = centers.head.length
    require(centers.forall(_.length == dim), "ragged centroid table")
    val flat = new Array[Double](centers.length * dim)
    var i = 0
    while (i < centers.length) {
      System.arraycopy(centers(i), 0, flat, i * dim, dim); i += 1
    }
    GraftBridge.column(NearestCells(GraftBridge.expression(vec), flat,
      dim, math.min(nProbe, centers.length)))
  }

  /** The single-assignment convenience: nearest cell id as an int. */
  def assignCell(vec: Column, centers: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(apply(vec, centers, 1), 1)

  /** The per-row kernel, shared by eval and the generated code (the
    * call keeps whole-stage codegen alive; the selection itself is a
    * primitive JVM loop). Returns null on a dim mismatch. */
  def select(vec: ArrayData, isFloat: Boolean, flat: Array[Double],
             dim: Int, nProbe: Int): ArrayData = {
    if (vec.numElements() != dim) return null
    val nCells = flat.length / dim
    // distances in the SAME index-order fold as the sqDist column (and
    // the driver-side cellOf twins) — bit-identical ranking keys
    val dists = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      val off = c * dim
      var d = 0
      while (d < dim) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        val t = x - flat(off + d)
        s += t * t
        d += 1
      }
      dists(c) = s
      c += 1
    }
    val take = math.min(nProbe, nCells)
    val out = new Array[Int](take)
    if (take > 64) {
      // large-probe regime (full-coverage certification): one sort
      // beats O(nCells·nProbe) selection; ordering is identical
      val idx = Array.range(0, nCells).map(Integer.valueOf)
      java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
        override def compare(a: Integer, b: Integer): Int = {
          val byDist = java.lang.Double.compare(dists(a), dists(b))
          if (byDist != 0) byDist else Integer.compare(a, b)
        }
      })
      var i = 0
      while (i < take) { out(i) = idx(i); i += 1 }
    } else {
      // selection passes: Double.compare strict < keeps the lower cell
      // id on ties — the window's (dist asc, cell asc) tie-break — and
      // orders NaN last exactly like Spark's double sort
      val used = new Array[Boolean](nCells)
      var r = 0
      while (r < take) {
        var best = -1
        var bestD = 0.0
        var j = 0
        while (j < nCells) {
          if (!used(j) && (best == -1 ||
              java.lang.Double.compare(dists(j), bestD) < 0)) {
            bestD = dists(j); best = j
          }
          j += 1
        }
        out(r) = best
        used(best) = true
        r += 1
      }
    }
    new GenericArrayData(out)
  }
}
