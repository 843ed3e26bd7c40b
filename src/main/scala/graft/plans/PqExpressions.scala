package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Product-quantization expressions. The codebook/lookup table ride
  * inside the serialized expression (m×k×sub floats — 128 KiB at
  * 16×256×64, far under task-closure scale), so encode and ADC scoring
  * are pure map-side work with no join against a codebook table.
  *
  * CodegenFallback as with [[MinHashSignature]]: the per-row cost is the
  * argmin / lookup loop itself; one virtual call per row around a tight
  * primitive loop is noise.
  */

/** Encode a float vector as m subspace code indices: code j is the
  * argmin-L2 centroid of codebook(j) for the j-th vector slice. Ties
  * break to the LOWEST centroid index (deterministic cross-run).
  * NULL on dimension mismatch — a truncated encode would silently
  * corrupt the index. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {

  private val m = codebook.length
  private val sub = codebook(0)(0).length
  // codes are stored as shorts; a codebook trained with k > 32767 would
  // silently wrap indices and corrupt every encoded vector
  require(codebook.forall(_.length <= Short.MaxValue),
    s"PQ codebook k must be <= ${Short.MaxValue} to fit short codes")

  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // doubles are the RESIDUAL path: r = x − coarse_centroid is
      // computed in double so the SQL oracle (DOUBLE[] arithmetic)
      // replays it bit-for-bit
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<float> or array<double>, got ${other.catalogString}")
    }

  private lazy val isDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != m * sub) return null
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cents = codebook(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = if (isDouble) arr.getDouble(j * sub + i)
                  else arr.getFloat(j * sub + i).toDouble
          val diff = x - cent(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toShort
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Asymmetric-distance (ADC) scoring: sum over subspaces of the
  * precomputed query-to-centroid squared distance for each stored code —
  * `table(j)(code_j)`. The table is query-specific (built on the driver,
  * m×k doubles) and the scan reads ONLY the codes column: at 1024-dim
  * float32 vs m=16 codes that is a 256× smaller read+score footprint.
  * NULL on code-arity mismatch. */
case class PqAdc(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  private val m = table.length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ShortType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc needs array<short> codes, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    var d = 0.0
    var j = 0
    while (j < m) {
      d += table(j)(codes.getShort(j).toInt)
      j += 1
    }
    d
  }

  override protected def withNewChildInternal(c: Expression): PqAdc =
    copy(child = c)
}

/** ADC scoring against a PER-CELL lookup table — the IVF-PQ probe form,
  * where codes quantize the RESIDUAL (vector − coarse centroid) and the
  * query's table therefore differs per probed cell. `tables` holds one
  * m×k table per probed cell (nProbe × m × k doubles — driver-built,
  * closure-shipped). NULL for unprobed cells or code-arity mismatch. */
case class PqAdcByCell(left: Expression, right: Expression,
                       tables: Map[Int, Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {

  private val m = tables.valuesIterator.next().length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(ShortType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_by_cell needs (int cell, array<short> codes), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(cell: Any, codesAny: Any): Any = {
    tables.get(cell.asInstanceOf[Int]) match {
      case None => null
      case Some(table) =>
        val codes = codesAny.asInstanceOf[ArrayData]
        if (codes.numElements() != m) return null
        var d = 0.0
        var j = 0
        while (j < m) {
          d += table(j)(codes.getShort(j).toInt)
          j += 1
        }
        d
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcByCell =
    copy(left = l, right = r)
}

object PqExpressions {
  def pqEncode(vec: Column, codebook: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebook))
  def pqAdc(codes: Column, table: Array[Array[Double]]): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(codes), table))
  def pqAdcByCell(cell: Column, codes: Column,
                  tables: Map[Int, Array[Array[Double]]]): Column =
    GraftBridge.column(PqAdcByCell(GraftBridge.expression(cell),
      GraftBridge.expression(codes), tables))
}
