package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-random-projection (hyperplane) LSH signature for cosine
  * similarity, as a single-pass native expression: bit j of the result
  * is 1 iff the dot product of the embedding with the j-th Rademacher
  * hyperplane is positive. Two vectors agree on a bit with probability
  * 1 - θ/π (θ = angle between them), so bucket collisions concentrate
  * on high-cosine pairs — the standard SRP-LSH scheme (Charikar 2002),
  * the cosine analog of the MinHash tier in [[MinHashSignature]].
  *
  * The hyperplanes are ±1 (Rademacher) entries derived from md5 —
  * sign(j,d) = +1 iff first4bytes(md5("j|d")) is even — so the whole
  * signature is reproducible cross-engine from the portable-hash rule
  * the dedup tier already uses, and the DuckDB oracle can rebuild the
  * exact sign matrix in SQL. Projections accumulate as a sequential
  * double left-fold over sign×value products — bit-compatible with
  * DuckDB's `list_dot_product` against a ±1.0 DOUBLE[] list (same
  * ordering, and x*±1.0 is exact), so the sign never diverges between
  * engines.
  *
  * The sign matrix is computed once per expression instance (driver)
  * and ships inside the serialized plan: bits×dim doubles — 16 KiB at
  * 32×64, trivially under broadcast scale even at 1024 dims.
  *
  * CodegenFallback for the same reason as [[MinHashSignature]]: the
  * per-row cost is the bits×dim loop itself; one virtual call per row
  * around a tight primitive loop is noise.
  */
case class HyperplaneSignature(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 63, "signature must fit a signed long")

  override def dataType: DataType = LongType

  // mismatched dimensionality yields NULL, like CosineSimilarity: a
  // truncated projection would silently bucket corrupt rows
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature needs array<float>, got ${other.catalogString}")
    }

  /** signs(j)(d) = +1.0 / -1.0 from the portable md5 rule. */
  @transient private lazy val signs: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (j, d) =>
      md.reset()
      val digest = md.digest(
        s"$j|$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      if (h % 2 == 0) 1.0 else -1.0
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    var sig = 0L
    var j = 0
    while (j < bits) {
      val row = signs(j)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += row(d) * arr.getFloat(d).toDouble; d += 1 }
      if (acc > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignature =
    copy(child = c)
}

object HyperplaneSignature {
  def apply(vec: Column, bits: Int, dim: Int): Column =
    GraftBridge.column(HyperplaneSignature(
      GraftBridge.expression(vec), bits, dim))
}
