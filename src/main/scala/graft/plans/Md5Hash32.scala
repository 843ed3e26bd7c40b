package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 32-bit hash as ONE native expression (round 20,
  * guide order-of-operations §1.2 step 2 — per-task work):
  * `conv(substring(md5(s), 1, 8), 16, 10)` computes a 16-byte digest,
  * hex-encodes it into a fresh 32-char UTF8String, substrings the first
  * 8 chars (second allocation), and string-parses them base-16 — three
  * allocations and a radix parse per call to recover 4 bytes the digest
  * already held. This expression digests the UTF-8 bytes and returns the
  * first 4 bytes as an unsigned 32-bit value in a long directly.
  *
  * Bit-identity: md5 hex is the lowercase hex of the digest bytes in
  * order, so its first 8 hex chars ARE the first 4 digest bytes;
  * conv(hex, 16, 10) of 8 hex chars is exactly
  * `((d0&255)<<24 | (d1&255)<<16 | (d2&255)<<8 | (d3&255))` as an
  * unsigned value. NULL in → NULL out, matching the builtin chain
  * (md5/substring/conv are all null-propagating). Pinned value-for-value
  * against the builtin chain in HashedGramExpressionsSpec (its
  * Md5Hash32 battery), and every oracle replays
  * the same 8-hex-char parse — the SQL contract is untouched.
  *
  * Used by [[graft.functions.TextFunctions.portableHash32]], i.e. every
  * MinHash band, fingerprint bucket, Efraimidis key, sampling bucket and
  * train-order rank in the engine. The digest instance is thread-local
  * scratch (one per executor thread, reused across rows). */
case class Md5Hash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hash32 needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

object Md5Hash32 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the string's UTF-8 bytes, unsigned, in a long. */
  def hash(u: UTF8String): Long = {
    val m = md.get()
    m.reset()
    val bytes = u.getBytes
    m.update(bytes, 0, bytes.length)
    val d = m.digest()
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  def apply(c: Column): Column =
    GraftBridge.column(Md5Hash32(GraftBridge.expression(c)))
}
