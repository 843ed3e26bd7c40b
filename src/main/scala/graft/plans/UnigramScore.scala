package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Batch unigram-LM scoring as ONE map-only expression (round 20, guide
  * §2.4): `struct(n_tokens, avg_logp)` of an already-lowercased text
  * against a collected top-V vocabulary —
  * avg over tokens of log10((c(tok)+1) / (total+1)).
  *
  * Replaces [[graft.operators.TextAnalysis.unigramQuality]]'s scoring
  * half (explode_outer → broadcast join → groupBy(id)): the vocabulary
  * was already a driver-side bounded table (top-V via TakeOrdered) — it
  * now rides into the expression as one referenced map instead of a
  * broadcast join build side, and the per-doc aggregation disappears
  * entirely.
  *
  * Value contract vs the column formulation: the per-token logp is the
  * same IEEE ops (long→double widen, +1.0, divide by the (total+1.0)
  * literal, Math.log10 — Spark's Log10 IS Math.log10); the sum runs in
  * TEXT ORDER, which is exactly the order the previous plan's partial
  * aggregate consumed (a doc's exploded tokens are contiguous in one
  * scan partition and broadcast joins preserve stream order); avg is
  * one final sum/count division, Average's own shape. Empty text scores
  * (0, 0.0); NULL text yields NULL and the caller coalesces to the
  * explode_outer zeros. Tokenization is the byte-level single-space
  * scan ([[HashedGrams]]' contract). Pinned against the legacy column
  * path in HashedGramExpressionsSpec.
  *
  * NOT the streaming [[UnigramLogProb]] (which tokenizes on `\\s+` for
  * the gate contract and is certified separately) — this one matches
  * the batch `split(text, " ")` tokenization bit-for-bit. */
case class UnigramScore(child: Expression, vocab: Seq[(String, Long)],
                        totalPlus1: Double)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("avg_logp", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_score needs string, got ${other.catalogString}")
    }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, c) => m.put(UTF8String.fromString(t), c) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramScore.score(input.asInstanceOf[UTF8String], lookup, totalPlus1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("vocab", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.UnigramScore.score($c, $mapRef, $totalPlus1);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramScore =
    copy(child = newChild)
}

object UnigramScore {

  private val SPACE = 0x20.toByte

  /** Text-order fold of log10((c+1)/(total+1)) over single-space tokens. */
  def score(u: UTF8String, vocab: java.util.HashMap[UTF8String, java.lang.Long],
            totalPlus1: Double): InternalRow = {
    val bytes = u.getBytes
    val n = bytes.length
    var i = 0
    var nTok = 0L
    var sum = 0.0
    while (i < n) {
      while (i < n && bytes(i) == SPACE) i += 1
      if (i < n) {
        val start = i
        while (i < n && bytes(i) != SPACE) i += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val c = vocab.get(tok)
        val cd = if (c == null) 0.0 else c.longValue().toDouble
        sum += java.lang.Math.log10((cd + 1.0) / totalPlus1)
        nTok += 1L
      }
    }
    InternalRow(nTok, if (nTok == 0L) 0.0 else sum / nTok.toDouble)
  }

  def apply(textLower: Column, vocab: Seq[(String, Long)],
            totalPlus1: Double): Column =
    GraftBridge.column(UnigramScore(GraftBridge.expression(textLower),
      vocab, totalPlus1))
}
