package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM token count under a trained piece table
  * ([[graft.operators.UnigramLm]]) as a single-pass native expression:
  * whitespace-split the (already-lowercased) text and sum each word's
  * integer-Viterbi token count. The piece table is constructor state
  * (task-local, broadcast-free map-only at any scale); CodegenFallback
  * for the MinHashSignature reason — the per-row DP dominates. */
case class UnigramTokenCount(child: Expression,
                             pieces: Seq[(String, Long)],
                             maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val costs = {
    val m = new java.util.HashMap[String, Long]()
    pieces.foreach { case (p, c) => m.put(p, c) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var total = 0L
    for (word <- text.split("\\s+") if word.nonEmpty)
      total += graft.operators.UnigramLm.viterbi(word, costs, maxPieceLen)._2
    total
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
}
