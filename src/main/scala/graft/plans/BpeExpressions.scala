package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE token count under a trained merge table, as a single-pass
  * native expression: whitespace-split the (already-lowercased) text,
  * segment each word by applying the merges in rank order — each one
  * left-to-right over the word's symbols, the classic
  * sequential-equals-priority application (see
  * [[graft.operators.BpeTraining]]) — and return the total symbol
  * count.
  *
  * The merge table is constructor state (a few hundred string pairs):
  * task-local, never shuffled — map-only at any scale, like
  * [[LangTrigramScores]]. CodegenFallback for the same reason as
  * MinHashSignature: the per-row loop dominates; codegen would save
  * one virtual call per ROW.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  /** subword-nmt's bpe_ranks dict, built once per task — the heap apply
    * ([[graft.operators.BpeTraining.applyMergesFast]]) makes per-word
    * cost independent of table size (a 32k-merge vocab under the old
    * rank-order sweep paid O(table × len) per word). */
  @transient private lazy val ranks =
    graft.operators.BpeTraining.rankMap(merges)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var total = 0L
    for (word <- text.split("\\s+") if word.nonEmpty)
      total += graft.operators.BpeTraining.applyMergesFast(word, ranks).length
    total
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
