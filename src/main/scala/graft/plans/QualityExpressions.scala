package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Laplace-smoothed unigram mean-log10-probability of a (lowercased)
  * text against a FIXED top-V vocabulary, as one map-only expression:
  * struct(n_tokens, avg_logp). The vocabulary is constructor state
  * (bounded by the model's vocabSize — task-local like LangId's
  * profiles), so the expression is STATELESS under Structured
  * Streaming: no explode, no join, no aggregation — which is exactly
  * what lets [[graft.streaming.StreamingQualityGate]] gate an append-
  * mode stream with zero watermark/state tuning. Token order of the
  * per-row fold is the text's own order — deterministic, and identical
  * between the batch and streaming forms by construction. */
case class UnigramLogProb(child: Expression,
                          vocab: Seq[(String, Long)],
                          total: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("avg_logp", DoubleType, nullable = false)))

  @transient private lazy val counts = {
    val m = new java.util.HashMap[String, Long]()
    vocab.foreach { case (t, c) => m.put(t, c) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var n = 0L
    var sum = 0.0
    for (tok <- text.split("\\s+") if tok.nonEmpty) {
      val c = counts.getOrDefault(tok, 0L)
      sum += math.log10((c.toDouble + 1.0) / (total + 1.0))
      n += 1
    }
    InternalRow(n, if (n == 0) 0.0 else sum / n)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramLogProb =
    copy(child = newChild)
}
