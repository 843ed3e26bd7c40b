package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Line-level exact dedup scoring as ONE map-only expression (round 20,
  * guide §2.4): given the corpus's hot-line set (lines in ≥ minDocs
  * docs — ALREADY a broadcast-bounded table in
  * [[graft.operators.TextAnalysis.lineDedup]]), compute per document
  * `struct(cleaned_text, n_lines, n_removed, removed_frac)` in one pass
  * over the text. Replaces the posexplode → broadcast join →
  * ObjectHashAggregate(collect_list + array_sort) pipeline whose value
  * only ever depends on one row's text plus the fixed hot set.
  *
  * Value contract vs the column formulation (pinned in
  * CurationOpsSpec's lineDedup battery — the legacy column path is
  * replayed there against this kernel): lines are `split(text, "\n")`
  * segments in order
  * (trailing empties kept — split's -1 limit); the hot lookup key is
  * `trim(lower(line))` — Spark's Lower IS UTF8String.toLowerCase and
  * Spark's trim strips 0x20 only, both reproduced here via the same
  * UTF8String calls; kept lines re-join with "\n" in document order
  * (the old array_sort on (pos, line) structs was exactly pos order —
  * pos is unique); n_lines counts ALL segments; removed_frac is the
  * same single division. NULL text propagates NULL and the caller
  * filters those rows out — matching posexplode's drop of NULL rows. */
case class LineDedupScore(child: Expression, hot: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned_text", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("removed_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"line_dedup_score needs string, got ${other.catalogString}")
    }

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](hot.size * 2)
    hot.foreach(l => s.add(UTF8String.fromString(l)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    LineDedupScore.score(input.asInstanceOf[UTF8String], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("hot", lookup, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.LineDedupScore.score($c, $setRef);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LineDedupScore =
    copy(child = newChild)
}

object LineDedupScore {

  private val NL = UTF8String.fromString("\n")

  def score(text: UTF8String,
            hot: java.util.HashSet[UTF8String]): InternalRow = {
    // split(text, "\n") with limit -1: all segments, trailing empties kept
    val lines = text.split(NL, -1)
    var nLines = 0L
    var nRemoved = 0L
    val kept = new java.util.ArrayList[UTF8String](lines.length)
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      nLines += 1L
      // trim(lower(line)): same UTF8String ops as Spark's Lower/StringTrim
      val key = line.toLowerCase.trim()
      if (hot.contains(key)) nRemoved += 1L
      else kept.add(line)
      i += 1
    }
    val cleaned = UTF8String.concatWs(NL,
      kept.toArray(new Array[UTF8String](kept.size())): _*)
    InternalRow(cleaned, nLines, nRemoved,
      nRemoved.toDouble / math.max(nLines, 1L).toDouble)
  }

  def apply(text: Column, hot: Seq[String]): Column =
    GraftBridge.column(LineDedupScore(GraftBridge.expression(text), hot))
}
