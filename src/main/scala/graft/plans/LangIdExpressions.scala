package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Trigram Naive-Bayes language scores as a single-pass native
  * expression.
  *
  * Input: the NORMALIZED text (lowercased, non-letter runs collapsed to
  * single spaces — `LangId.normalizeJvm` semantics, produced by the
  * caller so the normalization stays visible in the plan and identical
  * to the oracle's). Output: one scaled-log-prob long per language in
  * `LangId.TrigramLangs` order, where
  *
  *   score_l = Σ_i  w_l(trigram_i)    (w = profile weight, or
  *                                      `LangId.Penalty` when absent)
  *
  * Equivalent to exploding trigrams and joining a profile table, but
  * with ONE hash probe per trigram (the combined profile maps trigram →
  * weight vector) and zero shuffle — the profile is a few KB of
  * task-local state, so at 100 TB this stays a map-only stage fused
  * into the scan.
  *
  * CodegenFallback is fine here (same argument as MinHashSignature):
  * the per-row cost is the trigram loop itself, already a tight JVM
  * loop; splitting whole-stage codegen costs one virtual call per ROW.
  *
  * Trigrams are taken over Unicode CODE POINTS, matching Spark's and
  * DuckDB's character semantics for `substring`/`length`.
  */
case class LangTrigramScores(child: Expression, script: String = "latin")
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val profile =
    graft.operators.LangId.CombinedProfiles(script)
  @transient private lazy val nLangs =
    graft.operators.LangId.ScriptLangs(script).size
  private val penalty = graft.operators.LangId.Penalty

  override def nullSafeEval(input: Any): Any = {
    val norm = input.asInstanceOf[UTF8String].toString
    val scores = new Array[Long](nLangs)
    val cps = norm.codePoints().toArray
    val n = cps.length
    var i = 0
    while (i <= n - 3) {
      val w = profile.get(new String(cps, i, 3))
      if (w == null) {
        var j = 0
        while (j < nLangs) { scores(j) += penalty; j += 1 }
      } else {
        var j = 0
        while (j < nLangs) { scores(j) += w(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(scores)
  }

  override protected def withNewChildInternal(newChild: Expression): LangTrigramScores =
    copy(child = newChild)
}
