package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character k-shingles of a string as a single-pass native
  * expression — replaces `array_distinct(transform(sequence(...),
  * substr))`, which allocates an index array, a substring per position,
  * and a dedup pass per row. Order of first appearance; equal *as a set*
  * to the HOF formulation (set consumers only: Jaccard, MinHash).
  * Shorter-than-k input yields the whole text, matching
  * [[graft.functions.TextFunctions.shingles]]. */
case class ShingleSet(child: Expression, shingleK: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // code points, not UTF-16 code units — Spark substr/length and
    // DuckDB count code points; a code-unit window would split
    // surrogate pairs on astral-plane characters
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n < shingleK) {
      new GenericArrayData(Array[Any](UTF8String.fromString(text)))
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val last = n - shingleK
      while (i <= last) {
        seen.add(new String(cps, i, shingleK))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleSet =
    copy(child = c)
}

/** Distinct word n-grams over whitespace tokens (empties dropped) —
  * single-pass replacement for the tokens/transform/slice/concat_ws
  * pipeline in [[graft.functions.TextFunctions.wordNgrams]]; fewer-than-
  * n-token input yields an empty set (no n-gram exists), matching both
  * the HOF fallback and the DuckDB list-comprehension oracle, so short
  * docs never form degenerate jaccard-1.0 pairs. */
case class WordNgramSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split(" ").filter(_.nonEmpty)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordNgramSet =
    copy(child = c)
}

/** [[WordNgramSet]] with the gram IDENTITY hashed away: the distinct
  * word n-grams as xxHash64 longs, for consumers that only count or
  * join grams and never read them back (e.g. the source-overlap
  * matrix). An 8-byte key shuffles ~3× less than the gram string and
  * skips per-gram UTF8String allocation; a collision merges two grams
  * (probability ~#distinct-grams²/2⁶⁵ — negligible at any corpus
  * size, and certifying oracles compare aggregate counts, not gram
  * ids). */
case class WordNgramHashSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split(" ").filter(_.nonEmpty)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(XxHash64Function.hash(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          BinaryType, 42L))
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordNgramHashSet =
    copy(child = c)
}

/** Jaccard similarity of two string arrays (treated as sets) in one
  * hash-set pass — |∩| / (|A| + |B| - |∩|), the same value as
  * `size(array_intersect) / size(array_union)` on distinct arrays,
  * without building either intermediate array. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i)); i += 1 }
    val sizeA = set.size
    var inter = 0
    val seenB = new java.util.HashSet[UTF8String](y.numElements() * 2)
    var j = 0
    while (j < y.numElements()) {
      val e = y.getUTF8String(j)
      if (seenB.add(e) && set.contains(e)) inter += 1
      j += 1
    }
    val sizeB = seenB.size
    val union = sizeA + sizeB - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** SimHash over the distinct whitespace-token set in one pass: per
  * distinct token, one md5-derived 32-bit hash votes ±1 on each bit
  * position; the sign of each bit's vote total forms the hash. Replaces
  * the 16-aggregate HOF formulation in
  * [[graft.functions.TextFunctions.simhash]] value-for-value. */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split(" ").filter(_.nonEmpty)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Long](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
}

object TextSetExpressions {
  def shingleSet(text: Column, k: Int): Column =
    GraftBridge.column(ShingleSet(GraftBridge.expression(text), k))
  def wordNgramSet(text: Column, n: Int): Column =
    GraftBridge.column(WordNgramSet(GraftBridge.expression(text), n))
  def wordNgramHashSet(text: Column, n: Int): Column =
    GraftBridge.column(WordNgramHashSet(GraftBridge.expression(text), n))
  def arrayJaccard(a: Column, b: Column): Column =
    GraftBridge.column(ArrayJaccard(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def simhash(text: Column, bits: Int): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(text), bits))
}
