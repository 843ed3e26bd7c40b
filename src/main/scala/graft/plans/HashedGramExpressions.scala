package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the hashed unigram+bigram feature stream shared by
  * the DSIR and LR-quality tiers (round 20, guide §2.3/§2.4: the scoring
  * half of both operators was explode → md5-as-hex-string → two keyed
  * shuffles → join-back, all to compute a value that only ever depends on
  * ONE row's text).
  *
  * Bit-identity contract (what lets these replace the column formulation
  * under the frozen oracle):
  *
  *  - Tokenization is `filter(split(text, " "), t => length(t) > 0)` —
  *    maximal runs of non-0x20 bytes. 0x20 never occurs inside a UTF-8
  *    multibyte sequence, so the byte-level scan splits exactly where the
  *    string form does.
  *  - The gram stream is tokens ++ adjacent-pair bigrams ("prev cur"),
  *    with multiplicity — [[graft.functions.TextFunctions.bigramPairs]].
  *  - The bucket is [[graft.functions.TextFunctions.portableHash32]]
  *    `% buckets`: the first 4 md5 bytes of the gram's UTF-8 bytes as an
  *    unsigned 32-bit value (conv(substring(md5(g),1,8),16,10) parses
  *    exactly those bytes; the hash is non-negative so `%` == mod).
  *  - The dot fold runs in ASCENDING BUCKET order over the buckets the
  *    document actually touched, `acc + count·w(b)` — the same IEEE op
  *    sequence as the certified
  *    `aggregate(array_sort(collect_list(struct(b, n·w))), 0.0, acc+c)`
  *    (zero-count buckets never enter either fold).
  *
  * Everything is per-row local state: thread-local scratch (md5 digest,
  * bucket counts) reused across rows, no UTF8String → String decode, no
  * hex-string round-trip, and whole-stage codegen stays alive (the
  * generated code calls one static kernel per row, the NearestCells
  * pattern).
  */
object HashedGrams {

  /** Thread-local scratch: one md5 instance + one counts array (sized to
    * the largest `buckets` seen on this thread) + touched-bucket list. */
  private final class Scratch {
    val md5: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    var counts: Array[Long] = new Array[Long](0)
    var touched: Array[Int] = new Array[Int](64)
    var nTouched: Int = 0
    def ensure(buckets: Int): Unit =
      if (counts.length < buckets) counts = new Array[Long](buckets)
    def touch(b: Int): Unit = {
      if (counts(b) == 0L) {
        if (nTouched == touched.length)
          touched = java.util.Arrays.copyOf(touched, nTouched * 2)
        touched(nTouched) = b
        nTouched += 1
      }
      counts(b) += 1L
    }
    def reset(): Unit = {
      var i = 0
      while (i < nTouched) { counts(touched(i)) = 0L; i += 1 }
      nTouched = 0
    }
  }

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  private val SPACE = 0x20.toByte

  /** Bucket of one gram spanning [off, off+len) of `bytes`, with an
    * optional second segment (the bigram's second token) — the md5 of
    * "prev cur" without materializing the concatenation. */
  private def bucketOf(md: java.security.MessageDigest, bytes: Array[Byte],
                       off: Int, len: Int, off2: Int, len2: Int,
                       buckets: Int): Int = {
    md.reset()
    md.update(bytes, off, len)
    if (len2 >= 0) {
      md.update(SPACE)
      md.update(bytes, off2, len2)
    }
    val d = md.digest()
    val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    (h % buckets).toInt
  }

  /** Tokenize `text` (bytes of the ALREADY-lowercased UTF-8 string) and
    * accumulate unigram+bigram bucket counts into the scratch. Returns
    * the total gram count. */
  private def countGrams(s: Scratch, u: UTF8String, buckets: Int): Long = {
    s.ensure(buckets)
    s.reset()
    val bytes = u.getBytes // contiguous UTF-8; may be the backing array
    var nGrams = 0L
    var i = 0
    var prevOff = -1
    var prevLen = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == SPACE) i += 1
      if (i < n) {
        val start = i
        while (i < n && bytes(i) != SPACE) i += 1
        val len = i - start
        s.touch(bucketOf(s.md5, bytes, start, len, -1, -1, buckets))
        nGrams += 1L
        if (prevOff >= 0) {
          s.touch(bucketOf(s.md5, bytes, prevOff, prevLen, start, len, buckets))
          nGrams += 1L
        }
        prevOff = start
        prevLen = len
      }
    }
    nGrams
  }

  /** Per-row kernel for [[HashedGramDot]]: (n_grams, Σ_{b asc} n_b·w_b). */
  def dot(u: UTF8String, weights: Array[Double], buckets: Int): InternalRow = {
    val s = scratch.get()
    val nGrams = countGrams(s, u, buckets)
    // ascending-bucket fold == fold over the sorted touched list
    java.util.Arrays.sort(s.touched, 0, s.nTouched)
    var acc = 0.0
    var i = 0
    while (i < s.nTouched) {
      val b = s.touched(i)
      acc += s.counts(b).toDouble * weights(b)
      i += 1
    }
    InternalRow(nGrams, acc)
  }

  /** Per-row kernel for [[HashedGramBuckets]]: the document's compacted
    * (bucket, count) histogram, ascending bucket. */
  def hist(u: UTF8String, buckets: Int): ArrayData = {
    val s = scratch.get()
    countGrams(s, u, buckets)
    java.util.Arrays.sort(s.touched, 0, s.nTouched)
    val out = new Array[Any](s.nTouched)
    var i = 0
    while (i < s.nTouched) {
      val b = s.touched(i)
      out(i) = InternalRow(b, s.counts(b))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-row kernel for [[BucketArrayDot]]: fold a histogram array
    * (ascending bucket) against a runtime weight table. */
  def arrayDot(hist: ArrayData, weights: Array[Double]): InternalRow = {
    var n = 0L
    var acc = 0.0
    var i = 0
    val m = hist.numElements()
    while (i < m) {
      val row = hist.getStruct(i, 2)
      val c = row.getLong(1)
      n += c
      acc += c.toDouble * weights(row.getInt(0))
      i += 1
    }
    InternalRow(n, acc)
  }

  val dotType: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dot", DoubleType, nullable = false)))

  val histType: ArrayType = ArrayType(StructType(Seq(
    StructField("b", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
}

/** `struct(n_grams, dot)` of the hashed unigram+bigram stream of `child`
  * (an already-lowercased string) against a FIXED weight table — the
  * map-only form of LR-quality scoring ([[graft.operators
  * .QualityClassifier.scoreWithMargin]]): z = intercept + dot. */
case class HashedGramDot(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  require(weights.nonEmpty, "weights must be non-empty")

  override def dataType: DataType = HashedGrams.dotType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_gram_dot needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashedGrams.dot(input.asInstanceOf[UTF8String], weights, weights.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.HashedGrams.dot($c, $wRef, $wRef.length);
    """)
  }

  // content equality over the weight array (the NearestCells/ADVICE r19
  // discipline: reference equality defeats canonicalization and would
  // serialize one copy per occurrence)
  override def equals(other: Any): Boolean = other match {
    case o: HashedGramDot =>
      child == o.child && java.util.Arrays.equals(weights, o.weights)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(weights)))

  override protected def withNewChildInternal(newChild: Expression): HashedGramDot =
    copy(child = newChild)
}

/** The document's hashed-gram histogram: `array<struct<b:int, n:long>>`
  * ascending by bucket — the compact feed for corpus-level bucket
  * statistics (DSIR's target/source counts) where the weight table is
  * not known until runtime. */
case class HashedGramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = HashedGrams.histType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_gram_buckets needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashedGrams.hist(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.HashedGrams.hist($c, $buckets);
    """)

  override protected def withNewChildInternal(newChild: Expression): HashedGramBuckets =
    copy(child = newChild)
}

/** Fold a [[HashedGramBuckets]] histogram against a runtime weight table:
  * `struct(n_grams, dot)` with the same ascending-bucket IEEE fold as
  * [[HashedGramDot]] (the histogram is already bucket-ascending). */
case class BucketArrayDot(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  require(weights.nonEmpty, "weights must be non-empty")

  override def dataType: DataType = HashedGrams.dotType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case t: ArrayType if t.elementType.isInstanceOf[StructType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bucket_array_dot needs array<struct>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashedGrams.arrayDot(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.HashedGrams.arrayDot($c, $wRef);
    """)
  }

  override def equals(other: Any): Boolean = other match {
    case o: BucketArrayDot =>
      child == o.child && java.util.Arrays.equals(weights, o.weights)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(weights)))

  override protected def withNewChildInternal(newChild: Expression): BucketArrayDot =
    copy(child = newChild)
}

object HashedGramDot {
  def apply(textLower: Column, weights: Array[Double]): Column =
    GraftBridge.column(HashedGramDot(GraftBridge.expression(textLower), weights))
}

object HashedGramBuckets {
  def apply(textLower: Column, buckets: Int): Column =
    GraftBridge.column(HashedGramBuckets(GraftBridge.expression(textLower), buckets))
}

object BucketArrayDot {
  def apply(hist: Column, weights: Array[Double]): Column =
    GraftBridge.column(BucketArrayDot(GraftBridge.expression(hist), weights))
}
