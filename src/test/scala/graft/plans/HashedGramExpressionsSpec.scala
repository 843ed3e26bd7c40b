package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Round-20 native kernels: bit-parity of [[Md5Hash32]] against the
  * builtin conv/substring/md5 chain it replaced, and of the hashed-gram
  * kernels against their driver-side replicas. */
class HashedGramExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "hello world", "  spaced  out  ",
    "único naïve café", "Ωmega σχήμα", "0|42", "es7|key",
    "control", "𝕌nicode beyond BMP 🎯",
    "a" * 1000, "tab\tand\nnewline stay intact")

  test("Md5Hash32 equals the builtin conv(substring(md5)) chain") {
    val df = (samples :+ null).toDF("s")
    val got = df.select(
      Md5Hash32(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("legacy"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), r.toString)
    }
    // and against the spec-wide driver replica
    samples.foreach { s =>
      val one = Seq(s).toDF("s").select(Md5Hash32(col("s"))).head().getLong(0)
      assert(one === md5Hash32(s), s"'$s'")
    }
  }

  test("Md5Hash32 survives whole-stage codegen and constant folding") {
    // expression on a computed column inside a filter + projection
    val n = spark.range(1000)
      .select(concat(lit("k"), col("id").cast("string")).as("s"))
      .filter(Md5Hash32(col("s")) % 100 < 50)
      .count()
    val expected = (0 until 1000)
      .count(i => md5Hash32(s"k$i") % 100 < 50)
    assert(n === expected)
  }

  test("HashedGramDot matches the driver replica (counts and fold order)") {
    val buckets = 64
    val weights = Array.tabulate(buckets)(b => math.sin(b.toDouble))
    val texts = Seq(
      "the quick brown fox", "", "x", "a a a a", "  padded   runs  ",
      "único naïve café naïve café", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    val got = texts.toDF("t")
      .select(HashedGramDot(lower(col("t")), weights).as("d"))
      .select(col("d.n_grams"), col("d.dot")).collect()
    texts.zip(got).foreach { case (t, r) =>
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val counts = grams.groupBy(g => (md5Hash32(g) % buckets).toInt)
        .map { case (b, gs) => b -> gs.size.toLong }
      val dot = counts.toSeq.sortBy(_._1).foldLeft(0.0) {
        case (acc, (b, c)) => acc + c.toDouble * weights(b) }
      assert(r.getLong(0) === grams.size.toLong, s"'$t' n_grams")
      assert(r.getDouble(1) === dot, s"'$t' dot") // bit-equal
    }
  }

  test("HashedGramBuckets is ascending, compact, and count-exact") {
    val buckets = 16 // force collisions
    val t = "b b c d e f g h i j k l m n o p q r s t u v w x y z"
    val rows = Seq(t).toDF("t")
      .select(explode(HashedGramBuckets(lower(col("t")), buckets)).as("e"))
      .select(col("e.b"), col("e.n")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._1).distinct.length === rows.length)
    val toks = t.split(" ").filter(_.nonEmpty).toSeq
    val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    assert(rows.map(_._2).sum === grams.size.toLong)
    val expected = grams.groupBy(g => (md5Hash32(g) % buckets).toInt)
      .map { case (b, gs) => (b, gs.size.toLong) }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expected)
  }

  test("BucketArrayDot folds the histogram like HashedGramDot folds text") {
    val buckets = 32
    val weights = Array.tabulate(buckets)(b => 1.0 / (b + 1))
    val texts = Seq("alpha beta gamma delta", "alpha alpha", "")
    val viaHist = texts.toDF("t")
      .select(BucketArrayDot(
        HashedGramBuckets(lower(col("t")), buckets), weights).as("d"))
      .select(col("d.n_grams"), col("d.dot")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val direct = texts.toDF("t")
      .select(HashedGramDot(lower(col("t")), weights).as("d"))
      .select(col("d.n_grams"), col("d.dot")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaHist.toSeq === direct.toSeq)
  }
}
