package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Native set expressions must match the HOF formulations they replace:
  * same sets, and bitwise-identical Jaccard values. */
class TextSetExpressionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").limit(150)

  test("shingleSet == HOF shingles as sets") {
    val both = docs.select(
      TextSetExpressions.shingleSet(lower(col("text")), 5).as("fast"),
      TextFunctions.shingles(lower(col("text")), 5).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("fast").toSet ===
        r.getAs[scala.collection.Seq[String]]("ref").toSet)
    }
  }

  test("wordNgramSet == HOF wordNgrams as sets") {
    val both = docs.select(
      TextSetExpressions.wordNgramSet(lower(col("text")), 3).as("fast"),
      TextFunctions.wordNgrams(col("text"), 3).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("fast").toSet ===
        r.getAs[scala.collection.Seq[String]]("ref").toSet)
    }
  }

  test("arrayJaccard == size(intersect)/size(union), bitwise") {
    import spark.implicits._
    val pairs = docs.limit(40).select(col("doc_id"), col("text"))
      .crossJoin(docs.limit(40).select(col("doc_id").as("doc_id2"), col("text").as("text2")))
      .filter(col("doc_id") < col("doc_id2"))
    val both = pairs.select(
      TextSetExpressions.arrayJaccard(
        TextSetExpressions.shingleSet(lower(col("text")), 5),
        TextSetExpressions.shingleSet(lower(col("text2")), 5)).as("fast"),
      TextFunctions.jaccard(
        TextFunctions.shingles(lower(col("text")), 5),
        TextFunctions.shingles(lower(col("text2")), 5)).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native simhash == HOF simhash, bitwise") {
    val both = docs.select(
      TextSetExpressions.simhash(lower(col("text")), 16).as("fast"),
      TextFunctions.simhash(TextFunctions.tokenSet(col("text")), 16).as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("astral-plane chars: native shingles == HOF shingles (code points, not code units)") {
    import spark.implicits._
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16; a
    // code-unit window would split it and corrupt the hashed bytes
    val df = Seq("ab𝄞cd", "𝄞𝄞abc").toDF("t")
    val rows = df.select(
      TextSetExpressions.shingleSet(col("t"), 3).as("fast"),
      TextFunctions.shingles(col("t"), 3).as("ref"),
      graft.plans.MinHashSignature(col("t"), 3, 4).as("sig"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("fast").toSet ===
        r.getAs[scala.collection.Seq[String]]("ref").toSet)
      assert(r.getAs[scala.collection.Seq[Long]]("sig").forall(_ != Long.MaxValue))
    }
  }

  test("NULL text: native and HOF agree (NULL in, NULL out)") {
    import spark.implicits._
    val df = Seq(Option.empty[String], Some("hello world text")).toDF("t")
    val rows = df.select(
      TextSetExpressions.shingleSet(col("t"), 5).as("n_sh"),
      TextFunctions.shingles(col("t"), 5).as("h_sh"),
      TextSetExpressions.wordNgramSet(col("t"), 3).as("n_ng"),
      TextFunctions.wordNgrams(col("t"), 3).as("h_ng"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1) &&
      rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(1))
  }

  test("edge cases: short text, empty text, fewer tokens than n") {
    import spark.implicits._
    val df = Seq("ab", "", "one two").toDF("t")
    val rows = df.select(
      TextSetExpressions.shingleSet(col("t"), 5).as("sh"),
      TextSetExpressions.wordNgramSet(col("t"), 3).as("ng"))
      .collect()
    assert(rows(0).getAs[scala.collection.Seq[String]]("sh").toSeq === Seq("ab"))
    assert(rows(1).getAs[scala.collection.Seq[String]]("sh").toSeq === Seq(""))
    // fewer tokens than n: no n-gram is formable -> empty set (matches
    // the DuckDB list-comprehension oracle; no degenerate 1.0 pairs)
    assert(rows(2).getAs[scala.collection.Seq[String]]("ng").toSeq === Seq.empty)
    assert(rows(1).getAs[scala.collection.Seq[String]]("ng").toSeq === Seq.empty)
  }
}
