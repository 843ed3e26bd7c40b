package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkSpec {

  test("native expression equals the Column-pipeline formulation exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    // the pre-optimization HOF formulation, kept here as the spec
    val hashed = docs
      .select(col("doc_id"), shingles(lower(col("text")), 5).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), e => portableHash32(e)).as("h1"),
        transform(col("sh"), e => portableHash32(concat(lit("x|"), e))).as("h2"))
    val reference = hashed.select(col("doc_id") +:
      (0 until 4).map(i => array_min(zip_with(col("h1"), col("h2"),
        (a, b) => (a + lit(i.toLong) * b) % lit(4294967296L))).as(s"mh$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap

    val fast = docs.select(col("doc_id"),
      MinHashSignature(lower(col("text")), 5, 4).as("sig"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("sig").toSeq).toMap

    assert(fast.keySet === reference.keySet)
    fast.foreach { case (id, sig) => assert(sig === reference(id), s"doc $id") }
  }

  test("short and empty inputs behave like the whole-text shingle fallback") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "")).toDF("id", "t")
    val out = df.select(col("id"), MinHashSignature(col("t"), 5, 2).as("sig"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("sig").toSeq).toMap
    // "abc" shorter than k -> single whole-text shingle; deterministic
    assert(out(1L).length === 2)
    assert(out(1L).forall(_ >= 0))
    assert(out(2L).length === 2)
  }
}
