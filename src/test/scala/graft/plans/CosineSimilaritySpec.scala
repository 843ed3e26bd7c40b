package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The codegen expression must be BIT-IDENTICAL to the HOF reference
  * formulation (same left-fold order) — that equivalence is what lets
  * the hot path swap in codegen without breaking oracle parity. */
class CosineSimilaritySpec extends SparkSpec {

  test("codegen expression == HOF fold, bitwise, on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0)
    val both = emb.select(
      CosineSimilarity(col("embedding"), lit(q.toArray)).as("fast"),
      VectorFunctions.cosineSim(col("embedding"), lit(q.toArray)).as("ref"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval matches codegen and handles nulls/self-similarity") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (3L, null.asInstanceOf[Array[Float]], Array(1f, 0f, 0f))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), CosineSimilarity(col("a"), col("b")).as("cs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(rows(1L).get - 1.0) < 1e-12)
    assert(math.abs(rows(2L).get) < 1e-12)
    assert(rows(3L) === None)
  }

  test("SQL registration works") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(cast(1 as float), cast(0 as float)), " +
        "array(cast(1 as float), cast(0 as float)))").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("mismatched vector lengths yield NULL, not a prefix cosine") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    val rows = df.select(CosineSimilarity(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0), "corrupt/truncated vectors must not rank")
    assert(!rows(1).isNullAt(0))
  }

  test("SQL function args are honored: simhash(text, 16) uses 16 bits") {
    graft.GraftSession.registerFunctions(spark)
    val h16 = spark.sql("SELECT simhash('alpha beta gamma', 16)").head().getLong(0)
    val h32 = spark.sql("SELECT simhash('alpha beta gamma')").head().getLong(0)
    assert(h16 < (1L << 16), s"16-bit simhash out of range: $h16")
    assert(h16 !== h32)
    val sh7 = spark.sql("SELECT shingle_set('abcdefghij', 7)").head()
      .getAs[scala.collection.Seq[String]](0)
    assert(sh7.forall(_.length === 7))
  }
}
