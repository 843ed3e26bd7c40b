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
}
