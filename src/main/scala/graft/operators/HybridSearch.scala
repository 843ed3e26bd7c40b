package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid (vector + full-text) result fusion.
  *
  * Reproduces the reference's merge semantics
  * (/root/reference/src/index.ts:323-348): results are keyed, a hit
  * present in both sources gets `score = min(1, vectorScore * 1.2)` and
  * `match_type = "hybrid"`; otherwise each side keeps its own score with
  * `match_type = "vector" | "fts"`. The reference's quirk of comparing
  * unnormalized FTS scores against [0,1] vector scores in the final sort
  * is preserved deliberately (SURVEY.md §7.3).
  *
  * Implemented as a single full-outer join — both inputs are already
  * top-k sized (small), so this is a broadcastable join with no
  * wide shuffle regardless of corpus size.
  */
object HybridSearch {

  /** @param vector (keyCols..., score) vector-side hits
    * @param fts    (keyCols..., score) text-side hits */
  def fuse(vector: DataFrame, fts: DataFrame, keyCols: Seq[String],
           boost: Double = 1.2): DataFrame = {
    val v = vector.withColumnRenamed("score", "vec_score")
    val f = fts.withColumnRenamed("score", "fts_score")
    v.join(f, keyCols, "full_outer")
      .withColumn("match_type",
        when(col("vec_score").isNotNull && col("fts_score").isNotNull, "hybrid")
          .when(col("vec_score").isNotNull, "vector")
          .otherwise("fts"))
      .withColumn("score",
        when(col("match_type") === "hybrid",
          least(lit(1.0), col("vec_score") * boost))
          .when(col("match_type") === "vector", col("vec_score"))
          .otherwise(col("fts_score")))
  }

  /** Fuse and return the final ranked top-k (reference K5:
    * src/index.ts:351-353). */
  def fuseTopK(vector: DataFrame, fts: DataFrame, keyCols: Seq[String],
               k: Int, boost: Double = 1.2): DataFrame =
    fuse(vector, fts, keyCols, boost)
      .orderBy(desc("score") +: keyCols.map(asc): _*)
      .limit(k)
}
