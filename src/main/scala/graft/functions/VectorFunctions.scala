package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Everything here is built from Catalyst higher-order functions
  * (`zip_with`, `aggregate`, `transform`) rather than Scala UDFs, so the
  * expressions stay inside Catalyst: they are optimizable, serializable
  * in the plan (no closure shipping), and usable from SQL. The fold order
  * of `aggregate` is a deterministic left-fold, which keeps floating-point
  * results reproducible run-to-run and engine-to-engine — important both
  * for the DuckDB oracle parity and for stable top-k tie-breaking.
  *
  * Semantics mirror the reference's `vector_distance_cos` (cosine distance
  * in [0,2], /root/reference/src/services/LibSQLDatabase.ts:264,332) and its
  * score mapping `score = 1 - distance/2` (LibSQLDatabase.ts:317,386-387).
  */
object VectorFunctions {

  /** Element-wise product folded to a dot product, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosineSim(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine distance in [0, 2] — the reference's `vector_distance_cos`. */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)

  /** Reference score mapping: distance [0,2] -> score [1,0]
    * (LibSQLDatabase.ts:317). */
  def distToScore(dist: Column): Column = lit(1.0) - dist / 2.0

  /** Squared Euclidean distance (k-means metric, Clustering.ts:189-191). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2-normalize a vector to the unit sphere. */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }
}
