package graft.operators

import graft.functions.TextFunctions.portableHash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and splitting.
  *
  * `df.sample` draws from a partition-seeded RNG: the selected set
  * changes with partitioning, task retries, and engine — unusable for
  * reproducible training corpora. Hashing a stable key instead gives a
  * sample that is (a) identical on every run, cluster size, and engine
  * (md5-derived [[graft.functions.TextFunctions.portableHash32]]),
  * (b) consistent across tables — sampling `documents` and `embeddings`
  * by the same key keeps them aligned, and (c) a pure narrow filter:
  * no shuffle, pushes into the scan's evaluated predicate at any scale.
  */
object Sampling {

  /** Keep rows whose hash lands in `[0, keep)` of `outOf` buckets —
    * a deterministic ~keep/outOf fraction. */
  def hashSample(df: DataFrame, key: Column, keep: Int,
                 outOf: Int = 100): DataFrame = {
    require(keep >= 0 && keep <= outOf, s"keep=$keep must be in [0, $outOf]")
    df.filter(bucket(key, outOf) < keep)
  }

  /** Disjoint deterministic splits (train/val/test): one DataFrame per
    * weight, covering all rows when weights sum to `outOf`. */
  def splitByHash(df: DataFrame, key: Column, weights: Seq[Int],
                  outOf: Int = 100): Seq[DataFrame] = {
    require(weights.forall(_ >= 0) && weights.sum <= outOf,
      s"weights $weights must be non-negative and sum to <= $outOf")
    val bounds = weights.scanLeft(0)(_ + _)
    bounds.zip(bounds.tail).map { case (lo, hi) =>
      // isin evaluates the md5-derived bucket ONCE per row; a range
      // predicate (>= lo && < hi) would hash twice after predicate
      // pushdown inlines the bucket expression into both comparisons
      if (lo == hi) df.filter(lit(false))
      else df.filter(bucket(key, outOf).isin(lo until hi: _*))
    }
  }

  /** The stable bucket of a key: portable 32-bit hash mod `outOf`.
    * Non-negative (hash is an unsigned 32-bit value in a long). */
  def bucket(key: Column, outOf: Int): Column =
    portableHash32(key.cast("string")) % outOf

  /** Weighted sampling WITHOUT replacement, deterministic (Efraimidis &
    * Spirakis 2006): each row gets the key u^(1/w) with u a hash-derived
    * uniform in (0,1); the k largest keys are exactly a weight-
    * proportional sample without replacement. Because u comes from
    * [[portableHash32]] of the row key (not an RNG), the selected set is
    * identical on every run, partitioning, and engine — the reproducible
    * form of the importance-resampling step DSIR-style pipelines run on
    * [[ImportanceSampling.dsirWeights]] outputs (or any weight: token
    * counts for length-proportional mixes, quality scores, ...).
    *
    * Scale shape: the key is one map-only expression; the k-largest
    * selection compiles to `TakeOrderedAndProject` (k rows per
    * partition, no global sort). The ranked key is INTEGER-EXACT:
    * `floor(u^(1/w) * 1e9)` as a BIGINT. IEEE multiply and floor are
    * exactly specified, identical on every engine — no engine-specific
    * float-`round` semantics (Spark HALF_UP vs DuckDB nearbyint) are
    * load-bearing. The one residual cross-engine freedom is libm's
    * 1-ulp `pow` at an exact integer boundary of the scaled key
    * (probability ~2^-30 per row); ties break by the row key.
    *
    * Rows with weight <= 0 or NULL are excluded (zero-probability mass).
    * Output: input columns + `es_key` (the integer selection key).
    *
    * @param seed varies the sample (a different hash universe per
    *             seed) without any RNG state */
  def weightedSample(df: DataFrame, key: Column, weightCol: Column,
                     k: Int, seed: Int = 0): DataFrame = {
    require(k > 0, "k must be positive")
    // (hash + 0.5) / 2^32: an exact dyadic rational in (0, 1). The "es"
    // prefix keeps this hash universe disjoint from [[trainOrder]]'s
    // epoch universes — seed 0 must not reuse epoch 0's uniforms
    val u = (portableHash32(concat(lit(s"es$seed|"), key.cast("string")))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val esKey = floor(pow(u, lit(1.0) / weightCol.cast("double")) * lit(1e9))
      .cast("long")
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("es_key", esKey)
      .orderBy(col("es_key").desc, key.asc)
      .limit(k)
  }

  /** Deterministic global training order: a portable-hash rank keyed by
    * `"<epoch>|<key>"` — the reproducible shuffle a training run needs.
    * Same order on every engine, run, and partitioning; a different
    * `epoch` salt yields an independent permutation (per-epoch
    * reshuffling without RNG state). Returned as a COLUMN (plus the
    * key as tie-break), not a sorted frame: the trainer sorts/range-
    * partitions on it exactly once at write time, so the expensive
    * total-order sort happens where the data is consumed, not before
    * every intermediate stage. */
  def trainOrder(key: Column, epoch: Int = 0): Column =
    portableHash32(concat(lit(s"$epoch|"), key.cast("string")))
}
