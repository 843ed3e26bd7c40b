package graft.operators

import graft.functions.TextFunctions.portableHash32
import graft.util.Materialize.MatOps
import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** EXACT-proportion stratified split: within every stratum, rows are
    * ranked by a deterministic hash order and cut at
    * `floor(cumFraction × n_stratum)` boundaries — each stratum
    * contributes its exact share to every split (the guarantee
    * [[splitByHash]]'s per-row bucketing only approaches in
    * expectation, which matters when small strata must all appear in a
    * small validation set). The hash order makes the assignment
    * identical on every run, engine, and cluster size.
    *
    * Scale shape is [[ImportanceSampling.resampleTop]]'s distributed
    * prefix-rank generalized per stratum — NOT a per-stratum Window
    * (one partition per stratum dies on a 100 TB corpus with a handful
    * of sources): range-partition on (stratum, ord), per-partition
    * per-stratum counts prefix-scanned into rank offsets (driver
    * metadata, ≤ partitions + strata rows), then one map-only pass
    * labels each row from its running in-stratum rank.
    *
    * `fractions` are (label, fraction) pairs summing to 1; the last
    * label absorbs the floor remainders. Output: input columns +
    * `ss_ord` (the hash key), `ss_rank` (1-based in-stratum rank), and
    * `split`. The stratum column must be a string. */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
                      fractions: Seq[(String, Double)],
                      seed: Int = 0): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      s"fractions must be positive, got $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    // materialize before repartitionByRange: its range-boundary sampling
    // job would otherwise recompute the caller's lineage one extra time
    val w0 = df.withColumn("ss_ord",
        portableHash32(concat(lit(s"ss$seed|"), col(idCol).cast("string"))))
      .materializeOnce(eager = false)
    val ranked = stratumRank(w0, strataCol,
      Seq(col("ss_ord").asc, col(idCol).asc), "ss_rank", "__ss_n")
    // cut_j = floor(cumFrac_j * n), evaluated as the same IEEE doubles
    // the driver would compute; the last label absorbs every floor
    // remainder (no cut, the otherwise branch)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val names = fractions.map(_._1)
    val split = cum.init.zip(names.init).foldRight(lit(names.last)) {
      case ((f, name), acc) =>
        when(col("ss_rank") <= floor(lit(f) * col("__ss_n")), name)
          .otherwise(acc)
    }
    ranked.withColumn("split", split).drop("__ss_n")
  }

  /** Per-stratum distributed prefix rank — the shared scaffolding of
    * [[stratifiedSplit]] and [[TextAnalysis.ccnetBucketsPerStratum]]:
    * rank every row 1..n within its stratum under `order`, without a
    * per-stratum Window (which is one partition per stratum — dead at
    * 100 TB with a handful of strata). Range-partition on
    * (stratum, order), per-partition per-stratum counts prefix-scanned
    * into rank offsets (driver metadata, ≤ partitions + strata rows),
    * then one map-only labeling pass. Adds `rankCol` (1-based) and
    * `nCol` (the stratum's row count). The stratum column must be a
    * string; a NULL stratum is ranked as its own stratum (range
    * partitioning sorts nulls first, so it stays contiguous — ADVICE
    * r12: a dirty lang/source column must rank legibly, not NPE in an
    * executor). `order` must totally order rows within a stratum. */
  def stratumRank(df: DataFrame, strataCol: String, order: Seq[Column],
                  rankCol: String, nCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ordered = df
      .repartitionByRange(parts, (col(strataCol).asc +: order): _*)
      .sortWithinPartitions((col(strataCol).asc +: order): _*)
      .materializeOnce(eager = false) // both passes must see the same split
    val strataIdx = ordered.schema.fieldIndex(strataCol)
    val counts = ordered
      .select(spark_partition_id().as("__pid"), col(strataCol).as("__s"))
      .groupBy("__pid", "__s").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val strata = counts.keys.map(_._2).toSeq.distinct
    val totals = strata.map(s =>
      s -> (0 until parts).map(p => counts.getOrElse((p, s), 0L)).sum).toMap
    val offsets = (for { s <- strata; p <- 0 until parts } yield
      (p, s) -> (0 until p).map(q => counts.getOrElse((q, s), 0L)).sum).toMap
    val schema = ordered.schema
      .add(rankCol, org.apache.spark.sql.types.LongType)
      .add(nCol, org.apache.spark.sql.types.LongType)
    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId: the index
    // is `ordered`'s own split id, stable no matter what narrow ops a
    // caller pipelines on top — a downstream union() runs this closure
    // inside a UnionRDD stage whose TASK partition ids are offset past
    // the sibling branch's, which made the offsets lookup throw for any
    // consumer that unioned two reads of the ranked frame (round 14)
    val rdd = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first = true
      var cur: String = null
      var rank = 0L
      it.map { row =>
        val s = row.getString(strataIdx)
        // rows arrive sorted by (stratum, order): strata are contiguous,
        // so the running rank restarts from this partition's offset at
        // each stratum boundary. `first` (not a null sentinel) detects
        // the boundary so a NULL stratum ranks like any other
        if (first || s != cur) { first = false; cur = s; rank = offsets((pid, s)) }
        rank += 1
        Row.fromSeq(row.toSeq :+ rank :+ totals(s))
      }
    }
    spark.createDataFrame(rdd, schema)
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

  /** [[trainOrder]] with the epoch as a COLUMN — for plans where the
    * epoch number varies per row (e.g. [[Mixture.materializeEpochs]]'s
    * per-key partial epoch). Identical hash universe: an integral
    * epoch column casts to the same string the Int overload embeds. */
  def trainOrder(key: Column, epoch: Column): Column =
    portableHash32(concat(epoch.cast("string"), lit("|"),
      key.cast("string")))
}
