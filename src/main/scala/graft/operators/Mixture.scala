package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix budget allocation across languages/domains.
  *
  * [[unimaxAllocation]] is the UniMax algorithm (Chung et al., "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale
  * Multilingual Pretraining", ICLR 2023): spread a total token budget as
  * uniformly as possible across keys (languages, sources, domains), but
  * never take more than `maxEpochs` passes over any key's available
  * data. Low-resource keys contribute everything they have (up to the
  * epoch cap); the remaining budget splits evenly among high-resource
  * keys — the standard alternative to temperature sampling, which either
  * starves the tail or over-epochs it.
  *
  * The greedy loop in the paper (ascending scan, each key takes
  * `min(cap, remaining/left)`) has a closed form over the caps sorted
  * ascending: with `C_i` the prefix sum of caps and `r_i = (B - C_{i-1})
  * / (n - i + 1)`, the waterfilling level is `f* = max_i r_i` and every
  * key gets `min(cap, f*)` (while keys are capped, r strictly increases;
  * past the first uncapped key it falls below the level — so the max IS
  * the level). That closed form is two window functions + one max — no
  * driver loop, and it is exactly what the SQL oracle replays.
  *
  * Scale design: the input here is PER-KEY AGGREGATES — tens to
  * thousands of rows regardless of corpus size — so the partition-less
  * windows over it are bounded metadata, not a data-scale shuffle (the
  * same contract as the IVF centroid table). The corpus-scale work —
  * counting tokens per key, then admitting documents against the
  * per-key budgets — stays in the caller's aggregation and in
  * [[Quota.perKeyTokenBudgets]]'s two-phase admission, both of which
  * shuffle only slim keyed rows.
  */
object Mixture {

  /** Per-key UniMax token budgets.
    *
    * @param perKey    one row per key: (keyCol, tokensCol) — available
    *                  tokens per key (a small aggregate, not the corpus)
    * @param budget    total token budget B to allocate
    * @param maxEpochs cap on passes over any key's data (UniMax's N);
    *                  a key never receives more than
    *                  `maxEpochs * available` tokens
    * @return (keyCol, avail_tokens, alloc_tokens) — `alloc_tokens` =
    *         `floor(min(maxEpochs * avail, f*))` as a long; allocations
    *         sum to <= budget and the floor slack is at most one token
    *         per key
    */
  def unimaxAllocation(perKey: DataFrame, keyCol: String, tokensCol: String,
                       budget: Long, maxEpochs: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val base = perKey.select(col(keyCol),
      col(tokensCol).cast("long").as("avail_tokens"))
      .withColumn("__cap", col("avail_tokens").cast("double") * lit(maxEpochs))
    // ascending caps, key tie-break: the scan order of the greedy loop
    val ord = Window.orderBy(col("__cap").asc, col(keyCol).asc)
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = base
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__prefix", coalesce(
        sum(col("__cap")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__r",
        (lit(budget.toDouble) - col("__prefix")) /
          (col("__n") - col("__rn") + lit(1)).cast("double"))
      .withColumn("__fstar", max(col("__r")).over(all))
    ranked.select(col(keyCol), col("avail_tokens"),
      floor(least(col("__cap"), greatest(col("__fstar"), lit(0.0))))
        .cast("long").as("alloc_tokens"))
  }

  /** TEMPERATURE-based allocation — the pre-UniMax standard (mBERT's
    * exponential smoothing, mT5/XLM-R's p_l ∝ c_l^(1/T)): each key's
    * budget share is its token share raised to 1/T and renormalized.
    * T = 1 reproduces proportional-to-size sampling; T → ∞ approaches
    * uniform. Unlike [[unimaxAllocation]] there is NO epoch cap — the
    * known failure mode (a tiny language allocated more tokens than it
    * has gets over-epoched) is the caller's to bound, and exactly what
    * UniMax was proposed to fix; both live here so a mix pipeline can
    * A/B them behind one admission step.
    *
    * Cross-engine parity: shares are computed in double (`pow`, one
    * div) and floored to long tokens — the same floor-boundary
    * discipline as q75's Efraimidis-Spirakis keys; the residual 1-ulp
    * `pow` freedom sits away from floor boundaries for any real corpus.
    *
    * @return (keyCol, avail_tokens, alloc_tokens) like
    *         [[unimaxAllocation]]; allocations sum to <= budget
    */
  def temperatureAllocation(perKey: DataFrame, keyCol: String,
                            tokensCol: String, budget: Long,
                            temperature: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(temperature > 0, "temperature must be positive")
    val base = perKey.select(col(keyCol),
      col(tokensCol).cast("long").as("avail_tokens"))
      .withColumn("__w",
        pow(col("avail_tokens").cast("double"), lit(1.0 / temperature)))
    // normalizer via an ORDERED unbounded window: Spark folds the frame
    // in the (weight, key) sort order, so the double total is a fixed
    // sequential left fold — the oracle replays it with DuckDB's
    // list(... ORDER BY ...) fold (the q27 centroid discipline), making
    // the sum bit-reproducible across engines and partitionings
    val ord = Window.orderBy(col("__w").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("__z", sum(col("__w")).over(ord))
      .select(col(keyCol), col("avail_tokens"),
        floor(lit(budget.toDouble) * col("__w") / col("__z"))
          .cast("long").as("alloc_tokens"))
  }

  /** UniMax-budgeted corpus selection: allocate `budget` over the
    * distinct values of `keyCol` with [[unimaxAllocation]], then admit
    * rows per key in `order` while the key's running `tokensCol` total
    * stays within its allocation (prefix admission — the deterministic
    * SQL-window semantics, see [[Quota.perKeyTokenBudget]]).
    *
    * Output = input columns + `alloc_tokens` (the key's budget) +
    * `cum_tokens` (running total through this row). Keys allocated 0
    * tokens (or NULL keys — they never match the allocation join, the
    * SQL join semantics) contribute no rows.
    */
  def unimaxSample(df: DataFrame, keyCol: String, tokensCol: String,
                   order: Seq[Column], budget: Long,
                   maxEpochs: Double): DataFrame =
    sampleWithAllocation(df, keyCol, tokensCol, order,
      (perKey: DataFrame) =>
        unimaxAllocation(perKey, keyCol, "__avail", budget, maxEpochs))

  /** [[unimaxSample]]'s temperature-allocation sibling. */
  def temperatureSample(df: DataFrame, keyCol: String, tokensCol: String,
                        order: Seq[Column], budget: Long,
                        temperature: Double): DataFrame =
    sampleWithAllocation(df, keyCol, tokensCol, order,
      (perKey: DataFrame) =>
        temperatureAllocation(perKey, keyCol, "__avail", budget, temperature))

  /** Materialize the repeated training stream a >1-epoch allocation
    * implies — the data-constrained regime (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"; UniMax's N>1 case):
    * when a key's allocation exceeds its available tokens, the trainer
    * must SEE its documents multiple times, so the mixture's output is
    * rows repeated per epoch, not a sampled subset.
    *
    * Each key emits floor(alloc/avail) full passes over its documents
    * (epochs 0..k-1), plus a partial pass (epoch k) admitting a
    * deterministic-hash-order prefix worth the remaining tokens via
    * [[Quota.perKeyTokenBudgets]]. The partial epoch's admission order
    * is [[Sampling.trainOrder]] salted with the epoch NUMBER, so every
    * pass — full or partial — has an independent reproducible
    * permutation for the downstream write, and the admitted prefix is
    * not biased toward any earlier epoch's head.
    *
    * Scale: the repeat factor is bounded by `maxEpochs` (a small
    * constant — UniMax's published N is single digits); the allocation
    * runs over per-key metadata; the admission is the certified
    * two-phase quota. No corpus-sized window, no driver loop.
    *
    * Output: (idCol, keyCol, tokensCol, alloc_tokens, epoch), one row
    * per (document, epoch) in the stream. Keys with zero available
    * tokens are dropped (no stream contribution to materialize).
    */
  def materializeEpochs(df: DataFrame, keyCol: String, idCol: String,
                        tokensCol: String, budget: Long,
                        maxEpochs: Double): DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(sum(col(tokensCol).cast("long")).as("__avail"))
    val alloc = unimaxAllocation(perKey, keyCol, "__avail", budget, maxEpochs)
      .filter(col("avail_tokens") > 0)
      .withColumn("__fe", expr("alloc_tokens div avail_tokens"))
      .withColumn("__rem",
        col("alloc_tokens") - col("__fe") * col("avail_tokens"))
      .select(col(keyCol), col("alloc_tokens"), col("__fe"), col("__rem"))
    val joined = df.select(col(idCol), col(keyCol), col(tokensCol))
      .join(broadcast(alloc), Seq(keyCol))
    val full = joined.filter(col("__fe") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__fe") - 1)))
    val partial = Quota.perKeyTokenBudgets(
      joined.filter(col("__rem") > 0).withColumn("epoch", col("__fe")),
      Seq(keyCol),
      Seq(Sampling.trainOrder(col(idCol), col("epoch")).asc,
        col(idCol).asc),
      tokensCol, budgetCol = "__rem")
    val out = Seq(col(idCol), col(keyCol), col(tokensCol),
      col("alloc_tokens"), col("epoch"))
    full.select(out: _*).unionByName(partial.select(out: _*))
  }

  private def sampleWithAllocation(df: DataFrame, keyCol: String,
                                   tokensCol: String, order: Seq[Column],
                                   allocate: DataFrame => DataFrame)
      : DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(sum(col(tokensCol).cast("long")).as("__avail"))
    val alloc = allocate(perKey).select(col(keyCol), col("alloc_tokens"))
    val withBudget = df.join(broadcast(alloc), Seq(keyCol))
    Quota.perKeyTokenBudgets(withBudget, Seq(keyCol), order, tokensCol,
      budgetCol = "alloc_tokens")
  }
}
