package graft.operators

import graft.functions.TextFunctions
import graft.util.Materialize.MatOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level distributional diagnostics — the audit a training-data
  * pipeline runs before trusting a new source: does the token
  * frequency spectrum look like natural language (Zipf's law,
  * rank-frequency slope ≈ −1) or like boilerplate/generated spam
  * (flat head or degenerate tail)?
  *
  * Scale design: the corpus collapses to (token, count) in one
  * map-side-combined aggregate (vocabulary-sized, not corpus-sized);
  * the head is a distributed TakeOrdered; every float reduction runs
  * over the BOUNDED top-N list as a rank-ordered sequential fold
  * (the q97 ordered-fold discipline), so the fitted slope is
  * bit-reproducible across partitionings and engines up to the shared
  * 1-ulp `ln` freedom — absorbed by round-6 on the one float output.
  */
object CorpusStats {

  /** Rank-ordered sequential sum of `v` — deterministic fold order on
    * a bounded list (ranks must be unique). */
  private def orderedSum(rank: Column, v: Column): Column =
    aggregate(
      array_sort(collect_list(struct(rank.as("r"), v.as("v")))),
      lit(0.0), (a, x) => a + x.getField("v"))

  /** Top-`topN` token rank-frequency spectrum plus the OLS slope of
    * ln(freq) ~ ln(rank) over those points (the Zipf exponent is
    * −slope; natural text sits near slope −1).
    *
    * Output: (rank, token, freq, zipf_slope) — `zipf_slope` constant
    * across rows, rounded to 6dp. Tokens are whitespace tokens of the
    * lowercased text ([[TextFunctions.tokens]], the corpus-wide token
    * universe every LM/quality tier shares). Ties break by token so
    * the head is total-ordered.
    */
  def zipfSpectrum(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 2, "topN must be >= 2 to fit a slope")
    val counts = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val top = counts.orderBy(col("freq").desc, col("token").asc).limit(topN)
    // bounded window: topN rows survive the TakeOrdered above
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc))
        .cast("long"))
    val l = ranked.select(col("rank"), col("token"), col("freq"),
      log(col("rank").cast("double")).as("lnr"),
      log(col("freq").cast("double")).as("lnf"))
    val s = l.agg(
      count(lit(1)).cast("double").as("n"),
      orderedSum(col("rank"), col("lnr")).as("sx"),
      orderedSum(col("rank"), col("lnf")).as("sy"),
      orderedSum(col("rank"), col("lnr") * col("lnr")).as("sxx"),
      orderedSum(col("rank"), col("lnr") * col("lnf")).as("sxy"))
    val slope = s.select(round(
      (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6)
      .as("zipf_slope"))
    l.select("rank", "token", "freq").crossJoin(broadcast(slope))
  }

  /** EXACT per-stratum percentiles by distributed rank — the
    * nearest-rank method (value at rank ⌈q·n⌉ of the sorted stratum):
    * the length/score distribution audit behind packing, quota, and
    * filter-threshold decisions. Spark's built-in exact `percentile`
    * aggregate buffers each group's values in executor memory;
    * [[Sampling.stratumRank]]'s two-pass prefix rank never
    * materializes a stratum anywhere, so a billion-row stratum costs
    * the same per-row work as a thousand-row one. Integer-exact — no
    * interpolation, so any engine replays it bit-for-bit.
    *
    * Output: one row per stratum — (strataCol, n_docs,
    * p<100q> per requested quantile). */
  def exactPercentiles(df: DataFrame, valueCol: String, strataCol: String,
                       qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    // NULL values are excluded BEFORE ranking — otherwise they would
    // occupy low ranks (Spark sorts NULLs first ascending), inflate n,
    // and silently shift every ceil(q*n) pick
    val ranked = Sampling.stratumRank(
      df.select(col(strataCol), col(valueCol).cast("long").as("__v"))
        .filter(col("__v").isNotNull),
      strataCol, Seq(col("__v").asc), "__rk", "__n")
    val picks = qs.map { q =>
      max(when(col("__rk") === ceil(col("__n") * lit(q)), col("__v")))
        .as(s"p${math.round(q * 100)}")
    }
    ranked.groupBy(col(strataCol))
      .agg(max("__n").as("n_docs"), picks: _*)
  }

  /** KMV (k-minimum-values) distinct-count sketch — cardinality
    * estimation whose answer is DETERMINISTIC and SQL-replayable,
    * unlike HLL (whose register layout is engine-private): hash every
    * item with the portable md5-derived 32-bit hash, keep the k
    * smallest distinct hash values, estimate D ≈ (k−1)·2³² / h_(k)
    * (Bar-Yossef et al. 2002). Relative error ~ 1/√(k−2).
    *
    * Scale: one distinct on the 32-bit hash (map-side combined; the
    * shuffle carries hashes, not items) + a distributed TakeOrdered of
    * k values. When fewer than k distinct hashes exist the sketch has
    * seen everything and reports the exact count. 32-bit collisions
    * bias the estimate low by ~D²/2³³ (≪ the sampling error until
    * D approaches millions); both engines share the identical hash so
    * the replay is exact, collisions included.
    *
    * Output: one row (n_tracked, kth_hash, est_distinct). */
  def kmvDistinct(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val num = (k - 1).toDouble * 4294967296.0
    // NULL items hash to NULL and would sort FIRST in Spark's
    // ascending order but LAST in a replaying engine's default —
    // exclude them explicitly (a NULL is not an item)
    df.select(TextFunctions.portableHash32(item.cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
      .orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("n_tracked"), max("h").as("kth_hash"))
      .select(col("n_tracked"), col("kth_hash"),
        when(col("n_tracked") < k, col("n_tracked").cast("double"))
          .otherwise(lit(num) / col("kth_hash").cast("double"))
          .as("est_distinct"))
  }

  /** KMV sketch SET ALGEBRA (Beyer et al. 2007, "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations"): per-source
    * KMV sketches combined pairwise into union / intersection /
    * Jaccard estimates — the cross-source overlap audit at sketch cost
    * instead of an exact distinct-join over the token universe.
    *
    * For sources a < b with k-min sketches L_a, L_b:
    *   - the k smallest of L_a ∪ L_b form the union sketch; its k-th
    *     value h_k gives est_union = (k−1)·2³² / h_k
    *   - K∩ = |{h in the union sketch : h ∈ L_a ∧ h ∈ L_b}| gives
    *     jaccard_est = K∩/k and est_intersect = jaccard_est·est_union
    * Everything is integer ranks and one division over the portable
    * hash, so the sketch replays exactly in SQL, collisions included.
    *
    * Scale shape: the per-source k-min runs through the distributed
    * prefix rank ([[Sampling.stratumRank]] — never a single-partition
    * window over a source's distinct hashes); all pairwise algebra
    * then operates on sketches of ≤ k rows per source (bounded
    * windows). Sketches degrade to EXACT sets when a source has < k
    * distinct hashes — the estimators then return exact counts.
    *
    * Output per pair: (src_a, src_b, n_common, union_kth, est_union,
    * jaccard_est, est_intersect). */
  def kmvPairOverlap(df: DataFrame, sourceCol: String, item: Column,
                     k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    val hashes = df
      .select(col(sourceCol).as("src").cast("string"),
        TextFunctions.portableHash32(item.cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
    // the sketch feeds five plan branches (both pair sides + both
    // membership probes + the union ranks): pin it once — it is tiny
    // (≤ k rows per source) and the rank pass shouldn't re-run per branch
    val sketch = Sampling.stratumRank(hashes, "src",
        Seq(col("h").asc), "rk", "n")
      .filter(col("rk") <= k)
      .select(col("src"), col("h"), col("n").as("n_distinct"))
      .materializeOnce(eager = false)
    val a = sketch.select(col("src").as("src_a"), col("h"),
      col("n_distinct").as("na"))
    val b = sketch.select(col("src").as("src_b"), col("h"),
      col("n_distinct").as("nb"))
    // union sketch per pair: ranks over ≤ 2k rows per pair — bounded.
    // The pair expansion is sketch × the DISTINCT SOURCE LIST under an
    // inequality: broadcast the list side explicitly (it is ≤ #sources
    // rows) so the planner emits a broadcast nested-loop join, never a
    // CartesianProduct (the checkpointed sketch has no size stats)
    val merged = a.select(col("src_a"), col("h"))
      .join(broadcast(b.select(col("src_b")).distinct()),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("h"))
      .union(
        b.select(col("src_b"), col("h"))
          .join(broadcast(a.select(col("src_a")).distinct()),
            col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"), col("h")))
      .distinct()
    val w = Window.partitionBy("src_a", "src_b").orderBy(col("h").asc)
    val unionTop = merged.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val inA = a.select(col("src_a"), col("h")).withColumn("__a", lit(1))
    val inB = b.select(col("src_b"), col("h")).withColumn("__b", lit(1))
    val num = (k - 1).toDouble * 4294967296.0
    unionTop
      .join(inA, Seq("src_a", "h"), "left")
      .join(inB, Seq("src_b", "h"), "left")
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_tracked"), max("h").as("union_kth"),
        sum(when(col("__a") === 1 && col("__b") === 1, 1L)
          .otherwise(0L)).as("n_common"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("union_kth"),
        when(col("n_tracked") < k, col("n_tracked").cast("double"))
          .otherwise(lit(num) / col("union_kth").cast("double"))
          .as("est_union"),
        // exact-regime denominator: with < k tracked values the union
        // sketch IS the union, so K∩/n_tracked is the exact Jaccard
        (col("n_common").cast("double") / col("n_tracked").cast("double"))
          .as("jaccard_est"))
      .withColumn("est_intersect", col("jaccard_est") * col("est_union"))
  }

  /** Per-stratum tokenizer fertility — the multilingual-bias audit a
    * tokenizer ships with (a subword vocab trained on one language
    * fragments the others into more, shorter tokens, inflating their
    * effective sequence cost): per stratum (language/source),
    * characters and whitespace words per subword token.
    *
    * `tokenCounts` is any certified per-doc token counter's output —
    * (id, <count>), e.g. [[BpeTraining.tokenCounts]] or
    * [[UnigramLm]] scoring — so one audit shape serves every
    * tokenizer family.
    *
    * One co-partitioned join + one aggregate; ratios are single
    * divisions of exact integer sums (NULL when the denominator is
    * empty). Output: (strataCol, n_docs, n_chars, ws_tokens,
    * subword_tokens, chars_per_token, tokens_per_word).
    */
  def tokenizerFertility(df: DataFrame, idCol: String, textCol: String,
                         strataCol: String, tokenCounts: DataFrame,
                         countCol: String = "bpe_tokens"): DataFrame =
    df.select(col(idCol).as("id"), col(strataCol),
        length(col(textCol)).cast("long").as("__nc"),
        TextFunctions.wordCount(col(textCol)).cast("long").as("__ws"))
      .join(tokenCounts.select(col("id"),
        col(countCol).cast("long").as("__st")), Seq("id"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("__nc").as("n_chars"),
        sum("__ws").as("ws_tokens"),
        sum("__st").as("subword_tokens"))
      .select(col(strataCol), col("n_docs"), col("n_chars"),
        col("ws_tokens"), col("subword_tokens"),
        when(col("subword_tokens") > 0,
          col("n_chars").cast("double") /
            col("subword_tokens").cast("double")).as("chars_per_token"),
        when(col("ws_tokens") > 0,
          col("subword_tokens").cast("double") /
            col("ws_tokens").cast("double")).as("tokens_per_word"))
}
