package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation aggregates for the model-based curation tier
  * ([[QualityClassifier]], and any scored gate): exact ROC-AUC and
  * threshold confusion tables, computed distributedly — a quality
  * filter is only as good as its measured operating point, so the
  * evaluation belongs in-engine next to the scorer.
  *
  * Scale design: AUC is the Mann-Whitney rank-sum statistic. A naive
  * `rank() OVER (ORDER BY score)` drags the corpus through one window
  * partition; instead the corpus first collapses to one row per
  * DISTINCT score (an ordinary shuffle aggregate — ties collapse, and
  * a real scorer's distinct-score table is far smaller than the
  * corpus), then [[Packing.packSequences]]'s distributed prefix sum
  * turns per-score counts into rank offsets without a global window.
  * All rank arithmetic is integer (average ranks are half-integers, so
  * the statistic is carried as 2× the rank sum) — exact under any
  * partitioning and summation order, unlike a floating rank sum. The
  * one double division happens once, at the end.
  *
  * Rank on the most deterministic column available
  * ([[QualityClassifier.scoreWithMargin]]'s `z`, not the sigmoid
  * score — the sigmoid stacks the exp library's 1-ulp freedom on top)
  * when cross-engine reproducibility matters.
  *
  * Envelope: the 2×rank-sum accumulator is bounded by 2·n·n_pos; past
  * ~10^9 positives × 10^9 rows it would need a decimal accumulator.
  */
object Evaluation {

  /** Exact ROC-AUC by rank-sum with average-rank tie handling.
    *
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum of the
    * positives' average ranks under ascending `scoreCol`. Returns one
    * row: (n_pos, n_neg, auc); `auc` is NULL when either class is
    * empty (undefined, not 0/0).
    *
    * @param labelCol 1/true = positive; cast to int internally.
    *                 NULL labels count as NEGATIVE (explicitly, via
    *                 coalesce — not by falling out of one aggregate
    *                 and not another)
    */
  def aucByRank(scored: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val per = scored
      .select(col(scoreCol).as("__s"),
        coalesce(col(labelCol).cast("int").cast("long"), lit(0L))
          .as("__l"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), sum("__l").as("__p"))
    // distributed prefix count over ascending score: cum_tokens is the
    // inclusive running row count, so the __c tied rows at this score
    // occupy ranks (cum-__c, cum] and their doubled average rank is
    // 2·(cum-__c) + __c + 1 — integer, exact
    val cum = Packing.packSequences(per, "__s", "__c",
      Seq(col("__s").asc), seqLen = 1L)
    cum
      .agg(
        sum(col("__p") *
          (lit(2L) * (col("cum_tokens") - col("__c")) + col("__c") + lit(1L)))
          .as("__r2"),
        sum("__p").as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** The full ROC curve: one point per DISTINCT score — (score,
    * tp, fp, tpr, fpr) where tp/fp count rows with score >= this one
    * (the "predict positive at threshold = score" operating point).
    *
    * Same machinery as [[aucByRank]]: collapse to per-distinct-score
    * counts, then BOTH cumulative counts ride one
    * [[Packing.prefixSums]] pass down the descending score (one range
    * shuffle, one checkpoint — two separate prefix passes cost double
    * for identical row order), two single divisions per row. Curve
    * size = distinct scores, not corpus rows. `tpr`/`fpr` are NULL
    * when their class is empty. */
  def rocCurve(scored: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val per = scored
      .select(col(scoreCol).as("score"),
        coalesce(col(labelCol).cast("int").cast("long"), lit(0L))
          .as("__l"))
      .groupBy("score")
      .agg(count(lit(1)).as("__c"), sum("__l").as("__p"))
      .withColumn("__neg", col("__c") - col("__p"))
    val cum = Packing.prefixSums(per, "score", Seq("__p", "__neg"),
        Seq(col("score").desc))
      .withColumnRenamed("cum___p", "tp")
      .withColumnRenamed("cum___neg", "fp")
    val totals = per.agg(sum("__p").as("__npos"),
      sum("__neg").as("__nneg"))
    cum.crossJoin(broadcast(totals))
      .select(col("score"), col("tp"), col("fp"),
        when(col("__npos") > 0,
          col("tp").cast("double") / col("__npos").cast("double"))
          .as("tpr"),
        when(col("__nneg") > 0,
          col("fp").cast("double") / col("__nneg").cast("double"))
          .as("fpr"))
  }

  /** Confusion counts and precision/recall at each threshold
    * (predicted positive ⇔ `scoreCol` >= threshold).
    *
    * One map-side-combined aggregate pass: the threshold list
    * cross-joins in as a broadcast literal table (|thresholds| × rows
    * expands only inside partial aggregation — the shuffle carries
    * |thresholds| rows per partition). Precision/recall are NULL when
    * their denominator is empty, each a single division.
    *
    * For cross-engine-stable thresholding, pass a score whose values
    * are boundary-safe against the thresholds (e.g. `round(score, 6)`
    * — the [[QualityClassifier]] oracle discipline). */
  def confusionAtThresholds(scored: DataFrame, scoreCol: String,
                            labelCol: String, thresholds: Seq[Double])
      : DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val spark = scored.sparkSession
    val th = broadcast(
      spark.createDataFrame(thresholds.map(Tuple1(_))).toDF("threshold"))
    scored
      .select(col(scoreCol).as("__s"),
        // NULL label = negative, consistently across all four cells
        // (a raw NULL would drop the row from tp but ALSO from fp/tn)
        coalesce(col(labelCol).cast("int").cast("long"), lit(0L))
          .as("__l"))
      .crossJoin(th)
      .groupBy("threshold")
      .agg(
        sum(when(col("__s") >= col("threshold"), col("__l"))
          .otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("threshold"), lit(1L) - col("__l"))
          .otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("threshold"), col("__l"))
          .otherwise(0L)).as("fn"),
        sum(when(col("__s") < col("threshold"), lit(1L) - col("__l"))
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"))
  }

  /** Rank-based lift/gains table — the classifier report card next to
    * the ROC: rows ranked by (`scoreCol` desc, `tieCol` asc) split into
    * `nBins` equal-depth bins (bin = ceil(rank·nBins/n), integer
    * ceiling division), per bin the positive count, positive rate,
    * cumulative capture (share of ALL positives found so far down the
    * ranking) and lift over the base rate.
    *
    * Everything before the final ratios is integer: the rank is the
    * [[Sampling.stratumRank]] distributed prefix rank (never a corpus
    * window), bin assignment is exact integer arithmetic, and each
    * ratio is ONE division of exact integer products —
    * lift = (p·N)/(n·P) as a single divide, NOT (p/n)/(P/N) — so every
    * value replays bit-identically in SQL. The cumulative pass runs
    * over ≤ nBins rows (bounded window).
    *
    * Rank on the margin `z`, not the sigmoid score, for cross-engine
    * order stability (the [[aucByRank]] discipline). Output:
    * (bin, n_docs, positives, pos_rate, cum_capture, lift), bin asc. */
  def liftTable(scored: DataFrame, scoreCol: String, labelCol: String,
                tieCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val ranked = Sampling.stratumRank(
      scored.select(col(scoreCol).as("__s"), col(tieCol).as("__t"),
        coalesce(col(labelCol).cast("int").cast("long"), lit(0L)).as("__l"))
        .withColumn("__all", lit("all")),
      "__all", Seq(col("__s").desc, col("__t").asc), "__rk", "__n")
    val perBin = ranked
      .withColumn("bin",
        expr(s"(__rk * $nBins + __n - 1) div __n")) // ceil(rk*nBins/n)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("__l").as("positives"),
        max("__n").as("__nt"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("__cum", sum("positives").over(w)) // ≤ nBins rows
      .crossJoin(broadcast(
        scored.agg(coalesce(sum(coalesce(col(labelCol).cast("int")
          .cast("long"), lit(0L))), lit(0L)).as("__tp"))))
      .select(col("bin"), col("n_docs"), col("positives"),
        (col("positives").cast("double") / col("n_docs").cast("double"))
          .as("pos_rate"),
        when(col("__tp") > 0,
          col("__cum").cast("double") / col("__tp").cast("double"))
          .as("cum_capture"),
        when(col("__tp") > 0,
          (col("positives") * col("__nt")).cast("double") /
            (col("n_docs") * col("__tp")).cast("double")).as("lift"))
  }
}
