package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pair left/right rows on equal `keys` with the
  * right timestamp inside a trailing window of the left timestamp —
  * `lTs - window < rTs <= lTs` (timestamps as epoch longs).
  *
  * Catalyst turns a raw inequality join into an equi-join on `keys`
  * followed by a per-key cross product — quadratic in the hot keys.
  * Banding restores a pure equi-join: bucket both sides by
  * `window`-sized bands, explode the LEFT side to its two candidate
  * bands (any right row in range lies in the left row's band or the one
  * before), join on (keys, band), then apply the exact range predicate.
  * Each row meets only the rows of two bands, so the blowup is bounded
  * by band occupancy, not key cardinality — the standard interval-join
  * strategy in streaming engines.
  */
object RangeJoin {

  /** Pairs (all left columns + all right columns) with
    * `rTs in (lTs - windowTicks, lTs]`. `lTs`/`rTs` are epoch-long
    * columns in the same unit as `windowTicks`. Column names must be
    * disjoint across the two inputs (rename before calling). */
  def trailingWindowPairs(left: DataFrame, right: DataFrame,
                          keys: Seq[String], lTs: String, rTs: String,
                          windowTicks: Long): DataFrame = {
    require(windowTicks > 0, s"windowTicks must be positive: $windowTicks")
    // integer `div`, not `/`: float division of large epoch ticks would
    // round before the cast truncates
    val l = left.withColumn("__band",
      explode(array(expr(s"$lTs div $windowTicks") - 1,
        expr(s"$lTs div $windowTicks"))))
    val r = right.withColumn("__band", expr(s"$rTs div $windowTicks"))
    l.join(r, keys :+ "__band")
      .filter(col(rTs) > col(lTs) - windowTicks && col(rTs) <= col(lTs))
      .drop("__band")
  }

  /** INTERVAL-OVERLAP join: pair left/right rows on equal `keys` whose
    * [start, end] ranges (inclusive, epoch longs) intersect —
    * `lStart <= rEnd && rStart <= lEnd`. The range-range generalization
    * of [[trailingWindowPairs]]' point-in-range shape.
    *
    * Both sides explode to every `bandTicks`-sized band their interval
    * covers (`len/band + 1` rows each — bounded by interval length, a
    * pipeline constant) and equi-join on (keys, band). DEDUP-FREE by
    * construction: an overlapping pair is kept only in its FIRST shared
    * band — `floor(max(starts)/band)`, which both intervals provably
    * cover when they overlap — so no post-join `distinct` shuffles the
    * pair stream. Per-key cross products never form; blowup is band
    * occupancy, the interval-join strategy streaming engines use.
    *
    * Rows with NULL bounds or end < start cannot overlap anything and
    * are dropped. Column names must be disjoint across inputs. */
  def intervalOverlapPairs(left: DataFrame, right: DataFrame,
                           keys: Seq[String],
                           lStart: String, lEnd: String,
                           rStart: String, rEnd: String,
                           bandTicks: Long): DataFrame = {
    require(bandTicks > 0, s"bandTicks must be positive: $bandTicks")
    def banded(df: DataFrame, s: String, e: String) =
      df.filter(col(s).isNotNull && col(e).isNotNull && col(e) >= col(s))
        .withColumn("__band",
          explode(sequence(expr(s"$s div $bandTicks"),
            expr(s"$e div $bandTicks"))))
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), keys :+ "__band")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__band") === greatest(expr(s"$lStart div $bandTicks"),
          expr(s"$rStart div $bandTicks")))
      .drop("__band")
  }
}
