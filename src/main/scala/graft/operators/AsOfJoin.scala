package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row with `right.ts <= left.ts` on the same keys (SQL `ASOF JOIN`,
  * kdb `aj`). Spark has no native operator for this.
  *
  * Implemented as union + carry-forward window rather than a range join:
  * tag both inputs, sort each key group by (ts, side), and let
  * `last(..., ignoreNulls)` over an unbounded-preceding frame carry the
  * latest right payload onto every left row. One shuffle on the keys,
  * O(n log n) per group — no candidate-pair blowup, no per-row probe.
  * At corpus scale this is the only shape that survives: a naive
  * inequality join is a per-key cross product, and windowing the right
  * side per left row re-sorts per query. Right rows at equal ts sort
  * before left (inclusive <=); callers needing a deterministic winner
  * among equal-ts right rows should pre-dedup to one row per (keys, ts).
  */
object AsOfJoin {

  /** `payloadCols` of the latest right row (ts <= left ts) appended to
    * every left row (null when no prior right row exists — left join
    * semantics). `left`/`right` must share `keys`; `ts` columns must be
    * mutually comparable (use epoch longs for exactness). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns $payloadCols collide with left columns")

    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        payloadCols.map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        payloadCols.map(c => lit(null).as(c)) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // right (side 0) sorts before left (side 1) at equal ts -> inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .select(
        (keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
          col("__side")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
