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
    * mutually comparable (use epoch longs for exactness).
    *
    * SQL join semantics on the keys: NULL never matches NULL — null-key
    * left rows get null payloads (a bare window partition would group
    * them together). All payload columns are carried as ONE struct
    * tagged per right row, so (a) they always come from the same right
    * row and (b) a genuinely-NULL payload value on the latest right row
    * stays NULL instead of falling through to a staler row. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns $payloadCols collide with left columns")
    // internal scratch names and the carried right columns must not
    // collide with either input, or the union silently corrupts rows
    val reserved = Seq("__ts", "__side", "__payload", "__last")
    val allInput = leftCols ++ right.columns
    require(!reserved.exists(allInput.contains),
      s"reserved column names ${reserved.filter(allInput.contains)} present in inputs")

    val someNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val outCols = keys ++ leftCols.filterNot(keys.contains) ++ payloadCols

    val r = right.filter(!someNullKey).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        Seq(struct(payloadCols.map(col): _*).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val l = left.filter(!someNullKey).select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        Seq(lit(null).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // right (side 0) sorts before left (side 1) at equal ts -> inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l, allowMissingColumns = false)
      .withColumn("__last", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => col(s"__last.$c").as(c))): _*)

    val unmatched = left.filter(someNullKey).select(
      (keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payloadCols.map(c => lit(null).as(c))): _*)

    matched.unionByName(unmatched).select(outCols.map(col): _*)
  }
}
