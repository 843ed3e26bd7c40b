package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-based context expansion around search hits.
  *
  * The reference expands each hit one chunk at a time (`idx±1, ±2, ...`)
  * with per-row SQL fetches until a character budget is exhausted,
  * hard-stopping at `maxChars * 1.2`
  * (/root/reference/src/services/LibSQLDatabase.ts:459-535). That loop is
  * a row-store artifact. Here the same semantics run as ONE distributed
  * plan: join hits to their document's chunks within a window, order
  * neighbors by distance from the hit, take a running character sum, and
  * cut where the budget (with the 20% overflow tolerance) is crossed.
  * One shuffle on the doc key; no driver round-trips — the operator cost
  * is O(hits × window), independent of corpus size.
  */
object ContextExpansion {

  /** @param hits     (docCol, idxCol) rows to expand — plus any carry-through cols
    * @param chunks   (docCol, idxCol, contentCol) corpus
    * @param window   max neighbor distance considered either side
    * @param maxChars character budget; neighbors admitted in distance
    *                 order while running total < maxChars, with a hard
    *                 stop at 1.2 * maxChars (reference overflow rule)
    * @return one row per hit: doc, hit_idx, start_index, end_index,
    *         n_chunks, context (ordered concatenation)
    */
  def expand(hits: DataFrame, chunks: DataFrame, docCol: String,
             idxCol: String, contentCol: String,
             window: Int, maxChars: Int): DataFrame = {
    val h = hits.select(col(docCol).as("doc"), col(idxCol).as("hit_idx"))
    val c = chunks.select(col(docCol).as("doc"), col(idxCol).as("c_idx"),
      col(contentCol).as("content"))

    val joined = h.join(c, Seq("doc"))
      .filter(abs(col("c_idx") - col("hit_idx")) <= window)
      .withColumn("dist", abs(col("c_idx") - col("hit_idx")))

    // neighbors in distance order (after before: idx asc tie-break, i.e.
    // the earlier chunk is admitted first at equal distance)
    val w = Window.partitionBy("doc", "hit_idx")
      .orderBy(col("dist"), col("c_idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val budgeted = joined
      .withColumn("running_chars", sum(length(col("content"))).over(w))
      // the hit chunk itself (dist 0) is always kept; a neighbor is kept
      // if the budget wasn't exhausted before it and the hard cap holds
      .filter(col("dist") === 0 ||
        (col("running_chars") - length(col("content")) < maxChars &&
          col("running_chars") <= (maxChars * 1.2).toInt))

    budgeted
      .groupBy("doc", "hit_idx")
      .agg(
        min(col("c_idx")).as("start_index"),
        max(col("c_idx")).as("end_index"),
        count(lit(1)).as("n_chunks"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("c_idx"), col("content")))),
            s => s.getField("content"))).as("context"))
  }

  /** Generic neighbor expansion over an event sequence: for each hit row,
    * pull the `window` preceding/following rows in `orderCol` order within
    * the same `partCol` group. Returns (part, hit_ord, ord, payload cols). */
  def neighbors(df: DataFrame, partCol: String, orderCol: String,
                isHit: Column, window: Int): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCol)
    val ranked = df.withColumn("ord", row_number().over(w))
    val hits = ranked.filter(isHit)
      .select(col(partCol), col("ord").as("hit_ord"))
    hits.join(ranked, Seq(partCol))
      .filter(abs(col("ord") - col("hit_ord")) <= window)
  }
}
