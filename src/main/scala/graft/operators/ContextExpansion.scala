package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-based context expansion around search hits.
  *
  * The reference expands each hit one chunk at a time with per-row SQL
  * fetches: the BEFORE side fills first (idx-1, idx-2, ... while the
  * running total — separators included — is under `maxChars` and
  * admitting the next chunk stays under `maxChars * 1.2`), then the
  * AFTER side continues from that total; pieces join with "\n"
  * (/root/reference/src/services/LibSQLDatabase.ts:459-535). That loop
  * is a row-store artifact; here the same admit sequence runs as ONE
  * distributed plan — group each hit's neighbors, fold the before list
  * (nearest first) then the after list through the identical
  * budget/cap conditions with `aggregate`, and slice the admitted
  * range. One shuffle on the doc key; no driver round-trips — operator
  * cost is O(hits × window), independent of corpus size.
  */
object ContextExpansion {

  /** @param hits     (docCol, idxCol) rows to expand — plus any carry-through cols
    * @param chunks   (docCol, idxCol, contentCol) corpus
    * @param window   max neighbor distance considered either side — a
    *                 cost bound; the reference walks until the budget
    *                 stops it, so size this above maxChars/minChunkChars
    * @param maxChars character budget (reference semantics: before side
    *                 fills first, separators count, hard cap 1.2×)
    * @return one row per hit with a target chunk: doc, hit_idx,
    *         start_index, end_index, n_chunks, context ("\n"-joined)
    */
  def expand(hits: DataFrame, chunks: DataFrame, docCol: String,
             idxCol: String, contentCol: String,
             window: Int, maxChars: Int): DataFrame = {
    // distinct: duplicate hits would multiply neighbor rows through the
    // join and pollute the folded admit lists
    val h = hits.select(col(docCol).as("doc"), col(idxCol).as("hit_idx"))
      .distinct()
    val c = chunks.select(col(docCol).as("doc"), col(idxCol).as("c_idx"),
      col(contentCol).as("content"))

    // inner join + window filter, then LEFT-join the grouped result back
    // onto the hits: every input hit yields an output row — a chunk-less
    // doc, a missing target, or a doc whose chunks all fall outside the
    // window (e.g. a stale hit after chunk removal) each produce the
    // empty-context row (start=end=hit) instead of vanishing
    val joined = h.join(c, Seq("doc"))
      .filter(abs(col("c_idx") - col("hit_idx")) <= window)

    val grouped = joined.groupBy("doc", "hit_idx").agg(
      max(when(col("c_idx") === col("hit_idx"), length(col("content"))))
        .as("target_len"),
      // before neighbors nearest-first (idx desc == -idx asc)
      array_sort(collect_list(when(col("c_idx") < col("hit_idx"),
        struct((-col("c_idx")).cast("long").as("k"),
          length(col("content")).as("len")))))
        .as("before"),
      array_sort(collect_list(when(col("c_idx") > col("hit_idx"),
        struct(col("c_idx").cast("long").as("k"),
          length(col("content")).as("len")))))
        .as("after"),
      array_sort(collect_list(when(col("c_idx").isNotNull,
        struct(col("c_idx"), col("content")))))
        .as("all_chunks"))

    // the reference's admit loop as a fold: admit while total < maxChars
    // AND total + len <= 1.2*maxChars; each admitted piece adds its
    // length PLUS the "\n" separator to the running total. The walk
    // breaks at the FIRST missing index (the reference fetches idx-1,
    // idx-2, ... and stops on an empty result) — `nxt` tracks the only
    // admissible next key, so a gap in the ordinals stops the fold
    // instead of skipping past it. A missing target never admits
    // (total is null -> condition null -> stop).
    def admitFold(listCol: Column, init: Column): Column =
      aggregate(listCol, init, (acc, x) => {
        val total = acc.getField("total")
        val cnt = acc.getField("cnt")
        val stopped = acc.getField("stopped")
        val nxt = acc.getField("nxt")
        val len = x.getField("len").cast("long")
        when(!stopped && x.getField("k") === nxt && total < maxChars &&
          (total + len).cast("double") <= lit(maxChars * 1.2),
          struct((total + len + 1L).as("total"), (cnt + 1).as("cnt"),
            lit(false).as("stopped"), (nxt + 1L).as("nxt")))
          .otherwise(struct(total.as("total"), cnt.as("cnt"),
            lit(true).as("stopped"), nxt.as("nxt")))
      })

    // hits with no surviving neighbor rows re-enter here with null
    // aggregate columns; the folds propagate the null and the coalesces
    // below produce the empty-context row
    val folded = h.join(grouped, Seq("doc", "hit_idx"), "left")
      .withColumn("b", admitFold(col("before"),
        struct(col("target_len").cast("long").as("total"),
          lit(0).as("cnt"), lit(false).as("stopped"),
          (lit(1L) - col("hit_idx").cast("long")).as("nxt"))))
      .withColumn("a", admitFold(col("after"),
        struct(col("b.total").as("total"),
          lit(0).as("cnt"), lit(false).as("stopped"),
          (col("hit_idx").cast("long") + 1L).as("nxt"))))
      .withColumn("start_index", col("hit_idx") - coalesce(col("b.cnt"), lit(0)))
      .withColumn("end_index", col("hit_idx") + coalesce(col("a.cnt"), lit(0)))

    folded
      .withColumn("kept", filter(col("all_chunks"), s =>
        s.getField("c_idx") >= col("start_index") &&
          s.getField("c_idx") <= col("end_index")))
      .select(col("doc"), col("hit_idx"),
        col("start_index"), col("end_index"),
        coalesce(size(col("kept")), lit(0)).cast("long").as("n_chunks"),
        // concat_ws never returns null, so a null kept list reads as ""
        concat_ws("\n", transform(col("kept"), s => s.getField("content")))
          .as("context"))
  }

  /** Generic neighbor expansion over an event sequence: for each hit row,
    * pull the `window` preceding/following rows in `orderCols` order
    * within the same `partCol` group. Pass a composite key (e.g.
    * Seq(sec, event_id)) — a non-unique single key makes row_number, and
    * therefore the neighborhoods, nondeterministic. `hitCarry` renames
    * hit-row columns onto the output (e.g. "event_id" -> "hit_event_id")
    * so callers can group per hit. Returns (part, hitCarry..., hit_ord,
    * all df cols, ord). */
  def neighbors(df: DataFrame, partCol: String, orderCols: Seq[Column],
                isHit: Column, window: Int,
                hitCarry: Seq[(String, String)] = Nil): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCols: _*)
    val ranked = df.withColumn("ord", row_number().over(w))
    val hits = ranked.filter(isHit)
      .select((col(partCol) +:
        hitCarry.map { case (c, a) => col(c).as(a) } :+
        col("ord").as("hit_ord")): _*)
    hits.join(ranked, Seq(partCol))
      .filter(abs(col("ord") - col("hit_ord")) <= window)
  }
}
