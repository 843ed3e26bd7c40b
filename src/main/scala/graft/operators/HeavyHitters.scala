package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** EXACT frequency heavy hitters over an item stream (tokens, n-grams,
  * URLs, hosts) without ever shuffling the full distinct-item space.
  *
  * The naive `GROUP BY item HAVING count >= T` shuffles one row per
  * distinct item per map partition — at 100 TB the n-gram vocabulary is
  * billions of keys and the shuffle IS the job. This operator runs two
  * phases instead:
  *
  *   1. **Candidate pre-pass** (map-only): each partition counts its
  *      items in a bounded Misra-Gries summary (`maxTracked` slots) and
  *      emits items whose local count could reach `ceil(T / P)` over the
  *      partition's stream. Pigeonhole: an item with GLOBAL count >= T
  *      spread over P partitions has local count >= ceil(T / P)
  *      somewhere, so the candidate union is a SUPERSET of the true
  *      heavy set. Misra-Gries undercounts by at most the number of
  *      decrement rounds `d`, so the emit bar is `count + d >= bar`,
  *      which preserves the superset; if `d` ever reaches the bar the
  *      summary can no longer certify absence and the pass FAILS LOUDLY
  *      (raise `maxTracked` — the [[Components]] fail-don't-lie
  *      precedent) rather than silently dropping a heavy item.
  *   2. **Exact verify**: the (small) candidate set broadcasts; a
  *      left-semi join drops every non-candidate item BEFORE the keyed
  *      shuffle, and an ordinary exact count + `>= T` filter runs over
  *      the thin survivor stream. False candidates from phase 1 cost
  *      only verify work, never correctness.
  *
  * Output is bit-identical to the naive GROUP BY (the oracle form); the
  * shuffle carries only candidate items. Memory: `maxTracked` entries
  * per task — the Misra-Gries guarantee needs
  * `maxTracked + 1 > partitionRows / bar`, which the loud failure
  * enforces at runtime instead of assuming.
  */
object HeavyHitters {

  /** Exact items with global count >= `threshold`.
    *
    * @param items      one row per item OCCURRENCE (pre-exploded)
    * @param itemCol    the item column (any comparable type)
    * @param threshold  minimum global count T (>= 1)
    * @param maxTracked Misra-Gries capacity per partition
    * @return (itemCol, cnt) — exact counts, only rows with cnt >= T
    */
  def heavyItems(items: DataFrame, itemCol: String, threshold: Long,
                 maxTracked: Int = 100000): DataFrame = {
    require(threshold >= 1, "threshold must be >= 1")
    require(maxTracked > 0, "maxTracked must be positive")
    val src = items.select(col(itemCol))
    val schema = src.schema
    // partition count of this exact (narrow, deterministic) plan — the
    // P in the pigeonhole bar; mapPartitions below runs the same plan
    val parts = math.max(src.rdd.getNumPartitions, 1)
    val bar = math.max(1L, (threshold + parts - 1) / parts)

    /** Misra-Gries over one partition's item stream; emits candidate
      * items. Specialized per key type below — the per-item path is a
      * single primitive-free hash probe, no Row/Any boxing. */
    def misraGries[K](it: Iterator[K]): Iterator[K] = {
      val counts = new java.util.HashMap[K, Long](maxTracked * 2)
      var dec = 0L // decrement rounds = max undercount of any item
      while (it.hasNext) {
        val x = it.next()
        val c = counts.get(x)
        if (c != 0L) counts.put(x, c + 1)
        else if (counts.size < maxTracked) counts.put(x, 1L)
        else {
          // Misra-Gries decrement round: every tracked count -1,
          // the incoming item is dropped as part of the round
          dec += 1
          val eit = counts.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            if (e.getValue <= 1L) eit.remove() else e.setValue(e.getValue - 1)
          }
        }
      }
      if (dec >= bar)
        throw new IllegalStateException(
          s"HeavyHitters pre-pass lost the superset guarantee: " +
            s"$dec decrement rounds >= local bar $bar. Raise maxTracked " +
            s"(currently $maxTracked) above partitionRows/bar.")
      val out = scala.collection.mutable.ArrayBuffer.empty[K]
      counts.forEach { (k, c) => if (c + dec >= bar) out += k }
      out.iterator
    }

    import org.apache.spark.sql.types.{LongType, StringType}
    val candidates = (schema.head.dataType match {
      case StringType =>
        src.mapPartitions(it => misraGries[String](
          it.map(_.getString(0))).map(Row(_)))(Encoders.row(schema))
      case LongType =>
        src.mapPartitions(it => misraGries[java.lang.Long](
          it.map(r => java.lang.Long.valueOf(r.getLong(0)))).map(Row(_)))(
          Encoders.row(schema))
      case _ =>
        src.mapPartitions(it => misraGries[Any](
          it.map(_.get(0))).map(Row(_)))(Encoders.row(schema))
    }).distinct()
    items.join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Heavy word n-grams (with multiplicity, lowercased whitespace
    * tokens) — the boilerplate/template-mining form: n-grams repeated
    * hundreds of times across a corpus are navigation chrome, license
    * headers, spam templates. Map-only explode feeds [[heavyItems]];
    * n = 1 is plain token frequency. */
  def heavyNgrams(df: DataFrame, textCol: String, n: Int, threshold: Long,
                  maxTracked: Int = 100000): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = TextFunctions.tokens(lower(col(textCol)))
    // n = 2 rides the shared zip-based pair construction (one slice of
    // the whole array, not one per position — measured ~2× cheaper than
    // the generic per-position form at sf0.1). Generic n: guard the
    // bounds — sequence(1, 0) would run DESCENDING in Spark, and
    // slice(_, 0, _) throws — short/NULL docs must yield no grams
    val grams =
      if (n == 1) toks
      else if (n == 2) transform(TextFunctions.bigramPairs(toks),
        p => concat(p.getField("prev"), lit(" "), p.getField("cur")))
      else when(size(toks) >= n,
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    heavyItems(df.select(explode(grams).as("ngram")), "ngram",
      threshold, maxTracked)
  }
}
