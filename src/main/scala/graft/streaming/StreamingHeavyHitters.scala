package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING heavy-hitter detection: Misra-Gries summaries over an
  * unbounded item stream, with BOUNDED state — the hot-key/boilerplate
  * monitor an ingest pipeline runs continuously (which n-grams, URLs,
  * or fingerprints are suddenly flooding the crawl?), where the batch
  * tier ([[graft.operators.HeavyHitters]]) would re-scan history every
  * run and an exact streaming `groupBy(item).count()` grows state with
  * the vocabulary.
  *
  * Items hash into `buckets` groups; each group's state is ONE
  * Misra-Gries summary of at most `maxTracked` counters plus its
  * decrement-round and item totals — per-bucket state is O(maxTracked)
  * regardless of stream length or vocabulary. Per micro-batch each
  * updated bucket re-emits its candidate snapshot (update output
  * mode; the sink upserts by (bucket, item)).
  *
  * The classical guarantee survives streaming because the summary is
  * sequential within its bucket: after any prefix of the stream,
  * `cnt <= true count <= cnt + dec`, and every item whose true count
  * in its bucket exceeds `dec` (<= n_bucket / (maxTracked+1)) is
  * PRESENT in the snapshot — a flood can hide from one micro-batch
  * but not from the summary. Exact counts for the shortlisted
  * candidates are a stateless downstream recount (the batch
  * [[graft.operators.HeavyHitters.heavyItems]] second phase), kept
  * out of stream state.
  *
  * 100 TB shape: buckets shard the state across executors (set
  * `buckets` ≳ executor count); the per-item path is one hash-map
  * probe. Retention is the stream's: swap `NoTimeout` for a
  * processing-time TTL to age summaries on a bounded horizon.
  */
object StreamingHeavyHitters {

  case class MgState(items: Array[String], counts: Array[Long],
                     dec: Long, n: Long)

  /** Candidate snapshot rows: (bucket, item, cnt, dec, n) — `cnt` the
    * summary's lower bound, `cnt + dec` the upper bound, `n` items
    * seen by the bucket so far. */
  case class Candidate(bucket: Int, item: String, cnt: Long, dec: Long,
                       n: Long)

  def heavyItemCandidates(items: DataFrame, itemCol: String,
                          buckets: Int = 64, maxTracked: Int = 1000)
      : Dataset[Candidate] = {
    require(buckets > 0, "buckets must be positive")
    require(maxTracked > 0, "maxTracked must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(pmod(xxhash64(col(itemCol).cast("string")), lit(buckets))
        .cast("int").as("bucket"),
        col(itemCol).cast("string").as("item"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(maxTracked))
  }

  private def update(maxTracked: Int)(
      bucket: Int, rows: Iterator[(Int, String)],
      state: GroupState[MgState]): Iterator[Candidate] = {
    val counts = new java.util.HashMap[String, Long](maxTracked * 2)
    var dec = 0L
    var n = 0L
    if (state.exists) {
      val s = state.get
      var i = 0
      while (i < s.items.length) { counts.put(s.items(i), s.counts(i)); i += 1 }
      dec = s.dec; n = s.n
    }
    while (rows.hasNext) {
      val x = rows.next()._2
      n += 1
      val c = counts.get(x)
      if (c != 0L) counts.put(x, c + 1)
      else if (counts.size < maxTracked) counts.put(x, 1L)
      else {
        // Misra-Gries decrement round; the arriving item is absorbed
        // by the round (all tracked -1, it stays untracked)
        dec += 1
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    val ks = new Array[String](counts.size)
    val vs = new Array[Long](counts.size)
    var i = 0
    counts.forEach { (k, v) => ks(i) = k; vs(i) = v; i += 1 }
    state.update(MgState(ks, vs, dec, n))
    val d = dec; val t = n
    (0 until ks.length).iterator.map(j => Candidate(bucket, ks(j), vs(j), d, t))
  }
}
