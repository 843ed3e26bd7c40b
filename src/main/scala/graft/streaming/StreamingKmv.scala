package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING distinct-cardinality monitor: the KMV sketch
  * ([[graft.operators.CorpusStats.kmvDistinct]]) maintained over an
  * unbounded item stream — "how many distinct n-grams / urls /
  * fingerprints has ingest seen so far" with O(k) state, where exact
  * streaming `approx_count_distinct` state is engine-private and an
  * exact distinct grows with the vocabulary.
  *
  * The k-minimum-value set is a COMMUTATIVE, IDEMPOTENT monoid (merge
  * = union → keep k smallest), so the streaming sketch is EXACTLY the
  * batch sketch over the same rows under any arrival order, batching,
  * or duplication — not an approximation of it (the spec asserts
  * equality against the batch operator, not a tolerance). Same
  * portable hash ⇒ the live estimate also matches what a DuckDB
  * replay of the batch form would print.
  *
  * One state group holds the k longs (a monitor, not a data pipe):
  * per trigger every hash routes to the one state partition, each
  * probing the k-set in O(log k). For corpus-scale ingest, bucket the
  * hash space upstream into several groups and union-merge their
  * k-sets at read time — the monoid merge is exact, so sharding
  * changes nothing but parallelism.
  *
  * Emits one snapshot row per trigger: (n_seen_hashes, n_tracked,
  * kth_hash, est_distinct) — est = (k−1)·2³²/h_(k), exact count when
  * fewer than k distinct hashes exist.
  */
object StreamingKmv {

  case class KmvState(mins: Array[Long], nSeen: Long)
  case class KmvSnapshot(n_seen_hashes: Long, n_tracked: Long,
                         kth_hash: Long, est_distinct: Double)

  def distinctEstimate(items: DataFrame, itemCol: String, k: Int = 256)
      : Dataset[KmvSnapshot] = {
    require(k >= 2, "k must be >= 2")
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(TextFunctions.portableHash32(col(itemCol).cast("string"))
        .as("h"))
      .as[Long]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(k))
  }

  private def update(k: Int)(key: Int, rows: Iterator[Long],
                             state: GroupState[KmvState])
      : Iterator[KmvSnapshot] = {
    val set = scala.collection.mutable.TreeSet.empty[Long]
    var nSeen = 0L
    if (state.exists) {
      set ++= state.get.mins
      nSeen = state.get.nSeen
    }
    rows.foreach { h =>
      nSeen += 1
      if (!set.contains(h)) {
        if (set.size < k) set += h
        else if (h < set.max) { set -= set.max; set += h }
      }
    }
    state.update(KmvState(set.toArray, nSeen))
    val n = set.size
    val kth = if (n == 0) 0L else set.max
    val est =
      if (n < k) n.toDouble
      else (k - 1).toDouble * 4294967296.0 / kth.toDouble
    Iterator.single(KmvSnapshot(nSeen, n.toLong, kth, est))
  }
}
