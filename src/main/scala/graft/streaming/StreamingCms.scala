package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING point-frequency monitor: the Count-Min sketch
  * ([[graft.operators.CorpusStats.cmsTable]]) maintained over an
  * unbounded item stream — completing stream/batch parity for the
  * sketch tier (KMV order statistics / HLL cardinality / CMS
  * frequency each now has a GroupState monitor next to its certified
  * batch operator).
  *
  * The d×w counter grid is a COMMUTATIVE monoid under element-wise
  * addition, so the streaming sketch equals the batch table over the
  * same rows under any arrival order or batching — the spec asserts
  * estimate equality against the batch [[graft.operators.CorpusStats
  * .cmsEstimate]], not a tolerance — and the one-sided guarantee
  * (estimate ≥ truth) holds at every trigger. The item hashes compute
  * IN-PLAN with the batch side's own [[TextFunctions.portableHash32]]
  * chain (h1 + i·h2 mod w), so the streamed counters are
  * definitionally the batch counters; a persisted snapshot merges
  * with batch-built [[graft.operators.CorpusStats.cmsMerge]] states.
  *
  * One state group holds the d·w longs (a monitor, not a data pipe);
  * for corpus-scale ingest shard upstream and counter-sum the grids
  * at read time. Probes are passed UP FRONT (a monitor watches a
  * fixed probe set — e.g. contamination canaries or the hot tokens of
  * the last batch audit); each trigger emits one row per probe:
  * (n_seen, item, cms_est).
  */
object StreamingCms {

  case class CmsState(counters: Array[Long], nSeen: Long)
  case class CmsSnapshot(n_seen: Long, item: String, cms_est: Long)

  /** Driver-side mirror of [[TextFunctions.portableHash32]] (first 4
    * md5 bytes as an unsigned int) — used ONLY to place the fixed
    * probe set; the streamed items hash in-plan with the Catalyst
    * form itself. Equality is pinned in `StreamingCmsSpec`. */
  private[streaming] def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def frequencyEstimate(items: DataFrame, itemCol: String,
                        probes: Seq[String], d: Int = 4, w: Int = 512)
      : Dataset[CmsSnapshot] = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2, got d=$d w=$w")
    require(probes.nonEmpty, "a CMS monitor needs a probe set")
    val spark = items.sparkSession
    import spark.implicits._
    // probe cells precompute once on the driver: probes × d ints
    val probeCells = probes.map { it =>
      val h1 = h32(it); val h2 = h32("x|" + it)
      it -> (0 until d).map(r => (r * w + ((h1 + r * h2) % w)).toInt)
    }
    items
      .select(TextFunctions.portableHash32(col(itemCol).cast("string"))
          .as("h1"),
        TextFunctions.portableHash32(
          concat(lit("x|"), col(itemCol).cast("string"))).as("h2"))
      .filter(col("h1").isNotNull)
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(d, w, probeCells))
  }

  private def update(d: Int, w: Int,
                     probeCells: Seq[(String, Seq[Int])])(
      key: Int, rows: Iterator[(Long, Long)], state: GroupState[CmsState])
      : Iterator[CmsSnapshot] = {
    val counters = if (state.exists) state.get.counters.clone()
      else new Array[Long](d * w)
    var nSeen = if (state.exists) state.get.nSeen else 0L
    rows.foreach { case (h1, h2) =>
      nSeen += 1
      var r = 0
      while (r < d) {
        counters((r * w + ((h1 + r * h2) % w)).toInt) += 1L
        r += 1
      }
    }
    state.update(CmsState(counters, nSeen))
    val n = nSeen
    probeCells.iterator.map { case (it, cells) =>
      CmsSnapshot(n, it, cells.map(counters(_)).min)
    }
  }
}
