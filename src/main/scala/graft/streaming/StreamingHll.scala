package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING distinct-cardinality monitor #2: the HyperLogLog sketch
  * ([[graft.operators.CorpusStats.hllDistinct]]) maintained over an
  * unbounded item stream — the FIXED-state companion to
  * [[StreamingKmv]] (2^p register bytes forever vs KMV's k hashes;
  * at equal memory HLL's error is lower, KMV's estimate additionally
  * supports the set-algebra tier).
  *
  * The register array is a COMMUTATIVE, IDEMPOTENT monoid (merge =
  * per-bucket max), so the streaming sketch equals the batch sketch
  * over the same rows under any arrival order, batching, or
  * duplication — and the estimator runs the IDENTICAL double
  * arithmetic (the harmonic sum is dyadic-exact in any fold order;
  * α_m and the linear-counting `ln` evaluate the same literals through
  * the same Math.log), so the spec asserts bit-for-bit equality with
  * the batch operator, not a tolerance.
  *
  * One state group holds the 2^p ints (a monitor, not a data pipe);
  * for corpus-scale ingest shard the hash space upstream and max-merge
  * the register arrays at read time ([[graft.operators.CorpusStats
  * .hllMerge]] is the batch-side form of the same merge).
  *
  * Emits one snapshot per trigger: (n_seen_hashes, n_hit, n_zero,
  * est_distinct) — the batch operator's columns plus the row count.
  */
object StreamingHll {

  case class HllState(regs: Array[Int], nSeen: Long)
  case class HllSnapshot(n_seen_hashes: Long, n_hit: Long, n_zero: Long,
                         est_distinct: Double)

  def distinctEstimate(items: DataFrame, itemCol: String, p: Int = 8)
      : Dataset[HllSnapshot] = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(TextFunctions.portableHash32(col(itemCol).cast("string"))
        .as("h"))
      .as[Long]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(p))
  }

  private def update(p: Int)(key: Int, rows: Iterator[Long],
                             state: GroupState[HllState])
      : Iterator[HllSnapshot] = {
    val m = 1 << p
    val wBits = 32 - p
    val wMod = 1L << wBits
    val regs = if (state.exists) state.get.regs.clone()
      else Array.fill(m)(0)
    var nSeen = if (state.exists) state.get.nSeen else 0L
    rows.foreach { h =>
      nSeen += 1
      val bucket = (h / wMod).toInt
      val w = h % wMod
      val rho = if (w == 0L) wBits + 1
        else wBits + 1 - java.lang.Long.toBinaryString(w).length
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    state.update(HllState(regs, nSeen))
    // the identical estimator arithmetic as the batch hllEstimate:
    // harmonic sum of 2^-M over NON-empty registers + nZero ones
    // (dyadic-exact in any order), α_m from the same literals, the
    // same linear-counting branch through the same Math.log
    var nHit = 0L
    var sHit = 0.0
    var b = 0
    while (b < m) {
      if (regs(b) > 0) { nHit += 1; sHit += math.pow(2.0, -regs(b)) }
      b += 1
    }
    val nZero = m.toLong - nHit
    val s = sHit + nZero.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val raw = alpha * m.toDouble * m.toDouble / s
    val est = if (raw <= 2.5 * m && nZero > 0)
      m.toDouble * math.log(m.toDouble / nZero.toDouble)
    else raw
    Iterator.single(HllSnapshot(nSeen, nHit, nZero, est))
  }
}
