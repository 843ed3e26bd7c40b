package graft.operators

import graft.SparkSpec

/** `Dedup.winnowedFingerprints` / `winnowingDupPairs` (Schleimer et al.
  * 2003 robust winnowing) against a driver-side replica, plus the
  * paper's coverage guarantee: a shared substring of length ≥ w + k − 1
  * always shares at least one fingerprint.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5
  private val w = 4

  /** Driver replica: positional k-gram hashes, rightmost window minima,
    * distinct (pos, hash). */
  private def brute(text: String): Set[(Long, Long)] = {
    val t = text.toLowerCase
    val m = t.length - (k - 1)
    if (m < 1) return Set.empty
    val hs = (1 to m).map(i => md5Hash32(t.substring(i - 1, i - 1 + k)))
    val wins = math.max(m - (w - 1), 1)
    (1 to wins).map { j =>
      var bv = Long.MaxValue; var bp = 0L
      for (o <- 0 until w; p = j + o; if p <= m)
        if (hs(p - 1) <= bv) { bv = hs(p - 1); bp = p }
      (bp, bv)
    }.toSet
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    Dedup.winnowedFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, w)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("fingerprints equal the driver replica, including short-doc edges") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "abcd", // shorter than k -> no fingerprints
      3L -> "abcde", // exactly one gram, shorter than w+k-1 -> one window
      4L -> "abcdefg", // m=3 < w -> still one window
      5L -> "aaaaaaaaaaaa") // all grams equal: rightmost tie-break per window
    val got = run(docs)
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == brute(t), s"doc $id")
    }
    assert(!got.contains(2L))
    assert(got(3L).size == 1)
  }

  test("a shared substring of length w+k-1 shares at least one fingerprint value") {
    val shared = "zqxwvutsrq" // w+k-1 = 8 <= 10 chars
    val a = s"prefix one $shared suffix alpha"
    val b = s"completely different start $shared and tail"
    val got = run(Seq(1L -> a, 2L -> b))
    val va = got(1L).map(_._2); val vb = got(2L).map(_._2)
    assert((va & vb).nonEmpty)
  }

  test("dup pairs: jaccard matches the fingerprint-set replica; hot values excluded from pairing") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy cat today",
      3L -> "entirely unrelated content with no overlap at all")
    val pairs = Dedup.winnowingDupPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", k, w, minShared = 1L, maxDocFreq = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("jaccard"),
          r.getAs[Long]("n_adm_a"), r.getAs[Long]("n_adm_b"),
          r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toMap
    val fa = brute(docs(0)._2).map(_._2); val fb = brute(docs(1)._2).map(_._2)
    val inter = (fa & fb).size.toLong
    assert(inter >= 1)
    assert(pairs((1L, 2L))._1 == inter)
    assert(math.abs(pairs((1L, 2L))._2 -
      inter.toDouble / (fa.size + fb.size - inter)) < 1e-12)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // admitted-set sizes ride along (ADVICE r12): n_adm <= n_fp, and at
    // maxDocFreq=64 on this corpus nothing is hot, so the bound is
    // tight exactly when n_adm counts all shared-eligible values
    val (_, _, admA, admB, nA, nB) = pairs((1L, 2L))
    assert(admA <= nA && admB <= nB && admA >= inter && admB >= inter)
    // maxDocFreq = 1 admits nothing (every shared value is in >= 2 docs)
    assert(Dedup.winnowingDupPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", k, w, minShared = 1L, maxDocFreq = 1L).count() == 0L)
  }
}
