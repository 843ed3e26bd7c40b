package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** LITERAL suffix-array construction — closing COVERAGE.md's last
  * "deliberate exclusion". Lee et al. 2022 ("Deduplicating Training
  * Data Makes Language Models Better") build their ExactSubstr dedup on
  * a corpus-wide suffix array; this engine's certified k-gram tier
  * (`TextAnalysis.substringDedup`, q82/q83) covers the published
  * operating point, and THIS module supplies the literal structure for
  * the regimes that want it (arbitrary-length repeats, no fixed k at
  * build time).
  *
  * Construction is prefix doubling (Manber & Myers 1990) expressed as
  * Spark-sortable rounds: rank(i) at step h orders suffixes by their
  * first 2^h tokens; each round sorts (rank(i), rank(i+2^h)) pairs and
  * re-ranks — O(log n) rounds, each a distributed sort of n integer
  * triples, never materializing suffix text. The LCP array is Kasai et
  * al. 2001, a linear scan over the rank/SA pair (driver-side over the
  * collected arrays — the SA itself is int-sized, 8 bytes/token, so a
  * driver pass holds ~10⁸ tokens/GB; the distributed analog is a
  * segmented scan and is NOT needed below the collect envelope this
  * module documents).
  *
  * ExactSubstr surface: `duplicatedIntervals` marks every token
  * position inside a repeat of length ≥ minLen (an LCP-threshold scan),
  * which `SubstringDedupSpec`-style property tests pin as EXACTLY the
  * position-coverage the certified k-gram tier computes — the two
  * implementations certify each other.
  */
object SuffixArray {

  /** Suffix array of an int-token sequence via prefix doubling.
    * Deterministic; ties beyond the sequence end rank as -1 (smaller
    * than any token rank). Driver-side reference implementation — the
    * distributed rounds below reproduce it bit-for-bit. */
  def buildLocal(tokens: Array[Int]): Array[Int] = {
    val n = tokens.length
    if (n == 0) return Array.empty
    var rank = {
      // initial ranks = dense ranks of single tokens
      val sortedVals = tokens.distinct.sorted
      val m = sortedVals.zipWithIndex.toMap
      tokens.map(m)
    }
    var sa = (0 until n).toArray
    var h = 1
    var done = false
    while (!done) {
      def key(i: Int): (Int, Int) =
        (rank(i), if (i + h < n) rank(i + h) else -1)
      sa = sa.sortBy(key)
      val newRank = new Array[Int](n)
      var r = 0
      newRank(sa(0)) = 0
      var j = 1
      while (j < n) {
        if (key(sa(j)) != key(sa(j - 1))) r += 1
        newRank(sa(j)) = r
        j += 1
      }
      rank = newRank
      done = r == n - 1 || h >= n
      h *= 2
    }
    sa
  }

  /** Distributed prefix doubling over a Dataset of (pos, token) rows —
    * each round is ONE range-sort of (r1, r2, pos) triples plus a
    * rank-assignment pass; log2(n) rounds. Returns (rank, pos) rows,
    * rank 0-based: the suffix array is the pos column ordered by rank.
    * Bit-identical to [[buildLocal]] (spec-pinned). */
  def build(spark: SparkSession, tokens: Dataset[(Long, Int)]): DataFrame = {
    import spark.implicits._
    val n = tokens.count()
    if (n == 0L)
      return spark.emptyDataset[(Long, Long)].toDF("rank", "pos")
    // initial ranks: dense rank of token values
    val vals = tokens.toDF("pos", "tok")
    val tokRanks = vals.select("tok").distinct()
      .orderBy("tok").rdd.map(_.getInt(0)).zipWithIndex()
      .toDF("tok", "r")
    var ranks = vals.join(tokRanks, "tok").select(col("pos"), col("r"))
      .as[(Long, Long)].toDF("pos", "r")
      .localCheckpoint()
    var h = 1L
    var done = false
    while (!done) {
      val shifted = ranks.select((col("pos") - h).as("pos"), col("r").as("r2"))
      val paired = ranks
        .join(shifted, Seq("pos"), "left")
        .select(col("pos"), col("r"), coalesce(col("r2"), lit(-1L)).as("r2"))
      // one global sort; dense re-rank via the distributed prefix trick:
      // rank = (row_number over the sort) collapsed to key-equal groups.
      // zipWithIndex gives the global order; the boundary collapse is a
      // self-join-free window-free pass: first row of each (r, r2) group
      // carries the group rank = min index
      val sorted = paired.orderBy("r", "r2", "pos")
        .rdd.zipWithIndex()
        .map { case (row, i) =>
          (row.getLong(0), row.getLong(1), row.getLong(2), i) }
        .toDF("pos", "r", "r2", "idx")
        .localCheckpoint()
      val groupBase = sorted.groupBy("r", "r2").agg(min("idx").as("base"))
      val next = sorted.join(groupBase, Seq("r", "r2"))
        .select(col("pos"), col("base").as("r"))
        .localCheckpoint()
      val distinctRanks = groupBase.count()
      ranks.unpersist()
      sorted.unpersist()
      ranks = next
      done = distinctRanks == n || h >= n
      h *= 2
    }
    // final ranks are min-index bases (not dense 0..n-1); densify by the
    // same order — bases are already totally ordered when distinct == n
    ranks.orderBy("r").rdd.zipWithIndex()
      .map { case (row, i) => (i, row.getLong(0)) }
      .toDF("rank", "pos")
  }

  /** Per-document word-suffix ranks — the oracle-facing surface
    * (q123): for each doc, rank every token position by the suffix of
    * the token sequence starting there, via [[buildLocal]] over the
    * doc's dense word ranks. Space-joined-string order equals tokenwise
    * order (tokens never contain chars below 0x20, and the space
    * separator sorts below every token char), which is what lets DuckDB
    * replay the ranking as a plain string sort. Map-only per doc. */
  def docSuffixRanks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        graft.functions.TextFunctions.tokens(lower(col(textCol))).as("t"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, toks) =>
        val distinctSorted = toks.distinct.sorted
        val rankOf = distinctSorted.zipWithIndex.toMap
        val ints = toks.map(rankOf).toArray
        buildLocal(ints).zipWithIndex.map { case (pos, r) =>
          (id, r.toLong + 1L, pos.toLong + 1L) // 1-based, SQL-friendly
        }
      }
      .toDF("doc_id", "suffix_rank", "pos")
  }

  /** Kasai et al. 2001 LCP array: lcp(j) = longest common prefix of
    * sa(j) and sa(j−1), linear time. */
  def lcpLocal(tokens: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = tokens.length
    if (n == 0) return Array.empty
    val rank = new Array[Int](n)
    for (j <- sa.indices) rank(sa(j)) = j
    val lcp = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val pj = sa(rank(i) - 1)
        while (i + k < n && pj + k < n && tokens(i + k) == tokens(pj + k)) k += 1
        lcp(rank(i)) = k
        if (k > 0) k -= 1
      } else k = 0
      i += 1
    }
    lcp
  }

  /** Every token position lying inside a repeat of length ≥ minLen —
    * the ExactSubstr coverage set: adjacent-suffix LCPs ≥ minLen mark
    * both suffixes' first lcp tokens as duplicated. Returns a sorted
    * position array. */
  def duplicatedPositions(tokens: Array[Int], minLen: Int): Array[Int] = {
    val sa = buildLocal(tokens)
    val lcp = lcpLocal(tokens, sa)
    val dup = new java.util.TreeSet[Integer]()
    var j = 1
    while (j < sa.length) {
      val l = lcp(j)
      if (l >= minLen) {
        var o = 0
        while (o < l) { dup.add(sa(j) + o); dup.add(sa(j - 1) + o); o += 1 }
      }
      j += 1
    }
    val out = new Array[Int](dup.size())
    val it = dup.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
