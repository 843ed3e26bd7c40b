package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece unigram model): the OTHER tokenizer
  * family next to BPE ([[BpeTraining]]). Pieces carry probabilities; a
  * word's tokenization is the Viterbi-best segmentation under them.
  *
  * This implementation is the deterministic Viterbi-EM variant with
  * INTEGER scaled costs (the [[LangId]] discipline):
  *
  *   cost(x) = round(−10000 · ln p(x))  (StrictMath.log — reproducible)
  *
  * so segmentation compares integer sums with a (cost, pieces) lexical
  * tie-break — zero float accumulation freedom, and the DuckDB oracle
  * replays the exact DP over a literal piece table
  * ([[oracleSql]]: a recursive-CTE Viterbi with the combined
  * `cost*2^20 + n` key). The packing requires words shorter than 2^20
  * codepoints (guarded loudly in [[viterbi]]/[[segment]] — real corpora
  * DO contain 1000+-codepoint unbroken tokens, base64 blobs and URLs,
  * which the former *1000 packing silently mod-wrapped; ADVICE r13).
  *
  * Training loop (alternating Viterbi-EM and pruning, all
  * deterministic):
  *   1. seed vocab: every ≤ `maxPieceLen`-codepoint substring of the
  *      corpus words, weighted by word count; top `seedFactor ×
  *      vocabSize` by (freq desc, piece asc) + every single codepoint.
  *   2. E-step: Viterbi-segment each vocab word under current costs
  *      (map over the word vocab with the broadcast cost table — never
  *      the corpus); usage(piece) += wordCount. M-step: p = usage/Σ,
  *      recost; unused multi-codepoint pieces drop, unused single
  *      codepoints stay at a floor (coverage guarantee).
  *   3. prune: keep the top `max(vocabSize, ¾·|V|)` pieces by
  *      (usage desc, piece asc) + all single codepoints; repeat until
  *      |V| ≤ vocabSize, then one final EM round.
  *
  * Scale shape: like BPE's — every pass is WORD-VOCAB-sized (Heaps-law
  * sublinear), the corpus is read once for word counts and once per
  * seed pass; piece tables broadcast (vocabSize ≤ a few hundred KB).
  * Job count is rounds-bounded (~2 jobs per EM round), not vocab-bound.
  */
object UnigramLm {

  /** One vocabulary piece with its scaled integer cost. */
  case class Piece(piece: String, cost: Long)

  /** Cost of an unknown single codepoint (coverage fallback) — larger
    * than any trained cost, same constant in the oracle DP. */
  val UnkCost: Long = 1000000L

  val CostScale: Double = 10000.0

  /** Radix of the combined Viterbi key `cost*Pack + nPieces`. 2^20 keeps
    * the count field intact for words up to ~1M codepoints (vs the old
    * 1000, which a long base64 token overran silently), while the cost
    * field stays overflow-free: worst-case cost ≤ n·UnkCost, so
    * key ≤ 2^20·2^20·10^6 < 2^63 within the guarded range. */
  val Pack: Long = 1L << 20

  private def guardLen(n: Int, word: String): Unit =
    require(n < Pack,
      s"unigram Viterbi word of $n codepoints exceeds the key packing " +
        s"limit ($Pack); pre-split pathological tokens before tokenizing " +
        s"(head: ${word.take(40)}...)")

  private def cps(word: String): Array[String] = {
    val a = word.codePoints().toArray
    Array.tabulate(a.length)(i => new String(a, i, 1))
  }

  /** Integer Viterbi over codepoints: minimal (cost, nPieces) lexical
    * pair; unknown single codepoints cost [[UnkCost]]. Returns
    * (totalCost, nTokens). Matches the oracle DP exactly (combined
    * key = cost*[[Pack]] + n, length-guarded). */
  def viterbi(word: String, costs: java.util.HashMap[String, Long],
              maxPieceLen: Int): (Long, Int) = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return (0L, 0)
    guardLen(n, word)
    val dp = new Array[Long](n + 1) // combined key cost*Pack + n
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        val sub = c.slice(i - l, i).mkString
        val pc = costs.getOrDefault(sub, -1L)
        val stepCost = if (pc >= 0) pc else if (l == 1) UnkCost else -1L
        if (stepCost >= 0) {
          val k = (dp(i - l) / Pack + stepCost) * Pack + (dp(i - l) % Pack + 1)
          if (k < best) best = k
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    (dp(n) / Pack, (dp(n) % Pack).toInt)
  }

  /** Train the piece vocabulary over `textCol`'s whitespace-lowercase
    * words. Deterministic; returns pieces sorted by (cost asc, piece
    * asc). */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, seedFactor: Int = 4,
            emRounds: Int = 2): Seq[Piece] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .localCheckpoint()
    // seed: substring frequencies, weighted by word count
    val subFreq = words.flatMap { case (w, wc) =>
      val c = cps(w)
      for {
        i <- c.indices
        l <- 1 to math.min(maxPieceLen, c.length - i)
      } yield (c.slice(i, i + l).mkString, wc)
    }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
      .as[(String, Long)]
      .localCheckpoint()
    val chars = subFreq.filter(r => r._1.codePointCount(0, r._1.length) == 1)
      .collect().toMap
    val seedTop = subFreq
      .orderBy(desc("c"), asc("p")).limit(seedFactor * vocabSize)
      .collect().toMap
    var vocab: Map[String, Long] = seedTop ++ chars // freq table
    def recost(freq: Map[String, Long]): Map[String, Long] = {
      val total = freq.values.sum.toDouble
      freq.map { case (p, f) =>
        val prob = if (f > 0) f.toDouble / total else 0.5 / total
        p -> math.round(-CostScale * StrictMath.log(prob))
      }
    }
    var costs = recost(vocab)
    var done = false
    while (!done) {
      // E-step over the WORD VOCAB (distributed; costs broadcast)
      val bc = spark.sparkContext.broadcast {
        val m = new java.util.HashMap[String, Long]()
        costs.foreach { case (p, c) => m.put(p, c) }
        m
      }
      val usage = words.flatMap { case (w, wc) =>
        segment(w, bc.value, maxPieceLen).map(p => (p, wc))
      }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
        .as[(String, Long)].collect().toMap
      // single codepoints always survive (coverage); multi-codepoint
      // pieces compete by (usage desc, piece asc) for the shrinking
      // budget: 25% off per round, floored at the final size — strict
      // progress while above budget, so the loop always terminates
      val charUsage = chars.keys.map(ch => ch -> usage.getOrElse(ch, 0L)).toMap
      val multi = usage.toSeq
        .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
        .sortBy { case (p, u) => (-u, p) }
      val budget = math.max(vocabSize - charUsage.size, 0)
      val target = math.max(budget, (multi.size * 3) / 4)
      done = multi.size <= budget
      vocab = multi.take(target).toMap ++ charUsage
      costs = recost(vocab)
    }
    // final EM passes to settle probabilities on the final vocabulary
    var r = 0
    while (r < emRounds) {
      val bc = spark.sparkContext.broadcast {
        val m = new java.util.HashMap[String, Long]()
        costs.foreach { case (p, c) => m.put(p, c) }
        m
      }
      val usage = words.flatMap { case (w, wc) =>
        segment(w, bc.value, maxPieceLen).map(p => (p, wc))
      }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
        .as[(String, Long)].collect().toMap
      val freq = vocab.map { case (p, _) => p -> usage.getOrElse(p, 0L) }
      costs = recost(freq)
      r += 1
    }
    words.unpersist(); subFreq.unpersist()
    costs.toSeq.map { case (p, c) => Piece(p, c) }
      .sortBy(p => (p.cost, p.piece))
  }

  /** The Viterbi-best segmentation (pieces in order) — backtracking
    * variant of [[viterbi]], same DP and tie-break. */
  def segment(word: String, costs: java.util.HashMap[String, Long],
              maxPieceLen: Int): Seq[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    guardLen(n, word)
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var bestL = 1
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        val sub = c.slice(i - l, i).mkString
        val pc = costs.getOrDefault(sub, -1L)
        val stepCost = if (pc >= 0) pc else if (l == 1) UnkCost else -1L
        if (stepCost >= 0) {
          val k = (dp(i - l) / Pack + stepCost) * Pack + (dp(i - l) % Pack + 1)
          if (k < best) { best = k; bestL = l }
        }
        l += 1
      }
      dp(i) = best; back(i) = bestL
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      out += c.slice(pos - back(pos), pos).mkString
      pos -= back(pos)
    }
    out.reverse.toSeq
  }

  /** Per-document token counts under a trained piece table — map-only
    * (native expression, task-local cost map). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  pieces: Seq[Piece], maxPieceLen: Int = 6): DataFrame = {
    val counts = org.apache.spark.sql.GraftBridge.column(
      graft.plans.UnigramTokenCount(
        org.apache.spark.sql.GraftBridge.expression(lower(col(textCol))),
        pieces.map(p => (p.piece, p.cost)), maxPieceLen))
    df.select(col(idCol).as("id"), coalesce(counts, lit(0L)).as("ulm_tokens"))
  }

  /** DuckDB oracle: the integer Viterbi DP as a recursive CTE over the
    * DISTINCT word vocab (combined `cost*Pack + n` key — prototype-
    * validated), pieces as a literal VALUES table, token counts joined
    * back to per-doc word occurrences (the q116 shape). */
  /** The shared integer-Viterbi CTE block (recursive DP over distinct
    * words): ends at `ulm` = one row per source-table row,
    * (id, ulm_tokens). Consumers append their own final SELECT (q121's
    * per-row counts, q136's per-language fertility aggregate). */
  def oracleSqlCtes(table: String, idCol: String, textCol: String,
                    pieces: Seq[Piece], maxPieceLen: Int = 6): String = {
    def esc(s: String) = s.replace("'", "''")
    val rows = pieces.sortBy(p => (p.piece))
      .map(p => s"('${esc(p.piece)}', ${p.cost}::BIGINT)")
      .mkString(",\n        ")
    s"""pieces(p, c) AS (VALUES
        $rows),
      w AS (
        SELECT $idCol AS id,
          unnest(list_filter(string_split_regex(lower($textCol), '\\s+'),
            x -> x <> '')) AS w
        FROM $table),
      v AS (SELECT DISTINCT w FROM w),
      lens(l) AS (SELECT unnest(generate_series(1, $maxPieceLen))),
      step(w, i, dp) AS (
        SELECT w, 0, CAST([0] AS BIGINT[]) FROM v
        UNION ALL
        SELECT s.w, s.i + 1, list_append(s.dp, best.k)
        FROM step s,
        LATERAL (
          SELECT min((s.dp[s.i + 2 - l.l] // ${Pack} +
                      coalesce((SELECT c FROM pieces pc
                                WHERE pc.p = substr(s.w, s.i + 2 - l.l, l.l)),
                               CASE WHEN l.l = 1 THEN ${UnkCost} END)) * ${Pack}
                     + (s.dp[s.i + 2 - l.l] % ${Pack} + 1)) AS k
          FROM lens l WHERE l.l <= s.i + 1
        ) best
        WHERE s.i < length(s.w)),
      tok AS (
        SELECT w, dp[length(w) + 1] % ${Pack} AS nt
        FROM step WHERE i = length(w)),
      t AS (SELECT w.id, tok.nt FROM w JOIN tok ON tok.w = w.w),
      ulm AS (
        SELECT d.$idCol AS id, CAST(coalesce(sum(t.nt), 0) AS BIGINT) AS ulm_tokens
        FROM $table d LEFT JOIN t ON t.id = d.$idCol
        GROUP BY d.$idCol)"""
  }

  def oracleSql(table: String, idCol: String, textCol: String,
                pieces: Seq[Piece], maxPieceLen: Int = 6): String =
    s"""
      WITH RECURSIVE
      ${oracleSqlCtes(table, idCol, textCol, pieces, maxPieceLen)}
      SELECT id AS $idCol, ulm_tokens FROM ulm ORDER BY id"""
}
