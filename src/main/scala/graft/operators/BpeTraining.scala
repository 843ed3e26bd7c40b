package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BPE merge-table training (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the last
  * COVERAGE.md exclusion, now executable.
  *
  * The algorithm is a driver loop over DISTRIBUTED pair counts:
  *
  *   1. word vocab: one distributed groupBy over the corpus — from here
  *      on, every pass touches the VOCAB (Heaps-law sublinear in corpus
  *      size), never the corpus again.
  *   2. per round: explode adjacent symbol pairs weighted by word count
  *      (map-side partial aggregation), pick the argmax pair with a
  *      deterministic (count desc, left asc, right asc) tie-break —
  *      the driver sees exactly ONE row per round — and merge that
  *      pair in every vocab entry (map-only).
  *
  * The sequential part (the merge order) is inherent to BPE; what
  * matters at 100 TB is that each round is vocab-sized, the pair
  * explode partial-aggregates before its shuffle, and the corpus is
  * read once. Lineage is truncated per round (localCheckpoint) so 50
  * rounds do not stack 50 plan copies.
  *
  * Application (tokenization) uses the classic equivalence: applying
  * merges sequentially in RANK ORDER, each left-to-right over the
  * word, yields the same segmentation as priority-queue application —
  * any pair a later merge creates can only be merged by an
  * even-later-ranked rule, because training learned the rules in the
  * same sequential process.
  */
object BpeTraining {

  /** One learned merge: `left`+`right` fuse into one symbol. */
  case class BpeMerge(rank: Int, left: String, right: String, count: Long)

  /** End-of-word marker symbol (separate symbol, Sennrich-style). */
  val Eow = "</w>"

  /** Split a word into initial symbols: one per codepoint, plus the
    * end-of-word marker. */
  def initialSymbols(word: String): Seq[String] =
    word.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp))) :+ Eow

  /** One left-to-right pass merging occurrences of (l, r). */
  def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Tokenize one word under a trained merge table (rank order). */
  def applyMerges(word: String, merges: Seq[BpeMerge]): Seq[String] =
    merges.foldLeft(initialSymbols(word)) { (s, m) => mergePair(s, m.left, m.right) }

  /** Train a merge table over `textCol`'s whitespace-lowercase words.
    * Stops early when no pair reaches `minPairCount`. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[BpeMerge] = {
    val spark = df.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (initialSymbols(w), c) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // adjacent-pair counts, weighted by word frequency; the orderBy +
      // limit(1) compiles to TakeOrderedAndProject — only ONE row ever
      // reaches the driver
      val best = vocab.flatMap { case (syms, c) =>
        var i = 0
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        while (i + 1 < syms.length) { b += ((syms(i), syms(i + 1), c)); i += 1 }
        b
      }.toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      best.headOption match {
        case Some(row) if row.getLong(2) >= minPairCount =>
          val (l, r, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += BpeMerge(rank, l, r, cnt)
          val old = vocab
          vocab = vocab.map { case (syms, c) => (mergePair(syms, l, r), c) }
            .localCheckpoint()
          old.unpersist()
          rank += 1
        case _ => done = true
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Per-document BPE token counts under a trained table — map-only
    * (the merge table is task-local state, like LangId's profiles). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[BpeMerge]): DataFrame = {
    val scores = org.apache.spark.sql.GraftBridge.column(
      graft.plans.BpeTokenCount(
        org.apache.spark.sql.GraftBridge.expression(lower(col(textCol))),
        merges.map(m => (m.left, m.right))))
    df.select(col(idCol).as("id"), coalesce(scores, lit(0L)).as("bpe_tokens"))
  }

  /** DuckDB oracle: replay the SAME merge table as a chain of literal
    * `replace` calls over a space-delimited symbol encoding.
    *
    * Encoding invariant: every symbol carries its OWN leading and
    * trailing space — `' ' || join(chars, '  ') || ' '` — so the
    * pattern `' l  r '` → `' lr '` (a) can never match across symbol
    * boundaries or inside longer symbols, and (b) never consumes a
    * neighbor's delimiter, so ADJACENT occurrences both merge in one
    * left-to-right replace pass — exactly BPE's merge semantics — and
    * the invariant survives each step for the next replace in the
    * chain. Tokens cannot contain spaces (they are whitespace-split),
    * so the encoding is unambiguous for any input. */
  def oracleSql(table: String, idCol: String, textCol: String,
                merges: Seq[BpeMerge]): String = {
    def esc(s: String) = s.replace("'", "''")
    val chain = merges.foldLeft("sym") { (acc, m) =>
      s"replace($acc, ' ${esc(m.left)}  ${esc(m.right)} ', ' ${esc(m.left + m.right)} ')"
    }
    s"""
      WITH w AS (
        SELECT $idCol AS id,
          unnest(list_filter(string_split_regex(lower($textCol), '\\s+'),
            x -> x <> '')) AS w
        FROM $table),
      s AS (
        SELECT id, ' ' || array_to_string(
            list_transform(generate_series(1, length(w)), i -> w[i]) || ['${Eow}'],
            '  ') || ' ' AS sym
        FROM w),
      t AS (SELECT id,
              len(list_filter(string_split($chain, ' '), x -> x <> '')) AS nt
            FROM s)
      SELECT d.$idCol, CAST(coalesce(sum(t.nt), 0) AS BIGINT) AS bpe_tokens
      FROM $table d LEFT JOIN t ON t.id = d.$idCol
      GROUP BY d.$idCol ORDER BY d.$idCol"""
  }
}
