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

  /** Tokenize one word under a trained merge table (rank order) — the
    * REFERENCE apply: every merge swept left-to-right in rank order.
    * O(merges × len); [[applyMergesFast]] is the production apply. */
  def applyMerges(word: String, merges: Seq[BpeMerge]): Seq[String] =
    merges.foldLeft(initialSymbols(word)) { (s, m) => mergePair(s, m.left, m.right) }

  /** Rank lookup for [[applyMergesFast]] — build ONCE per merge table
    * and reuse across rows (the subword-nmt `bpe_ranks` dict). */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + "\u0000" + r, i)
    }
    m
  }

  /** Production apply: repeatedly merge the LOWEST-RANK pair present,
    * occurrences left-to-right within a rank (lazy-deletion heap over a
    * linked symbol list) — O((len + merges-applied) × log len) per word
    * REGARDLESS of table size, vs [[applyMerges]]'s O(table × len)
    * (a 32k-merge vocab makes the naive sweep the next day-one wall
    * after training, the same argument as trainBatched).
    *
    * Exactly ≡ [[applyMerges]]: a pair learned at rank j can never
    * reappear after a higher-rank merge fires, because any pair a
    * rank-m merge creates contains the rank-m fused symbol, and a rule
    * whose component IS that symbol must have been learned after rank m
    * — so processing ranks monotonically never misses a lower-rank
    * occurrence. Property-pinned in BpeTrainingSpec. */
  def applyMergesFast(word: String,
                      ranks: java.util.HashMap[String, Int]): Seq[String] = {
    val init = initialSymbols(word)
    val n = init.length
    if (n < 2 || ranks.isEmpty) return init
    val sym = new Array[String](n)
    init.copyToArray(sym)
    val prev = Array.tabulate(n)(_ - 1)
    val next = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    val alive = Array.fill(n)(true)
    // getOrDefault, NOT get: a Scala Int-valued java map unboxes an
    // absent-key null to 0 — which would rank every unknown pair first
    def rankOf(i: Int, j: Int): Int =
      ranks.getOrDefault(sym(i) + "\u0000" + sym(j), Int.MaxValue)
    // heap of (rank, leftPos); lazy deletion — validate on pop
    val heap = new java.util.PriorityQueue[(Int, Int)](
      (a: (Int, Int), b: (Int, Int)) => {
        val c = Integer.compare(a._1, b._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      })
    var i = 0
    while (i < n - 1) {
      val r = rankOf(i, i + 1)
      if (r != Int.MaxValue) heap.add((r, i))
      i += 1
    }
    var count = n
    while (!heap.isEmpty) {
      val (r, li) = heap.poll()
      val ri = if (li >= 0 && alive(li)) next(li) else -1
      if (ri != -1 && alive(ri) && rankOf(li, ri) == r) {
        sym(li) = sym(li) + sym(ri)
        alive(ri) = false
        count -= 1
        val rn = next(ri)
        next(li) = rn
        if (rn != -1) prev(rn) = li
        val lp = prev(li)
        if (lp != -1) {
          val nr = rankOf(lp, li)
          if (nr != Int.MaxValue) heap.add((nr, lp))
        }
        if (rn != -1) {
          val nr = rankOf(li, rn)
          if (nr != Int.MaxValue) heap.add((nr, li))
        }
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](count)
    var c = 0
    while (c != -1) { if (alive(c)) out += sym(c); c = next(c) }
    out.toSeq
  }

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

  /** Driver-local sequential BPE over a collected (word, count) vocab —
    * the REFERENCE semantics (argmax with (count desc, left asc, right
    * asc) tie-break, recount between merges), used (a) as the oracle the
    * batched trainer is property-pinned against and (b) as the small-
    * vocab fast path of [[trainAuto]]. O(numMerges × totalSymbols). */
  def trainLocal(words: Seq[(String, Long)], numMerges: Int,
                 minPairCount: Long = 2L): Seq[BpeMerge] = {
    // incremental pair-delta counting (the classic fast-BPE loop): a
    // merge only touches words that contain the pair, so counts update
    // by ± the affected words' pair multisets instead of a full recount.
    // `occurs` is an APPROXIMATE index (stale entries allowed, checked
    // on touch); argmax is a flat scan of the live count table.
    val syms = words.map { case (w, _) => initialSymbols(w).toArray }.toArray
    val wc = words.map(_._2).toArray
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.BitSet]
    def addWord(i: Int, sign: Long): Unit = {
      val s = syms(i)
      val c = wc(i) * sign
      var j = 0
      while (j + 1 < s.length) {
        val k = (s(j), s(j + 1))
        val n = counts.getOrElse(k, 0L) + c
        if (n == 0L) counts.remove(k) else counts(k) = n
        if (sign > 0)
          occurs.getOrElseUpdate(k, scala.collection.mutable.BitSet.empty) += i
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { addWord(i, 1L); i += 1 }
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var done = false
    while (merges.size < numMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        var bl: String = null; var br: String = null; var bc = Long.MinValue
        counts.foreachEntry { case ((pl, pr), c) =>
          if (c > bc || (c == bc && (pl < bl || (pl == bl && pr < br)))) {
            bl = pl; br = pr; bc = c
          }
        }
        if (bc < minPairCount) done = true
        else {
          merges += BpeMerge(merges.size, bl, br, bc)
          val hit = occurs.getOrElse((bl, br), scala.collection.mutable.BitSet.empty)
          for (w <- hit.toArray) {
            val s = syms(w)
            var has = false
            var j = 0
            while (!has && j + 1 < s.length) {
              has = s(j) == bl && s(j + 1) == br; j += 1
            }
            if (has) { // stale-index check
              addWord(w, -1L)
              syms(w) = mergePair(s, bl, br).toArray
              addWord(w, 1L)
            }
          }
          occurs.remove((bl, br))
        }
      }
    }
    merges.toSeq
  }

  /** Batched trainer: EXACTLY the sequential merge table, ~B merges per
    * round instead of 1 — the fix for sequential `train`'s ~2 Spark jobs
    * per merge (a real 32k-merge vocab would be ~1e5 jobs).
    *
    * Per round (3 jobs, each vocab-sized):
    *   1. pair counts → global top-`candK` to the driver (TakeOrdered).
    *   2. The driver takes the maximal *prefix* of the sorted candidates
    *      that is pairwise non-interacting — no shared symbol, and no
    *      fused string `l+r` of one occurring as a symbol of another —
    *      capped at `batchMax`. Prefix-ness matters: a skipped
    *      interacting candidate may keep its count after the earlier
    *      merges, so sequential could pick it next; truncating at the
    *      first interaction removes that case. Under the prefix
    *      condition, merges 1..j cannot create or destroy occurrences of
    *      batch pair j+1, so its counted value is still exact when
    *      sequential would reach it.
    *   3. ONE map pass applies the batch in rank order per word. The
    *      only remaining way sequential could diverge is PREEMPTION: a
    *      pair involving a just-fused string (which is where all new or
    *      grown pairs live — merging l,r→f only rewires adjacencies at f
    *      sites) out-ranking a later batch member. So the same pass
    *      emits, after each step j, every adjacent pair touching f_j
    *      with its exact count at that intermediate state; a small
    *      aggregation then computes the earliest batch step preempted by
    *      any such pair (counts only decay after emission except where a
    *      later step re-emits them, so emission-time counts are safe
    *      upper bounds — a flagged step is conservatively truncated).
    *      Violations re-apply the truncated prefix from the kept parent
    *      vocab (rare; correctness never depends on the flag being
    *      tight, only on truncating at or before the first true
    *      preemption).
    *
    * Scale shape: candidates to the driver = `candK` rows/round; the
    * emission volume is bounded by 2× the occurrences of the round's
    * fused symbols (≤ 2× total vocab symbols); everything else is the
    * same vocab-sized flatMap as sequential. */
  def trainBatched(df: DataFrame, textCol: String, numMerges: Int,
                   minPairCount: Long = 2L, batchMax: Int = 64,
                   candK: Int = 256,
                   /** telemetry hook: called once per round with
                     * (acceptedBatchSize, truncated) — SCALE.md's
                     * batch-profile evidence; no-op by default. */
                   onRound: (Int, Boolean) => Unit = (_, _) => ()): Seq[BpeMerge] = {
    val spark = df.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (initialSymbols(w), c) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var done = false
    while (merges.size < numMerges && !done) {
      val cand = vocab.flatMap { case (syms, c) =>
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i + 1 < syms.length) { b += ((syms(i), syms(i + 1), c)); i += 1 }
        b
      }.toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(candK)
        .as[(String, String, Long)].collect()

      // maximal non-interacting sorted PREFIX (stop at first interaction)
      val roundMax = math.min(batchMax, numMerges - merges.size)
      val batch = selectPrefix(cand, minPairCount, roundMax)
      if (batch.isEmpty) done = true
      else if (batch.length == 1) {
        // degenerate (tie-heavy) round: no later step to preempt, so
        // skip the emission scan and validation job — 2 jobs, exactly
        // sequential's cost shape
        val (l, r, cnt) = batch.head
        val old = vocab
        vocab = vocab.map { case (syms, c) => (mergePair(syms, l, r), c) }
          .localCheckpoint()
        old.unpersist()
        merges += BpeMerge(merges.size, l, r, cnt)
        onRound(1, false)
      }
      else {
        val batchPairs = batch.toArray.map { case (l, r, _) => (l, r) }
        val bcBatch = spark.sparkContext.broadcast(batchPairs)
        // one pass: apply batch in rank order; after each step j emit
        // every adjacent pair touching f_j at that intermediate state
        val staged = vocab.flatMap { case (syms, c) =>
          val bs = bcBatch.value
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Seq[String], Long, Int, String, String)]
          var cur = syms
          var j = 0
          while (j < bs.length) {
            val (l, r) = bs(j)
            cur = mergePair(cur, l, r)
            val f = l + r
            if (cur.contains(f)) {
              var i = 0
              while (i + 1 < cur.length) {
                if (cur(i) == f || cur(i + 1) == f)
                  out += ((1, null, c, j, cur(i), cur(i + 1)))
                i += 1
              }
            }
            j += 1
          }
          out += ((0, cur, c, -1, null, null))
          out.toSeq
        }.toDF("kind", "syms", "c", "step", "l", "r").localCheckpoint()

        // earliest batch step preempted by an emitted pair (exact
        // emission-time counts are upper bounds afterward)
        val ord = batch.toArray.map { case (l, r, cnt) => (cnt, l, r) }
        val bcOrd = spark.sparkContext.broadcast(ord)
        val violStep = staged.filter(col("kind") === 1)
          .groupBy("step", "l", "r").agg(sum("c").as("cnt"))
          .as[(Int, String, String, Long)]
          .flatMap { case (j, l, r, cnt) =>
            firstPreemptedStep(j, l, r, cnt, bcOrd.value)
          }.toDF("t").agg(min("t")).as[Option[Int]].head()

        val accepted = violStep.getOrElse(batch.length)
        val acceptedPairs = batch.take(accepted)
        val old = vocab
        vocab =
          if (accepted == batch.length)
            staged.filter(col("kind") === 0).select("syms", "c")
              .as[(Seq[String], Long)].localCheckpoint()
          else {
            // preemption flagged: re-apply only the safe prefix from the
            // kept parent vocab, then let the next round recount
            val safe = acceptedPairs.toArray.map { case (l, r, _) => (l, r) }
            val bcSafe = spark.sparkContext.broadcast(safe)
            old.map { case (syms, c) =>
              (bcSafe.value.foldLeft(syms) { case (s, (l, r)) => mergePair(s, l, r) }, c)
            }.localCheckpoint()
          }
        staged.unpersist()
        old.unpersist()
        val base = merges.size
        acceptedPairs.zipWithIndex.foreach { case ((l, r, cnt), i) =>
          merges += BpeMerge(base + i, l, r, cnt)
        }
        onRound(accepted, accepted < batch.length)
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Maximal prefix of the count-sorted candidate list that is pairwise
    * non-interacting: no shared symbol among selected pairs, and no
    * fused string `l+r` of one occurring as a symbol of another (string
    * identity IS symbol identity here, as in the oracle encoding). The
    * scan STOPS at the first interacting candidate rather than skipping
    * it — a skipped pair may keep its full count after the earlier
    * merges and would be sequential's next pick. Pure; unit-tested
    * directly in BpeTrainingSpec. */
  def selectPrefix(cand: Seq[(String, String, Long)], minPairCount: Long,
                   roundMax: Int): Seq[(String, String, Long)] = {
    val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val usedSyms = scala.collection.mutable.HashSet.empty[String]
    val usedFused = scala.collection.mutable.HashSet.empty[String]
    var stop = false
    var ci = 0
    while (!stop && ci < cand.length && batch.size < roundMax) {
      val (l, r, cnt) = cand(ci)
      val fused = l + r
      val interacts = usedSyms(l) || usedSyms(r) || usedFused(l) ||
        usedFused(r) || usedSyms(fused)
      if (cnt < minPairCount || interacts) stop = true
      else {
        batch += ((l, r, cnt))
        usedSyms += l; usedSyms += r; usedFused += fused
        ci += 1
      }
    }
    batch.toSeq
  }

  /** First batch step t > j that an emitted competitor (pair (l,r) with
    * count `cnt` observed after step j) would out-rank under the
    * (count desc, left asc, right asc) order. `ord(t)` is non-increasing
    * in t, so the first hit while scanning up is the earliest. Pure;
    * unit-tested directly in BpeTrainingSpec. */
  def firstPreemptedStep(j: Int, l: String, r: String, cnt: Long,
                         ord: Array[(Long, String, String)]): Option[Int] = {
    var t = j + 1
    var res: Option[Int] = None
    while (t < ord.length && res.isEmpty) {
      val (ct, lt, rt) = ord(t)
      val beats = cnt > ct || (cnt == ct && (l < lt || (l == lt && r < rt)))
      if (beats) res = Some(t)
      t += 1
    }
    res
  }

  /** Adaptive dispatch (the Components.scala precedent): collect-and-
    * train locally when the vocab is driver-sized, distributed batched
    * rounds otherwise. Both paths produce the identical merge table. */
  def trainAuto(df: DataFrame, textCol: String, numMerges: Int,
                minPairCount: Long = 2L,
                localMaxVocab: Long = 2000000L): Seq[BpeMerge] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = words.limit((localMaxVocab + 1).toInt).count()
    if (n <= localMaxVocab)
      trainLocal(words.as[(String, Long)].collect().toSeq, numMerges, minPairCount)
    else trainBatched(df, textCol, numMerges, minPairCount)
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
  /** DuckDB oracle for LARGE merge tables: same space-delimited symbol
    * encoding and replace semantics as [[oracleSql]], but the merge
    * chain is replayed by a recursive CTE indexed into two list
    * literals, so a 1000-merge table is 1000 iterations instead of
    * 1000-deep expression nesting. Replay runs over the DISTINCT word
    * vocab (Heaps-law small) and joins token counts back to per-doc
    * word occurrences. */
  def oracleSqlRecursive(table: String, idCol: String, textCol: String,
                         merges: Seq[BpeMerge]): String = {
    def esc(s: String) = s.replace("'", "''")
    val pats = merges.map(m => s"' ${esc(m.left)}  ${esc(m.right)} '")
      .mkString("[", ", ", "]")
    val reps = merges.map(m => s"' ${esc(m.left + m.right)} '")
      .mkString("[", ", ", "]")
    val m = merges.length
    s"""
      WITH RECURSIVE
      pat AS (SELECT $pats AS p, $reps AS q),
      w AS (
        SELECT $idCol AS id,
          unnest(list_filter(string_split_regex(lower($textCol), '\\s+'),
            x -> x <> '')) AS w
        FROM $table),
      v AS (SELECT DISTINCT w FROM w),
      s AS (
        SELECT w, ' ' || array_to_string(
            list_transform(generate_series(1, length(w)), i -> w[i]) || ['${Eow}'],
            '  ') || ' ' AS sym
        FROM v),
      steps AS (
        SELECT w, sym, 0 AS i FROM s
        UNION ALL
        SELECT steps.w, replace(steps.sym, pat.p[steps.i + 1], pat.q[steps.i + 1]),
               steps.i + 1
        FROM steps, pat WHERE steps.i < $m),
      tok AS (
        SELECT w, len(list_filter(string_split(sym, ' '), x -> x <> '')) AS nt
        FROM steps WHERE i = $m),
      t AS (SELECT w.id, tok.nt FROM w JOIN tok ON tok.w = w.w)
      SELECT d.$idCol, CAST(coalesce(sum(t.nt), 0) AS BIGINT) AS bpe_tokens
      FROM $table d LEFT JOIN t ON t.id = d.$idCol
      GROUP BY d.$idCol ORDER BY d.$idCol"""
  }

  /** The shared chain-replace CTE block: ends at `bpe` = one row per
    * source-table row, (id, bpe_tokens). Consumers append their own
    * final SELECT (q89's per-doc counts, q127's per-language
    * fertility aggregate). */
  def oracleSqlCtes(table: String, idCol: String, textCol: String,
                    merges: Seq[BpeMerge]): String = {
    def esc(s: String) = s.replace("'", "''")
    val chain = merges.foldLeft("sym") { (acc, m) =>
      s"replace($acc, ' ${esc(m.left)}  ${esc(m.right)} ', ' ${esc(m.left + m.right)} ')"
    }
    s"""w AS (
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
            FROM s),
      bpe AS (
        SELECT d.$idCol AS id, CAST(coalesce(sum(t.nt), 0) AS BIGINT) AS bpe_tokens
        FROM $table d LEFT JOIN t ON t.id = d.$idCol
        GROUP BY d.$idCol)"""
  }

  def oracleSql(table: String, idCol: String, textCol: String,
                merges: Seq[BpeMerge]): String =
    s"""
      WITH ${oracleSqlCtes(table, idCol, textCol, merges)}
      SELECT id AS $idCol, bpe_tokens FROM bpe ORDER BY id"""
}
