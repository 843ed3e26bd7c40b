package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Components, Dedup, Enrichment, Packing, Quantization, Quota, RangeJoin, Sampling, Skew, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators, round 2: deterministic sampling,
  * as-of / range joins over the event stream, TF-IDF, skew-salted
  * aggregation, int8-quantized vector search, per-source quotas.
  * Float-parity rules as in [[Q]]'s scaladoc; integer math end-to-end
  * wherever a sum crosses rows (quantized dots, epoch arithmetic).
  */
object PipelineQueries {

  /** Events projected to exact epoch-microsecond longs — all range/as-of
    * arithmetic stays in integer space (`epoch_us` on the DuckDB side). */
  private def eventsMicros(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(col("event_id"),
      unix_micros(col("ts")).as("tus"), col("user_id"), col("event_type"))

  /** SQL twins of the TextAnalysis tokenizer/stopword set (same
    * fragments as the q31/q32 oracles — the q59 composition restates
    * them per stage). */
  private def toksRawSql(c: String) =
    s"list_filter(string_split($c, ' '), x -> x <> '')"
  private val stopwordsSql = graft.functions.TextFunctions.stopWordsSql

  val all: Seq[Q] = Seq(

    // deterministic hash sampling: reproducible across runs, engines and
    // partitionings (a pure narrow filter — no shuffle at any scale)
    Q("q39_hash_sample", Some("""
      SELECT doc_id, lang, source FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 20
      ORDER BY doc_id"""),
      (s, d) => Sampling.hashSample(Tables.documents(s, d), col("doc_id"), 20)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // as-of join (backward): the latest click at-or-before each error by
    // the same user — union + carry-forward window, one shuffle, no
    // per-key cross product (DuckDB ASOF JOIN is the oracle)
    Q("q40_asof_click_before_error", Some("""
      WITH ev AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type FROM events),
      err AS (SELECT user_id, event_id AS error_id, tus AS err_tus FROM ev
              WHERE event_type = 'error'),
      clk AS (SELECT user_id, tus, max(event_id) AS click_id FROM ev
              WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT e.error_id, c.click_id, (e.err_tus - c.tus) // 1000000 AS gap_s
      FROM err e ASOF LEFT JOIN clk c
        ON e.user_id = c.user_id AND e.err_tus >= c.tus
      ORDER BY error_id"""),
      (s, d) => {
        val ev = eventsMicros(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"), col("tus").as("err_tus"))
        // one row per (user, ts): deterministic winner among equal-ts clicks
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "tus").agg(max("event_id").as("click_id"))
          .withColumn("click_tus", col("tus"))
        AsOfJoin.backward(errors, clicks, Seq("user_id"), "err_tus", "tus",
          Seq("click_id", "click_tus"))
          .withColumn("gap_s", expr("(err_tus - click_tus) div 1000000"))
          .select("error_id", "click_id", "gap_s")
          .orderBy("error_id")
      }),

    // TF-IDF: tf * ln(N/df), top term per doc (round-6 absorbs the
    // <=1-ulp libm-vs-StrictMath ln difference)
    Q("q44_tfidf_top_terms", Some("""
      WITH tok AS (SELECT doc_id,
          unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tok GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
      scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
          tf.tf * ln(n.n / dfreq.df) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      ranked AS (SELECT *, row_number() OVER
          (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored)
      SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf
      FROM ranked WHERE rn = 1 ORDER BY doc_id"""),
      (s, d) => TextAnalysis.topTfIdfTerm(Tables.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id")),

    // windowed event dedup (the batch form of streaming
    // dropDuplicatesWithinWatermark): collapse retries/refires to one
    // row per (user, type, minute)
    Q("q45_event_dedup", Some("""
      SELECT DISTINCT user_id, event_type,
        strftime(ts, '%Y-%m-%d %H:%M') AS minute
      FROM events ORDER BY user_id, event_type, minute"""),
      (s, d) => Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm").as("minute"))
        .dropDuplicates("user_id", "event_type", "minute")
        .orderBy("user_id", "event_type", "minute")),

    // skew-salted two-phase aggregation over the 5 hot event_type keys:
    // partials spread across 16 salt buckets, then merged — same result
    // as a direct GROUP BY (the oracle), immune to one-hot-key stragglers.
    // Sums in decimal (exact) — double sums are partition-order-sensitive
    Q("q46_salted_hot_keys", Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, d) => Skew.saltedAgg(
        Tables.events(s, d).select(col("event_type"),
          col("value").cast("decimal(18,2)").as("v")),
        Seq("event_type"), 16,
        partial = Seq(count(lit(1)).as("pn"), sum(col("v")).as("ps")),
        merge = Seq(sum(col("pn")).as("n_events"),
          sum(col("ps")).as("__total")))
        .select(col("event_type"), col("n_events"),
          col("__total").cast("double").as("total_value"))
        .orderBy("event_type")),

    // banded range join: clicks in the 10 minutes before each error by
    // the same user — equi-join on (user, time band), never a per-key
    // cross product (the oracle's inequality join IS that cross product)
    Q("q47_range_click_context", Some("""
      WITH ev AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type FROM events)
      SELECT e.event_id AS error_id, CAST(count(*) AS BIGINT) AS n_clicks
      FROM ev e JOIN ev c ON e.user_id = c.user_id
        AND e.event_type = 'error' AND c.event_type = 'click'
        AND c.tus > e.tus - 600000000 AND c.tus <= e.tus
      GROUP BY 1 ORDER BY 1"""),
      (s, d) => {
        val ev = eventsMicros(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"), col("tus").as("err_tus"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("tus").as("click_tus"))
        RangeJoin.trailingWindowPairs(errors, clicks, Seq("user_id"),
          "err_tus", "click_tus", 600000000L)
          .groupBy("error_id").agg(count(lit(1)).as("n_clicks"))
          .orderBy("error_id")
      }),

    // int8-quantized vector search (reference float8 index compression
    // analog): 4x smaller codes; integer dot products are exact and
    // order-independent, so results are bit-reproducible cross-engine
    Q("q48_quantized_knn", Some("""
      WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      sc AS (SELECT vec_id, label, v,
          127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS qs
        FROM base),
      qz AS (SELECT vec_id, label, list_transform(v, x -> floor(x * qs)) AS c FROM sc),
      q AS (SELECT c AS qc FROM qz WHERE vec_id = 0),
      s AS (SELECT vec_id, label,
          list_dot_product(c, qc) AS dot,
          list_dot_product(c, c) AS nc,
          list_dot_product(qc, qc) AS nq
        FROM qz, q WHERE vec_id <> 0),
      top AS (SELECT vec_id, label,
          CASE WHEN sqrt(nc) * sqrt(nq) = 0 THEN 0.0
               ELSE dot / (sqrt(nc) * sqrt(nq)) END AS qcos
        FROM s ORDER BY qcos DESC, vec_id LIMIT 10)
      SELECT vec_id, label, round(qcos, 6) AS qcos FROM top
      ORDER BY qcos DESC, vec_id"""),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qCodes = Quantization.quantized(emb.filter(col("vec_id") === 0), "embedding")
          .select("codes").head().getAs[scala.collection.Seq[Long]](0).toSeq
        val corpus = Quantization.quantized(emb.filter(col("vec_id") =!= 0), "embedding")
        Quantization.topK(corpus, "codes", qCodes, 10, tieCol = "vec_id")
          .withColumn("qcos", round(col("qcos"), 6))
          .select("vec_id", "label", "qcos")
          .orderBy(desc("qcos"), asc("vec_id"))
      }),

    // per-source quota (domain capping): keep the 5 largest docs per
    // source — bounds any one domain's share of the training mix.
    // Two-phase (partition-local pre-cap, then the exact window) so a
    // dominant source never serializes through one window partition
    Q("q49_source_quota", Some("""
      SELECT doc_id, source, n_chars, CAST(rnk AS INT) AS rnk FROM (
        SELECT doc_id, source, n_chars, row_number() OVER
          (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
        FROM documents) t
      WHERE rnk <= 5 ORDER BY source, rnk"""),
      (s, d) => Quota.perKeyTopN(
        Tables.documents(s, d).select("doc_id", "source", "n_chars"),
        keys = Seq("source"), order = Seq(desc("n_chars"), asc("doc_id")),
        n = 5)
        .select("doc_id", "source", "n_chars", "rnk")
        .orderBy("source", "rnk")),

    // connected components over the q25 near-dup pairs: pairwise dedup
    // leaks transitively (A~B, B~C — dropping B keeps A and C); the
    // component label (min member id) is the cluster's canonical doc.
    // Min-label propagation vs the oracle's recursive reachability CTE
    Q("q56_dup_components", Some("""
      WITH RECURSIVE ng AS (
        SELECT doc_id, source, length(text) AS len,
          list_distinct([array_to_string(t[i:i+2], ' ')
                         for i in range(1, greatest(len(t) - 2, 0) + 1)]) AS g
        FROM (SELECT doc_id, source, text,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents)),
      pairs AS (
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
            CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) AS jaccard
          FROM ng a JOIN ng b ON a.source = b.source AND a.doc_id < b.doc_id
            AND abs(a.len - b.len) <= 20
            AND len(a.g) + len(b.g) > 0) p
        WHERE jaccard >= 0.3),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS n FROM edges),
      reach(node, lab) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b)
      SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS component
      FROM reach GROUP BY node ORDER BY doc_id"""),
      (s, d) => {
        val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d),
          "doc_id", "text", col("source"), n = 3, threshold = 0.3,
          maxLenDiff = 20).select("id_a", "id_b")
        Components.connectedComponents(pairs, "id_a", "id_b")
          .select(col("node").as("doc_id"), col("component"))
          .orderBy("doc_id")
      }),

    // E6 heuristic enrichment tier (the fully-native fallback every
    // LLM-backed path degrades to): title/category/summary are
    // deterministic string transforms, so the oracle re-derives them in
    // SQL over a synthesized "source/doc-id.md" path. A map-only stage —
    // no shuffle at any scale. Tags/keyword scoring are covered by q34
    // and the EnrichmentSpec unit tier.
    Q("q58_enrich_heuristic", Some("""
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
        'Doc ' || CAST(doc_id AS VARCHAR) AS title,
        source AS category,
        trim(regexp_replace(substring(text, 1, 200), '\s+', ' ', 'g')) || '...' AS summary,
        CAST(0.3 AS DOUBLE) AS confidence
      FROM documents ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .map { case (id, source, text) =>
            val r = Enrichment.heuristic(s"$source/doc-$id.md", text)
            (id, r.title, r.category, r.summary, r.confidence)
          }
          .toDF("doc_id", "title", "category", "summary", "confidence")
          .orderBy("doc_id")
      }),

    // the canonical training-mix build, end to end: exact dedup (keep
    // min doc_id per fingerprint) -> quality gate -> per-source
    // token-budget quota (admit by stopword-richness rank while the
    // source's running ws-token total fits the budget). Composes q33 + q31 +
    // q32 semantics with the two-phase budget window; every stage is
    // map-side or a single keyed shuffle, and the dominant source never
    // serializes its whole corpus through one window partition.
    // stopword_ratio is a single int/int division — IEEE-identical in
    // both engines, so it's safe as a sort key AND as output.
    Q("q59_training_mix", Some(s"""
      WITH fp AS (
        SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
        FROM documents),
      canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
      q AS (
        SELECT doc_id,
          CASE WHEN len(t) > 0
            THEN CAST(len(list_filter(t, x -> list_contains([${stopwordsSql}], lower(x)))) AS DOUBLE)
                 / CAST(len(t) AS DOUBLE) ELSE 0.0 END AS q,
          CAST(len(t) AS BIGINT) AS n_words,
          CASE WHEN len(t) > 0
            THEN CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
                 / CAST(len(t) AS DOUBLE) ELSE 0.0 END AS avg_word_len,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
            greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio
        FROM (SELECT doc_id, text, ${toksRawSql("text")} AS t FROM documents) x),
      base AS (
        SELECT d.doc_id, d.source, q.q,
          CAST(len(${toksRawSql("d.text")}) AS BIGINT) AS ws_tokens
        FROM documents d
        JOIN q ON q.doc_id = d.doc_id
        WHERE d.doc_id IN (SELECT doc_id FROM canon)
          AND q.n_words >= 10 AND q.avg_word_len >= 2.0
          AND q.avg_word_len <= 12.0 AND q.punct_ratio <= 0.2),
      ranked AS (
        SELECT *, CAST(sum(ws_tokens) OVER (
          PARTITION BY source ORDER BY q DESC, doc_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM base)
      SELECT doc_id, source, q, ws_tokens, cum_tokens
      FROM ranked WHERE cum_tokens <= 1000
      ORDER BY source, doc_id"""),
      (s, d) => {
        val docs = Tables.documents(s, d)
        val canonical = TextAnalysis.fingerprints(docs, "doc_id", "text")
          .groupBy("fp").agg(min(col("id")).as("doc_id")).select("doc_id")
        val quality = TextAnalysis.qualityScore(docs, "doc_id", "text")
          .select(col("id").as("doc_id"),
            col("stopword_ratio").as("q"), col("keep"))
        val toks = TextAnalysis.tokenCounts(docs, "doc_id", "text")
          .select(col("id").as("doc_id"),
            col("ws_tokens").cast("long").as("ws_tokens"))
        val base = docs.select("doc_id", "source")
          .join(canonical, Seq("doc_id"), "left_semi")
          .join(quality, "doc_id").filter(col("keep") === 1).drop("keep")
          .join(toks, "doc_id")
        Quota.perKeyTokenBudget(base, Seq("source"),
            Seq(desc("q"), asc("doc_id")), "ws_tokens", 1000L)
          .select("doc_id", "source", "q", "ws_tokens", "cum_tokens")
          .orderBy("source", "doc_id")
      }),

    // sequence packing: every doc's place in the fixed-length training
    // sequences (concatenate in train order, cut every 512 tokens). The
    // engine runs a distributed prefix sum (range partition -> partition
    // totals -> map-only offset pass, never a single-partition window);
    // the oracle states the same layout as the naive global window. All
    // integer math — exact cross-engine equality, no rounding
    Q("q72_sequence_packing", Some(s"""
      WITH t AS (
        SELECT doc_id,
          CAST(len(${toksRawSql("text")}) AS BIGINT) AS ws_tokens,
          CAST('0x' || substr(md5('0|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS ord
        FROM documents),
      c AS (
        SELECT doc_id, ws_tokens,
          CAST(sum(ws_tokens) OVER (ORDER BY ord, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t)
      SELECT doc_id, ws_tokens, cum AS cum_tokens,
        CAST((cum - ws_tokens) // 512 AS BIGINT) AS seq_id,
        CAST((cum - ws_tokens) % 512 AS BIGINT) AS seq_pos,
        CAST(CASE WHEN ws_tokens > 0
             THEN (cum - 1) // 512 - (cum - ws_tokens) // 512 + 1
             ELSE 0 END AS BIGINT) AS spans
      FROM c ORDER BY doc_id"""),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          graft.functions.TextFunctions.wordCount(col("text"))
            .cast("long").as("ws_tokens"))
        Packing.packSequences(docs, "doc_id", "ws_tokens",
            Seq(Sampling.trainOrder(col("doc_id"))), seqLen = 512)
          .select("doc_id", "ws_tokens", "cum_tokens", "seq_id",
            "seq_pos", "spans")
          .orderBy("doc_id")
      }),

    // reproducible weighted sampling without replacement (Efraimidis-
    // Spirakis keys over hash-derived uniforms): length-proportional
    // document sample, k largest u^(1/w) keys via TakeOrdered — no RNG
    // state, no global sort. The ranked key is INTEGER-EXACT in both
    // engines — floor(key*1e9) as BIGINT (IEEE multiply + floor are
    // exactly specified) — so no engine-specific float-round semantics
    // can flip the rank-k edge; only the documented 1-ulp pow freedom
    // remains
    Q("q75_weighted_sample", Some(s"""
      WITH t AS (
        SELECT doc_id,
          CAST(len(${toksRawSql("text")}) AS BIGINT) AS ws_tokens
        FROM documents),
      s AS (
        SELECT doc_id, ws_tokens,
          CAST(floor(pow(
            (CAST('0x' || substr(md5('es0|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
              / 4294967296.0,
            1.0 / CAST(ws_tokens AS DOUBLE)) * 1000000000.0) AS BIGINT) AS es_key
        FROM t WHERE ws_tokens > 0)
      SELECT doc_id, ws_tokens, es_key FROM s
      ORDER BY es_key DESC, doc_id LIMIT 100"""),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          graft.functions.TextFunctions.wordCount(col("text"))
            .cast("long").as("ws_tokens"))
        Sampling.weightedSample(docs, col("doc_id"), col("ws_tokens"),
          k = 100, seed = 0)
      }),

    // UniMax (Chung et al. 2023) language/domain-balanced mix (round
    // 12): waterfill a 27k-token budget across sources at <= 1 epoch —
    // low-resource sources contribute everything, the rest split the
    // remainder evenly — then admit docs per source in deterministic
    // hash order until each allocation fills. The waterfilling level is
    // the closed-form max over prefix ratios (window cumsum over the
    // PER-SOURCE aggregate — bounded metadata, not corpus-scale);
    // admission is the certified two-phase prefix-budget quota
    Q("q93_unimax_mix", Some(s"""
      WITH t AS (
        SELECT doc_id, source,
          CAST(len(${toksRawSql("text")}) AS BIGINT) AS ws_tokens
        FROM documents),
      k AS (SELECT source, CAST(sum(ws_tokens) AS BIGINT) AS avail
            FROM t GROUP BY source),
      c AS (SELECT source, avail, CAST(avail AS DOUBLE) * 1.0 AS cap FROM k),
      w AS (
        SELECT source, cap,
          row_number() OVER (ORDER BY cap, source) AS rn,
          coalesce(sum(cap) OVER (ORDER BY cap, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
          count(*) OVER () AS n
        FROM c),
      f AS (SELECT max((27000.0 - pre) / CAST(n - rn + 1 AS DOUBLE)) AS fstar
            FROM w),
      alloc AS (
        SELECT source,
          CAST(floor(least(cap, greatest(fstar, 0.0))) AS BIGINT) AS alloc_tokens
        FROM w, f),
      sel AS (
        SELECT t.doc_id, t.source, t.ws_tokens, a.alloc_tokens,
          CAST(sum(t.ws_tokens) OVER (PARTITION BY t.source
            ORDER BY CAST('0x' || substr(md5('0|' || CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT),
              t.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM t JOIN alloc a USING (source))
      SELECT doc_id, source, ws_tokens, alloc_tokens, cum_tokens
      FROM sel WHERE cum_tokens <= alloc_tokens ORDER BY doc_id"""),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.wordCount(col("text"))
            .cast("long").as("ws_tokens"))
        graft.operators.Mixture.unimaxSample(docs, "source", "ws_tokens",
          order = Seq(Sampling.trainOrder(col("doc_id")).asc,
            col("doc_id").asc),
          budget = 27000L, maxEpochs = 1.0)
          .select(col("doc_id"), col("source"), col("ws_tokens"),
            col("alloc_tokens"), col("cum_tokens"))
          .orderBy("doc_id")
      }),

    // Temperature sampling (q93's pre-UniMax standard counterpart,
    // mT5/XLM-R's p ∝ c^(1/T)): shares at T = 2 over source token
    // counts, no epoch cap, same deterministic hash-order admission.
    // The double normalizer is a SEQUENTIAL fold in (weight, key)
    // order on both engines — Spark's ordered unbounded window vs
    // DuckDB's list(... ORDER BY ...) dot-product fold (q27 precedent)
    Q("q96_temperature_mix", Some(s"""
      WITH t AS (
        SELECT doc_id, source,
          CAST(len(${toksRawSql("text")}) AS BIGINT) AS ws_tokens
        FROM documents),
      k AS (SELECT source, CAST(sum(ws_tokens) AS BIGINT) AS avail
            FROM t GROUP BY source),
      w AS (SELECT source, avail,
              pow(CAST(avail AS DOUBLE), 0.5) AS wgt FROM k),
      z AS (SELECT list_dot_product(
              list(wgt ORDER BY wgt, source),
              list_transform(list(wgt ORDER BY wgt, source), x -> 1.0)) AS zz
            FROM w),
      alloc AS (
        SELECT source,
          CAST(floor(18000.0 * wgt / zz) AS BIGINT) AS alloc_tokens
        FROM w, z),
      sel AS (
        SELECT t.doc_id, t.source, t.ws_tokens, a.alloc_tokens,
          CAST(sum(t.ws_tokens) OVER (PARTITION BY t.source
            ORDER BY CAST('0x' || substr(md5('0|' || CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT),
              t.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM t JOIN alloc a USING (source))
      SELECT doc_id, source, ws_tokens, alloc_tokens, cum_tokens
      FROM sel WHERE cum_tokens <= alloc_tokens ORDER BY doc_id"""),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.wordCount(col("text"))
            .cast("long").as("ws_tokens"))
        graft.operators.Mixture.temperatureSample(docs, "source", "ws_tokens",
          order = Seq(Sampling.trainOrder(col("doc_id")).asc,
            col("doc_id").asc),
          budget = 18000L, temperature = 2.0)
          .select(col("doc_id"), col("source"), col("ws_tokens"),
            col("alloc_tokens"), col("cum_tokens"))
          .orderBy("doc_id")
      }),

    // interval-overlap join (round 12, q47's range-range
    // generalization): 6h error-impact windows × 1h click-activity
    // windows per user, banded to 1h buckets with first-shared-band
    // pair emission — a pure equi-join, NO post-join distinct, never a
    // per-key cross product. The oracle runs the naive inequality join;
    // integer microsecond arithmetic end to end
    Q("q98_interval_overlap", Some("""
      WITH err AS (
        SELECT event_id AS error_id, user_id, epoch_us(ts) AS es,
          epoch_us(ts) + 21600000000 AS ee
        FROM events WHERE event_type = 'error'),
      clk AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS cs,
          epoch_us(ts) + 3600000000 AS ce
        FROM events WHERE event_type = 'click')
      SELECT a.user_id, error_id, click_id,
        CAST(least(a.ee, b.ce) - greatest(a.es, b.cs) AS BIGINT) AS overlap_us
      FROM err a JOIN clk b ON a.user_id = b.user_id
        AND a.es <= b.ce AND b.cs <= a.ee
      ORDER BY error_id, click_id"""),
      (s, d) => {
        val ev = eventsMicros(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"),
            col("tus").as("es"), (col("tus") + 21600000000L).as("ee"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("tus").as("cs"), (col("tus") + 3600000000L).as("ce"))
        RangeJoin.intervalOverlapPairs(err, clk, Seq("user_id"),
          "es", "ee", "cs", "ce", bandTicks = 3600000000L)
          .select(col("user_id"), col("error_id"), col("click_id"),
            (least(col("ee"), col("ce")) - greatest(col("es"), col("cs")))
              .as("overlap_us"))
          .orderBy("error_id", "click_id")
      }),

    // EXACT-proportion stratified train/val/test split (round 12):
    // every source contributes floor-exact shares to every split under
    // a deterministic hash order — the guarantee q39's per-row hash
    // bucketing only approaches in expectation. Scale shape is the
    // q77/q85 distributed prefix-rank generalized per stratum (a
    // per-source Window would be one partition per source at 100 TB).
    // The floor boundaries are IEEE doubles computed identically in
    // both engines: the oracle literals below are Scala's own printed
    // cumulative sums, so 0.8 + 0.1 = 0.9000000000000001 crosses the
    // boundary bit-for-bit
    {
      val c1 = 0.8.toString
      val c2 = (0.8 + 0.1).toString
      Q("q103_stratified_split", Some(s"""
        WITH h AS (
          SELECT doc_id, source,
            CAST('0x' || substr(md5('ss0|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS ss_ord
          FROM documents),
        r AS (
          SELECT doc_id, source, ss_ord,
            row_number() OVER (PARTITION BY source ORDER BY ss_ord, doc_id) AS rk,
            count(*) OVER (PARTITION BY source) AS n
          FROM h)
        SELECT doc_id, source, CAST(rk AS BIGINT) AS ss_rank,
          CASE WHEN rk <= floor($c1 * n) THEN 'train'
               WHEN rk <= floor($c2 * n) THEN 'val'
               ELSE 'test' END AS split
        FROM r ORDER BY doc_id"""),
        (s, d) => Sampling.stratifiedSplit(
            Tables.documents(s, d).select(col("doc_id"), col("source")),
            "doc_id", "source",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("doc_id"), col("source"), col("ss_rank"), col("split"))
          .orderBy("doc_id"))
    },

    // Epoch materialization (round 13): the data-constrained regime
    // q93 cannot reach — a 40k budget over per-LANGUAGE availability
    // at <= 2.5 epochs allocates every language MORE than one pass
    // except en, so the output is the actual repeated training stream:
    // floor(alloc/avail) full passes per language plus an epoch-salted
    // hash-prefix partial pass worth the remainder. Every row is one
    // (doc, epoch) the trainer consumes; epoch k's prefix order is the
    // k-salted trainOrder hash (independent permutation per pass)
    Q("q125_epoch_materialize", Some(s"""
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(${toksRawSql("text")}) AS BIGINT) AS ws_tokens
        FROM documents),
      k AS (SELECT lang, CAST(sum(ws_tokens) AS BIGINT) AS avail
            FROM t GROUP BY lang),
      c AS (SELECT lang, avail, CAST(avail AS DOUBLE) * 2.5 AS cap FROM k),
      w AS (
        SELECT lang, avail, cap,
          row_number() OVER (ORDER BY cap, lang) AS rn,
          coalesce(sum(cap) OVER (ORDER BY cap, lang
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
          count(*) OVER () AS n
        FROM c),
      f AS (SELECT max((40000.0 - pre) / CAST(n - rn + 1 AS DOUBLE)) AS fstar
            FROM w),
      alloc AS (
        SELECT lang, avail,
          CAST(floor(least(cap, greatest(fstar, 0.0))) AS BIGINT) AS alloc_tokens
        FROM w, f),
      fe AS (
        SELECT lang, avail, alloc_tokens,
          CAST(alloc_tokens // avail AS BIGINT) AS nfull,
          CAST(alloc_tokens - (alloc_tokens // avail) * avail AS BIGINT) AS rem
        FROM alloc WHERE avail > 0),
      full_rows AS (
        SELECT t.doc_id, t.lang, t.ws_tokens, fe.alloc_tokens,
          CAST(e.epoch AS BIGINT) AS epoch
        FROM t JOIN fe USING (lang),
          LATERAL (SELECT unnest(generate_series(0, fe.nfull - 1)) AS epoch) e
        WHERE fe.nfull > 0),
      part_sel AS (
        SELECT t.doc_id, t.lang, t.ws_tokens, fe.alloc_tokens, fe.rem,
          CAST(fe.nfull AS BIGINT) AS epoch,
          CAST(sum(t.ws_tokens) OVER (PARTITION BY t.lang
            ORDER BY CAST('0x' || substr(md5(CAST(fe.nfull AS VARCHAR) || '|' || CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT),
              t.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM t JOIN fe USING (lang) WHERE fe.rem > 0),
      part_rows AS (
        SELECT doc_id, lang, ws_tokens, alloc_tokens, epoch
        FROM part_sel WHERE cum <= rem)
      SELECT doc_id, lang, ws_tokens, alloc_tokens, epoch
      FROM (SELECT * FROM full_rows UNION ALL SELECT * FROM part_rows)
      ORDER BY doc_id, epoch"""),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          graft.functions.TextFunctions.wordCount(col("text"))
            .cast("long").as("ws_tokens"))
        graft.operators.Mixture.materializeEpochs(docs, "lang", "doc_id",
            "ws_tokens", budget = 40000L, maxEpochs = 2.5)
          .select(col("doc_id"), col("lang"), col("ws_tokens"),
            col("alloc_tokens"), col("epoch"))
          .orderBy("doc_id", "epoch")
      }),

    // Dedup profile (round 13): the cluster-size histogram over q56's
    // near-dup components — the report a curation run reads before
    // picking a removal policy (pair-dominated tails and giant
    // boilerplate heads call for different handling). Two keyed
    // aggregates on top of the certified pairs->components path;
    // removable_docs = keep-one-per-cluster removal mass
    Q("q128_dedup_profile", Some("""
      WITH RECURSIVE ng AS (
        SELECT doc_id, source, length(text) AS len,
          list_distinct([array_to_string(t[i:i+2], ' ')
                         for i in range(1, greatest(len(t) - 2, 0) + 1)]) AS g
        FROM (SELECT doc_id, source, text,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents)),
      pairs AS (
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
            CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) AS jaccard
          FROM ng a JOIN ng b ON a.source = b.source AND a.doc_id < b.doc_id
            AND abs(a.len - b.len) <= 20
            AND len(a.g) + len(b.g) > 0) p
        WHERE jaccard >= 0.3),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS n FROM edges),
      reach(node, lab) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
      cc AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
      sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                FROM cc GROUP BY component)
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
        CAST((cluster_size - 1) * count(*) AS BIGINT) AS removable_docs
      FROM sizes GROUP BY cluster_size ORDER BY cluster_size"""),
      (s, d) => {
        val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d),
          "doc_id", "text", col("source"), n = 3, threshold = 0.3,
          maxLenDiff = 20).select("id_a", "id_b")
        Components.sizeProfile(
            Components.connectedComponents(pairs, "id_a", "id_b"))
          .orderBy("cluster_size")
      }),

    // Containment near-dup pairs (round 13): Broder's SECOND measure —
    // |A∩B|/min(|A|,|B|) — the quote/excerpt/boilerplate-inclusion
    // detector resemblance hides (a short doc inside a long one scores
    // low Jaccard, containment ~1). Same blocked self-join as q25 but
    // deliberately NO length prefilter: the size gap IS the signal —
    // which also means every same-block pair pays an exact intersect,
    // so the certified slice is two source blocks (the q29 subset
    // discipline; src7 holds the corpus's real contained pair) and the
    // operator's maxBlockSize cap is the documented density lever
    Q("q134_containment_pairs", Some("""
      WITH ng AS (
        SELECT doc_id, source,
          list_distinct([array_to_string(t[i:i+2], ' ')
                         for i in range(1, greatest(len(t) - 2, 0) + 1)]) AS g
        FROM (SELECT doc_id, source,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents
              WHERE source IN ('src0', 'src7')))
      SELECT source AS block, id_a, id_b, n_inter, n_a, n_b, containment
      FROM (
        SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_inter,
          CAST(len(a.g) AS BIGINT) AS n_a,
          CAST(len(b.g) AS BIGINT) AS n_b,
          CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
            CAST(least(len(a.g), len(b.g)) AS DOUBLE) AS containment
        FROM ng a JOIN ng b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE least(len(a.g), len(b.g)) > 0) p
      WHERE containment >= 0.5
      ORDER BY id_a, id_b"""),
      (s, d) => Dedup.ngramContainmentPairs(
          Tables.documents(s, d)
            .filter(col("source").isin("src0", "src7")),
          "doc_id", "text", col("source"), n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b"))
  ) ++ Seq(

    // OOV rate of the held-out split against the train-split
    // vocabulary (round 14): the tokenizer/vocab-coverage audit every
    // training run opens with — split by the certified q103 machinery
    // (exact-proportion stratified, hash-ordered, floor boundary as
    // the same IEEE double), build the train vocabulary, then flag
    // test tokens missing from it. Counts exact; rate is one division.
    // The vocab join is token-keyed (never text); at 100 TB the train
    // vocabulary is a shuffle-join side, vocabulary-sized not
    // corpus-sized
    Q("q164_oov_rate", Some(s"""
      WITH h AS (
        SELECT doc_id, source, text,
          CAST('0x' || substr(md5('ss0|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS ss_ord
        FROM documents),
      r AS (
        SELECT doc_id, source, text,
          row_number() OVER (PARTITION BY source ORDER BY ss_ord, doc_id) AS rk,
          count(*) OVER (PARTITION BY source) AS n
        FROM h),
      sp AS (
        SELECT source, text,
          CASE WHEN rk <= floor(${0.8.toString} * n) THEN 'train'
               ELSE 'test' END AS split
        FROM r),
      vocab AS (
        SELECT DISTINCT unnest(list_filter(string_split(lower(text), ' '),
          x -> x <> '')) AS t
        FROM sp WHERE split = 'train'),
      tt AS (
        SELECT source, unnest(list_filter(string_split(lower(text), ' '),
          x -> x <> '')) AS t
        FROM sp WHERE split = 'test'),
      j AS (
        SELECT tt.source,
          CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
        FROM tt LEFT JOIN vocab v ON v.t = tt.t)
      SELECT source, CAST(count(*) AS BIGINT) AS n_test_tokens,
        CAST(sum(oov) AS BIGINT) AS n_oov,
        round(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          AS oov_rate
      FROM j GROUP BY source ORDER BY source"""),
      (s, d) => {
        val sp = Sampling.stratifiedSplit(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            col("text")),
          "doc_id", "source", Seq("train" -> 0.8, "test" -> 0.2))
        val vocab = sp.filter(col("split") === "train")
          .select(explode(graft.functions.TextFunctions.tokens(
            lower(col("text")))).as("t"))
          .distinct().withColumn("__in", lit(1))
        sp.filter(col("split") === "test")
          .select(col("source"), explode(graft.functions.TextFunctions
            .tokens(lower(col("text")))).as("t"))
          .join(vocab, Seq("t"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_test_tokens"),
            sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("source"), col("n_test_tokens"), col("n_oov"),
            round(col("n_oov").cast("double") /
              col("n_test_tokens").cast("double"), 6).as("oov_rate"))
          .orderBy("source")
      })
  )
}
