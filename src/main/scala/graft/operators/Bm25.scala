package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text search as a derived postings table + BM25 ranking.
  *
  * The reference maintains an FTS5 inverted index with sync triggers
  * (/root/reference/src/services/LibSQLDatabase.ts:730-733,886-913) and
  * ranks with FTS5's BM25-family `rank` (:437,451). On Spark the inverted
  * index is a *relational* artifact: a postings DataFrame
  * `(term, docId, tf)` built with `explode` + `groupBy`, persisted/bucketed
  * by term at scale so a query term probe is a pruned scan instead of a
  * full pass. "Index maintenance" is an incremental append at ingest —
  * no triggers.
  *
  * Scoring is standard BM25 (k1=1.2, b=0.75 — SURVEY.md §7.3 defines
  * parity at the ranking level, not FTS5's exact constants):
  * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·len/avgdl))`.
  * All inputs (tf, df, N, len, avgdl) are exact integers/ratios, so the
  * double math is per-row deterministic — reproducible across engines.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Bucket count for the persisted postings layout: the index is
    * hive-partitioned on `__tb = portableHash32(term) % TermBuckets`, so
    * a query-term probe computes its buckets driver-side and partition
    * pruning skips (TermBuckets - |query buckets|)/TermBuckets of the
    * index files — the relational analog of FTS5's term lookup
    * (reference LibSQLDatabase.ts:410-437). Within each bucket the rows
    * are term-sorted for parquet row-group pruning. */
  val TermBuckets = 32

  /** Driver-side twin of [[graft.functions.TextFunctions.portableHash32]]
    * (first 8 md5 hex chars as an unsigned int) mod [[TermBuckets]] —
    * MUST stay bit-identical to [[termBucketCol]] or probes read the
    * wrong partitions. */
  def termBucket(term: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % TermBuckets).toInt
  }

  /** Column-side bucket id, used when writing the persisted index. */
  def termBucketCol(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(TextFunctions.portableHash32(term), lit(TermBuckets)).cast("int")

  /** Index tokenizer: split on ANY whitespace run. Chunk content keeps
    * newlines (the markdown chunker only collapses spaces/tabs), so a
    * single-space split would glue line-adjacent words into unmatchable
    * terms — every heading word would vanish from the index. */
  private def indexTokens(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Build the postings table `(term, id, tf)` plus doc lengths
    * `(id, doclen)` from a corpus `(idCol, textCol)`. */
  def postings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .select(col(idCol).as("id"),
        explode(indexTokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  def docLengths(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus.select(col(idCol).as("id"),
      size(indexTokens(col(textCol))).as("doclen"))

  /** Positional postings `(id, pos, term)` — the phrase-query tier of
    * the index (FTS5 "exact phrase" support). `pos` is the 0-based
    * ordinal in the same token stream as [[postings]]. */
  def positionalPostings(corpus: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    corpus.select(col(idCol).as("id"),
      posexplode(indexTokens(col(textCol))))
      .select(col("id"), col("pos"), col("col").as("term"))

  /** Exact-phrase occurrence counts: the i-th phrase term must sit at
    * start+i, expressed as k-1 equi-joins on (id, start) where each side
    * is pre-filtered to ONE term — a pruned probe per term on a
    * term-bucketed index at scale, never a positional cross product.
    * Returns (id, n_occurrences) for docs containing the phrase. */
  def phraseOccurrences(post: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    // Locale.ROOT: index terms come from Spark's locale-independent
    // lower(); the default locale (tr/az dotted-I) would miss them
    val terms = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val base = post.filter(col("term") === terms.head)
      .select(col("id"), col("pos").as("start"))
    val matched = terms.zipWithIndex.drop(1).foldLeft(base) {
      case (acc, (t, i)) =>
        acc.join(post.filter(col("term") === t)
          .select(col("id"), (col("pos") - i).as("start")),
          Seq("id", "start"))
    }
    matched.groupBy("id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** Score the corpus for a bag of query terms; returns `(id, bm25)` for
    * documents matching at least one term, ordered by score desc with a
    * deterministic id tie-break.
    *
    * Plan shape: postings filtered to the query terms (a tiny slice of
    * the index — term-bucketing makes this partition-pruned at scale),
    * one map-side-combinable groupBy on id, a broadcast of the per-term
    * df counts (|terms| rows), and a broadcast join of doc lengths.
    */
  def search(corpus: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k: Int): DataFrame = {
    val post = postings(corpus, idCol, textCol)
    // materialize the (tiny) lens table: it feeds three consumers
    // (corpus size, avgdl, per-doc length join) that would otherwise
    // each re-tokenize the corpus
    val lens = docLengths(corpus, idCol, textCol).localCheckpoint(false)
    scoreFromIndex(post, lens, terms, k)
  }

  /** BM25 over prebuilt index tables, unlimited: every matching doc with
    * its score. Callers that post-filter (tags) MUST rank/limit after
    * their filter — FTS5 semantics are global scoring, then predicate,
    * then LIMIT (reference LibSQLDatabase.ts:426-437). */
  def scoreAllFromIndex(post: DataFrame, lens: DataFrame,
                        terms: Seq[String]): DataFrame = {
    // corpus size and total length in ONE job over the lens table (a
    // count() + agg() pair would scan it twice per query)
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("doclen")).as("s")).head()
    val n = stats.getLong(0)
    val totalLen = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val avgdl = if (n > 0) totalLen.toDouble / n.toDouble else 1.0

    val hits = post.filter(col("term")
      .isin(terms.map(_.toLowerCase(java.util.Locale.ROOT)): _*))
    // document frequency per query term (tiny: |terms| rows -> broadcast)
    val dfs = hits.groupBy("term").agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5))
    val tfNorm = (col("tf").cast("double") * (K1 + 1)) /
      (col("tf").cast("double") +
        lit(K1) * (lit(1 - B) + lit(B) * col("doclen").cast("double") / avgdl))

    hits
      .join(broadcast(dfs), "term")
      .join(lens, "id")
      .withColumn("term_score", idf * tfNorm)
      .groupBy("id")
      // deterministic accumulation: per-term scores are IEEE-exact
      // scalar doubles, but a double SUM is partition-order-sensitive —
      // fold in term order instead (collect the tiny per-doc term list,
      // sort, left-fold). Bit-identical to DuckDB's
      // list_dot_product(list(score ORDER BY term), ones) per the
      // project's verified parity rule; a decimal cast of the computed
      // double would round differently across engines (shortest-string
      // vs exact-binary) and collapse sub-1e-9 score gaps into ties.
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("term_score")))),
        lit(0.0), (acc, x) => acc + x.getField("term_score")).as("bm25"))
  }

  /** Ranked top-k over prebuilt index tables. */
  def scoreFromIndex(post: DataFrame, lens: DataFrame,
                     terms: Seq[String], k: Int): DataFrame =
    scoreAllFromIndex(post, lens, terms)
      .orderBy(desc("bm25"), asc("id"))
      .limit(k)
}
