package graft.operators

import graft.plans.CosineSimilarity
import graft.plans.TextSetExpressions.wordNgramSet
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import graft.util.Materialize.MatOps

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark corpus (the GPT-3/Llama-style
  * contamination check — any shared n-gram of order ~8-13 marks a
  * training doc as contaminated; we also report the overlap fraction so
  * callers can threshold instead of hard-flagging).
  *
  * Scale design: the eval side is benchmark-sized (thousands of docs,
  * millions of n-grams) while the train side is the 100 TB corpus, so
  * the distinct eval n-gram set is the BROADCAST side of the join and
  * the train side never shuffles its text — the plan is a map-only
  * explode over train docs, a broadcast hash join against the eval
  * set, and one partial-aggregated groupBy on doc id. No shuffle ever
  * carries document text or the full n-gram stream; only (id, counts)
  * rows cross the wire. If the eval set outgrows broadcast range
  * (hundreds of benchmarks), the same plan works with a shuffle hash
  * join on the n-gram — semantics unchanged.
  *
  * Mirrors the dedup tier's determinism rules ([[Dedup]]): n-grams are
  * DISTINCT per doc (a doc repeating a contaminated n-gram counts it
  * once) and tokenization matches [[graft.plans.TextSetExpressions
  * .WordNgramSet]] exactly, so the DuckDB oracle reproduces every
  * count bit-for-bit.
  */
object Decontamination {

  /** Per-train-doc contamination report.
    *
    * Output: (id, n_ngrams, n_hit, contamination, contaminated) — one
    * row per train doc, including docs too short to form any n-gram
    * (n_ngrams = 0, contamination = 0).
    *
    * @param train    training corpus (idCol, textCol)
    * @param eval     eval/benchmark corpus (evalTextCol); the small side
    * @param n        n-gram order (words); 8-13 in published pipelines
    */
  def contamination(train: DataFrame, idCol: String, textCol: String,
                    eval: DataFrame, evalTextCol: String, n: Int): DataFrame = {
    val evalNg = eval
      .select(explode(wordNgramSet(lower(col(evalTextCol)), n)).as("ng"))
      .distinct()
      .withColumn("__hit", lit(1))
    val trainNg = train.select(col(idCol).as("id"),
      explode_outer(wordNgramSet(lower(col(textCol)), n)).as("ng"))
    trainNg
      .join(broadcast(evalNg), Seq("ng"), "left")
      .groupBy("id")
      .agg(
        count(col("ng")).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).cast("long").as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") /
          greatest(col("n_ngrams"), lit(1L)).cast("double"))
      .withColumn("contaminated", (col("n_hit") > 0).cast("int"))
  }

  /** [[contamination]] with a Bloom-filter prefilter — EXACTLY the same
    * output (the exact join verifies every Bloom positive, so false
    * positives never reach a count), at a fraction of the exact path's
    * shuffle volume.
    *
    * Why this exists: the exact path is the right plan while the eval
    * n-gram set broadcasts. Past broadcast range (hundreds of benchmarks
    * — tens of GB of distinct n-grams) the verify join must shuffle, and
    * the shuffled side is the 100 TB corpus's ENTIRE n-gram stream. The
    * Bloom filter (Spark's own runtime-filter machinery:
    * `BloomFilterAggregate` to build, `BloomFilterMightContain` +
    * `XxHash64` to probe — both codegen) compresses the eval set to a
    * few MB of bits that always broadcast, and the map-side probe drops
    * every train n-gram except true hits and the ~fpp false positives
    * BEFORE the shuffle. The exact join then runs over that thin
    * candidate stream — output provably identical to [[contamination]]
    * (spec-asserted, and q70 shares the exact oracle's SQL shape).
    *
    * @param expectedEvalNgrams sizing estimate for the filter (an
    *   overestimate wastes bits, an underestimate raises the false-
    *   positive rate — never correctness)
    * @param fpp target false-positive probability at the estimate
    */
  def bloomContamination(train: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String, n: Int,
                         expectedEvalNgrams: Long = 1L << 20,
                         fpp: Double = 0.01): DataFrame = {
    val evalNg = eval
      .select(explode(wordNgramSet(lower(col(evalTextCol)), n)).as("ng"))
      .distinct()
      .materializeOnce(eager = false) // two consumers: bloom build + verify
    // build once, driver-side single row (the serialized bits), same
    // bounded-metadata contract as the IVF meta collect. Sizing stays
    // inside Spark's runtime-filter conf caps (4M items / 8 MB of bits)
    // so the aggregate never trips them
    val numItems = math.min(math.max(expectedEvalNgrams, 1L), 4000000L)
    val numBits = math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(
        numItems, fpp),
      67108864L)
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(col("ng")))),
      Literal(numItems), Literal(numBits))
      .toAggregateExpression()
    val bloomBits = evalNg.select(GraftBridge.column(bloomAgg)).head()
      .getAs[Array[Byte]](0)
    // zero eval n-grams -> the aggregate yields a NULL filter; the
    // exact path degenerates identically (no hits), so just use it
    if (bloomBits == null)
      return contamination(train, idCol, textCol, eval, evalTextCol, n)
    val mightContain = GraftBridge.column(BloomFilterMightContain(
      Literal.create(bloomBits,
        org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(GraftBridge.expression(col("ng"))))))
    // per-doc denominators come from the map-only array pass, BEFORE
    // the probe drops non-candidate n-grams
    val base = train.select(col(idCol).as("id"),
      wordNgramSet(lower(col(textCol)), n).as("__ngs"))
      // coalesce: NULL text -> NULL n-gram array -> NULL size; the
      // exact path's count() reports 0 there, and the two paths must
      // stay value-identical
      .withColumn("n_ngrams", coalesce(size(col("__ngs")), lit(0)).cast("long"))
      .materializeOnce(eager = false) // two consumers: candidates + output
    val cand = base
      .select(col("id"), explode(col("__ngs")).as("ng"))
      .filter(mightContain)
    // exact verify over Bloom positives only — deliberately NOT
    // broadcast-hinted: this is the path for eval sets past broadcast
    // range, and the candidate side is already thin
    val hits = cand.join(evalNg, Seq("ng"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    base.select(col("id"), col("n_ngrams"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_ngrams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") /
          greatest(col("n_ngrams"), lit(1L)).cast("double"))
      .withColumn("contaminated", (col("n_hit") > 0).cast("int"))
  }

  /** Decontaminated view of the training corpus: drop docs whose overlap
    * fraction meets `maxContamination` (0.0 = drop on any shared
    * n-gram). A left-semi join on the clean ids — train text columns
    * pass through untouched. */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
                    eval: DataFrame, evalTextCol: String, n: Int,
                    maxContamination: Double = 0.0): DataFrame = {
    val clean = contamination(train, idCol, textCol, eval, evalTextCol, n)
      .filter(col("contamination") <= maxContamination)
      .select(col("id").as(idCol))
    train.join(clean, Seq(idCol), "left_semi")
  }

  /** EMBEDDING-SPACE (semantic) decontamination: flag training rows
    * whose embedding is too close to ANY eval/benchmark embedding —
    * the paraphrase-robust complement of the n-gram checks above
    * (n-gram overlap misses reworded test questions; embedding cosine
    * catches them — the semantic-contamination check in recent LLM
    * eval-hygiene work, same geometry as SemDeDup's near-dup notion
    * applied across the train/eval boundary).
    *
    * Output: one row per train row — (id, max_sim, nearest_eval,
    * contaminated) where `max_sim` is the maximum cosine against the
    * eval set, `nearest_eval` the eval id achieving it (ties break to
    * the smallest eval id), and `contaminated` = 1 iff
    * max_sim >= threshold. Train rows with NULL/length-mismatched
    * vectors report NULL max_sim and contaminated = 0.
    *
    * Scale design: the eval side is benchmark-sized (thousands of
    * vectors) while the train side is the full corpus, so the eval
    * embeddings BROADCAST and the scoring pass is a map-side
    * nested-loop against the in-memory eval block — the train
    * embeddings never shuffle. The per-train max is a partial
    * aggregate (max of a (sim, -eval_id) struct — one row per train id
    * crosses the wire, not the train×eval pair stream). Cosine runs in
    * the codegen [[graft.plans.CosineSimilarity]] expression; the
    * whole pair loop stays inside one whole-stage-codegen span. If the
    * eval set outgrows broadcast range, block it by an IVF cell key
    * first (K2's shape) — semantics unchanged.
    */
  def embeddingContamination(train: DataFrame, idCol: String, vecCol: String,
                             eval: DataFrame, evalIdCol: String,
                             evalVecCol: String,
                             threshold: Double): DataFrame = {
    val ev = broadcast(eval.select(col(evalIdCol).cast("long").as("__eid"),
      col(evalVecCol).as("__ev")))
    val best = train
      .select(col(idCol).as("id"), col(vecCol).as("__tv"))
      .crossJoin(ev)
      .select(col("id"),
        CosineSimilarity(col("__tv"), col("__ev")).as("__cs"),
        col("__eid"))
      .filter(col("__cs").isNotNull)
      // max over a (sim, -eval_id) struct: lexicographic compare gives
      // the max sim, then the SMALLEST eval id on an exact-double tie —
      // deterministic across partitionings and engines
      .groupBy("id")
      .agg(max(struct(col("__cs"), (-col("__eid")).as("__neg"))).as("__m"))
    train.select(col(idCol).as("id"))
      .join(best, Seq("id"), "left")
      .select(col("id"),
        col("__m.__cs").as("max_sim"),
        (-col("__m.__neg")).as("nearest_eval"),
        coalesce((col("__m.__cs") >= threshold).cast("int"), lit(0))
          .as("contaminated"))
  }

  /** Semantically decontaminated view: drop train rows whose embedding
    * cosine against any eval embedding reaches `threshold`. Left-semi
    * on the clean ids — train columns pass through untouched. */
  def semanticDecontaminate(train: DataFrame, idCol: String, vecCol: String,
                            eval: DataFrame, evalIdCol: String,
                            evalVecCol: String,
                            threshold: Double): DataFrame = {
    val clean = embeddingContamination(train, idCol, vecCol,
      eval, evalIdCol, evalVecCol, threshold)
      .filter(col("contaminated") === 0)
      .select(col("id").as(idCol))
    train.join(clean, Seq(idCol), "left_semi")
  }
}
