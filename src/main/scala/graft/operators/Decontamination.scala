package graft.operators

import graft.plans.TextSetExpressions.wordNgramSet
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
