package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality gate — the ingest-time form of the batch curation
  * battery: score arriving documents against a PRE-TRAINED unigram LM
  * and the stateless repetition/length rules, and keep/drop in-flight.
  * This is how a 100 TB pipeline consumes the LM artifacts the batch
  * queries build: the model is trained ONCE on a reference corpus and
  * rides into the stream as task-local expression state
  * ([[graft.plans.UnigramLogProb]]) — no explode, no join, no
  * aggregation, so the gate is STATELESS under Structured Streaming
  * (append mode, zero watermark tuning) and throughput is the scan
  * rate. CCNet's deployment shape exactly: a fixed scorer applied to
  * new data.
  *
  * Semantics contract: the streaming gate emits EXACTLY the rows the
  * same function applied to the same data as a batch frame keeps —
  * `StreamingQualitySpec` pins stream ≡ batch row-for-row. */
object StreamingQualityGate {

  /** A fixed scoring model: top-V (token, count) vocab + Laplace total.
    * Driver-held and bounded (the BPE/LangId model discipline). */
  case class UnigramModel(vocab: Seq[(String, Long)], total: Double)

  /** Train on a REFERENCE corpus (batch). Deterministic: top-V by
    * (count desc, token asc). */
  def trainUnigram(reference: DataFrame, textCol: String,
                   vocabSize: Int = 65536): UnigramModel = {
    import graft.functions.TextFunctions.tokens
    val counts = reference
      .select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true) // total + top-V read the same counts
    val total = counts.agg(coalesce(sum("c"), lit(0L))).head().getLong(0).toDouble
    val vocab = counts.orderBy(desc("c"), asc("tok")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    counts.unpersist()
    UnigramModel(vocab, total)
  }

  /** Score + gate. Identical plan on a static OR streaming frame (all
    * map-only). Keeps rows passing the LM floor AND the stateless
    * rules; emits the score and per-rule bits so a sink can audit
    * drops. */
  def apply(docs: DataFrame, idCol: String, textCol: String,
            model: UnigramModel, minLogp: Double,
            minWords: Int = 5, maxRepetitionFrac: Double = 0.3): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val lm = org.apache.spark.sql.GraftBridge.column(
      graft.plans.UnigramLogProb(
        org.apache.spark.sql.GraftBridge.expression(
          lower(coalesce(col(textCol), lit("")))),
        model.vocab, model.total))
    val toks = tokens(lower(coalesce(col(textCol), lit(""))))
    docs
      .withColumn("__lm", lm)
      .withColumn("n_tokens", col("__lm.n_tokens"))
      .withColumn("avg_logp", col("__lm.avg_logp"))
      // most-frequent-token share — the q38-style repetition tell,
      // computed with HOFs (map-only, streaming-safe)
      .withColumn("top_frac",
        when(size(toks) === 0, lit(1.0)).otherwise(
          aggregate(
            transform(array_distinct(toks),
              t => size(filter(toks, x => x === t))),
            lit(0), (acc, n) => greatest(acc, n)).cast("double") /
            size(toks).cast("double")))
      .withColumn("pass_lm", (col("avg_logp") >= minLogp).cast("int"))
      .withColumn("pass_len", (col("n_tokens") >= minWords).cast("int"))
      .withColumn("pass_rep", (col("top_frac") <= maxRepetitionFrac).cast("int"))
      .withColumn("keep",
        (col("pass_lm") === 1 && col("pass_len") === 1 &&
          col("pass_rep") === 1).cast("int"))
      .select(col(idCol).as("id"), col("n_tokens"), col("avg_logp"),
        col("top_frac"), col("pass_lm"), col("pass_len"), col("pass_rep"),
        col("keep"))
  }
}
