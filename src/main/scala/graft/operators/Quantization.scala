package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 vector quantization — the Spark-side analog of the
  * reference's compressed neighbor storage (`compress_neighbors=float8`,
  * ~4x smaller index for ~1-2% recall loss;
  * /root/reference/src/services/LibSQLDatabase.ts:724-727).
  *
  * Each vector is scaled by `127 / max|v_i|` and floored to codes in
  * [-128, 127]: 4x smaller at rest and on the shuffle wire than float32.
  * Similarity over codes is exact integer arithmetic — every product
  * and partial sum of 64-dim int8 codes stays far below 2^53, so the
  * dot products are order-independent and bit-reproducible on any
  * engine, partitioning, or fold direction (unlike float sums). The
  * scale factors cancel in cosine, so quantized cosine needs no
  * dequantization — one double division at the end.
  */
object Quantization {

  /** Per-vector scale: 127 / max|v_i| (eps-guarded for zero vectors). */
  def scaleFor(vec: Column): Column =
    lit(127.0) / greatest(aggregate(vec,
      lit(0.0), (m, x) => greatest(m, abs(x.cast("double")))), lit(1e-30))

  /** Append `qscale` and `codes` (int8 values in longs; floor(v_i *
    * qscale) — `floor`, not `round`, has no round-half boundary
    * ambiguity across engines). `qscale` stays a real output column:
    * referenced once more inside the codes lambda, it is evaluated once
    * per row — folded into the lambda it would recompute the max-abs
    * fold per *element* (CollapseProject inlines single-use columns). */
  def quantized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("qscale", scaleFor(col(vecCol)))
      .withColumn("codes",
        transform(col(vecCol), x => floor(x.cast("double") * col("qscale")).cast("long")))
      // self dot precomputed at quantization time: search scans read it
      // instead of re-folding codes·codes per probe (codes is referenced
      // twice — output + norm2 — so it is not inlined per element)
      .withColumn("norm2", intDot(col("codes"), col("codes")))

  /** Integer dot product of two code arrays — exact, order-independent. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Cosine over quantized codes: intDot / (|a| |b|), integers until the
    * final double op. NaN-free: zero vectors quantize to all-zero codes,
    * guarded to 0.0. */
  def quantizedCosine(a: Column, b: Column): Column = {
    val denom = sqrt(intDot(a, a).cast("double")) * sqrt(intDot(b, b).cast("double"))
    when(denom === 0.0, 0.0).otherwise(intDot(a, b).cast("double") / denom)
  }

  /** Top-k by quantized cosine against one query vector: a scan +
    * TakeOrdered — the 4x-smaller codes column is all that's read.
    * `df` must come from [[quantized]] (uses its `norm2` column); the
    * query's norm is folded on the driver — the per-row work is ONE
    * codes·query dot, not three folds. */
  def topK(df: DataFrame, codesCol: String, queryCodes: Seq[Long], k: Int,
           tieCol: String): DataFrame = {
    val q = array(queryCodes.map(lit): _*)
    val qNorm = math.sqrt(queryCodes.map(c => c * c).sum.toDouble)
    val denom = sqrt(col("norm2").cast("double")) * lit(qNorm)
    df.withColumn("qcos",
        when(denom === 0.0, 0.0)
          .otherwise(intDot(col(codesCol), q).cast("double") / denom))
      .orderBy(desc("qcos"), col(tieCol).asc)
      .limit(k)
  }

  /** Group-affinity matrix in code space: for every group pair, the
    * cosine between the groups' RESULTANT vectors Σ codes — "which
    * classes/sources occupy the same embedding region", the pairwise
    * complement to the kNN label-purity audit (purity says how
    * separated the classes are; this says WHICH pairs collide).
    *
    * Exactness: the max-abs quantization scale involves NO
    * accumulation (a max fold + one division + one multiply + floor —
    * every step bit-identical cross-engine, unlike a norm-based scale
    * whose Σv² accumulates float error), so the per-dimension code
    * sums are exact longs and the pair dot/norms exact
    * decimal(38,0)/HUGEINT; ONE double division chain per pair at the
    * end. The statistic is the cosine of max-abs-normalized direction
    * sums — a deterministic, engine-replayable proxy for
    * mean-embedding cosine.
    *
    * Scale: the corpus-sized work is quantize + posexplode + one
    * (group, dim)-keyed sum — the shuffle carries #groups·dims cells,
    * never vectors; the pair stage runs on that metadata-sized table.
    * Output: (group_a, group_b, affinity-double-unrounded), a < b. */
  def codeSumAffinity(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val sums = quantized(df, vecCol)
      .select(col(groupCol).as("__g"), posexplode(col("codes")).as(Seq("__dim", "__c")))
      .groupBy("__g", "__dim").agg(sum("__c").as("__s"))
    val norms = sums.groupBy("__g")
      .agg(sum(dec(col("__s")) * dec(col("__s"))).as("__n2"))
    val dots = sums.select(col("__g").as("__ga"), col("__dim"), col("__s").as("__sa"))
      .join(sums.select(col("__g").as("__gb"), col("__dim"), col("__s").as("__sb")),
        Seq("__dim"))
      .filter(col("__ga") < col("__gb"))
      .groupBy("__ga", "__gb")
      .agg(sum(dec(col("__sa")) * dec(col("__sb"))).as("__dot"))
    dots
      .join(norms.select(col("__g").as("__ga"), col("__n2").as("__n2a")), Seq("__ga"))
      .join(norms.select(col("__g").as("__gb"), col("__n2").as("__n2b")), Seq("__gb"))
      .select(col("__ga").as("group_a"), col("__gb").as("group_b"),
        when(col("__n2a") === dec(lit(0)) || col("__n2b") === dec(lit(0)), lit(0.0))
          .otherwise(col("__dot").cast("double") /
            (sqrt(col("__n2a").cast("double")) *
              sqrt(col("__n2b").cast("double")))).as("affinity"))
  }
}
