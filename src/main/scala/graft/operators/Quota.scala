package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key quotas (domain capping for training mixes): keep the top `n`
  * rows per key by an explicit order.
  *
  * A single `row_number() OVER (PARTITION BY key)` is correct but
  * serializes EVERY row of a dominant key through one window partition —
  * a 40%-of-corpus source at 100 TB is one task. This operator is
  * two-phase:
  *
  *   1. partition-local pre-cap: sort each input partition by
  *      (key, order) — a local sort, NO shuffle — and stream-keep the
  *      first `n` rows per key run. The global per-key top-n is a subset
  *      of the union of per-partition per-key top-n's, so this drops
  *      nothing that could survive phase 2.
  *   2. the exact window over the survivors: the dominant key now
  *      contributes <= n × inputPartitions rows, not its whole corpus.
  *
  * Keys must be scalar-comparable columns (the run detector compares key
  * tuples with ==). Output = input columns + `rankCol` (1-based). */
object Quota {

  def perKeyTopN(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 n: Int, rankCol: String = "rnk"): DataFrame = {
    require(keys.nonEmpty, "perKeyTopN requires at least one key column")
    require(n > 0, "quota must be positive")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val localSorted = df.sortWithinPartitions(keys.map(col) ++ order: _*)
    val preCapped = localSorted.mapPartitions { it =>
      var prev: Seq[Any] = null
      var kept = 0
      it.filter { row =>
        val k = keyIdx.map(row.get)
        if (prev == null || k != prev) { prev = k; kept = 0 }
        kept += 1
        kept <= n
      }
    }(Encoders.row(schema))
    preCapped
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col(rankCol) <= n)
  }
}
