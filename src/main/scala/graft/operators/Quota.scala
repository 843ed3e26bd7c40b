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

  /** Token-budget quota (training-mix building): admit rows per key in
    * `order` while the key's running token total stays <= `budget` —
    * PREFIX admission, the SQL-window semantics: one oversized row
    * blocks everything ranked after it in that key (deterministic;
    * knapsack-style skipping is a different, order-unstable policy).
    *
    * Same two-phase shape as [[perKeyTopN]]: the partition-local
    * running-sum pre-cap keeps a superset of the global admit set,
    * because a row's local predecessors are a subset of its global
    * predecessors and token counts are non-negative, so the local
    * running total is never larger than the global one. The dominant
    * key's exact window then sees only rows whose local prefix fit the
    * budget, not the key's whole corpus.
    *
    * Output = input + `cumCol` (cumulative tokens through this row).
    * `tokensCol` must be non-negative numeric. */
  def perKeyTokenBudget(df: DataFrame, keys: Seq[String], order: Seq[Column],
                        tokensCol: String, budget: Long,
                        cumCol: String = "cum_tokens"): DataFrame = {
    require(keys.nonEmpty, "perKeyTokenBudget requires at least one key column")
    require(budget > 0, "budget must be positive")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val tokIdx = schema.fieldIndex(tokensCol)
    val localSorted = df.sortWithinPartitions(keys.map(col) ++ order: _*)
    val preCapped = localSorted.mapPartitions { it =>
      var prev: Seq[Any] = null
      var run = 0L
      it.filter { row =>
        val k = keyIdx.map(row.get)
        if (prev == null || k != prev) { prev = k; run = 0L }
        run += row.get(tokIdx).asInstanceOf[Number].longValue
        run <= budget
      }
    }(Encoders.row(schema))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    preCapped
      .withColumn(cumCol, sum(col(tokensCol)).over(w))
      .filter(col(cumCol) <= budget)
  }

  /** [[perKeyTokenBudget]] with a PER-KEY budget carried on the rows
    * themselves (`budgetCol`, constant within each key — e.g. joined in
    * from a broadcast allocation table like
    * [[Mixture.unimaxAllocation]]'s output). Fully distributed: no
    * driver-side budget map, any key type/cardinality.
    *
    * Same two-phase shape and the same superset argument: a row's local
    * running total is <= its global one, and its budget is a per-key
    * CONSTANT, so every global admit survives the local pre-cap. Rows
    * with NULL/negative budgets are dropped (no allocation). */
  def perKeyTokenBudgets(df: DataFrame, keys: Seq[String], order: Seq[Column],
                         tokensCol: String, budgetCol: String,
                         cumCol: String = "cum_tokens"): DataFrame = {
    require(keys.nonEmpty, "perKeyTokenBudgets requires at least one key column")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val tokIdx = schema.fieldIndex(tokensCol)
    val budIdx = schema.fieldIndex(budgetCol)
    val localSorted = df.sortWithinPartitions(keys.map(col) ++ order: _*)
    val preCapped = localSorted.mapPartitions { it =>
      var prev: Seq[Any] = null
      var run = 0L
      it.filter { row =>
        val k = keyIdx.map(row.get)
        if (prev == null || k != prev) { prev = k; run = 0L }
        run += row.get(tokIdx).asInstanceOf[Number].longValue
        !row.isNullAt(budIdx) &&
          run <= row.get(budIdx).asInstanceOf[Number].longValue
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    preCapped
      .withColumn(cumCol, sum(col(tokensCol)).over(w))
      .filter(col(cumCol) <= col(budgetCol))
  }
}
