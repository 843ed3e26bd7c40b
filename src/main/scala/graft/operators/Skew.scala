package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys.
  *
  * AQE's skew-join split handles shuffle-join skew at runtime; these
  * cover the cases AQE cannot: aggregation skew (one giant group) and
  * broadcast-salted joins where one side's hot key would overload a
  * single task.
  */
object Skew {

  /** Two-phase salted aggregation: spread each group over `saltBuckets`
    * partial groups, aggregate, then merge partials. Correct for any
    * algebraic aggregate the caller expresses in (partial, merge) form.
    *
    * Example — count+sum per possibly-hot key:
    * {{{
    *   Skew.saltedAgg(df, Seq("k"), 16,
    *     partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *     merge   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
      lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)

  /** Salted broadcast-side replication join: the big (possibly skewed)
    * side gets a random salt in [0, saltBuckets); the small side is
    * replicated once per salt value. The join key becomes (key, salt),
    * so a hot key spreads across `saltBuckets` tasks. `smallSide` must
    * be broadcast-sized times `saltBuckets`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets))
        + lit(saltBuckets), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(broadcast(replicated), Seq(key, "__salt")).drop("__salt")
  }
}
