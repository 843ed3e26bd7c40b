package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Each loader is a plain `spark.read.parquet` so Catalyst retains full
  * pushdown freedom: filters and column pruning land in the parquet scan
  * (`PushedFilters` / `ReadSchema`), and partition-level parallelism is
  * governed by `spark.sql.files.maxPartitionBytes` — at 100 TB the same
  * call fans out to thousands of input splits with no code change.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    // events needs the nanos-timestamp workaround; routing it here makes
    // a raw (throwing) read of events.parquet unreachable via this API.
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Schema-adaptive loader for `events.ts` — the generator has shipped
    * it both as parquet TIMESTAMP(NANOS) (which Spark's reader rejects
    * unless nanos are surfaced as long via the legacy conf) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read natively as
    * TIMESTAMP_NTZ). Sniff the loaded type rather than hard-wiring one
    * physical layout:
    *
    *  - integral `ts` → nanos-as-long: convert with integer arithmetic
    *    (`div` stays in long space — nanos ~1.7e18 would lose precision
    *    through a double; truncation matches DuckDB's ns→us).
    *  - TIMESTAMP_NTZ → cast to TimestampType. Sessions here pin
    *    `spark.sql.session.timeZone=UTC`, so the cast preserves both the
    *    wall clock (date_format) and epoch micros (unix_micros), matching
    *    DuckDB's NTZ reading of the same file.
    *  - TimestampType → pass through.
    *
    * The legacy conf must stay set on the session: the parquet reader
    * consults it again when the scan RDD is materialized (first action),
    * so a save/restore scoped to this call would break lazy execution.
    * Setting it is harmless for non-nanos files. All events access routes
    * through here (Tables.table delegates), so no raw read can observe
    * the flag order-dependently. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case _: LongType | _: IntegerType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
