package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ADVICE r14 parity fix: the fixed 7-day epoch week bucket must FLOOR
  * like the DuckDB oracle's `//`, not truncate toward zero like Spark's
  * bare `div` — divergence only shows on pre-1970 timestamps, which the
  * driver fixtures never contain, so this spec is the gate. */
class WeekFloorSpec extends SparkSpec {
  import spark.implicits._

  private val secs = Seq(-1209601L, -1209600L, -604801L, -604800L,
    -604799L, -1L, 0L, 1L, 604799L, 604800L, 604801L, 1209599L)

  test("weekFloor == mathematical floor division at any epoch sign") {
    val rows = secs.toDF("s")
      .withColumn("ts", timestamp_seconds(col("s")))
      .select(col("s"), RelationalQueries.weekFloor.as("wk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    secs.foreach { v =>
      assert(rows(v) === Math.floorDiv(v, 604800L), s"floor at $v")
    }
  }

  test("the truncating form this fix replaced really diverges below zero") {
    val trunc = secs.toDF("s")
      .withColumn("ts", timestamp_seconds(col("s")))
      .select(col("s"), expr("cast(ts as long) div 604800").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(secs.exists(v => trunc(v) != Math.floorDiv(v, 604800L)))
    // and agrees above zero — the fixtures could never catch it
    assert(secs.filter(_ >= 0)
      .forall(v => trunc(v) == Math.floorDiv(v, 604800L)))
  }
}
