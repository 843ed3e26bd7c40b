package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The scale techniques SCALE.md describes, demonstrated and asserted at
  * the plan level: bucketed co-located joins (no shuffle) and salted
  * skew handling (correctness under rebalancing). */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the chunk⋈embedding join: no Exchange") {
    // clean any stale state from a previously interrupted run
    Seq("b_chunks", "b_embs").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      def del(f: java.io.File): Unit =
        if (f.exists()) { if (f.isDirectory) f.listFiles().foreach(del); f.delete() }
      del(loc)
    }
    val chunks = (0 until 2000)
      .map(i => (s"c$i", s"d${i / 10}", s"content $i"))
      .toDF("id", "docId", "content")
    val embs = (0 until 2000).map(i => (s"c$i", Array.fill(8)(i.toFloat)))
      .toDF("chunkId", "embedding")

    chunks.write.mode("overwrite")
      .bucketBy(8, "id").sortBy("id").saveAsTable("b_chunks")
    embs.write.mode("overwrite")
      .bucketBy(8, "chunkId").sortBy("chunkId").saveAsTable("b_embs")

    // force the shuffle-join path so bucketing (not broadcast) is what
    // eliminates the exchanges — the at-scale scenario where both sides
    // are too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_embs").join(spark.table("b_chunks"),
        col("chunkId") === col("id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 2000)

      // contrast: the same join over plain (unbucketed) frames shuffles
      val unbucketed = embs.join(chunks, col("chunkId") === col("id"))
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_chunks")
      spark.sql("DROP TABLE IF EXISTS b_embs")
    }
  }

  test("salted aggregation matches plain aggregation on skewed data") {
    // 90% of rows share one hot key
    val rows = (0 until 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toLong)
    }.toDF("k", "v")
    val plain = rows.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(rows, Seq("k"), 16,
      partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
      merge = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === plain)
  }

  test("salted broadcast join matches plain join on skewed keys") {
    val big = (0 until 5000).map(i => (if (i % 5 == 0) "a" else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", 1), ("a", 2), ("unused", 3)).toDF("k", "w")
    val plain = big.join(small, Seq("k"))
      .agg(count(lit(1)), sum($"v" * $"w")).head()
    val salted = Skew.saltedJoin(big, small, "k", 8)
      .agg(count(lit(1)), sum($"v" * $"w")).head()
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getLong(1) === plain.getLong(1))
  }
}
