package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing: distributed prefix sum + fixed-length chunk math. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("cum/seq/pos/spans match the hand-computed stream layout") {
    // order by id: tokens 3, 5, 4, 0, 6 -> cum 3, 8, 12, 12, 18; L = 5
    val df = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 0L), (5L, 6L))
      .toDF("id", "toks")
    val out = Packing.packSequences(df, "id", "toks", Seq(col("id")),
        seqLen = 5, numPartitions = 2)
      .select("id", "cum_tokens", "seq_id", "seq_pos", "spans")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((3L, 0L, 0L, 1L)))   // [0,3) in seq 0
    assert(out(2L) === ((8L, 0L, 3L, 2L)))   // [3,8) straddles seqs 0-1
    assert(out(3L) === ((12L, 1L, 3L, 2L)))  // [8,12) straddles 1-2
    assert(out(4L) === ((12L, 2L, 2L, 0L)))  // empty doc: no positions
    assert(out(5L) === ((18L, 2L, 2L, 2L)))  // [12,18) spans 2-3
  }

  test("prefix sum is exact and partitioning-invariant") {
    val df = (1L to 500L).map(i => (i, i % 17)).toDF("id", "toks")
    def run(parts: Int) =
      Packing.packSequences(df.repartition(parts), "id", "toks",
          Seq(col("id")), seqLen = 64, numPartitions = parts)
        .select("id", "cum_tokens", "seq_id", "seq_pos", "spans")
        .orderBy("id").collect().map(_.toSeq).toSeq
    val one = run(1)
    assert(run(7) === one)
    assert(run(32) === one)
    // final cumulative equals the exact total
    assert(one.last(1) === (1L to 500L).map(_ % 17).sum)
  }

  test("NULL token counts contribute 0, like the SQL window SUM") {
    // a NULL wordCount (e.g. from NULL text under Spark 4's split
    // semantics) must neither NPE the prefix sum nor shift the stream
    val df = Seq((1L, Some(3L)), (2L, None), (3L, Some(5L)),
        (4L, None), (5L, Some(4L)))
      .toDF("id", "toks")
    val out = Packing.packSequences(df, "id", "toks", Seq(col("id")),
        seqLen = 4, numPartitions = 3)
      .select("id", "cum_tokens", "seq_id", "seq_pos", "spans")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((3L, 0L, 0L, 1L)))
    assert(out(2L) === ((3L, 0L, 3L, 0L)))   // NULL = token-less doc
    assert(out(3L) === ((8L, 0L, 3L, 2L)))
    assert(out(4L) === ((8L, 2L, 0L, 0L)))
    assert(out(5L) === ((12L, 2L, 0L, 1L)))
    // an all-NULL partition must not NPE the per-partition totals
    val allNull = Seq((1L, None: Option[Long]), (2L, None)).toDF("id", "toks")
    val nn = Packing.packSequences(allNull, "id", "toks", Seq(col("id")),
        seqLen = 4, numPartitions = 2)
      .select("cum_tokens").collect().map(_.getLong(0))
    assert(nn.forall(_ === 0L))
  }

  test("ordering column (not id) drives the layout") {
    // reverse order: id 2 (10 toks) first, then id 1 (3 toks)
    val df = Seq((1L, 3L, 2L), (2L, 10L, 1L)).toDF("id", "toks", "ord")
    val out = Packing.packSequences(df, "id", "toks", Seq(col("ord")),
        seqLen = 8, numPartitions = 2)
      .select("id", "cum_tokens", "seq_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L) === ((10L, 0L)))
    assert(out(1L) === ((13L, 1L)))  // starts at 10 -> seq 1
  }

  test("packRankedPrefix equals rank -> admit -> pack, across partitionings and fractions") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 157).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(9).toLong))
    def replica(f: Double): Map[Long, (Long, Long, Long)] = {
      val sorted = rows.sortBy { case (id, _, key) => (-key, id) }
      val k = math.ceil(f * sorted.size).toLong
      var cum = 0L
      sorted.zipWithIndex.takeWhile(_._2 < k).map { case ((id, t, _), i) =>
        cum += t
        id -> (i + 1L, cum, (cum - t) / 64)
      }.toMap
    }
    for (parts <- Seq(1, 7); f <- Seq(2.0 / 3.0, 0.3, 1.0)) {
      val got = Packing.packRankedPrefix(
          rows.toDF("id", "t", "key").repartition(parts),
          "id", "t", Seq(col("key").desc), seqLen = 64, admitFraction = f)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("rank"), r.getAs[Long]("cum_tokens"),
            r.getAs[Long]("seq_id"))).toMap
      assert(got == replica(f), s"parts=$parts f=$f")
    }
  }

  test("prefixSums: multi-column pass == per-column sorted replica, NULLs skip") {
    val rnd = new scala.util.Random(61)
    val rows = (1 to 300).map { i =>
      (i.toLong,
        if (i % 17 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(50).toLong),
        rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)
    }
    for (parts <- Seq(1, 9)) {
      val got = Packing.prefixSums(
          rows.toDF("id", "a", "b", "key").repartition(parts),
          "id", Seq("a", "b"), Seq(col("key").asc))
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("cum_a"), r.getAs[Long]("cum_b"))).toMap
      var ca = 0L; var cb = 0L
      val want = rows.sortBy { case (id, _, _, k) => (k, id) }.map {
        case (id, a, b, _) =>
          ca += (if (a == null) 0L else a.longValue); cb += b
          id -> (ca, cb)
      }.toMap
      assert(got === want, s"parts=$parts")
    }
  }
}
