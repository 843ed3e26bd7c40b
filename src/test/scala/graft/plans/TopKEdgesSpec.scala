package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate against a driver-side reference: exact
  * under any partitioning (partial top-k serialization is lossless for
  * the global top-k), (cos desc, dst asc) tie-breaks, null inputs
  * skipped, round-trip through serialize/deserialize. */
class TopKEdgesSpec extends SparkSpec {
  import spark.implicits._

  private def runAgg(rows: Seq[(Long, Long, Double)], k: Int,
                     parts: Int): Map[Long, Seq[(Long, Double)]] = {
    val topk = GraftBridge.column(
      TopKEdges(GraftBridge.expression(col("dst")),
        GraftBridge.expression(col("cos_sim")), k).toAggregateExpression())
    rows.toDF("src", "dst", "cos_sim").repartition(parts)
      .groupBy("src").agg(topk.as("top"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getDouble(1))).toSeq
      }.toMap
  }

  test("matches the reference sort under every partitioning; output sorted (cos desc, dst asc)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(400).toLong,
        math.floor(rnd.nextDouble() * 20) / 20.0) // coarse -> real ties
    }.distinct // dst distinct per (src, dst) like the edge builders
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sortBy { case (d, c) => (-c, d) }.take(7))
      .toMap
    for (parts <- Seq(1, 3, 32)) {
      val got = runAgg(rows, 7, parts)
      assert(got.keySet === want.keySet, s"parts=$parts")
      want.foreach { case (s, w) =>
        assert(got(s) === w, s"src=$s parts=$parts") }
    }
  }

  test("null dst/cos rows are skipped; groups smaller than k return all members") {
    val df = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 0.9), (1L, null, 0.8), (1L, 11L, null), (1L, 12L, 0.7),
      (2L, 20L, 0.1))
      .toDF("src", "dst", "cos_sim")
    val topk = GraftBridge.column(
      TopKEdges(GraftBridge.expression(col("dst")),
        GraftBridge.expression(col("cos_sim")), 5).toAggregateExpression())
    val got = df.groupBy("src").agg(topk.as("top"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getDouble(1))).toSeq
      }.toMap
    assert(got(1L) === Seq((10L, 0.9), (12L, 0.7)))
    assert(got(2L) === Seq((20L, 0.1)))
  }

  test("bit-identical duplicate rows dedup inside the buffer (VERDICT r16 #6)") {
    // the reverse harvest emits a pair in both orientations with the
    // SAME bits; the buffer must not let the duplicate occupy a second
    // top-k slot or displace the true k-th candidate — this is what
    // replaced the candidate-volume distinct() shuffle
    val base = (1 to 40).map(i => (1L, i.toLong, i / 40.0))
    val want = base.map(t => (t._2, t._3))
      .sortBy { case (d, c) => (-c, d) }.take(5)
    for (parts <- Seq(1, 2, 7)) { // dups within AND across partials
      val got = runAgg(base ++ base, 5, parts)(1L)
      assert(got === want, s"parts=$parts")
    }
    // same dst with DIFFERENT cos is not merged — whole-row semantics,
    // exactly what distinct() used to do
    val mixed = Seq((1L, 10L, 0.9), (1L, 10L, 0.8), (1L, 11L, 0.85))
    assert(runAgg(mixed, 3, 1)(1L) ===
      Seq((10L, 0.9), (11L, 0.85), (10L, 0.8)))
    // saturation path: duplicates past the cap trim correctly
    val heavy = (1 to 2000).flatMap(i =>
      Seq((1L, (i % 50).toLong, (i % 50) / 50.0)))
    val wantH = (0 until 50).map(d => (d.toLong, d / 50.0))
      .sortBy { case (d, c) => (-c, d) }.take(7)
    assert(runAgg(heavy, 7, 3)(1L) === wantH)
  }

  test("buffer round-trips through serialize/deserialize; partials keep only top-k") {
    val agg = TopKEdges(GraftBridge.expression(lit(0L)),
      GraftBridge.expression(lit(0.0)), 3)
    val b = agg.createAggregationBuffer()
    (1 to 500).foreach(i => b.add(i.toLong, (i % 37) / 37.0))
    val bytes = agg.serialize(b)
    // the partial serializes only its k best — the shuffle bound
    assert(bytes.length === 4 + 16 * 3)
    val b2 = agg.deserialize(bytes)
    assert(b2.n === 3)
    val back = (0 until b2.n).map(i => (b2.ids(i), b2.cs(i))).toSet
    b.trim()
    assert(back === (0 until b.n).map(i => (b.ids(i), b.cs(i))).toSet)
  }
}
