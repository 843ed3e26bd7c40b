package graft.operators

import graft.SparkSpec

/** `Sampling.stratifiedSplit`: exact per-stratum proportions under a
  * deterministic hash order, invariant to input partitioning, equal to
  * a driver-side replica of the rank + floor-boundary contract.
  */
class StratifiedSplitSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def replica(rows: Seq[(Long, String)])
      : Map[Long, (Long, String)] = {
    val cum = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
    rows.groupBy(_._2).flatMap { case (_, g) =>
      val ranked = g.sortBy { case (id, _) => (md5Hash32(s"ss0|$id"), id) }
      val n = ranked.size.toLong
      val bounds = (cum.init.map(f => math.floor(f * n).toLong) :+ n).toArray
      ranked.zipWithIndex.map { case ((id, _), i) =>
        val rank = i + 1L
        id -> (rank, fracs(bounds.indexWhere(rank <= _))._1)
      }
    }
  }

  private def run(rows: Seq[(Long, String)], parts: Int)
      : Map[Long, (Long, String)] =
    Sampling.stratifiedSplit(
        rows.toDF("id", "src").repartition(parts), "id", "src", fracs)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("ss_rank"), r.getAs[String]("split"))).toMap

  test("exact per-stratum proportions with floor remainders to the last label") {
    // strata of size 20, 10, 3, 1 — small strata exercise the floors
    val rows = (0 until 20).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b")) ++
      (200 until 203).map(i => (i.toLong, "c")) ++
      Seq((300L, "d"))
    val got = run(rows, parts = 5)
    def dist(s: String) = rows.filter(_._2 == s)
      .groupBy(r => got(r._1)._2).view.mapValues(_.size).toMap
    assert(dist("a") == Map("train" -> 16, "val" -> 2, "test" -> 2))
    assert(dist("b") == Map("train" -> 8, "val" -> 1, "test" -> 1))
    // n=3: floor(2.4)=2 train, floor(2.7)-2=0 val, rest test
    assert(dist("c") == Map("train" -> 2, "test" -> 1))
    // n=1: floor(.8)=floor(.9)=0 -> the single row lands in the LAST label
    assert(dist("d") == Map("test" -> 1))
    assert(got == replica(rows))
  }

  test("assignment is invariant to input partitioning") {
    val rows = (0 until 97).map(i => (i.toLong, s"s${i % 4}"))
    assert(run(rows, parts = 1) == run(rows, parts = 13))
  }
}
