package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact heavy hitters (round 12): two-phase candidate/verify vs the
  * naive GROUP BY, including the bounded Misra-Gries regime. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, t: Long) =
    df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("heavyItems equals the naive GROUP BY across partitionings") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item k appears ~N/k times
    val occurrences = (1 to 60).flatMap { k =>
      Seq.fill(600 / k)(s"item$k")
    } ++ (1 to 500).map(i => s"rare$i")
    val shuffled = rnd.shuffle(occurrences)
    for (parts <- Seq(1, 4, 13)) {
      val df = shuffled.toDF("item").repartition(parts)
      val got = HeavyHitters.heavyItems(df, "item", threshold = 25)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === naive(df, 25), s"parts=$parts")
      assert(got.nonEmpty)
    }
  }

  test("heavyItems stays exact when Misra-Gries decrements kick in") {
    // 2000 rare singletons force constant eviction at maxTracked=64;
    // the 3 heavy items must still surface with exact counts
    val rnd = new scala.util.Random(5)
    val occ = rnd.shuffle(
      Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++ Seq.fill(120)("hot3")
        ++ (1 to 2000).map(i => s"one$i"))
    val df = occ.toDF("item").repartition(4)
    val got = HeavyHitters.heavyItems(df, "item", threshold = 100,
      maxTracked = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("hot1", 300L), ("hot2", 200L), ("hot3", 120L)))
  }

  test("heavyItems fails loudly when the summary cannot certify absence") {
    val df = (1 to 100).map(i => s"u$i").toDF("item").repartition(1)
    val e = intercept[Exception] {
      HeavyHitters.heavyItems(df, "item", threshold = 1, maxTracked = 1)
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("superset guarantee")))
  }

  test("heavyNgrams: bigram construction, short/NULL docs contribute nothing") {
    val df = Seq(
      (1L, "a b a b a b"),   // "a b" x3, "b a" x2
      (2L, "a b"),           // "a b" x1
      (3L, "solo"),          // no bigram
      (4L, null.asInstanceOf[String]),
      (5L, "A B")            // lowercased -> "a b"
    ).toDF("doc_id", "text")
    val got = HeavyHitters.heavyNgrams(df, "text", n = 2, threshold = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a b", 5L), ("b a", 2L)))
  }

  test("heavyNgrams n=1 is plain token frequency") {
    val df = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val got = HeavyHitters.heavyNgrams(df, "text", n = 1, threshold = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("x", 3L)))
  }
}
