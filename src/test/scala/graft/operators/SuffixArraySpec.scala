package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Literal suffix-array construction (Manber-Myers prefix doubling +
  * Kasai LCP) against brute force, the distributed rounds against the
  * local reference, and the ExactSubstr COVERAGE-EQUIVALENCE property:
  * SA/LCP duplicated positions == k-gram duplicated-window coverage —
  * the two substring-dedup implementations certify each other. */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private val tokensGen = Gen.chooseNum(0, 60)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 3)).map(_.toArray))

  private def bruteSa(t: Array[Int]): Array[Int] =
    t.indices.toArray.sortWith { (a, b) =>
      val (sa, sb) = (t.drop(a).toSeq, t.drop(b).toSeq)
      import scala.math.Ordering.Implicits._
      sa < sb
    }

  test("buildLocal == brute suffix sort (ScalaCheck)") {
    val prop = Prop.forAllNoShrink(tokensGen) { t =>
      SuffixArray.buildLocal(t).toSeq == bruteSa(t).toSeq
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("lcpLocal == brute pairwise longest common prefix (ScalaCheck)") {
    def bruteLcp(t: Array[Int], a: Int, b: Int): Int = {
      var k = 0
      while (a + k < t.length && b + k < t.length && t(a + k) == t(b + k)) k += 1
      k
    }
    val prop = Prop.forAllNoShrink(tokensGen.suchThat(_.nonEmpty)) { t =>
      val sa = SuffixArray.buildLocal(t)
      val lcp = SuffixArray.lcpLocal(t, sa)
      (1 until t.length).forall(j => lcp(j) == bruteLcp(t, sa(j), sa(j - 1))) &&
        lcp(0) == 0
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("ExactSubstr coverage equivalence: SA/LCP positions == k-gram coverage") {
    // position p is k-gram-covered iff some k-window containing p has a
    // value occurring at >= 2 distinct positions — the certified
    // substringDedup semantics; the SA/LCP scan must mark EXACTLY that set
    def kgramCoverage(t: Array[Int], k: Int): Set[Int] = {
      val byVal = (0 to t.length - k).groupBy(i => t.slice(i, i + k).toSeq)
      byVal.values.filter(_.size >= 2)
        .flatMap(starts => starts.flatMap(s => s until s + k)).toSet
    }
    val gen = for { t <- tokensGen; k <- Gen.chooseNum(1, 5) } yield (t, k)
    val prop = Prop.forAllNoShrink(gen) { case (t, k) =>
      SuffixArray.duplicatedPositions(t, k).toSet == kgramCoverage(t, k)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed prefix doubling == local reference") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 2, 17, 100, 257)) {
      val t = Array.fill(n)(rnd.nextInt(4))
      val ds = t.zipWithIndex.map { case (tok, i) => (i.toLong, tok) }
        .toSeq.toDS()
      val got = SuffixArray.build(spark, ds)
        .orderBy("rank").select("pos").as[Long].collect().map(_.toInt)
      assert(got.toSeq === SuffixArray.buildLocal(t).toSeq, s"n=$n")
    }
  }
}
