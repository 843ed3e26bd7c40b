package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Evaluation]]: exact rank-sum AUC (with ties) vs the O(n²)
  * pairwise definition, and threshold confusion tables vs hand
  * counting. */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  /** AUC by definition: P(s⁺ > s⁻) + ½·P(s⁺ = s⁻) over all
    * positive-negative pairs. */
  private def pairwiseAuc(rows: Seq[(Double, Int)]): Double = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size.toDouble)
  }

  test("aucByRank equals the pairwise definition, ties included") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      // coarse scores force plenty of exact ties
      val rows = (1 to 120).map { _ =>
        (rnd.nextInt(12) / 4.0, if (rnd.nextBoolean()) 1 else 0)
      }
      val got = Evaluation.aucByRank(
        rows.toDF("s", "l"), "s", "l").head()
      assert(got.getLong(0) === rows.count(_._2 == 1).toLong)
      assert(got.getLong(1) === rows.count(_._2 == 0).toLong)
      assert(math.abs(got.getDouble(2) - pairwiseAuc(rows)) < 1e-12,
        s"trial $trial")
    }
  }

  test("aucByRank: perfect separation -> 1.0, inverted -> 0.0, all-tied -> 0.5") {
    def auc(rows: Seq[(Double, Int)]): Double =
      Evaluation.aucByRank(rows.toDF("s", "l"), "s", "l")
        .head().getDouble(2)
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))) === 1.0)
    assert(auc(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))) === 0.0)
    assert(auc(Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0))) === 0.5)
  }

  test("NULL labels count as negatives in every cell, consistently") {
    val rows = Seq(
      (0.9, java.lang.Integer.valueOf(1)),
      (0.8, null.asInstanceOf[java.lang.Integer]),   // negative by rule
      (0.2, java.lang.Integer.valueOf(0)))
    val a = Evaluation.aucByRank(rows.toDF("s", "l"), "s", "l").head()
    assert(a.getLong(0) === 1L && a.getLong(1) === 2L)
    assert(a.getDouble(2) === 1.0)
    val c = Evaluation.confusionAtThresholds(rows.toDF("s", "l"),
      "s", "l", Seq(0.5)).head()
    // cells must sum to n: tp=1 fp=1 fn=0 tn=1
    assert((c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4)) ===
      ((1L, 1L, 0L, 1L)))
    val r = Evaluation.rocCurve(rows.toDF("s", "l"), "s", "l")
      .orderBy("score").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ===
      Seq((1L, 2L), (1L, 1L), (1L, 0L))) // ascending score
  }

  test("aucByRank: empty class -> NULL auc, counts still reported") {
    val got = Evaluation.aucByRank(
      Seq((0.3, 1), (0.7, 1)).toDF("s", "l"), "s", "l").head()
    assert(got.getLong(0) === 2L && got.getLong(1) === 0L)
    assert(got.isNullAt(2))
  }

  test("rocCurve equals the sorted-cumulation replica; trapezoid == rank AUC") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 150).map { _ =>
      (rnd.nextInt(10) / 3.0, if (rnd.nextInt(3) == 0) 1 else 0)
    }
    val got = Evaluation.rocCurve(rows.toDF("s", "l"), "s", "l")
      .orderBy(org.apache.spark.sql.functions.desc("score")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val nPos = rows.count(_._2 == 1).toLong
    val nNeg = rows.count(_._2 == 0).toLong
    // replica: distinct scores descending, cumulative tp/fp
    val per = rows.groupBy(_._1).view
      .mapValues(g => (g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong))
      .toSeq.sortBy(-_._1)
    val want = per.scanLeft((0.0, 0L, 0L)) { case ((_, tp, fp), (s, (p, q))) =>
      (s, tp + p, fp + q) }.drop(1)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === want)
    assert(got.last._4 === 1.0 && got.last._5 === 1.0) // curve ends at (1,1)
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted) // monotone
    // trapezoid area under (fpr, tpr) == the rank-sum AUC (ties make
    // the curve's diagonal segments exactly the 1/2 credit)
    val pts = (0.0, 0.0) +: got.map(t => (t._5, t._4)).toSeq
    val area = pts.sliding(2).map { case Seq((x0, y0), (x1, y1)) =>
      (x1 - x0) * (y0 + y1) / 2.0 }.sum
    val auc = Evaluation.aucByRank(rows.toDF("s", "l"), "s", "l")
      .head().getDouble(2)
    assert(math.abs(area - auc) < 1e-12)
  }

  test("confusionAtThresholds matches hand counts; boundary is >=") {
    val rows = Seq((0.2, 0), (0.5, 0), (0.5, 1), (0.8, 1))
    val got = Evaluation.confusionAtThresholds(
        rows.toDF("s", "l"), "s", "l", Seq(0.5, 0.9))
      .orderBy("threshold").collect()
    // t=0.5: predicted+ = {0.5,0.5,0.8} -> tp=2 fp=1 fn=0 tn=1
    assert(got(0).getLong(1) === 2L && got(0).getLong(2) === 1L &&
      got(0).getLong(3) === 0L && got(0).getLong(4) === 1L)
    assert(got(0).getDouble(5) === 2.0 / 3.0) // precision
    assert(got(0).getDouble(6) === 1.0)       // recall
    // t=0.9: nothing predicted positive -> precision NULL, recall 0
    assert(got(1).getLong(1) === 0L && got(1).getLong(2) === 0L)
    assert(got(1).isNullAt(5))
    assert(got(1).getDouble(6) === 0.0)
  }

  test("liftTable == driver replica; perfect ranking concentrates lift up front") {
    val rnd = new scala.util.Random(17)
    // 83 rows (deliberately not a multiple of 10), noisy scores
    val rows = (1 to 83).map { i =>
      (i.toLong, rnd.nextDouble() * 2 - 1, if (rnd.nextInt(3) == 0) 1 else 0)
    }
    val got = Evaluation.liftTable(rows.toDF("id", "z", "l"),
        "z", "l", "id", nBins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // driver replica: rank desc z (tie id asc), bin = ceil(r*10/n)
    val n = rows.length
    val totalP = rows.count(_._3 == 1)
    val ranked = rows.sortBy { case (id, z, _) => (-z, id) }.zipWithIndex
    val bins = ranked.groupBy { case (_, i) => ((i + 1) * 10 + n - 1) / n }
    var cum = 0L
    val want = bins.toSeq.sortBy(_._1).map { case (b, rs) =>
      val p = rs.count(_._1._3 == 1).toLong
      cum += p
      (b.toLong, rs.length.toLong, p,
        p.toDouble / rs.length,
        cum.toDouble / totalP,
        (p * n).toDouble / (rs.length.toLong * totalP))
    }
    assert(got.toSeq === want)
    // equal-depth: bin sizes differ by at most 1, all 10 bins present
    assert(got.map(_._1).toSeq === (1L to 10L))
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    assert(got.last._5 === 1.0) // cumulative capture ends at exactly 1
    // perfect ranking: all positives in the first bins, lift = N/P there
    val sep = (1 to 40).map(i => (i.toLong, -i.toDouble, if (i <= 4) 1 else 0))
    val g2 = Evaluation.liftTable(sep.toDF("id", "z", "l"),
        "z", "l", "id", nBins = 10)
      .orderBy("bin").collect()
    assert(g2(0).getLong(2) === 4L && g2(0).getDouble(5) === 10.0)
    assert(g2(0).getDouble(4) === 1.0) // bin 1 captures everything
    assert((1 to 9).forall(i => g2(i).getLong(2) === 0L))
  }
}
