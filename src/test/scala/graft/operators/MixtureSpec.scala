package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UniMax mixture allocation (round 12): closed-form waterfilling vs a
  * driver-side replica of the paper's greedy loop, plus the budgeted
  * selection built on the per-key-budget quota. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  /** The greedy loop exactly as published: ascending scan, each key
    * takes min(cap, remaining / keysLeft). */
  private def greedy(avail: Seq[(String, Long)], budget: Double,
                     epochs: Double): Map[String, Double] = {
    val sorted = avail.sortBy { case (k, a) => (a * epochs, k) }
    var remaining = budget
    var left = sorted.size
    sorted.map { case (k, a) =>
      val alloc = math.min(a * epochs, remaining / left)
      remaining -= alloc
      left -= 1
      k -> alloc
    }.toMap
  }

  test("unimaxAllocation matches the greedy loop on random inputs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val avail = (0 until 12).map(i => s"k$i" -> (1L + rnd.nextInt(5000)))
      val budget = 1000L + rnd.nextInt(40000)
      val epochs = Seq(0.5, 1.0, 2.0, 3.0)(trial % 4)
      val got = Mixture.unimaxAllocation(
        avail.toDF("key", "toks"), "key", "toks", budget, epochs)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = greedy(avail, budget.toDouble, epochs)
        .map { case (k, v) => k -> math.floor(v).toLong }
      assert(got === want, s"trial $trial budget=$budget epochs=$epochs")
    }
  }

  test("unimaxAllocation: budget beyond total caps gives every key its cap") {
    val got = Mixture.unimaxAllocation(
      Seq(("a", 100L), ("b", 300L)).toDF("key", "toks"),
      "key", "toks", budget = 100000L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 200L, "b" -> 600L))
  }

  test("unimaxAllocation: all caps above the fair share -> uniform split") {
    val got = Mixture.unimaxAllocation(
      Seq(("a", 5000L), ("b", 9000L), ("c", 7000L)).toDF("key", "toks"),
      "key", "toks", budget = 3000L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 1000L, "b" -> 1000L, "c" -> 1000L))
  }

  test("unimaxAllocation: low-resource keys capped, rest split the remainder") {
    // caps 100, 200, 10000, 10000; B = 2300 -> a,b capped; c,d get 1000
    val got = Mixture.unimaxAllocation(
      Seq(("a", 100L), ("b", 200L), ("c", 10000L), ("d", 10000L))
        .toDF("key", "toks"),
      "key", "toks", budget = 2300L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 100L, "b" -> 200L, "c" -> 1000L, "d" -> 1000L))
  }

  test("unimaxSample: per-key admitted tokens within allocation; prefix order") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 800).map { i =>
      (i.toLong, s"s${rnd.nextInt(6)}", 1L + rnd.nextInt(200))
    }
    val df = rows.toDF("id", "src", "toks").repartition(7)
    val out = Mixture.unimaxSample(df, "src", "toks",
      order = Seq(Sampling.trainOrder(col("id")).asc, col("id").asc),
      budget = 20000L, maxEpochs = 1.0)
    val perKey = out.groupBy("src")
      .agg(max("cum_tokens").as("used"), max("alloc_tokens").as("alloc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perKey.nonEmpty)
    perKey.foreach { case (k, used, alloc) =>
      assert(used <= alloc, s"key $k used $used > alloc $alloc")
    }
    // equals the single-window replica over the same allocation
    val alloc = Mixture.unimaxAllocation(
      df.groupBy("src").agg(sum("toks").as("a")), "src", "a", 20000L, 1.0)
      .select(col("src"), col("alloc_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hashOf = (id: Long) => md5Hash32(s"0|$id")
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (k, rs) =>
      var cum = 0L
      rs.sortBy(r => (hashOf(r._1), r._1)).flatMap { r =>
        cum += r._3
        if (cum <= alloc(k)) Some(r._1) else None
      }
    }.toSet
    assert(out.select("id").collect().map(_.getLong(0)).toSet === expect)
  }

  test("temperatureAllocation matches a driver-side ordered-fold replica") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val avail = (0 until 9).map(i => s"k$i" -> (1L + rnd.nextInt(8000)))
      val budget = 5000L + rnd.nextInt(30000)
      val temp = Seq(1.0, 2.0, 5.0, 100.0)(trial - 1)
      val got = Mixture.temperatureAllocation(
        avail.toDF("key", "toks"), "key", "toks", budget, temp)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      // replica: weights summed as a sequential fold in (w, key) order —
      // the exact accumulation the ordered unbounded window performs
      val w = avail.map { case (k, a) => k -> math.pow(a.toDouble, 1.0 / temp) }
      val z = w.sortBy { case (k, x) => (x, k) }
        .foldLeft(0.0) { case (acc, (_, x)) => acc + x }
      val want = w.map { case (k, x) =>
        k -> math.floor(budget.toDouble * x / z).toLong
      }.toMap
      assert(got === want, s"trial $trial budget=$budget T=$temp")
    }
  }

  test("temperatureAllocation: T=1 is proportional, high T approaches uniform") {
    val avail = Seq(("a", 100L), ("b", 900L))
    val t1 = Mixture.temperatureAllocation(
      avail.toDF("key", "toks"), "key", "toks", budget = 1000L, 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(t1("a") === 100L && t1("b") === 900L)
    val t100 = Mixture.temperatureAllocation(
      avail.toDF("key", "toks"), "key", "toks", budget = 1000L, 100.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(t100("a") >= 480L && t100("b") <= 520L) // near-uniform split
  }

  test("temperatureSample admits within each key's temperature budget") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 500).map { i =>
      (i.toLong, s"s${rnd.nextInt(5)}", 1L + rnd.nextInt(150))
    }
    val df = rows.toDF("id", "src", "toks").repartition(5)
    val out = Mixture.temperatureSample(df, "src", "toks",
      order = Seq(Sampling.trainOrder(col("id")).asc, col("id").asc),
      budget = 12000L, temperature = 2.0)
    val perKey = out.groupBy("src")
      .agg(max("cum_tokens").as("used"), max("alloc_tokens").as("alloc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perKey.nonEmpty)
    perKey.foreach { case (k, used, alloc) =>
      assert(used <= alloc, s"key $k used $used > alloc $alloc")
    }
  }

  test("perKeyTokenBudgets: NULL-budget keys drop; matches window replica") {
    val df = Seq(
      (1L, "a", 10L, java.lang.Long.valueOf(25L)),
      (2L, "a", 10L, java.lang.Long.valueOf(25L)),
      (3L, "a", 10L, java.lang.Long.valueOf(25L)), // a: 2 rows fit in 25
      (4L, "b", 5L, null.asInstanceOf[java.lang.Long]),
      (5L, "c", 7L, java.lang.Long.valueOf(7L))
    ).toDF("id", "src", "toks", "alloc_tokens").repartition(3)
    val got = Quota.perKeyTokenBudgets(df, Seq("src"), Seq(asc("id")),
      "toks", budgetCol = "alloc_tokens")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 5L))
  }

  /** Driver replica of [[Sampling.trainOrder]]'s epoch-salted hash. */
  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("materializeEpochs equals the per-key full+prefix replica") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      (i.toLong, s"s${rnd.nextInt(4)}", 1L + rnd.nextInt(120))
    }
    val df = rows.toDF("id", "src", "toks").repartition(5)
    val budget = 60000L
    val maxEpochs = 2.5
    val got = Mixture.materializeEpochs(df, "src", "id", "toks",
        budget, maxEpochs)
      .select("id", "src", "epoch")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // replica: allocation from the (separately certified) closed form,
    // then fe full passes + the epoch-salted hash prefix worth rem
    val alloc = Mixture.unimaxAllocation(
      rows.groupBy(_._2).map { case (k, g) => (k, g.map(_._3).sum) }
        .toSeq.toDF("src", "toks"), "src", "toks", budget, maxEpochs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = rows.groupBy(_._2).flatMap { case (k, g) =>
      val (avail, a) = alloc(k)
      val fe = a / avail
      val rem = a - fe * avail
      val full = for (e <- 0L until fe; (id, _, _) <- g) yield (id, k, e)
      val prefix = g.sortBy { case (id, _, _) => (h32(s"$fe|$id"), id) }
        .scanLeft((0L, 0L, "", 0L)) { case ((cum, _, _, _), (id, _, t)) =>
          (cum + t, id, k, fe) }
        .drop(1).takeWhile(_._1 <= rem)
        .map { case (_, id, kk, e) => (id, kk, e) }
      full ++ (if (rem > 0) prefix else Nil)
    }.toSet
    assert(got === want)
  }

  test("materializeEpochs conserves the allocation per key") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map { i =>
      (i.toLong, s"s${rnd.nextInt(5)}", 1L + rnd.nextInt(90))
    }
    val out = Mixture.materializeEpochs(rows.toDF("id", "src", "toks"),
      "src", "id", "toks", budget = 30000L, maxEpochs = 3.0)
    val perKey = out.groupBy("src")
      .agg(sum("toks").as("used"), max("alloc_tokens").as("alloc"),
        max("epoch").as("maxep"))
      .collect()
    assert(perKey.nonEmpty)
    val maxTok = rows.map(_._3).max
    perKey.foreach { r =>
      val (used, alloc, maxep) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(used <= alloc, s"${r.getString(0)} used $used > alloc $alloc")
      assert(alloc - used < maxTok + 1,
        s"${r.getString(0)} under-fills by ${alloc - used}")
      assert(maxep <= 3L)
    }
  }

  test("materializeEpochs at maxEpochs=1 reproduces unimaxSample's admitted set") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 250).map { i =>
      (i.toLong, s"s${rnd.nextInt(4)}", 1L + rnd.nextInt(80))
    }
    val df = rows.toDF("id", "src", "toks")
    val mat = Mixture.materializeEpochs(df, "src", "id", "toks",
      budget = 9000L, maxEpochs = 1.0)
    assert(mat.agg(max("epoch")).head().getLong(0) === 0L)
    val got = mat.select("id").collect().map(_.getLong(0)).toSet
    val want = Mixture.unimaxSample(df, "src", "toks",
        order = Seq(Sampling.trainOrder(col("id")).asc, col("id").asc),
        budget = 9000L, maxEpochs = 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === want)
  }
}
