package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, udf}

/** `TextAnalysis.sourceOverlap` (cross-source n-gram overlap matrix)
  * and `TextAnalysis.charEntropy` against driver-side replicas.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("sourceOverlap equals the pairwise distinct-trigram-set replica") {
    val docs = Seq(
      ("a", "alpha beta gamma delta epsilon"),
      ("a", "one two three four"),
      ("b", "alpha beta gamma something else entirely"),
      ("b", "one two three different"),
      ("c", "totally disjoint content lives here"),
      ("d", "xx")) // < 3 tokens -> no grams, absent from the matrix
    def grams(ts: Seq[String]): Set[String] = ts.flatMap { t =>
      val w = t.toLowerCase.split(" ").filter(_.nonEmpty)
      (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
    }.toSet
    val bySrc = docs.groupBy(_._1).view.mapValues(g => grams(g.map(_._2))).toMap
    val want = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      inter = (bySrc(a) & bySrc(b)).size if inter > 0
    } yield (a, b) -> (inter.toLong, bySrc(a).size.toLong, bySrc(b).size.toLong,
      inter.toDouble / (bySrc(a).size + bySrc(b).size - inter))).toMap
    val got = TextAnalysis.sourceOverlap(
        docs.toDF("source", "text"), "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got == want)
    assert(!got.keySet.exists(p => p._1 == "d" || p._2 == "d"))
  }

  test("charEntropy matches the histogram formula; degenerate docs pin to exactly 0.0") {
    val docs = Seq(1L -> "abab", 2L -> "aaaa", 3L -> "", 4L -> "abcdefgh",
      5L -> "Mixed CASE mixed case")
    val got = TextAnalysis.charEntropy(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def h(t: String): Double = {
      val s = t.toLowerCase
      if (s.isEmpty) 0.0
      else {
        val acc = s.groupBy(identity).toSeq.sortBy(_._1).map { case (_, g) =>
          val p = g.length.toDouble / s.length
          p * math.log(p)
        }.foldLeft(0.0)(_ + _)
        val e = -acc / 0.6931471805599453
        if (e == 0.0) 0.0 else e
      }
    }
    docs.foreach { case (id, t) =>
      assert(got(id)._1 == t.length.toLong, s"n_chars $id")
      assert(got(id)._3 == h(t), s"entropy $id")
    }
    // two equiprobable symbols -> exactly 1 bit? (2 chars, p=.5 each:
    // -2*(.5*ln .5)/ln2 — IEEE-exact to 1.0 since ln(.5) = -ln(2))
    assert(math.abs(got(1L)._3 - 1.0) < 1e-12)
    assert(got(1L)._2 == 2L)
    // degenerate docs: positive zero bit pattern, never -0.0
    for (id <- Seq(2L, 3L)) {
      assert(got(id)._3 == 0.0)
      assert(java.lang.Double.doubleToRawLongBits(got(id)._3) == 0L, s"-0.0 leak $id")
    }
    assert(got(3L)._2 == 0L)
    // uniform 8 distinct chars -> 3 bits
    assert(math.abs(got(4L)._3 - 3.0) < 1e-12)
    // case-folding: "Mixed CASE mixed case" counts m/c/etc. once folded
    assert(got(5L)._2 == "mixed case ".toSet.size.toLong)
  }

  test("sourceDivergence equals the driver KL replica; identical slices read ~0") {
    val docs = Seq(
      ("a", "x x y z"), ("a", "x y z z"), // mixed
      ("b", "x x y z x y z z"), // same distribution as a -> KL(b||corpus) ~ KL(a||corpus)
      ("c", "w w w w w w w w")) // disjoint-ish skew -> large KL
    val got = TextAnalysis.sourceDivergence(
        docs.toDF("source", "text"), "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val corpus = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val cc = corpus.groupBy(identity).view.mapValues(_.size).toMap
    val n = corpus.size.toDouble
    def kl(src: String): Double = {
      val toks = docs.filter(_._1 == src).flatMap(_._2.split(" ")).filter(_.nonEmpty)
      val sc = toks.groupBy(identity).view.mapValues(_.size).toMap
      sc.toSeq.sortBy(_._1).map { case (t, c) =>
        val ps = c / toks.size.toDouble
        ps * math.log(ps / (cc(t) / n))
      }.sum
    }
    for (s <- Seq("a", "b", "c")) {
      assert(math.abs(got(s)._3 - kl(s)) < 1e-9, s)
      assert(got(s)._1 == docs.filter(_._1 == s)
        .flatMap(_._2.split(" ")).count(_.nonEmpty).toLong)
    }
    assert(math.abs(got("a")._3 - got("b")._3) < 1e-9) // same distribution
    assert(got("c")._3 > got("a")._3 + 0.5) // the skewed slice stands out
    assert(got("c")._2 == 1L)
  }

  test("sourceJsDivergence == driver replica, bounded [0,1]; skew ranks like KL without exploding") {
    val docs = Seq(
      ("a", "x x y z"), ("a", "x y z z"),
      ("b", "x x y z x y z z"),      // same distribution as a
      ("c", "w w w w w w w w"))      // token disjoint from a/b
    val got = TextAnalysis.sourceJsDivergence(
        docs.toDF("source", "text"), "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // full-vocabulary driver replica (no telescoped tail): for every
    // corpus token, p = src prob (0 if absent), q = corpus prob
    val corpus = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val cc = corpus.groupBy(identity).view.mapValues(_.size).toMap
    val n = corpus.size.toDouble
    def jsd(src: String): Double = {
      val toks = docs.filter(_._1 == src).flatMap(_._2.split(" "))
        .filter(_.nonEmpty)
      val sc = toks.groupBy(identity).view.mapValues(_.size).toMap
      cc.toSeq.sortBy(_._1).map { case (t, c) =>
        val p = sc.getOrElse(t, 0) / toks.size.toDouble
        val q = c / n
        val m = (p + q) / 2.0
        (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
      }.sum / 2.0 / math.log(2.0)
    }
    for (s <- Seq("a", "b", "c")) {
      assert(math.abs(got(s)._3 - jsd(s)) < 1e-9, s)
      assert(got(s)._3 >= 0.0 && got(s)._3 <= 1.0, s)
    }
    assert(math.abs(got("a")._3 - got("b")._3) < 1e-9) // same distribution
    assert(got("c")._3 > got("a")._3 + 0.2) // skew still stands out
    // one source owning the whole corpus: p == q everywhere -> exactly 0
    val solo = Seq(("only", "u v w u")).toDF("source", "text")
    val g0 = TextAnalysis.sourceJsDivergence(solo, "source", "text")
      .head().getDouble(3)
    assert(math.abs(g0) < 1e-12)
  }

  test("per-language CCNet: scores use the language's own LM; terciles rank within language") {
    // "rare rare" is likely in lang a (half its corpus) but would be
    // OOV-ish under a global LM dominated by lang b
    val docs = Seq(
      (1L, "a", "rare rare rare rare"),
      (2L, "a", "rare rare odd odd"),
      (3L, "a", "odd odd odd singleton"),
      (4L, "b", "common common common common common"),
      (5L, "b", "common common common filler"),
      (6L, "b", "filler words only here"))
    val df = docs.toDF("doc_id", "lang", "text")
    val scored = TextAnalysis.unigramQualityPerStratum(df, "doc_id", "text", "lang")
    val out = TextAnalysis.ccnetBucketsPerStratum(scored, "stratum")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("stratum"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("lm_key"), r.getAs[Long]("rank"),
          r.getAs[String]("bucket"))).toMap
    // replica: per-lang Laplace unigram mean log10 prob
    val byLang = docs.groupBy(_._2)
    val repl = docs.map { case (id, lg, t) =>
      val corpus = byLang(lg).flatMap(_._3.split(" ")).filter(_.nonEmpty)
      val counts = corpus.groupBy(identity).view.mapValues(_.size).toMap
      val n = corpus.size.toDouble
      val ws = t.split(" ").filter(_.nonEmpty)
      val avg = ws.map(w => math.log10((counts(w) + 1.0) / (n + 1.0))).sum / ws.length
      id -> BigDecimal(avg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    docs.foreach { case (id, lg, t) =>
      assert(out(id)._1 == lg && out(id)._2 == t.split(" ").count(_.nonEmpty))
      assert(math.abs(out(id)._3 - repl(id)) < 2e-6, s"lm_key $id")
    }
    // each language ranks 1..3 independently with one doc per tercile
    for (lg <- Seq("a", "b")) {
      val ranks = out.collect { case (_, (`lg`, _, _, r, b)) => (r, b) }.toSeq.sorted
      assert(ranks == Seq((1L, "head"), (2L, "middle"), (3L, "tail")), lg)
    }
    // within-language ordering follows the language-local score
    assert(out(4L)._5 == "head") // most-likely doc of lang b
  }

  test("zipfSpectrum: ranks/freqs match hand counts; slope vs OLS replica") {
    // freqs 16,8,4,2: ln(freq) = ln(16) - rank'*ln(2) exactly linear
    // in log2-space but NOT in ln(rank) -> slope from the OLS replica
    val docs = Seq.fill(16)("a").zipWithIndex.map(_._1) ++
      Seq.fill(8)("b") ++ Seq.fill(4)("c") ++ Seq.fill(2)("d") ++ Seq("e")
    val df = docs.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val out = graft.operators.CorpusStats.zipfSpectrum(df, "text", topN = 4)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "a", 16L), (2L, "b", 8L), (3L, "c", 4L), (4L, "d", 2L)))
    val x = (1 to 4).map(i => math.log(i.toDouble))
    val y = Seq(16.0, 8.0, 4.0, 2.0).map(math.log)
    val n = 4.0
    val slope = (n * x.zip(y).map { case (a, b) => a * b }.sum -
      x.sum * y.sum) / (n * x.map(a => a * a).sum - x.sum * x.sum)
    assert(math.abs(out.head.getDouble(3) - slope) < 2e-6)
    assert(out.map(_.getDouble(3)).distinct.length === 1)
  }

  test("tokenizerFertility aggregates per stratum with exact ratios") {
    val docs = Seq(
      (1L, "en", "aa bb"),        // 5 chars, 2 words
      (2L, "en", "cc dd ee"),     // 8 chars, 3 words
      (3L, "de", "ffff")          // 4 chars, 1 word
    ).toDF("id", "lang", "text")
    val counts = Seq((1L, 4L), (2L, 6L), (3L, 2L)).toDF("id", "bpe_tokens")
    val got = graft.operators.CorpusStats.tokenizerFertility(
        docs, "id", "text", "lang", counts)
      .orderBy("lang").collect()
    // de: 4 chars / 2 toks = 2.0; 2 toks / 1 word = 2.0
    assert(got(0).getString(0) === "de" && got(0).getLong(1) === 1L)
    assert(got(0).getDouble(5) === 2.0 && got(0).getDouble(6) === 2.0)
    // en: 13 chars / 10 toks; 10 toks / 5 words
    assert(got(1).getLong(2) === 13L && got(1).getLong(3) === 5L &&
      got(1).getLong(4) === 10L)
    assert(got(1).getDouble(5) === 1.3 && got(1).getDouble(6) === 2.0)
  }

  test("kmvDistinct: estimate within KMV error bounds; exact below k") {
    import org.apache.spark.sql.functions.col
    // 20k distinct items: estimate should land within ~4 standard
    // errors (4/sqrt(k-2) ~ 25% at k=256); typical is ~6%
    val big = (1 to 20000).map(i => s"item$i").toDF("g")
    val est = CorpusStats.kmvDistinct(big, col("g"), k = 256).head()
    assert(est.getLong(0) === 256L)
    val d = est.getDouble(2)
    assert(math.abs(d - 20000.0) / 20000.0 < 4.0 / math.sqrt(254.0), d)
    // repartitioning must not change a deterministic sketch
    val est2 = CorpusStats.kmvDistinct(big.repartition(17), col("g"), 256)
      .head()
    assert(est2.getDouble(2) === d && est2.getLong(1) === est.getLong(1))
    // below k the sketch saw everything: exact, not estimated
    val small = (1 to 100).map(i => s"x$i").toDF("g")
    val se = CorpusStats.kmvDistinct(small, col("g"), k = 256).head()
    assert(se.getLong(0) === 100L && se.getDouble(2) === 100.0)
    // duplicates collapse before the sketch
    val dup = ((1 to 50) ++ (1 to 50)).map(i => s"d$i").toDF("g")
    assert(CorpusStats.kmvDistinct(dup, col("g"), 256)
      .head().getDouble(2) === 50.0)
    // NULL items are not items
    val withNull = (Seq("x", null, "y"): Seq[String]).toDF("g")
    assert(CorpusStats.kmvDistinct(withNull, col("g"), 256)
      .head().getDouble(2) === 2.0)
  }

  test("collapseTokenRuns: consecutive duplicates collapse, non-adjacent survive") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "the the the cat sat sat on the mat"),
      (2L, "a b a b a b"),            // alternating: nothing to collapse
      (3L, "x  x   x"),               // multi-space runs still adjacent
      (4L, ""),                       // empty
      (5L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.collapseTokenRuns(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) === ((9L, 6L, 3L, "the cat sat on the mat")))
    assert(got(2L) === ((6L, 6L, 0L, "a b a b a b")))
    assert(got(3L) === ((3L, 1L, 2L, "x")))
    assert(got(4L) === ((0L, 0L, 0L, "")))
    assert(got(5L) === ((1L, 1L, 0L, "solo")))
    // idempotent: collapsing the cleaned text removes nothing further
    val again = TextAnalysis.collapseTokenRuns(
      TextAnalysis.collapseTokenRuns(df, "doc_id", "text")
        .select(col("id").as("doc_id"), col("clean_text").as("text")),
      "doc_id", "text")
    assert(again.collect().forall(_.getLong(3) === 0L))
  }

  test("kmvPairOverlap == driver-side sketch replica; exact regime below k") {
    import org.apache.spark.sql.functions.col
    // 3 sources with engineered overlap: A∩B = 300 of 800/900, C disjoint
    val rows =
      (1 to 800).map(i => ("A", s"it$i")) ++
      (501 to 1400).map(i => ("B", s"it$i")) ++
      (1 to 700).map(i => ("C", s"other$i"))
    val df = rows.toDF("src", "g")
    val k = 64
    val got = CorpusStats.kmvPairOverlap(df, "src", col("g"), k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    // driver replica of the full sketch algebra over the same hash
    def h32(s: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md5.take(4).map("%02x".format(_)).mkString, 16)
    }
    val bySrc = rows.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(r => h32(r._2)).distinct.sorted.take(k)
    }
    for (Seq(a, b) <- Seq("A", "B", "C").combinations(2)) {
      val union = (bySrc(a) ++ bySrc(b)).distinct.sorted.take(k)
      val common = union.count(x => bySrc(a).contains(x) && bySrc(b).contains(x))
      val eu = if (union.length < k) union.length.toDouble
        else (k - 1).toDouble * 4294967296.0 / union.max
      val ej = common.toDouble / union.length
      val (gc, gk, geu, gej, gei) = got((a, b))
      assert(gc === common.toLong && gk === union.max, s"pair $a-$b")
      assert(geu === eu && gej === ej && gei === ej * eu, s"pair $a-$b")
    }
    // true Jaccard(A,B) = 300/1400 ≈ 0.214: the estimate should be in
    // the right neighborhood (binomial error ~ sqrt(p(1-p)/k) ~ 0.05)
    assert(math.abs(got(("A", "B"))._4 - 300.0 / 1400.0) < 0.2)
    assert(got(("A", "C"))._1 === 0L) // disjoint sources share nothing
    // exact regime: tiny sources report exact set sizes
    val tiny = (Seq(("X", "p"), ("X", "q"), ("Y", "q"), ("Y", "r")))
      .toDF("src", "g")
    val t = CorpusStats.kmvPairOverlap(tiny, "src", col("g"), k = 64)
      .head()
    assert(t.getDouble(4) === 3.0 && t.getLong(2) === 1L) // |X∪Y|=3, |X∩Y|=1
    assert(t.getDouble(5) === 1.0 / 3.0 && t.getDouble(6) === (1.0 / 3.0) * 3.0)
  }

  test("exactPercentiles == nearest-rank on the sorted stratum, ties included") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(29)
    // coarse values force ties inside every stratum
    val rows = (1 to 500).map(i => (s"s${i % 4}", (rnd.nextInt(40) * 10).toLong))
    val got = graft.operators.CorpusStats.exactPercentiles(
        rows.toDF("src", "v").repartition(7), "v", "src",
        Seq(0.25, 0.5, 0.9, 1.0))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    rows.groupBy(_._1).foreach { case (s, g) =>
      val sorted = g.map(_._2).sorted
      def nr(q: Double) = sorted(math.ceil(q * sorted.size).toInt - 1)
      assert(got(s) === ((sorted.size.toLong, nr(0.25), nr(0.5), nr(0.9),
        nr(1.0))), s)
    }
    // NULL values are excluded before ranking (they must not inflate
    // n or shift the ceil(q*n) picks)
    val withNull = Seq(("a", java.lang.Long.valueOf(1L)),
      ("a", null.asInstanceOf[java.lang.Long]),
      ("a", java.lang.Long.valueOf(3L)),
      ("a", java.lang.Long.valueOf(2L)))
    val gn = graft.operators.CorpusStats.exactPercentiles(
      withNull.toDF("src", "v"), "v", "src", Seq(0.5)).head()
    assert(gn.getLong(1) === 3L && gn.getLong(2) === 2L) // n=3, p50=2
  }

  test("zipfSpectrum: Zipf-like decay is negative and partition-independent") {
    val words = Seq("w1" -> 64, "w2" -> 32, "w3" -> 21, "w4" -> 16)
    val docs = words.flatMap { case (w, f) => Seq.fill(f)(w) }
    val df = docs.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
    val a = graft.operators.CorpusStats.zipfSpectrum(df, "text", 4)
      .orderBy("rank").collect().map(_.getDouble(3))
    val b = graft.operators.CorpusStats.zipfSpectrum(df.repartition(7),
      "text", 4).orderBy("rank").collect().map(_.getDouble(3))
    assert(a.head < 0.0)
    assert(a.toSeq === b.toSeq) // partitioning-independent fold
  }

  /** Driver-side replica of [[graft.functions.TextFunctions.portableHash32]]. */
  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("hllDistinct replays the register algorithm exactly; small sets hit linear counting") {
    val items = (1 to 300).map(i => ("a", s"item_$i")) ++
      (1 to 7).map(i => ("b", s"thing_$i"))
    val got = CorpusStats.hllDistinct(items.toDF("src", "it"),
        "src", col("it"), p = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // driver-side replica: same hash, same registers, same estimate
    val want = items.groupBy(_._1).view.mapValues { g =>
      val regs = scala.collection.mutable.Map.empty[Long, Int]
      g.map(x => h32(x._2)).foreach { h =>
        val b = h / 16777216L
        val w = h % 16777216L
        val rho = if (w == 0L) 25
          else 25 - java.lang.Long.toBinaryString(w).length
        regs(b) = math.max(regs.getOrElse(b, 0), rho)
      }
      val nHit = regs.size.toLong
      val nZero = 256L - nHit
      val s = regs.values.map(m => math.pow(2.0, -m)).sum + nZero.toDouble
      val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
      val raw = alpha * 256.0 * 256.0 / s
      val e = if (raw <= 640.0 && nZero > 0)
        256.0 * math.log(256.0 / nZero.toDouble) else raw
      (nHit, nZero, e)
    }.toMap
    assert(got.keySet === Set("a", "b"))
    for (k <- got.keySet) {
      assert(got(k)._1 === want(k)._1, s"$k n_hit")
      assert(got(k)._2 === want(k)._2, s"$k n_zero")
      assert(math.abs(got(k)._3 - want(k)._3) < 1e-9, s"$k estimate")
    }
    // the small-range branch is near-exact up to register collisions
    // (2 of the 7 md5 hashes share a register here -> est ~ 6.07)
    assert(math.abs(got("b")._3 - 7.0) < 2.0)
    // 300 distinct at m=256 registers: within the ~3-sigma sketch band
    assert(math.abs(got("a")._3 - 300.0) / 300.0 < 0.25)
  }

  test("hll registers merge across shards: max-merge == sketch of the union, estimates identical") {
    // the 100 TB contract in one property: shard the input, sketch
    // each shard, max-merge the registers — identical state AND
    // estimate to sketching the concatenated corpus (overlapping
    // items included: idempotence is the point of max)
    val all = (1 to 400).map(i => ("s", s"u_$i"))
    val shardA = all.take(260)               // overlap on 1..260
    val shardB = all.drop(120)               // overlap on 121..260
    val whole = CorpusStats.hllRegisters(all.toDF("src", "it"),
        "src", col("it"), p = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val merged = CorpusStats.hllMerge(
        CorpusStats.hllRegisters(shardA.toDF("src", "it"), "src", col("it"), p = 8),
        CorpusStats.hllRegisters(shardB.toDF("src", "it"), "src", col("it"), p = 8))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(merged === whole)
    val estWhole = CorpusStats.hllEstimate(
        CorpusStats.hllRegisters(all.toDF("src", "it"), "src", col("it"), p = 8),
        "src", p = 8).collect().head.getDouble(3)
    val estMerged = CorpusStats.hllEstimate(CorpusStats.hllMerge(
        CorpusStats.hllRegisters(shardA.toDF("src", "it"), "src", col("it"), p = 8),
        CorpusStats.hllRegisters(shardB.toDF("src", "it"), "src", col("it"), p = 8)),
        "src", p = 8).collect().head.getDouble(3)
    assert(estWhole === estMerged)
  }

  test("giniConcentration: equal frequencies pin 0; skew replays the rank formula") {
    // source a: 4 tokens x 5 each -> G = 0 exactly
    val eq = (1 to 4).flatMap(i => Seq.fill(5)(("a", s"w$i")))
    // source b: counts 1,1,1,17 -> ranks asc (ties by token)
    val sk = Seq.fill(17)(("b", "big")) ++
      Seq(("b", "x1"), ("b", "x2"), ("b", "x3"))
    val got = CorpusStats.giniConcentration(
        (eq ++ sk).toDF("src", "t"), "src", col("t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") === ((4L, 20L, 0.0)))
    // b: sorted counts (1,1,1,17) ranks 1..4 -> s1 = 1+2+3+68 = 74
    // G = (2*74 - 5*20) / (4*20) = 48/80 = 0.6
    assert(got("b") === ((4L, 20L, 0.6)))
  }

  test("distinctNgramDiversity counts n-gram tokens vs types with multiplicity") {
    val df = Seq(("a", "x y x y"), ("a", "x y z")).toDF("src", "text")
    val got = CorpusStats.distinctNgramDiversity(df, "src", "text", maxN = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // unigrams: 7 tokens, types {x,y,z} = 3
    assert(got(("a", 1)) === ((7L, 3L)))
    // bigrams: "x y","y x","x y" + "x y","y z" = 5 tokens, 3 types
    assert(got(("a", 2)) === ((5L, 3L)))
    // trigrams: "x y x","y x y" + "x y z" = 3 tokens, 3 types
    assert(got(("a", 3)) === ((3L, 3L)))
  }

  test("freqOfFreqs: spectrum counts and raw Good-Turing estimates replay by hand") {
    // source a: counts {x:3, y:3, z:2, w:1, v:1, u:1}
    val items = Seq.fill(3)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z") ++
      Seq("w", "v", "u")
    val df = items.map(("a", _)).toDF("src", "it")
    val got = CorpusStats.freqOfFreqs(df, "src", col("it"), maxC = 10)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // N_1=3, N_2=1, N_3=2; c*(1) = 2*N_2/N_1 = 2/3; c*(2) = 3*N_3/N_2 = 6
    assert(got(1L) === ((3L, Some(2.0 / 3.0))))
    assert(got(2L) === ((1L, Some(6.0))))
    assert(got(3L) === ((2L, None))) // N_4 absent -> raw-Turing NULL
    assert(got.keySet === Set(1L, 2L, 3L))
  }

  test("cms: estimate == driver replica, one-sided (est >= exact), shards merge by counter sum") {
    val rnd = new scala.util.Random(53)
    val items = (1 to 1200).map(_ => ("s", s"w${rnd.nextInt(300)}"))
    val d = 4; val w = 64 // small w forces real collisions
    val df = items.toDF("src", "it")
    // driver-side replica of the full table
    val replica = scala.collection.mutable.Map.empty[(Int, Long), Long]
    items.foreach { case (_, t) =>
      val h1 = h32(t); val h2 = h32("x|" + t)
      for (r <- 0 until d) {
        val b = (h1 + r * h2) % w
        replica((r, b)) = replica.getOrElse((r, b), 0L) + 1L
      }
    }
    val cms = CorpusStats.cmsTable(df, "src", col("it"), d, w)
    val gotTable = cms.collect()
      .map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(gotTable === replica.toMap)
    // point estimates: exact replica min, and est >= exact for EVERY token
    val exact = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // the estimate reads d/w from the sketch itself (ADVICE r14): no
    // caller-side constants to get wrong
    val est = CorpusStats.cmsEstimate(cms, "src",
        exact.keys.toSeq.map(("s", _)).toDF("src", "it"), "it")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    for ((t, c) <- exact) {
      val want = (0 until d).map { r =>
        replica((r, (h32(t) + r * h32("x|" + t)) % w)) }.min
      assert(est(t) === want, s"estimate for $t")
      assert(est(t) >= c, s"one-sided guarantee broken for $t")
    }
    // shard-merge: counter tables SUM — cmsMerge == whole-corpus build
    val (sa, sb) = items.splitAt(700)
    val merged = CorpusStats.cmsMerge(
        CorpusStats.cmsTable(sa.toDF("src", "it"), "src", col("it"), d, w),
        CorpusStats.cmsTable(sb.toDF("src", "it"), "src", col("it"), d, w),
        "src")
      .collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(merged === replica.toMap)
    // a merged sketch still probes correctly (dims carried through)
    val estM = CorpusStats.cmsEstimate(
        CorpusStats.cmsMerge(
          CorpusStats.cmsTable(sa.toDF("src", "it"), "src", col("it"), d, w),
          CorpusStats.cmsTable(sb.toDF("src", "it"), "src", col("it"), d, w),
          "src"),
        "src", Seq(("s", "w1")).toDF("src", "it"), "it")
      .collect()
    assert(estM.length === 1 && estM(0).getLong(2) === est("w1"))
    // mixed-geometry sketches are rejected loudly, not mis-probed —
    // at the merge AND at the probe
    val other = CorpusStats.cmsTable(sa.toDF("src", "it"), "src", col("it"),
      d, w * 2)
    intercept[IllegalArgumentException] {
      CorpusStats.cmsMerge(cms, other, "src")
    }
    intercept[IllegalArgumentException] {
      CorpusStats.cmsEstimate(cms.union(other), "src",
        Seq(("s", "w1")).toDF("src", "it"), "it")
    }
    // an EMPTY sketch is a valid state (ADVICE r15): every probe
    // estimates the correct 0 — both when the dims are still readable
    // off the plan (filter passthrough) and when the plan is opaque
    // (checkpoint boundary, the parquet-loaded shape)
    val emptyEst = CorpusStats.cmsEstimate(cms.filter(col("cnt") < 0),
        "src", Seq(("s", "w1")).toDF("src", "it"), "it").collect()
    assert(emptyEst.length === 1 && emptyEst(0).getLong(2) === 0L)
    val opaqueEmpty = cms.filter(col("cnt") < 0).localCheckpoint(true)
    val opaqueEst = CorpusStats.cmsEstimate(opaqueEmpty,
        "src", Seq(("s", "w1")).toDF("src", "it"), "it").collect()
    assert(opaqueEst.length === 1 && opaqueEst(0).getLong(2) === 0L)
    // ...and a mixed-config sketch behind an opaque plan still fails
    // loudly via the one-job fallback check
    intercept[IllegalArgumentException] {
      CorpusStats.cmsEstimate(cms.union(other).localCheckpoint(true),
        "src", Seq(("s", "w1")).toDF("src", "it"), "it")
    }
  }

  test("cms: chained merges execute each batch sketch's lineage exactly once (VERDICT r15 #1)") {
    // The r15 geometry guard ran an EAGER collect over un-materialized
    // sketch frames, re-executing every upstream cmsTable shuffle per
    // merge (q169 regressed 0.94 -> 2.0+ s). The guard now reads the
    // lit() dims off the analyzed plan — zero jobs — so a chained
    // 3-way merge + probe reads the base data exactly once, at the
    // single final action. Accumulator-asserted, the knnGraphAppend
    // pattern.
    val acc = spark.sparkContext.longAccumulator("cmsBaseReads")
    val tick = udf((s: String) => { acc.add(1L); s })
    val base = (1 to 900).map(i => ("s", s"w${i % 120}", i % 3))
      .toDF("src", "it", "b")
    val counted = base.withColumn("it", tick(col("it")))
    val sketches = (0 until 3).map(b =>
      CorpusStats.cmsTable(counted.filter(col("b") === b),
        "src", col("it"), d = 4, w = 64))
    val merged = sketches.reduce(CorpusStats.cmsMerge(_, _, "src"))
    assert(acc.value === 0L,
      "merge guards must not run jobs over the sketch lineage")
    val estDf = CorpusStats.cmsEstimate(merged, "src",
      Seq(("s", "w1")).toDF("src", "it"), "it")
    assert(acc.value === 0L,
      "the probe guard must not run jobs over the sketch lineage")
    val est = estDf.collect()
    assert(est.length === 1 && est(0).getLong(2) >= 1L)
    // one action total: each branch evaluated the tick over at most the
    // full base once (<= 2700 across 3 branches, plan-shape agnostic);
    // the r15 bug re-ran every upstream aggregate per merge AND per
    // probe, tripping the two zero asserts above before this one
    assert(acc.value <= 2700L && acc.value >= 900L,
      s"chained merge re-executed sketch lineage: ${acc.value} reads")
  }

  test("vocabRichness: Chao1 and coverage replay the moment formulas by hand") {
    // stratum a: [x, x, y, z] -> V=3, N=4, N1=2 (y,z), N2=1 (x)
    //   chao1 = 3 + 2*1/(2*(1+1)) = 3.5 ; coverage = 1 - 2/4 = 0.5
    // stratum b: [q, q] -> V=1, N=2, N1=0, N2=1
    //   chao1 = 1 + 0 = 1.0 ; coverage = 1 - 0/2 = 1.0
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "z"),
      ("b", "q"), ("b", "q")).toDF("src", "t")
    val got = CorpusStats.vocabRichness(df, "src", col("t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got("a") === ((3L, 4L, 2L, 1L, 3.5, 0.5)))
    assert(got("b") === ((1L, 2L, 0L, 1L, 1.0, 1.0)))
  }

  test("tokenDispersion: hand DP with the telescoped absent-stratum tail; topK cut is (c desc, token)") {
    // A: [w, w, v]  B: [w, u, u, u]  ->  N=7, S_A=3, S_B=4
    // w: C=3, both present: |2*7-3*3| + |1*7-3*4| = 10, tail 0 -> 10/42
    // u: C=3, only B:       |3*7-3*4| = 9, tail 3*(7-4)=9      -> 18/42
    // v: C=1, only A:       |1*7-1*3| = 4, tail 1*(7-3)=4      -> 8/14
    val df = Seq(("A", "w"), ("A", "w"), ("A", "v"),
      ("B", "w"), ("B", "u"), ("B", "u"), ("B", "u")).toDF("src", "t")
    val got = CorpusStats.tokenDispersion(df, "src", col("t"), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // ties on c_total=3 break to token asc: u before w; v (c=1) last
    assert(got.map(_._1).toSeq === Seq("u", "w", "v"))
    val byTok = got.map(x => x._1 -> x).toMap
    assert(byTok("w")._2 === 3L && byTok("w")._3 === 2L)
    assert(math.abs(byTok("w")._4 - 10.0 / 42.0) < 1e-12)
    assert(byTok("u")._2 === 3L && byTok("u")._3 === 1L)
    assert(math.abs(byTok("u")._4 - 18.0 / 42.0) < 1e-12)
    assert(byTok("v")._2 === 1L && byTok("v")._3 === 1L)
    assert(math.abs(byTok("v")._4 - 8.0 / 14.0) < 1e-12)
    // topK=2 cuts v, keeps the (c desc, token asc) head
    val cut = CorpusStats.tokenDispersion(df, "src", col("t"), topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(cut === Seq("u", "w"))
  }

  test("pmiCollocations replays the count arithmetic; minCount cuts but keeps N_bi total") {
    // 6x "strong coffee", 1x "weak coffee" -> N_uni = 14, N_bi = 7
    val docs = Seq.fill(6)("strong coffee") ++ Seq("weak coffee")
    val got = CorpusStats.pmiCollocations(
        docs.toDF("text"), "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // only (strong, coffee) survives minCount=2; N_bi stays 7
    assert(got.keySet === Set(("strong", "coffee")))
    val (cab, ca, cb, pmi) = got(("strong", "coffee"))
    assert((cab, ca, cb) === ((6L, 6L, 7L)))
    val want = math.log((6.0 / 7.0) / (6.0 / 14.0 * (7.0 / 14.0)))
    assert(math.abs(pmi - math.rint(want * 1e6) / 1e6) < 1e-9)
  }
}
