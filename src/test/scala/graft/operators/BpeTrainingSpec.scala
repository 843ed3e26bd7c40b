package graft.operators

import graft.SparkSpec
import graft.operators.BpeTraining.{BpeMerge, Eow}

/** BPE training certification: the distributed pair-count loop must
  * reproduce a from-scratch driver-side implementation of Sennrich
  * 2016 exactly — merge-for-merge, count-for-count. */
class BpeTrainingSpec extends SparkSpec {

  /** Independent in-memory reference: classic BPE over a word-count
    * map, same (count desc, left asc, right asc) tie-break. */
  private def referenceTrain(corpus: Seq[String], numMerges: Int,
                             minPairCount: Long): Seq[BpeMerge] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ Eow) -> ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var done = false
    while (merges.size < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val best = pairCounts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          merges += BpeMerge(merges.size, l, r, c)
          vocab = vocab.groupMapReduce {
            case (syms, _) => BpeTraining.mergePair(syms, l, r).toVector
          }(_._2)(_ + _)
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "low new wide lowest newest")

  test("distributed training matches the driver-side reference merge-for-merge") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTraining.train(df, "text", numMerges = 25, minPairCount = 2)
    val want = referenceTrain(corpus, numMerges = 25, minPairCount = 2)
    assert(got == want)
    assert(got.nonEmpty && got.map(_.rank) == got.indices)
  }

  test("training stops when no pair reaches minPairCount") {
    import spark.implicits._
    val df = Seq((1L, "ab cd ef")).toDF("doc_id", "text") // every pair count 1
    assert(BpeTraining.train(df, "text", numMerges = 10, minPairCount = 2).isEmpty)
  }

  test("applyMerges segments like subword-nmt on the learned table") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTraining.train(df, "text", numMerges = 25, minPairCount = 2)
    // frequent whole words collapse to few symbols; "low" appears 6x so
    // it must have fused further than a rare same-length word
    val lowLen = BpeTraining.applyMerges("low", merges).length
    assert(lowLen < "low".length + 1)
    // unseen characters stay unmerged singles + EOW
    assert(BpeTraining.applyMerges("xyz", merges) == Seq("x", "y", "z", Eow))
  }

  test("trainLocal matches the spec's independent reference merge-for-merge") {
    val words = corpus.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    assert(BpeTraining.trainLocal(words, 25, 2) == referenceTrain(corpus, 25, 2))
  }

  test("batched training matches sequential on an interacting-pair corpus") {
    import spark.implicits._
    // every top pair shares symbols with the next (abc-family ties), so
    // prefix selection must repeatedly truncate to stay sequential-exact
    val inter = Seq(
      "aaab aaab aaab aab ab", "abab abab baba", "aabb aabb bbaa",
      "low lower lowest low low", "new newer newest new new new")
    val df = inter.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTraining.trainBatched(df, "text", numMerges = 30,
      minPairCount = 2, batchMax = 8, candK = 64)
    assert(got == referenceTrain(inter, 30, 2))
  }

  test("batched == sequential == local over random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._
    val word = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.chooseNum(3, 12)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(2, 10)
        .flatMap(k => word.map(w => Seq.fill(k)(w).mkString(" ")))))
    val prop = Prop.forAllNoShrink(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val want = referenceTrain(texts, 15, 2)
      val batched = BpeTraining.trainBatched(df, "text", 15, 2,
        batchMax = 4, candK = 32)
      val local = BpeTraining.trainLocal(
        texts.flatMap(_.split("\\s+")).filter(_.nonEmpty).groupBy(identity)
          .map { case (w, ws) => (w, ws.size.toLong) }.toSeq, 15, 2)
      batched == want && local == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("batched reaches 1000 merges and still equals the local reference") {
    import spark.implicits._
    // synthetic corpus rich enough for >=1000 count>=2 pairs: zipf-ish
    // repeated pseudo-words over a 20-letter alphabet
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrst"
    val vocabWords = (0 until 1500).map { _ =>
      (0 until (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(20))).mkString
    }
    val texts = (0 until 300).map { _ =>
      (0 until 40).map { _ =>
        vocabWords((math.pow(rnd.nextDouble(), 2.0) * vocabWords.size).toInt
          .min(vocabWords.size - 1))
      }.mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val want = BpeTraining.trainLocal(words, 1000, 2)
    assert(want.size >= 1000, s"corpus only supports ${want.size} merges")
    val got = BpeTraining.trainBatched(df, "text", 1000, 2)
    assert(got == want)
  }

  test("selectPrefix stops at the first interacting candidate, not past it") {
    // (a,b) then (b,c) shares b: the prefix must stop, NOT skip to (x,y)
    val cand = Seq(("a", "b", 12L), ("b", "c", 11L), ("x", "y", 9L))
    assert(BpeTraining.selectPrefix(cand, 2, 8) == Seq(("a", "b", 12L)))
    // disjoint candidates all admitted, in order, capped by roundMax
    val disj = Seq(("a", "b", 9L), ("c", "d", 8L), ("e", "f", 7L))
    assert(BpeTraining.selectPrefix(disj, 2, 2) == disj.take(2))
    // fused-string collision: fused "ab" appearing as a later symbol stops the scan
    val fusedHit = Seq(("a", "b", 9L), ("ab", "c", 8L))
    assert(BpeTraining.selectPrefix(fusedHit, 2, 8) == fusedHit.take(1))
    // minPairCount truncates
    assert(BpeTraining.selectPrefix(disj, 8, 8) == disj.take(2))
  }

  test("firstPreemptedStep flags tie-break preemption at the earliest step") {
    val ord = Array((12L, "p", "q"), (9L, "x", "y"), (9L, "z", "w"))
    // competitor emitted after step 0 with count 9 and lex-smaller than
    // (x,y): preempts step 1 (the tie-break case; counts can only decay)
    assert(BpeTraining.firstPreemptedStep(0, "ab", "c", 9L, ord) == Some(1))
    // lex-larger at equal count: only preempts the later, lex-larger step
    assert(BpeTraining.firstPreemptedStep(0, "xz", "c", 9L, ord) == Some(2))
    // strictly smaller count: never preempts
    assert(BpeTraining.firstPreemptedStep(0, "ab", "c", 8L, ord) == None)
    // competitors only compete at steps AFTER their emission
    assert(BpeTraining.firstPreemptedStep(2, "ab", "c", 99L, ord) == None)
  }

  test("applyMergesFast == applyMerges over random corpora and tables (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val word = Gen.chooseNum(1, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val gen = for {
      train <- Gen.listOfN(20, word)
      probes <- Gen.listOfN(8, word)
      nm <- Gen.chooseNum(1, 25)
    } yield (train, probes, nm)
    val prop = Prop.forAllNoShrink(gen) { case (train, probes, nm) =>
      val words = train.groupBy(identity)
        .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      val merges = BpeTraining.trainLocal(words, nm, 1)
      val ranks = BpeTraining.rankMap(merges.map(m => (m.left, m.right)))
      probes.forall { p =>
        BpeTraining.applyMergesFast(p, ranks) == BpeTraining.applyMerges(p, merges)
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("applyMergesFast: overlap, repeats, and unseen symbols match the sweep") {
    val merges = Seq(BpeMerge(0, "a", "a", 9), BpeMerge(1, "aa", "b", 5),
      BpeMerge(2, "b", Eow, 4))
    val ranks = BpeTraining.rankMap(merges.map(m => (m.left, m.right)))
    for (w <- Seq("aaa", "aaaa", "aab", "aaab", "baaab", "xyz", "b", "a"))
      assert(BpeTraining.applyMergesFast(w, ranks)
        === BpeTraining.applyMerges(w, merges), s"word '$w'")
  }

  test("mergePair merges adjacent occurrences left-to-right (a a a -> aa, a)") {
    assert(BpeTraining.mergePair(Seq("a", "a", "a"), "a", "a")
      == Seq("aa", "a"))
    assert(BpeTraining.mergePair(Seq("x", "l", "r", "l", "r", "y"), "l", "r")
      == Seq("x", "lr", "lr", "y"))
  }

  test("tokenCounts expression equals driver-side application, empty/null safe") {
    import spark.implicits._
    val train = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTraining.train(train, "text", numMerges = 25, minPairCount = 2)
    val probe = Seq((1L, "low newer widest"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = BpeTraining.tokenCounts(probe, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect1 = Seq("low", "newer", "widest")
      .map(w => BpeTraining.applyMerges(w, merges).length.toLong).sum
    assert(got(1L) == expect1)
    assert(got(2L) == 0L && got(3L) == 0L)
  }
}
