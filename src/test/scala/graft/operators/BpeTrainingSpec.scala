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
