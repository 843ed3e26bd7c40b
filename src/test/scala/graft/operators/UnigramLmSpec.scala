package graft.operators

import graft.SparkSpec

/** Unigram-LM tokenizer (Kudo 2018) certification: the integer Viterbi
  * against brute-force enumeration, training determinism + coverage +
  * budget, compression sanity, and the scoring expression. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def costMap(ps: Seq[(String, Long)]) = {
    val m = new java.util.HashMap[String, Long]()
    ps.foreach { case (p, c) => m.put(p, c) }
    m
  }

  test("viterbi == brute-force minimal (cost, nPieces) over all segmentations") {
    val pieces = Seq("a" -> 10L, "b" -> 12L, "ab" -> 15L, "bb" -> 20L,
      "abb" -> 40L, "ba" -> 9L)
    val costs = costMap(pieces)
    val table = pieces.toMap
    def brute(w: String): (Long, Int) = {
      def go(s: String): Seq[(Long, Int)] =
        if (s.isEmpty) Seq((0L, 0))
        else (1 to math.min(3, s.length)).flatMap { l =>
          val p = s.take(l)
          val c = table.get(p).orElse(
            if (l == 1) Some(UnigramLm.UnkCost) else None)
          c.toSeq.flatMap(cc => go(s.drop(l)).map { case (rc, rn) =>
            (cc + rc, rn + 1) })
        }
      go(w).minBy { case (c, n) => (c, n) }
    }
    for (w <- Seq("abb", "ba", "abab", "bbbb", "xaxb", "a", "x", "ababbba"))
      assert(UnigramLm.viterbi(w, costs, 3) === brute(w), s"word '$w'")
    assert(UnigramLm.viterbi("", costs, 3) === ((0L, 0)))
    // segment() returns the pieces realizing viterbi()'s (cost, n)
    for (w <- Seq("abb", "abab", "ababbba")) {
      val seg = UnigramLm.segment(w, costs, 3)
      assert(seg.mkString === w)
      assert(seg.length === UnigramLm.viterbi(w, costs, 3)._2)
    }
  }

  test("1000+-codepoint words count exactly; the packing limit fails loudly") {
    // ADVICE r13: the old cost*1000+n key silently mod-wrapped the token
    // count once a word hit 1000 codepoints (base64 blobs, URLs). Under
    // the 2^20 packing a 1500-codepoint unknown-char word counts exactly.
    val costs = costMap(Seq("a" -> 10L, "aa" -> 15L))
    val blob = "x" * 1500 // every step is the UnkCost single-codepoint path
    assert(UnigramLm.viterbi(blob, costs, 3) ===
      ((1500L * UnigramLm.UnkCost, 1500)))
    assert(UnigramLm.segment(blob, costs, 3).length === 1500)
    // known pieces at length >= 1000: 1200 'a's = 600 "aa" pieces
    val as = "a" * 1200
    assert(UnigramLm.viterbi(as, costs, 3) === ((600L * 15L, 600)))
    // at/above the packing radix the guard fires instead of corrupting
    val tooLong = "y" * UnigramLm.Pack.toInt
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi(tooLong, costs, 3)
    }
  }

  test("training: deterministic, char coverage, vocab budget respected") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select(org.apache.spark.sql.functions.col("c_name").as("text"))
    val p1 = UnigramLm.train(df, "text", vocabSize = 120)
    val p2 = UnigramLm.train(df, "text", vocabSize = 120)
    assert(p1 === p2) // deterministic end to end
    val chars = df.as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+")).flatMap(_.toCharArray)
      .map(_.toString).toSet
    val vocabSet = p1.map(_.piece).toSet
    assert(chars.subsetOf(vocabSet), "every corpus codepoint is covered")
    val multi = p1.count(_.piece.length > 1)
    assert(p1.size <= 120 + chars.size && multi > 0)
    // compression: trained pieces tokenize below the char count
    val costs = costMap(p1.map(p => (p.piece, p.cost)))
    val word = "customer#000000042"
    assert(UnigramLm.viterbi(word, costs, 6)._2 < word.length)
  }

  test("tokenCounts expression == driver viterbi; empty/null safe") {
    val train = spark.read.parquet(s"$sf/customer.parquet")
      .select(org.apache.spark.sql.functions.col("c_name").as("text"))
    val pieces = UnigramLm.train(train, "text", vocabSize = 80)
    val costs = costMap(pieces.map(p => (p.piece, p.cost)))
    val probe = Seq((1L, "customer#000000001 customer#000000002"),
      (2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = UnigramLm.tokenCounts(probe, "doc_id", "text", pieces)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Seq("customer#000000001", "customer#000000002")
      .map(w => UnigramLm.viterbi(w, costs, 6)._2.toLong).sum
    assert(got(1L) === expect)
    assert(got(2L) === 0L && got(3L) === 0L)
  }
}
