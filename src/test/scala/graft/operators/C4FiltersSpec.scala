package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `TextAnalysis.c4Filters` (Raffel et al. 2020 §2.2) on punctuated
  * fixture text — the C4 defaults the driver-query corpus (which has no
  * punctuation) can't exercise — plus `TextAnalysis.spanDedup`, the
  * unit-level generalization of the ExactSubstr machinery, against a
  * brute-force reference over caller-supplied units.
  */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def runC4(docs: Seq[(Long, String)],
                    badWords: Seq[String] = Seq.empty) =
    TextAnalysis.c4Filters(docs.toDF("doc_id", "text"), "doc_id", "text",
        badWords = badWords)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4), r.getInt(5),
          r.getInt(7))).toMap

  test("C4 line rules: terminal punctuation, min words, javascript drop") {
    val doc =
      "This sentence ends with a period.\n" +
        "short one.\n" + // 2 words < 3 -> dropped
        "No terminal punctuation here\n" + // dropped
        "Does this survive as a question?\n" +
        "Enable JavaScript to view this site.\n" + // line drop pattern
        "She said \"quoted ending counts.\"\n" +
        "All of these lines pass fine.\n" +
        "And a fifth surviving line appears!"
    val m = runC4(Seq(1L -> doc))
    val (nLines, nKept, cleaned, pat, bad, keep) = m(1L)
    assert(nLines == 8)
    assert(nKept == 5)
    assert(cleaned == Seq(
      "This sentence ends with a period.",
      "Does this survive as a question?",
      "She said \"quoted ending counts.\"",
      "All of these lines pass fine.",
      "And a fifth surviving line appears!").mkString("\n"))
    assert(pat == 0 && bad == 0 && keep == 1)
  }

  test("C4 cleaned_text keeps the TRIMMED line (ADVICE r12: padded crawl lines)") {
    // note: trim is SPACE-only in both engines (Spark trim == DuckDB
    // trim), so the rules and the kept text see the same form
    val doc =
      "   Leading whitespace survives the rules after trimming.   \n" +
        "  Indented sentence also ends with terminal punctuation.\n" +
        "But this padded line has no terminal punct   "
    val m = runC4(Seq(1L -> doc))
    val (_, nKept, cleaned, _, _, _) = m(1L)
    assert(nKept == 2)
    assert(cleaned == Seq(
      "Leading whitespace survives the rules after trimming.",
      "Indented sentence also ends with terminal punctuation.").mkString("\n"))
  }

  test("C4 doc rules: lorem ipsum, curly brace, bad word, min lines") {
    val five = (1 to 5).map(i => s"Perfectly ordinary sentence number $i.")
    val loremDoc = (five :+ "Filler lorem ipsum dolor sit amet.").mkString("\n")
    val braceDoc = (five :+ "if (x) { return; }").mkString("\n")
    val badDoc = (five :+ "This has one forbidden token.").mkString("\n")
    val thinDoc = five.take(4).mkString("\n") // 4 kept < 5
    val cleanDoc = five.mkString("\n")
    val m = runC4(Seq(1L -> loremDoc, 2L -> braceDoc, 3L -> badDoc,
      4L -> thinDoc, 5L -> cleanDoc), badWords = Seq("forbidden"))
    assert(m(1L)._6 == 0 && m(1L)._4 == 1) // has_drop_pattern
    assert(m(2L)._6 == 0 && m(2L)._4 == 1) // "{" is a doc pattern
    assert(m(3L)._6 == 0 && m(3L)._5 == 1) // has_bad_word
    assert(m(4L)._6 == 0 && m(4L)._2 == 4) // pass_min_lines fails
    assert(m(5L)._6 == 1)
    // the lorem line itself also survives the LINE rules (ends in '.'),
    // so the drop is genuinely the document-level pattern rule
    assert(m(1L)._2 == 6)
  }

  test("bad-word matching is token-exact and never crosses a newline") {
    // "forbidden" as a substring of a longer token must NOT match;
    // tokens split at newlines even though tokens() only splits spaces
    val doc = ("Unforbiddenly fine sentence here okay.\n" * 5).trim
    val m = runC4(Seq(1L -> doc), badWords = Seq("forbidden"))
    assert(m(1L)._5 == 0 && m(1L)._6 == 1)
    val boundary = (1 to 5).map(i => s"Line number $i ends with token.")
      .mkString("\n")
    // a naive tokens(full text) would merge "token.\nline" into one
    // token; the per-line tokenization must never produce it
    val m2 = runC4(Seq(1L -> boundary), badWords = Seq("token.\nline"))
    assert(m2(1L)._5 == 0)
  }

  private def runSpan(docs: Seq[(Long, String)], k: Int,
                      keepFirst: Boolean = false) =
    TextAnalysis.spanDedup(docs.toDF("doc_id", "text"), "doc_id",
        split(col("text"), "\\|"), k = k, keepFirst = keepFirst)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))).toMap

  /** Brute reference over '|'-separated units: coverage booleans per
    * unit, spans = maximal covered runs. */
  private def bruteSpan(docs: Seq[(Long, String)], k: Int,
                        keepFirst: Boolean)
      : Map[Long, (Long, Long, Long, String)] = {
    val units = docs.map { case (id, t) => id -> t.split("\\|", -1).toVector }
    val counts = scala.collection.mutable.Map.empty[Vector[String], Long]
    val canon = scala.collection.mutable.Map.empty[Vector[String], (Long, Int)]
    for ((id, us) <- units.sortBy(_._1); i <- 0 to us.length - k) {
      val g = us.slice(i, i + k)
      counts.updateWith(g)(c => Some(c.getOrElse(0L) + 1))
      if (!canon.contains(g)) canon(g) = (id, i + 1)
    }
    units.map { case (id, us) =>
      val covered = Array.fill(us.length)(false)
      for (i <- 0 to us.length - k
           if counts(us.slice(i, i + k)) >= 2
           if !(keepFirst && canon(us.slice(i, i + k)) == ((id, i + 1)));
           j <- i until i + k) covered(j) = true
      val spans = us.indices
        .count(j => covered(j) && (j == 0 || !covered(j - 1))).toLong
      id -> (us.length.toLong, covered.count(identity).toLong, spans,
        us.indices.filterNot(covered).map(us).mkString(" "))
    }.toMap
  }

  test("spanDedup equals the brute-force unit-coverage reference") {
    val docs = Seq(
      1L -> "s1|s2|s3|s4|s5|s6",
      2L -> "x|s2|s3|s4|y", // shares the s2 s3 s4 span with doc 1
      3L -> "s2|s3|s4", // and so does all of doc 3
      4L -> "a|b|c|d",
      5L -> "p|s3|s4|s5|q") // s3 s4 s5 duplicates doc 1 too
    for (keepFirst <- Seq(false, true)) {
      val got = runSpan(docs, k = 3, keepFirst = keepFirst)
      val want = bruteSpan(docs, k = 3, keepFirst = keepFirst)
      assert(got == want, s"keepFirst=$keepFirst")
    }
    // keepFirst leaves doc 1's canonical copies intact
    assert(runSpan(docs, 3, keepFirst = true)(1L)._2 <
      runSpan(docs, 3, keepFirst = false)(1L)._2)
  }

  test("span keys cannot alias across unit boundaries") {
    // joined by a space these two docs would both key "a b|c" -> "a b c";
    // the  separator keeps them distinct, so nothing is hot
    val docs = Seq(1L -> "a b|c|tail here", 2L -> "a|b c|tail here")
    val got = runSpan(docs, k = 2)
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L)
  }
}
