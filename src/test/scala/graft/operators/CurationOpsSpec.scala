package graft.operators

import graft.SparkSpec
import graft.plans.HyperplaneSignature
import org.apache.spark.sql.functions._

/** Round-4 curation operators: decontamination, SRP-LSH embedding
  * near-dup, boilerplate n-grams, Gopher rule battery. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Decontamination ----

  test("contamination flags exactly the docs sharing an n-gram with eval") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta unrelated tail here")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "prefix alpha beta gamma delta suffix"))
      .toDF("doc_id", "text")
    val out = Decontamination.contamination(train, "doc_id", "text", eval, "text", n = 4)
      .orderBy("id").collect()
    assert(out.length === 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 1: "alpha beta gamma delta" is shared
    assert(byId(1L).getAs[Int]("contaminated") === 1)
    assert(byId(2L).getAs[Int]("contaminated") === 0)
    assert(byId(3L).getAs[Int]("contaminated") === 1)
    // doc 2 has 6 tokens -> 3 4-grams, zero hits
    assert(byId(2L).getAs[Long]("n_ngrams") === 3L)
    assert(byId(2L).getAs[Long]("n_hit") === 0L)
  }

  test("embeddingContamination: max cosine, nearest id, threshold flag") {
    // train 1 aligned with eval 100; train 2 orthogonal to everything;
    // train 3 anti-aligned (cos = -1 is still its max vs a 2-vec eval set)
    val train = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Array(1f, 0f)),
      (101L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = Decontamination.embeddingContamination(
      train, "vec_id", "embedding", eval, "vec_id", "embedding",
      threshold = 0.9)
      .orderBy("id").collect()
    assert(out.length === 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Double]("max_sim") === 1.0)
    assert(byId(1L).getAs[Long]("nearest_eval") === 100L)
    assert(byId(1L).getAs[Int]("contaminated") === 1)
    // train 2: cos vs 100 = 0, vs 101 = 0.8 -> nearest 101, below 0.9
    assert(math.abs(byId(2L).getAs[Double]("max_sim") - 0.8) < 1e-6)
    assert(byId(2L).getAs[Long]("nearest_eval") === 101L)
    assert(byId(2L).getAs[Int]("contaminated") === 0)
    // train 3: max is -0.6 (vs 101), not -1
    assert(math.abs(byId(3L).getAs[Double]("max_sim") - (-0.6)) < 1e-6)
    assert(byId(3L).getAs[Long]("nearest_eval") === 101L)
  }

  test("embeddingContamination: exact-tie breaks to the smallest eval id") {
    val train = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val eval = Seq( // identical eval vectors -> bit-equal cosines
      (7L, Array(2f, 0f)), (3L, Array(2f, 0f)), (9L, Array(2f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Decontamination.embeddingContamination(
      train, "vec_id", "embedding", eval, "vec_id", "embedding", 0.5).head()
    assert(r.getAs[Long]("nearest_eval") === 3L)
    assert(r.getAs[Int]("contaminated") === 1)
  }

  test("embeddingContamination: mismatched-dim train vector reports NULL, flag 0") {
    val train = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val eval = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val out = Decontamination.embeddingContamination(
      train, "vec_id", "embedding", eval, "vec_id", "embedding", 0.5)
      .orderBy("id").collect()
    assert(out.length === 2)
    assert(out(1).isNullAt(out(1).fieldIndex("max_sim")))
    assert(out(1).getAs[Int]("contaminated") === 0)
  }

  test("semanticDecontaminate drops flagged rows and preserves columns") {
    val train = Seq(
      (1L, Array(1f, 0f), "keepable"),
      (2L, Array(0f, 1f), "kept")
    ).toDF("vec_id", "embedding", "meta")
    val eval = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val out = Decontamination.semanticDecontaminate(
      train, "vec_id", "embedding", eval, "vec_id", "embedding", 0.9)
    assert(out.columns.toSeq === Seq("vec_id", "embedding", "meta"))
    assert(out.select("vec_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("bloomContamination is value-identical to the exact path") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta unrelated tail here"),
      (4L, "x"), // no formable 4-gram
      (5L, "seven eight nine ten eleven twelve thirteen")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "prefix alpha beta gamma delta suffix"),
      (101L, "ten eleven twelve thirteen fourteen")
    ).toDF("doc_id", "text")
    val exact = Decontamination.contamination(
      train, "doc_id", "text", eval, "text", n = 4)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val bloom = Decontamination.bloomContamination(
      train, "doc_id", "text", eval, "text", n = 4,
      expectedEvalNgrams = 64, fpp = 0.01)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(bloom === exact)
  }

  test("bloomContamination stays exact when the filter is undersized (high fpp)") {
    // a deliberately tiny filter: lots of false positives, all of which
    // the verify join must remove
    val train = (1L to 50L).map(i => (i, s"tok$i a b c d e f g$i")).toDF("doc_id", "text")
    val eval = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val exact = Decontamination.contamination(
      train, "doc_id", "text", eval, "text", n = 5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val bloom = Decontamination.bloomContamination(
      train, "doc_id", "text", eval, "text", n = 5,
      expectedEvalNgrams = 2, fpp = 0.5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(bloom === exact)
  }

  test("bloomContamination matches the exact path on NULL-text docs") {
    val train = Seq((1L, "a b c d e f"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val eval = Seq((9L, "a b c d e z")).toDF("doc_id", "text")
    val exact = Decontamination.contamination(
      train, "doc_id", "text", eval, "text", n = 5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val bloom = Decontamination.bloomContamination(
      train, "doc_id", "text", eval, "text", n = 5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(bloom === exact)
    assert(exact.exists(r => r.head == 2L && r(1) == 0L)) // NULL text -> 0 n-grams
  }

  test("bloomContamination survives an empty eval corpus (null filter -> exact path)") {
    val train = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val eval = Seq((9L, "x")).toDF("doc_id", "text") // no formable 5-gram
    val out = Decontamination.bloomContamination(
      train, "doc_id", "text", eval, "text", n = 5)
      .collect().map(r => (r.getAs[Long]("n_hit"), r.getAs[Int]("contaminated")))
    assert(out.toSeq === Seq((0L, 0)))
  }

  test("bigramQuality: interpolated probability, word-order sensitivity, short docs neutral") {
    // corpus: "a b" twice, "b a" once, "z" -> ctx(a)=2 with c(a,b)=2;
    // ctx(b)=1 with c(b,a)=1; unigrams a:3, b:3, z:1, N=7
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "b a"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramQuality(df, "doc_id", "text", lambda = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    val pUni = (3.0 + 1.0) / (7.0 + 1.0)
    val pAB = 0.9 * (2.0 / 2.0) + (1.0 - 0.9) * pUni
    val pBA = 0.9 * (1.0 / 1.0) + (1.0 - 0.9) * pUni
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.log10(pAB)) < 1e-12)
    assert(math.abs(out(3L)._2 - math.log10(pBA)) < 1e-12)
    // single-token doc: no bigram positions, neutral score
    assert(out(4L) === ((0L, 0.0)))
  }

  test("bigramQuality ranks common word order above rare order") {
    // "x y z" dominates, so ctx(y) overwhelmingly continues to z; the
    // one "y x" doc's rare continuation must score lower
    val rows = (1L to 9L).map(i => (i, "x y z")) :+ ((10L, "y x"))
    val df = rows.toDF("doc_id", "text")
    val out = TextAnalysis.bigramQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(out(10L) < out(1L))
  }

  test("trigramQuality: deleted interpolation, hand-computed, short docs neutral") {
    // corpus: "a b c" twice, "c b a" once, "z" —
    // trigrams: (a,b,c):2, (c,b,a):1; ctx2 (a,b)=2, (c,b)=1
    // bigrams: (a,b):2, (b,c):2, (c,b):1, (b,a):1; ctx1 a=2, b=3, c=1
    // unigrams: a:3, b:3, c:3, z:1, N=10
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.trigramQuality(df, "doc_id", "text",
        lambda3 = 0.6, lambda2 = 0.3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_logp"))).toMap
    val l1 = 1.0 - 0.6 - 0.3
    val pABC = 0.6 * (2.0 / 2.0) + 0.3 * (2.0 / 3.0) + l1 * ((3.0 + 1.0) / 11.0)
    val pCBA = 0.6 * (1.0 / 1.0) + 0.3 * (1.0 / 3.0) + l1 * ((3.0 + 1.0) / 11.0)
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.log10(pABC)) < 1e-12)
    assert(math.abs(out(3L)._2 - math.log10(pCBA)) < 1e-12)
    // 1- and 2-token docs: no trigram positions, neutral score
    assert(out(4L) === ((0L, 0.0)))
  }

  test("trigramQuality ranks common word order above rare order") {
    import spark.implicits._
    val rows = (1L to 9L).map(i => (i, "x y z w")) :+ ((10L, "z x w y"))
    val df = rows.toDF("doc_id", "text")
    val out = TextAnalysis.trigramQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(out(10L) < out(1L))
  }

  test("ccnetBuckets trigram tier ranks by trigramQuality and rejects bad tiers") {
    import spark.implicits._
    val docs = ((1L to 6L).map(i => (i, "p q r s t")) ++
      Seq((7L, "t p s q r"), (8L, "r t q"), (9L, "q"))).toDF("doc_id", "text")
    val got = TextAnalysis.ccnetBuckets(docs, "doc_id", "text", tier = "trigram")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[String]("bucket"))).toMap
    // window formulation over the same tier scores
    val scored = TextAnalysis.trigramQuality(docs, "doc_id", "text")
      .select(col("id"), round(col("avg_logp"), 6).as("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, k) => (-k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got.view.mapValues(_._1).toMap === scored)
    val n = scored.size
    got.foreach { case (id, (rank, bucket)) =>
      val want = if (rank <= math.ceil(n / 3.0)) "head"
        else if (rank <= math.ceil(2.0 * n / 3.0)) "middle" else "tail"
      assert(bucket === want, s"doc $id")
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.ccnetBuckets(docs, "doc_id", "text", tier = "tetragram")
    }
  }

  test("ngramQuality(order=3) == trigramQuality and (order=2) == bigramQuality") {
    import spark.implicits._
    val df = (Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a"), (4L, "z"),
      (5L, "a b c a b c d"), (6L, "b c a"), (7L, ""))).toDF("doc_id", "text")
    def keyed(out: org.apache.spark.sql.DataFrame, nCol: String) =
      out.collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long](nCol),
          math.rint(r.getAs[Double]("avg_logp") * 1e9) / 1e9)).toMap
    val tri = keyed(TextAnalysis.trigramQuality(df, "doc_id", "text",
      lambda3 = 0.6, lambda2 = 0.3), "n_trigrams")
    val g3 = keyed(TextAnalysis.ngramQuality(df, "doc_id", "text",
      order = 3, lambdas = Seq(0.6, 0.3)), "n_ngrams")
    assert(g3 === tri)
    val bi = keyed(TextAnalysis.bigramQuality(df, "doc_id", "text",
      lambda = 0.9), "n_bigrams")
    val g2 = keyed(TextAnalysis.ngramQuality(df, "doc_id", "text",
      order = 2, lambdas = Seq(0.9)), "n_ngrams")
    assert(g2 === bi)
  }

  test("fivegramQuality: hand-computed interpolation, short docs neutral") {
    import spark.implicits._
    // corpus: "a b c d e" x2, "e d c b a" x1, "a b c" (too short)
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "e d c b a"),
      (4L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.fivegramQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_fivegrams"), r.getAs[Double]("avg_logp"))).toMap
    // doc 1: 5-gram (a,b,c,d,e) 2/ctx4 2; 4-gram (b,c,d,e) 2/ctx3 2;
    // tri (c,d,e) 2/ctx2 2; bi (d,e) 2/ctx1(d) 3 [(d,e)x2, (d,c)x1];
    // uni e: 3 of N=18
    val l1 = 1.0 - 0.4 - 0.25 - 0.2 - 0.1
    val p1 = 0.4 * 1.0 + 0.25 * 1.0 + 0.2 * 1.0 + 0.1 * (2.0 / 3.0) +
      l1 * ((3.0 + 1.0) / 19.0)
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.log10(p1)) < 1e-12)
    // doc 3's reversed 5-gram: tiers 5..3 all 1/1; bi (b,a) 1/ctx1(b) 4
    // [(b,c)x3, (b,a)x1]; uni a: 4 of 18
    val p3 = 0.4 * 1.0 + 0.25 * 1.0 + 0.2 * 1.0 + 0.1 * (1.0 / 4.0) +
      l1 * ((4.0 + 1.0) / 19.0)
    assert(math.abs(out(3L)._2 - math.log10(p3)) < 1e-12)
    assert(out(4L) === ((0L, 0.0))) // 3 tokens: no 5-gram positions
  }

  test("knTrigramQuality == an independent driver-side interpolated-KN replica") {
    import spark.implicits._
    val texts = Seq("a b c d", "a b c e", "b c d a b c", "x y", "a b c d e a b",
      "c d a b", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // replica: counts from scratch, Chen-Goodman interpolated KN
    def grams(t: String, n: Int) = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length < n) Seq.empty else w.sliding(n).map(_.toSeq).toSeq
    }
    val tri = texts.flatMap(grams(_, 3)).groupBy(identity).map { case (g, o) => g -> o.size }
    val bi = texts.flatMap(grams(_, 2)).groupBy(identity).map { case (g, o) => g -> o.size }
    val ctx3 = tri.groupBy(_._1.take(2)).map { case (c, m) => c -> (m.values.sum, m.size) }
    val cc2 = tri.keys.groupBy(g => g.drop(1)).map { case (s, gs) => s -> gs.size }
    val cctot2 = cc2.groupBy(_._1.head).map { case (p, m) => p -> (m.values.sum, m.size) }
    val cc1 = bi.keys.groupBy(_.last).map { case (w, gs) => w -> gs.size }
    val cctot1 = bi.size.toDouble
    def disc(cs: Iterable[Int]) = {
      val n1 = cs.count(_ == 1); val n2 = cs.count(_ == 2)
      if (n1 + 2 * n2 == 0) 0.5 else n1.toDouble / (n1 + 2 * n2)
    }
    val d3 = disc(tri.values); val d2 = disc(cc2.values)
    def pKn(g: Seq[String]): Double = {
      val (ct3, nf) = ctx3(g.take(2))
      val (ct2, n1p) = cctot2(g(1))
      math.max(tri(g) - d3, 0.0) / ct3 +
        (d3 * nf / ct3) * (math.max(cc2(g.drop(1)) - d2, 0.0) / ct2 +
          (d2 * n1p / ct2) * (cc1(g.last) / cctot1))
    }
    val want = texts.zipWithIndex.map { case (t, i) =>
      val gs = grams(t, 3)
      i.toLong -> (gs.size.toLong,
        if (gs.isEmpty) 0.0 else gs.map(g => math.log10(pKn(g))).sum / gs.size)
    }.toMap
    val got = TextAnalysis.knTrigramQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_logp"))).toMap
    want.foreach { case (id, (n, lp)) =>
      assert(got(id)._1 === n, s"doc $id n")
      assert(math.abs(got(id)._2 - lp) < 1e-9, s"doc $id logp")
    }
    // repeated phrasing scores above scrambled order (the LM signal)
    val rows = (1L to 9L).map(i => (i, "p q r s t")) :+ ((10L, "t p s q r"))
    val out = TextAnalysis.knTrigramQuality(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(out(10L) < out(1L))
  }

  test("knQuality(order=3) == knTrigramQuality; order=5 keeps the LM signal") {
    import spark.implicits._
    val texts = Seq("a b c d e f", "a b c e d f", "b c d a b c d e",
      "x y z", "a b c d e a b c", "c d a b e f", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def keyed(out: org.apache.spark.sql.DataFrame, nCol: String) =
      out.collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long](nCol),
          math.rint(r.getAs[Double]("avg_logp") * 1e9) / 1e9)).toMap
    val ref = keyed(TextAnalysis.knTrigramQuality(df, "doc_id", "text"),
      "n_trigrams")
    val gen = keyed(TextAnalysis.knQuality(df, "doc_id", "text", order = 3),
      "n_ngrams")
    assert(gen === ref)
    // order 5: repeated phrasing outranks a scrambled order
    val rows = (1L to 9L).map(i => (i, "p q r s t u v")) :+
      ((10L, "v t p s u q r"))
    val out = TextAnalysis.knQuality(rows.toDF("doc_id", "text"),
        "doc_id", "text", order = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(out(10L) < out(1L))
  }

  test("ccnetBuckets fivegram tier ranks by fivegramQuality") {
    import spark.implicits._
    val docs = ((1L to 6L).map(i => (i, "p q r s t u v")) ++
      Seq((7L, "v t p s u q r"), (8L, "r t q s p"), (9L, "q"))).toDF("doc_id", "text")
    val got = TextAnalysis.ccnetBuckets(docs, "doc_id", "text", tier = "fivegram")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    val scored = TextAnalysis.fivegramQuality(docs, "doc_id", "text")
      .select(col("id"), round(col("avg_logp"), 6).as("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, k) => (-k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got === scored)
  }

  test("contamination keeps short docs (no formable n-gram) with zero counts") {
    val train = Seq((1L, "too short"), (2L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    val out = Decontamination.contamination(train, "doc_id", "text", eval, "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_ngrams"), r.getAs[Int]("contaminated"))).toMap
    assert(out(1L) === ((0L, 0)))   // 2 tokens, no 5-gram
    assert(out(2L) === ((1L, 1)))   // its single 5-gram is in eval
  }

  test("decontaminate drops contaminated docs and preserves columns") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon", "keepme"),
      (2L, "one two three four five", "other")
    ).toDF("doc_id", "text", "extra")
    val eval = Seq((9L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Decontamination.decontaminate(train, "doc_id", "text", eval, "text", n = 5)
    assert(out.columns.toSeq === Seq("doc_id", "text", "extra"))
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  // ---- HyperplaneSignature / SRP-LSH ----

  test("hyperplane signature is deterministic and respects the md5 sign rule") {
    val df = Seq((1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(1.0f)))
      .toDF("id", "v")
    val sigs = df.select(HyperplaneSignature(col("v"), bits = 8, dim = 8).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs(0) === sigs(1)) // identical input, identical signature
    // recompute bit 0 by hand from the md5 rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d: Int): Double = {
      val dg = md.digest(s"$j|$d".getBytes("UTF-8"))
      val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      if (h % 2 == 0) 1.0 else -1.0
    }
    val proj0 = (0 until 8).map(d => sign(0, d) * 1.0).sum
    val expectedBit0 = if (proj0 > 0) 1L else 0L
    assert((sigs(0) & 1L) === expectedBit0)
  }

  test("hyperplane signature: opposite vectors get complementary bits") {
    val v = Array.tabulate(16)(i => (i + 1).toFloat)
    val df = Seq((1L, v), (2L, v.map(-_))).toDF("id", "v")
    val sigs = df.orderBy("id")
      .select(HyperplaneSignature(col("v"), bits = 16, dim = 16).as("s"))
      .collect().map(_.getLong(0))
    // no projection is exactly zero for this input, so sign flips every bit
    assert((sigs(0) ^ sigs(1)) === 0xffffL)
  }

  test("hyperplane signature NULLs on dimension mismatch") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val out = df.select(HyperplaneSignature(col("v"), bits = 8, dim = 64).as("s"))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("lshNearDupPairs finds identical vectors and verifies with exact cosine") {
    val base = Array.tabulate(32)(i => math.sin(i * 1.7).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.001f
    val far = Array.tabulate(32)(i => math.cos(i * 3.1).toFloat)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "v")
    val pairs = VectorSearch.lshNearDupPairs(df, "id", "v", dim = 32,
      threshold = 0.99, bits = 16, numBands = 4)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("lshNearDupPairs candidates agree with the Column-level band recompute") {
    // the signature path through bands must match a direct recompute
    val emb = graft.Tables.embeddings(spark, sf)
    val viaOp = VectorSearch.lshNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.35, bits = 16, numBands = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force: all pairs sharing any 4-bit band of the signature
    val sigs = emb.select(col("vec_id"),
      HyperplaneSignature(col("embedding"), 16, 64).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if (0 until 4).exists(b => ((sa >> (b * 4)) & 15) == ((sb >> (b * 4)) & 15))
      if cos(vecs(ia), vecs(ib)) >= 0.35
    } yield (ia, ib)).toSet
    assert(viaOp === expected)
  }

  // ---- Multi-table SimHash ----

  test("simhashDupPairs multi-table is EXACT at maxHamming < numTables (pigeonhole)") {
    val docs = graft.Tables.documents(spark, sf)
    val viaOp = Dedup.simhashDupPairs(docs, "doc_id", "text",
      bits = 16, prefixBits = 4, maxHamming = 1, numTables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all pairs within hamming 1 of the 16-bit simhash
    val sigs = Dedup.simhashes(docs, "doc_id", "text", bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 1
    } yield (ia, ib)).toSet
    assert(viaOp === expected)
  }

  test("simhashDupPairs single-table misses pairs the multi-table scheme catches") {
    // two docs whose simhashes differ in ONE bit inside the top prefix:
    // the old single-prefix blocking can never pair them
    val docs = graft.Tables.documents(spark, sf)
    val multi = Dedup.simhashDupPairs(docs, "doc_id", "text",
      bits = 16, prefixBits = 4, maxHamming = 1, numTables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Dedup.simhashDupPairs(docs, "doc_id", "text",
      bits = 16, prefixBits = 4, maxHamming = 1, numTables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi))
    // on this corpus some near-pair differs inside the prefix span
    assert(single.size < multi.size,
      s"expected single-table recall loss, got ${single.size} == ${multi.size}")
  }

  // ---- Boilerplate ----

  test("boilerplateNgrams counts distinct docs, not occurrences") {
    // "x y" repeats twice inside doc 1 but counts once
    val df = Seq(
      (1L, "x y z x y"),
      (2L, "x y q"),
      (3L, "unrelated words here")
    ).toDF("doc_id", "text")
    val hot = TextAnalysis.boilerplateNgrams(df, "doc_id", "text", n = 2, minDocs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hot === Map("x y" -> 2L))
  }

  test("boilerplateFraction covers every doc and bounds the fraction") {
    val df = Seq(
      (1L, "x y z"),
      (2L, "x y w"),
      (3L, "ab")  // single token: no 2-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateFraction(df, "doc_id", "text", n = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_frac"))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("lineDedup drops cross-doc boilerplate lines, preserves order/casing/blanks") {
    val header = "SITE HEADER — Example Corp"
    val footer = "copyright 2026 example corp"
    val df = Seq(
      (1L, s"$header\nUnique opening line.\n\n$footer"),
      (2L, s"$header\nA different body.\nSecond body line.\n$footer"),
      (3L, s"  site header — example corp  \nThird doc body.\n$footer"),
      (4L, "No boilerplate at all.\nJust content.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(df, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // header matches doc 3's padded/lowercased variant via normalization
    // (trim + lowercase), but the SURVIVING lines keep original casing
    assert(out(1L).getAs[String]("cleaned_text") === "Unique opening line.\n")
    assert(out(1L).getAs[Long]("n_lines") === 4L)
    assert(out(1L).getAs[Long]("n_removed") === 2L)
    assert(out(1L).getAs[Double]("removed_frac") === 0.5)
    // order preserved across a removed middle line
    assert(out(2L).getAs[String]("cleaned_text") ===
      "A different body.\nSecond body line.")
    // blank lines are structural: doc 1 keeps its empty line even though
    // "" appears in many docs' normalized forms
    assert(out(1L).getAs[String]("cleaned_text").endsWith("\n"))
    assert(out(4L).getAs[String]("cleaned_text") ===
      "No boilerplate at all.\nJust content.")
    assert(out(4L).getAs[Long]("n_removed") === 0L)
  }

  test("lineDedup counts distinct docs, not occurrences, and honors minDocs") {
    // the repeated line appears TWICE in doc 1 but only 2 distinct docs
    // carry it -> below minDocs = 3, nothing removed
    val df = Seq(
      (1L, "dup line\nbody\ndup line"),
      (2L, "dup line\nother"),
      (3L, "unrelated\ncontent")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(df, "doc_id", "text", minDocs = 3)
      .collect()
    assert(out.forall(_.getAs[Long]("n_removed") === 0L))
    // at minDocs = 2 the duplicated line goes, including BOTH copies in doc 1
    val out2 = TextAnalysis.lineDedup(df, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(1L).getAs[String]("cleaned_text") === "body")
    assert(out2(1L).getAs[Long]("n_removed") === 2L)
    assert(out2(2L).getAs[String]("cleaned_text") === "other")
  }

  test("lineDedup identity: minDocs above the corpus size removes nothing") {
    // the reconstruction must be byte-faithful when no line is hot —
    // original casing, original order, every blank line — over REAL
    // corpus text, not just fixtures
    val docs = graft.Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"),
        regexp_replace(col("text"), " (\\w+ \\w+ \\w+)", "\n$1").as("text"))
    val out = TextAnalysis.lineDedup(docs, "doc_id", "text", minDocs = 101)
      .select(col("id").as("doc_id"), col("cleaned_text"), col("n_removed"))
    val diff = out.join(docs, Seq("doc_id"))
      .filter(col("cleaned_text") =!= col("text") || col("n_removed") =!= 0)
    assert(diff.count() === 0)
    assert(out.count() === 100)
  }

  test("lineDedup: shuffle-join fallback is identical to the broadcast path") {
    val docs = graft.Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"),
        regexp_replace(col("text"), " (\\w+ \\w+ \\w+)", "\n$1").as("text"))
    def run(broadcastHot: Boolean) =
      TextAnalysis.lineDedup(docs, "doc_id", "text",
        minDocs = 3, broadcastHot = broadcastHot)
        .orderBy("id").collect().toSeq
    assert(run(true) === run(false))
  }

  test("boilerplateFraction: shuffle-join fallback is identical to the broadcast path") {
    // the broadcastHot=false tier exists for hot sets past broadcast
    // scale; the contract is bit-identical output on both paths — run
    // them over the real documents table and diff
    val docs = graft.Tables.documents(spark, sf).limit(200)
    def run(broadcastHot: Boolean) =
      TextAnalysis.boilerplateFraction(docs, "doc_id", "text",
        n = 3, minDocs = 5, broadcastHot = broadcastHot)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_boiler"),
            r.getAs[Double]("boiler_frac"))).toMap
    val viaBroadcast = run(broadcastHot = true)
    val viaShuffle = run(broadcastHot = false)
    assert(viaBroadcast.nonEmpty)
    assert(viaShuffle === viaBroadcast)
    // and the fallback really does drop the forced-broadcast hint (AQE
    // may still CHOOSE broadcast at runtime from actual sizes — the
    // contract is only that nothing forces it)
    def hintOf(broadcastHot: Boolean) = TextAnalysis.boilerplateFraction(
      docs, "doc_id", "text", n = 3, minDocs = 5, broadcastHot = broadcastHot)
      .queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    assert(hintOf(true) && !hintOf(false))
  }

  test("unigramQuality: Laplace-smoothed mean log-prob, OOV floor, empty docs neutral") {
    val df = Seq(
      (1L, "a a b"),   // common tokens
      (2L, "a zzz"),   // one rare token
      (3L, "")         // empty -> (0, 0.0)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"))).toMap
    // corpus: a=3, b=1, zzz=1, total=5; p(t) = (c+1)/6
    def lp(c: Long) = math.log10((c + 1.0) / 6.0)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - (2 * lp(3) + lp(1)) / 3) < 1e-12)
    assert(math.abs(out(2L)._2 - (lp(3) + lp(1)) / 2) < 1e-12)
    assert(out(3L) === ((0L, 0.0)))
    // rare-token doc scores strictly worse (more negative)
    assert(out(2L)._2 < out(1L)._2)

    // vocabSize caps the vocabulary: with V=1 only "a" stays in-vocab,
    // b/zzz score at the OOV floor log10(1/6)
    val capped = TextAnalysis.unigramQuality(df, "doc_id", "text", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(math.abs(capped(2L) - (lp(3) + lp(0)) / 2) < 1e-12)
  }

  // ---- trainOrder ----

  test("trainOrder: deterministic, partitioning-independent, epoch-salted") {
    val df = spark.range(0, 500).toDF("id")
    def order(d: org.apache.spark.sql.DataFrame, epoch: Int): Seq[Long] =
      d.withColumn("o", Sampling.trainOrder(col("id"), epoch))
        .orderBy("o", "id").collect().map(_.getLong(0)).toSeq
    val a = order(df, 0)
    val b = order(df.repartition(7), 0)
    assert(a === b)                       // partitioning-independent
    val e1 = order(df, 1)
    assert(a !== e1)                      // epochs permute independently
    assert(a.toSet === e1.toSet)          // same elements, different order
  }

  // ---- Gopher rules ----

  test("gopherRules: each rule flips on its own violation") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, fifty + " the and of input with sample"),     // passes all
      (2L, "short doc the and"),                          // fails word count
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the and"), // mean word len < 3
      (4L, fifty + " the and " + (1 to 12).map(_ => "#").mkString(" ")), // symbol ratio
      (5L, (1 to 60).map(_ => "123").mkString(" ") + " the and")  // alpha frac
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") === 1)
    assert(out(2L).getAs[Int]("pass_word_count") === 0)
    assert(out(3L).getAs[Int]("pass_word_len") === 0)
    assert(out(4L).getAs[Int]("pass_symbol") === 0)
    assert(out(5L).getAs[Int]("pass_alpha") === 0)
    Seq(2L, 3L, 4L, 5L).foreach(id => assert(out(id).getAs[Int]("keep") === 0))
  }

  test("gopherRules: stopword rule needs two hits") {
    val base = (1 to 55).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base + " the"), (2L, base + " the and")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("pass_stopword")).toMap
    assert(out === Map(1L -> 0, 2L -> 1))
  }

  test("ccnetBuckets: distributed prefix-rank equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(9)
    val vocab = Vector("the", "quick", "fox", "jumps", "over", "dog", "xyzzy")
    val docs = (1L to 50L).map { id =>
      id -> Vector.fill(2 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.ccnetBuckets(docs, "doc_id", "text")
      .select("id", "lm_key", "rank", "bucket")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3))).toSet
    // the semantics, stated as the single-partition window it replaces
    val w = Window.orderBy(org.apache.spark.sql.functions.col("lm_key").desc,
      org.apache.spark.sql.functions.col("id").asc)
    val scored = TextAnalysis.unigramQuality(docs, "doc_id", "text")
      .select(col("id"), round(col("avg_logp"), 6).as("lm_key"))
    val n = scored.count()
    val k1 = math.ceil(n / 3.0).toLong; val k2 = math.ceil(2.0 * n / 3.0).toLong
    val want = scored
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .withColumn("bucket", when(col("rank") <= k1, "head")
        .when(col("rank") <= k2, "middle").otherwise("tail"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3))).toSet
    assert(got === want)
    // terciles are exact: 50 -> 17 / 17 / 16
    val sizes = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes === Map("head" -> 17, "middle" -> 17, "tail" -> 16))
  }
}
