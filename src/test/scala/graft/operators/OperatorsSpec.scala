package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

/** Table-in/table-out behavior of the search/dedup operator layer,
  * mirroring the reference DB tests (LibSQLDatabase.test.ts:439-793). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark sql executes hash join and sort merge join plans"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "spark sql executes hash join and sort merge join plan"), // near dup of 2
    (5L, "completely different content about databases and storage")
  ).toDF("id", "text")

  test("exact dedup finds the duplicated text") {
    val groups = Dedup.exactDupGroups(corpus, "id", "text").collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("n_dups") === 2)
    assert(groups.head.getAs[Long]("canonical_id") === 1L)
    val stats = Dedup.exactDupStats(corpus, "id", "text").head()
    assert(stats.getAs[Long]("n_total") === 5)
    assert(stats.getAs[Long]("n_unique") === 4)
  }

  test("minhash LSH surfaces exact and near duplicates") {
    val pairs = Dedup.minhashDupPairs(corpus, "id", "text",
      numHashes = 8, numBands = 4, shingleK = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L))) // exact dup always survives
    assert(pairs.contains((2L, 4L))) // near dup (1-char diff)
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("LSH hot-bucket cap drops degenerate buckets without a window shuffle") {
    // 20 identical docs -> every band bucket has 20 members; cap at 10
    // must eliminate all candidate pairs
    val boiler = (1L to 20L).map(i => (i, "identical boilerplate text body"))
      .toDF("id", "text")
    val sig = Dedup.minhashSignature(boiler, "id", "text",
      numHashes = 8, shingleK = 5)
    val cands = Dedup.lshCandidatePairs(sig, numHashes = 8, numBands = 4,
      maxBucketSize = 10)
    assert(cands.count() === 0)
    // the guard must be the two-phase groupBy+anti-join, not a window
    // over band_key (which re-shuffles every banded row to one task per
    // hot key — the exact skew the cap exists to avoid)
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected in LSH plan:\n$plan")
    // under the cap, pairs still flow
    val ok = Dedup.lshCandidatePairs(sig, numHashes = 8, numBands = 4,
      maxBucketSize = 1000)
    assert(ok.count() === 20L * 19 / 2)
  }

  test("simhash: identical texts agree, near texts are close") {
    val sh = Dedup.simhashes(corpus, "id", "text", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(3L))
    assert(java.lang.Long.bitCount(sh(2L) ^ sh(4L)) <= 6)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(5L)) > 6)
  }

  test("ngram jaccard pairs with blocking") {
    val blocked = corpus.withColumn("grp", lit(1))
    val pairs = Dedup.ngramJaccardPairs(blocked, "id", "text", col("grp"),
      n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("ngram jaccard maxBlockSize drops hot blocks, bounding verify pairs (round 13)") {
    // one degenerate block of 12 near-identical rows + one small block:
    // uncapped the hot block emits 66 verify pairs; capped at 4 it is
    // dropped entirely and only the small block's pairs survive
    val hot = (1L to 12L).map(i => (i, "identical boilerplate row content", "hot"))
    val small = Seq((21L, "alpha beta gamma delta", "ok"),
      (22L, "alpha beta gamma delta", "ok"))
    val df = (hot ++ small).toDF("id", "text", "blk")
    val uncapped = Dedup.ngramJaccardPairs(df, "id", "text", col("blk"),
      n = 2, threshold = 0.5).count()
    assert(uncapped === 66L + 1L)
    val capped = Dedup.ngramJaccardPairs(df, "id", "text", col("blk"),
      n = 2, threshold = 0.5, maxBlockSize = 4L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(capped === Set((21L, 22L)))
  }

  test("term bucket: driver-side hash is bit-identical to the column expression") {
    val terms = Seq("join", "the", "a", "ётерм", "日本語", "x" * 500, "")
    val fromCol = terms.toDF("t")
      .select(col("t"), Bm25.termBucketCol(col("t")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(Bm25.termBucket(t) === fromCol(t), s"bucket mismatch for '$t'")
    }
  }

  test("bm25 ranks term-bearing docs and respects tie-break") {
    val hits = Bm25.search(corpus, "id", "text", Seq("join"), 10).collect()
    assert(hits.map(_.getLong(0)).toSet === Set(2L, 4L))
    // doc 2 has tf=2 for "join" with same length as doc 4 -> ranks first
    assert(hits.head.getLong(0) === 2L)
    assert(hits.forall(_.getDouble(1) > 0))
  }

  test("pii redaction replaces emails, ips, phone runs with typed tokens") {
    val df = Seq(
      (1L, "contact me at jane.doe+x@example.org or call +1 (555) 123-4567"),
      (2L, "server at 192.168.1.100 responded"),
      (3L, "nothing sensitive here at all")
    ).toDF("id", "text")
    val out = TextAnalysis.piiScan(df, "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") === 1)
    val red1 = out(1L).getAs[String]("redacted")
    assert(red1.contains("<EMAIL>") && red1.contains("<PHONE>"))
    assert(!red1.contains("example.org") && !red1.contains("555"))
    assert(out(2L).getAs[Int]("n_ips") === 1)
    assert(out(2L).getAs[String]("redacted").contains("<IP>"))
    assert(out(3L).getAs[String]("redacted") === "nothing sensitive here at all")
  }

  test("repetition score flags token-dominated documents") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam once"),
      (2L, "every word here appears exactly one time")
    ).toDF("id", "text")
    val out = TextAnalysis.repetitionScore(df, "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Double]("top_token_ratio") > 0.8)
    assert(out(2L).getAs[Double]("top_token_ratio") < 0.2)
    assert(out(2L).getAs[Double]("type_token_ratio") === 1.0)
  }

  test("bm25 golden values: hand-computed score with k1=1.2, b=0.75") {
    // corpus: 3 docs; term "join": df=2, N=3, avgdl=(4+4+4)/3=4
    val tiny = Seq(
      (1L, "join join alpha beta"), // tf=2, len=4
      (2L, "join gamma delta eps"), // tf=1, len=4
      (3L, "zeta eta theta iota")   // tf=0
    ).toDF("id", "text")
    val got = Bm25.search(tiny, "id", "text", Seq("join"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def expected(tf: Double): Double = {
      val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
      val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 4.0 / 4.0))
      BigDecimal(idf * tfn).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(got(1L) - expected(2.0)) < 1e-9)
    assert(math.abs(got(2L) - expected(1.0)) < 1e-9)
    assert(!got.contains(3L))
    assert(got(1L) > got(2L)) // higher tf ranks first at equal length
  }

  test("vector topK is exact and deterministically tie-broken") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(1f, 0f, 0f))
    ).toDF("id", "vec")
    val top = VectorSearch.topK(vecs, "vec", Seq(1f, 0f, 0f), 3, "id").collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 4L, 2L)) // ties by id
    assert(top.head.getDouble(2) === 1.0 +- 1e-12)
  }

  test("hybrid fusion boosts both-source hits 1.2x capped at 1") {
    val vec = Seq((1L, 0.9), (2L, 0.5)).toDF("doc", "score")
    val fts = Seq((1L, 3.4), (3L, 2.0)).toDF("doc", "score")
    val fused = HybridSearch.fuse(vec, fts, Seq("doc")).collect()
      .map(r => r.getAs[Long]("doc") ->
        (r.getAs[String]("match_type"), r.getAs[Double]("score"))).toMap
    assert(fused(1L) === ("hybrid", 1.0)) // min(1, 0.9*1.2)
    assert(fused(2L) === ("vector", 0.5))
    assert(fused(3L) === ("fts", 2.0)) // unnormalized fts kept (quirk)
  }

  test("reciprocal-rank fusion: 1/(c+rank) sums, absent lists contribute 0, ties by id") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc", "rank")
    val b = Seq((3L, 1), (1L, 2), (4L, 3)).toDF("doc", "rank")
    val got = HybridSearch.rrfFuseTopK(Seq(a, b), "doc", k = 10)
      .collect().map(r => r.getAs[Long]("doc") ->
        (Option(r.getAs[java.lang.Long]("rank_0")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("rank_1")).map(_.toLong),
          r.getAs[Double]("rrf_score"))).toMap
    assert(got(1L) === ((Some(1L), Some(2L), 1.0 / 61 + 1.0 / 62)))
    assert(got(3L) === ((Some(3L), Some(1L), 1.0 / 63 + 1.0 / 61)))
    assert(got(2L) === ((Some(2L), None, 1.0 / 62)))
    assert(got(4L) === ((None, Some(3L), 1.0 / 63)))
    // both-list hits outrank single-list hits here; doc 1 beats doc 3
    // (1/61 + 1/62 > 1/63 + 1/61)
    val order = HybridSearch.rrfFuseTopK(Seq(a, b), "doc", k = 10)
      .collect().map(_.getAs[Long]("doc")).toSeq
    assert(order === Seq(1L, 3L, 2L, 4L))
  }

  test("MMR re-ranking diversifies: near-copies of the top hit defer to distinct results") {
    // cluster A: three near-copies of the best hit; cluster B: one
    // orthogonal-but-relevant hit. Pure relevance ranks A1 A2 A3 B;
    // MMR at lambda=0.5 must pick B second.
    val docs = Seq(
      (1L, Array(1.00f, 0.0f, 0.00f)),
      (2L, Array(0.98f, 0.0f, 0.02f)), // near-copy of 1 (z-perturbed,
      (3L, Array(0.96f, 0.0f, 0.04f)), //  orthogonal to the query)
      (4L, Array(0.00f, 1.0f, 0.00f))).toDF("id", "v")
    val q = Seq(0.8f, 0.6f, 0.0f)
    val picks = VectorSearch.mmrTopK(docs, "id", "v", q, k = 4,
        shortlist = 4, lambda = 0.5)
      .collect().map(r => (r.getInt(3), r.getLong(0))).sorted.map(_._2)
    assert(picks.head == 1L) // first pick is the relevance argmax
    assert(picks(1) == 4L, s"expected the distinct hit second, got $picks")
    // lambda = 1 degenerates to pure relevance order
    val pure = VectorSearch.mmrTopK(docs, "id", "v", q, k = 4,
        shortlist = 4, lambda = 1.0)
      .collect().sortBy(_.getInt(3)).map(_.getLong(0)).toSeq
    val rel = VectorSearch.topK(docs, "v", q, 4, "id")
      .collect().map(_.getLong(0)).toSeq
    assert(pure === rel)
    // k capped at candidate count; picks are distinct
    assert(VectorSearch.mmrTopK(docs, "id", "v", q, k = 9, shortlist = 9)
      .collect().map(_.getLong(0)).distinct.length == 4)
  }

  test("MMR score ties break to the lowest id, not topK order (ADVICE r13)") {
    // query == first pick, lambda=0.5: every later candidate with
    // rel == sim-to-picked scores EXACTLY 0.5*(rel - rel) = 0.0, so ids
    // 2 (rel 0) and 3 (rel 1/sqrt(2)) tie on MMR score with different
    // relevance. The q113 oracle's `ORDER BY sc DESC, id` picks id 2;
    // topK-order tie-breaking (the old docstring) would pick id 3.
    val docs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 0.0f, 0.0f))).toDF("id", "v")
    val out = VectorSearch.mmrTopK(docs, "id", "v",
        Seq(1.0f, 0.0f, 0.0f, 0.0f), k = 2, shortlist = 3, lambda = 0.5)
      .collect().sortBy(_.getInt(3)).map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L), s"got ${out.toSeq}")
    assert(out(1)._2 === 0.0) // the tie really was at exactly 0.0
  }

  test("MMR re-ranking accepts non-Long ids (ADVICE r12) and preserves the type") {
    val docs = Seq(
      ("doc-a", Array(1.00f, 0.0f, 0.00f)),
      ("doc-b", Array(0.98f, 0.0f, 0.02f)),
      ("doc-c", Array(0.00f, 1.0f, 0.00f))).toDF("id", "v")
    val q = Seq(0.8f, 0.6f, 0.0f)
    val out = VectorSearch.mmrTopK(docs, "id", "v", q, k = 3,
      shortlist = 3, lambda = 0.5)
    assert(out.schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
    val picks = out.collect().sortBy(_.getInt(3)).map(_.getString(0)).toSeq
    assert(picks.head == "doc-a" && picks.toSet.size == 3)
    // int ids too
    val docsInt = Seq((1, Array(1.0f, 0.0f)), (2, Array(0.0f, 1.0f)))
      .toDF("id", "v")
    assert(VectorSearch.mmrTopK(docsInt, "id", "v", Seq(1.0f, 0.0f), k = 2,
      shortlist = 2).collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("stratumRank survives a downstream union (pipelined-stage partition ids)") {
    // regression (round 14): union() pipelines the rank closure into a
    // UnionRDD stage whose TASK partition ids are offset past the first
    // branch's — TaskContext.getPartitionId there broke the offsets
    // lookup; mapPartitionsWithIndex pins the parent RDD's split ids
    val df = (1 to 300).map(i => (s"s${i % 5}", i.toLong)).toDF("src", "v")
      .repartition(8)
    val ranked = Sampling.stratumRank(df, "src",
      Seq(col("v").asc), "rk", "n")
    val unioned = ranked.select("src", "rk")
      .union(ranked.select("src", "rk"))
    assert(unioned.count() === 600)
    // each branch carries identical, correct ranks: 1..60 per stratum
    val byStratum = unioned.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val want = (1L to 60L).flatMap(r => Seq(r, r)).sorted
    assert(byStratum.values.forall(_ == want))
  }

  test("stratumRank ranks a NULL stratum as its own stratum (ADVICE r12)") {
    val df = Seq(
      (1L, "en"), (2L, "en"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, "de")).toDF("id", "lang")
    val out = Sampling.stratumRank(df, "lang",
        Seq(col("id").asc), "rank", "n")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getAs[Long]("rank"), r.getAs[Long]("n"))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, Some("en"), 1L, 2L), (2L, Some("en"), 2L, 2L),
      (3L, None, 1L, 2L), (4L, None, 2L, 2L), (5L, Some("de"), 1L, 1L)))
  }

  test("hammingTopK ranks by popcount(sig xor query) with id tie-break") {
    val sigs = Seq((1L, 0xFFL), (2L, 0xF0L), (3L, 0x0FL), (4L, 0x00L),
      (5L, 0xFEL)).toDF("id", "sig")
    val got = Dedup.hammingTopK(sigs, "id", "sig", querySig = 0xFFL, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 0), (5L, 1), (2L, 4), (3L, 4)))
  }

  test("context expansion respects char budget with 20% overflow rule") {
    val chunks = (0 to 9).map(i => ("d1", i, s"chunk$i " + "x" * 93)) // 100 chars each
      .toDF("docId", "chunkIndex", "content")
    val hits = Seq(("d1", 5)).toDF("docId", "chunkIndex")
    val out = ContextExpansion.expand(hits, chunks, "docId", "chunkIndex",
      "content", window = 4, maxChars = 350).head()
    // 100-char chunks, budget 350, cap 420: hit + 3 neighbors admitted
    assert(out.getAs[Long]("n_chunks") === 4)
    assert(out.getAs[Int]("start_index") <= 4 && out.getAs[Int]("end_index") >= 5)
    val ctx = out.getAs[String]("context")
    assert(ctx.contains("chunk5"))
    // ordered concatenation by chunk index
    val order = "chunk([0-9])".r.findAllMatchIn(ctx).map(_.group(1).toInt).toSeq
    assert(order === order.sorted)
  }

  test("phrase search: adjacency, overlaps, case-insensitivity, no-match") {
    val docs = Seq(
      (1L, "the hash join wins over sort merge"),
      (2L, "hash  join\nhash join again"),   // 2 occurrences, ws runs/newline
      (3L, "join hash reversed order here"), // terms present, not adjacent
      (4L, "HASH JOIN uppercase"),           // tokenizer lowercases
      (5L, "a a a repeated")                 // overlapping phrase "a a" -> 2
    ).toDF("doc_id", "text")
    val post = Bm25.positionalPostings(docs, "doc_id", "text")
    val got = Bm25.phraseOccurrences(post, Seq("hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 4L -> 1L))
    val overlap = Bm25.phraseOccurrences(post, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(overlap === Map(5L -> 2L))
    // three-term phrase
    val tri = Bm25.phraseOccurrences(post, Seq("hash", "join", "wins"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L))
  }

  test("context expansion == reference admit loop (before fills first, \\n separators counted)") {
    // varied lengths so the budget binds at different points per hit
    val lens = Seq(40, 120, 60, 200, 30, 90, 150, 45, 80, 110)
    val chunks = lens.zipWithIndex
      .map { case (n, i) => ("d1", i, s"c$i" + "x" * (n - 2)) }
      .toDF("docId", "chunkIndex", "content")
    val contents = lens.zipWithIndex
      .map { case (n, i) => i -> (s"c$i" + "x" * (n - 2)) }.toMap
    // driver-side transcription of LibSQLDatabase.getExpandedContext
    def reference(hit: Int, maxChars: Int): (Int, Int, String) = {
      var total = contents(hit)
      var start = hit; var end = hit
      var b = hit - 1
      while (total.length < maxChars && b >= 0 &&
        total.length + contents(b).length <= maxChars * 1.2) {
        total = contents(b) + "\n" + total; start = b; b -= 1
      }
      var a = hit + 1
      while (total.length < maxChars && a < lens.length &&
        total.length + contents(a).length <= maxChars * 1.2) {
        total = total + "\n" + contents(a); end = a; a += 1
      }
      (start, end, total)
    }
    for (budget <- Seq(150, 300, 500)) {
      val hits = Seq(("d1", 0), ("d1", 4), ("d1", 9)).toDF("docId", "chunkIndex")
      val got = ContextExpansion.expand(hits, chunks, "docId", "chunkIndex",
        "content", window = 10, maxChars = budget)
        .collect().map(r => r.getAs[Int]("hit_idx") ->
          ((r.getAs[Int]("start_index"), r.getAs[Int]("end_index"),
            r.getAs[String]("context")))).toMap
      for (hit <- Seq(0, 4, 9)) {
        assert(got(hit) === reference(hit, budget), s"hit=$hit budget=$budget")
      }
    }
  }

  test("context expansion: missing target yields empty row, gap breaks the walk") {
    // indices 0,1,2,4,5,6 — 3 is missing; 100 chars each
    val chunks = Seq(0, 1, 2, 4, 5, 6)
      .map(i => ("d1", i, s"chunk$i " + "x" * 93))
      .toDF("docId", "chunkIndex", "content")
    val hits = Seq(("d1", 4), ("d1", 3), ("d2", 0), ("d1", 50))
      .toDF("docId", "chunkIndex")
    val out = ContextExpansion.expand(hits, chunks, "docId", "chunkIndex",
      "content", window = 6, maxChars = 5000)
      .collect().map(r => (r.getAs[String]("doc"), r.getAs[Int]("hit_idx")) ->
        ((r.getAs[Int]("start_index"), r.getAs[Int]("end_index"),
          r.getAs[Long]("n_chunks"), r.getAs[String]("context")))).toMap
    // hit 4: before-walk fetches 3 -> missing -> break (reference
    // semantics); after-walk admits 5,6. Budget is ample, so without
    // the gap-break it would have grabbed 0..2 as well.
    assert(out(("d1", 4)) === ((4, 6, 3L,
      Seq(4, 5, 6).map(i => s"chunk$i " + "x" * 93).mkString("\n"))))
    // hit 3: target itself missing -> empty context, start=end=hit
    assert(out(("d1", 3)) === ((3, 3, 0L, "")))
    // hit on a doc with no chunks at all -> same empty-row shape
    assert(out(("d2", 0)) === ((0, 0, 0L, "")))
    // stale hit: the doc HAS chunks but none within `window` of the hit
    // (e.g. after chunk removal) — must NOT vanish from the output
    assert(out(("d1", 50)) === ((50, 50, 0L, "")))
  }

  test("taxonomy closure: diamond polyhierarchy and depth") {
    val edges = Seq(
      ("leaf", "midA"), ("leaf", "midB"), // two parents
      ("midA", "root"), ("midB", "root")
    ).toDF("child", "parent")
    val closure = Taxonomy.ancestorClosure(edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(closure === Set(
      ("leaf", "midA"), ("leaf", "midB"), ("leaf", "root"),
      ("midA", "root"), ("midB", "root")))
    val roots = Taxonomy.roots(
      Seq("leaf", "midA", "midB", "root").toDF("id"), edges).collect()
    assert(roots.map(_.getString(0)).toSeq === Seq("root"))
  }

  test("centroids: exact ordered fold and streaming avg agree to 1e-9") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      (i % 5, i.toLong, Array.fill(8)(rnd.nextFloat())))
    val df = rows.toDF("g", "ord", "vec")
    def collectC(maxExact: Long) =
      VectorSearch.centroids(df, "g", "vec", "ord", maxExact)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = collectC(Long.MaxValue) // every group folds in order
    val stream = collectC(0L)           // every group routes to avg
    assert(exact.keySet === stream.keySet)
    assert(exact.size === 5 * 8)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - stream(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"paths disagree at $k: $v vs ${stream(k)}")
    }
  }

  test("threshold algebra: score >= t  <=>  distance <= 2(1-t)") {
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(-1f, 0f)))
      .toDF("id", "vec")
    val q = Seq(1f, 0f)
    val scored = vecs.withColumn("dist",
      VectorFunctions.cosineDist(col("vec"), VectorSearch.queryVec(q)))
      .withColumn("score", VectorFunctions.distToScore(col("dist")))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("dist"),
        r.getAs[Double]("score")))
    scored.foreach { case (_, dist, score) =>
      val t = 0.5
      assert((score >= t) === (dist <= 2 * (1 - t)))
    }
    assert(scored.find(_._1 == 1L).get._3 === 1.0 +- 1e-12)
    assert(scored.find(_._1 == 3L).get._3 === 0.0 +- 1e-12)
  }

  test("ngramContainmentPairs flags the quote Jaccard misses") {
    import org.apache.spark.sql.functions.col
    val quote = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, "blk", quote),
      // the quote embedded in a much longer doc: containment 1.0,
      // resemblance far below any threshold
      (2L, "blk", quote + " and then a very long discussion follows " +
        "with many additional sentences about completely unrelated " +
        "topics that dilute the union far below resemblance"),
      (3L, "blk", "entirely different content about query planners"),
      (4L, "other", quote) // different block: never paired with 1
    ).toDF("id", "blk", "text")
    val got = Dedup.ngramContainmentPairs(docs, "id", "text", col("blk"),
        n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(6)))
    assert(got.toSeq === Seq((1L, 2L, 1.0))) // short-inside-long found
    // the same pair is invisible to resemblance at the same bar
    val jac = Dedup.ngramJaccardPairs(docs, "id", "text", col("blk"),
        n = 3, threshold = 0.9)
      .collect()
    assert(jac.isEmpty)
  }

  test("prefix-filtered containment == exact enumeration on random corpora") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(53)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    for (trial <- 1 to 3) {
      val docs = (1 to 60).map { i =>
        val len = 4 + rnd.nextInt(12)
        (i.toLong, s"b${rnd.nextInt(3)}",
          (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("id", "blk", "text")
      for (t <- Seq(0.4, 0.7, 1.0)) {
        def key(r: org.apache.spark.sql.Row) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6))
        val exact = Dedup.ngramContainmentPairs(docs, "id", "text",
          col("blk"), n = 2, threshold = t).collect().map(key).toSet
        val filtered = Dedup.ngramContainmentPairsFiltered(docs, "id",
          "text", col("blk"), n = 2, threshold = t).collect().map(key).toSet
        assert(filtered === exact, s"trial $trial t=$t")
      }
    }
  }

  test("hardNegatives: only label-mismatched neighbors, nearest first") {
    // query (1,0) label A; same-label near-copy must NOT appear even
    // though it is the nearest vector overall
    val corpus = Seq(
      (10L, "A", Array(1.0f, 0.01f)),  // same label, nearest — excluded
      (11L, "B", Array(1.0f, 0.1f)),   // hard negative (closest B)
      (12L, "B", Array(0.0f, 1.0f)),   // easy negative
      (13L, "C", Array(1.0f, 0.2f))    // second-hardest negative
    ).toDF("vec_id", "label", "embedding")
    val queries = Seq((1L, "A", Array(1.0f, 0.0f)))
      .toDF("qid", "qlabel", "qvec")
    val got = VectorSearch.hardNegatives(corpus, "vec_id", "embedding",
        "label", queries, "qid", "qvec", "qlabel", k = 2)
      .orderBy("rn").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq((1, 11L, "B"), (2, 13L, "C")))
  }
}
