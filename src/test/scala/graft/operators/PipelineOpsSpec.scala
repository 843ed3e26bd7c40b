package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-2 pipeline operators: deterministic sampling, as-of join,
  * banded range join, int8 quantization. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Sampling ----

  test("hashSample is deterministic and partitioning-independent") {
    val df = spark.range(0, 2000).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 20).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(7), col("id"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    // ~20% within generous bounds
    assert(a.size > 250 && a.size < 550, s"got ${a.size}")
  }

  test("weightedSample matches a driver-side replica of the ES keys") {
    val rows = (1L to 200L).map(i => (i, (i % 13 + 1).toDouble))
    val df = rows.toDF("id", "w")
    val expected = rows.map { case (i, w) =>
      val u = (md5Hash32(s"es0|$i") + 0.5) / 4294967296.0
      val key = math.floor(math.pow(u, 1.0 / w) * 1e9).toLong
      (i, key)
    }.sortBy { case (i, k) => (-k, i) }.take(25).map(_._1).toSet
    val got = Sampling.weightedSample(df, col("id"), col("w"), k = 25)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("weightedSample is partitioning-invariant and excludes non-positive weights") {
    val df = (1L to 100L).map(i => (i, if (i % 10 == 0) 0.0 else i.toDouble))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, col("id"), col("w"), 30)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df.repartition(8), col("id"), col("w"), 30)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.forall(_ % 10 != 0), "zero-weight rows must never be sampled")
    assert(a.size === 30)
  }

  test("weightedSample favors heavy rows across seeds") {
    // one row with 50x the weight of the rest must appear in far more
    // seed-universes than a baseline row
    val df = (1L to 50L).map(i => (i, if (i == 7L) 50.0 else 1.0)).toDF("id", "w")
    val hits = (0 until 20).count { s =>
      Sampling.weightedSample(df, col("id"), col("w"), 5, seed = s)
        .collect().exists(_.getLong(0) == 7L)
    }
    assert(hits >= 15, s"heavy row sampled only $hits/20 times")
  }

  test("hashSample is monotone in keep: smaller samples nest in larger") {
    val df = spark.range(0, 1000).toDF("id")
    val small = Sampling.hashSample(df, col("id"), 10).collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, col("id"), 30).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("splitByHash: disjoint, covering when weights sum to outOf") {
    val df = spark.range(0, 1000).toDF("id")
    val Seq(train, valid, testS) =
      Sampling.splitByHash(df, col("id"), Seq(80, 10, 10))
    val t = train.collect().map(_.getLong(0)).toSet
    val v = valid.collect().map(_.getLong(0)).toSet
    val e = testS.collect().map(_.getLong(0)).toSet
    assert((t & v).isEmpty && (t & e).isEmpty && (v & e).isEmpty)
    assert(t.size + v.size + e.size === 1000)
  }

  test("sampling aligns across tables sharing a key") {
    val docs = spark.range(0, 500).toDF("id")
    val embs = spark.range(0, 500).toDF("id").withColumn("x", col("id") * 2)
    val d = Sampling.hashSample(docs, col("id"), 15).collect().map(_.getLong(0)).toSet
    val e = Sampling.hashSample(embs, col("id"), 15).collect().map(_.getLong(0)).toSet
    assert(d === e)
  }

  // ---- AsOfJoin ----

  private def asOfFixture = {
    // user 1: clicks at t=10,20,30; user 2: click at t=100; user 3: none
    val right = Seq((1L, 10L, "c10"), (1L, 20L, "c20"), (1L, 30L, "c30"),
      (2L, 100L, "c100"))
      .toDF("user_id", "rts", "tag")
    val left = Seq((1L, 5L, "e1"), (1L, 20L, "e2"), (1L, 25L, "e3"),
      (1L, 99L, "e4"), (2L, 100L, "e5"), (3L, 50L, "e6"))
      .toDF("user_id", "lts", "name")
    (left, right)
  }

  test("asof backward: latest right at-or-before each left, inclusive, null when none") {
    val (left, right) = asOfFixture
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "lts", "rts", Seq("tag"))
      .select("name", "tag").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("e1") === null) // before any click
    assert(out("e2") === "c20") // equal ts is inclusive
    assert(out("e3") === "c20")
    assert(out("e4") === "c30")
    assert(out("e5") === "c100")
    assert(out("e6") === null) // user with no right rows
  }

  test("asof backward matches the naive per-row formulation") {
    val n = 400
    val right = (0 until n).map(i => ((i % 5).toLong, (i * 7 % 97).toLong, i.toLong))
      .toDF("k", "rts", "rid")
      // one row per (k, ts): deterministic winner, as documented
      .groupBy("k", "rts").agg(max("rid").as("rid"))
    val left = (0 until n).map(i => ((i % 5).toLong, (i * 13 % 101).toLong, i.toLong))
      .toDF("k", "lts", "lid")
    val got = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts", Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val leftRows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    leftRows.foreach { case (k, lts, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= lts)
      val want = if (cands.isEmpty) -1L else cands.maxBy(r => (r._2, r._3))._3
      assert(got(lid) === want, s"left $lid (k=$k, ts=$lts)")
    }
  }

  test("asof backward: NULL payload on the latest right row stays NULL") {
    // regression: per-column last(ignoreNulls) used to fall through to a
    // staler right row's value; SQL ASOF returns the matched row as-is
    val right = Seq((1L, 10L, Some("a"), Some(100L)),
      (1L, 20L, None, Some(200L)))
      .toDF("k", "rts", "tag", "aux")
    val left = Seq((1L, 25L, "e1")).toDF("k", "lts", "name")
    val row = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("tag", "aux")).head()
    assert(row.getAs[String]("tag") === null) // from ts=20 row, not ts=10
    assert(row.getAs[Long]("aux") === 200L)   // same right row, coherent
  }

  test("asof backward: NULL keys never match (SQL join semantics)") {
    val right = Seq((Option(1L), 10L, "a"), (Option.empty[Long], 5L, "nullside"))
      .toDF("k", "rts", "tag")
    val left = Seq((Option(1L), 20L, "e1"), (Option.empty[Long], 20L, "e2"))
      .toDF("k", "lts", "name")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts", Seq("tag"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("tag")).toMap
    assert(out("e1") === "a")
    assert(out("e2") === null) // not "nullside"
  }

  test("connectedComponents fails loudly instead of returning non-fixpoint labels") {
    // a 100-link chain cannot flatten to a star in one round; a silent
    // return would mislabel every node >1 hop from the minimum
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, "a", "b", maxIter = 1,
        localEdgeThreshold = 0L) // force the iterative path under test
    }
  }

  test("sizeProfile histograms cluster sizes with removal mass") {
    // components: {1,2,3} (one 3-cluster), {10,11} {20,21} (two pairs),
    // {30} (singleton)
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L)).toDF("node", "component")
    val got = Components.sizeProfile(cc).orderBy("cluster_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L, 1L, 0L), (2L, 2L, 4L, 2L),
      (3L, 1L, 3L, 2L)))
  }

  test("connectedComponents handles a 1000-link chain at default maxIter") {
    // the diameter-independence property: large-star/small-star needs
    // ~log n rounds on a chain, where min-label propagation needs n —
    // the shape that breaks naive dedup clustering on crawl mirrors
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(chain, "a", "b",
        localEdgeThreshold = 0L) // force the iterative path under test
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 1001)
    assert(got.forall(_._2 === 0L))
  }

  test("connectedComponents: local union-find path ≡ iterative star path") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val edges = (0 until 400)
        .map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("a", "b").repartition(5)
      val local = Components.connectedComponents(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val iterative = Components.connectedComponents(df, "a", "b",
          localEdgeThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === iterative, s"trial $trial")
    }
    // non-long ids always take the iterative path (ordering semantics)
    val sdf = Seq(("b", "a"), ("c", "b")).toDF("a", "b")
    val sGot = Components.connectedComponents(sdf, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sGot === Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  // ---- RangeJoin ----

  test("intervalOverlapPairs == naive inequality join on random intervals") {
    val rnd = new scala.util.Random(31)
    val ls = (1 to 300).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, (rnd.nextInt(4) + 1).toLong, s, s + rnd.nextInt(700))
    }
    val rs = (1 to 300).map { i =>
      val s = rnd.nextInt(10000).toLong
      (1000L + i, (rnd.nextInt(4) + 1).toLong, s, s + rnd.nextInt(300))
    }
    val l = ls.toDF("lid", "k", "ls", "le").repartition(7)
    val r = rs.toDF("rid", "k", "rs_", "re").repartition(5)
    for (band <- Seq(64L, 250L, 5000L)) {
      val got = RangeJoin.intervalOverlapPairs(l, r, Seq("k"),
        "ls", "le", "rs_", "re", bandTicks = band)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val want = ls.flatMap { case (lid, lk, s1, e1) =>
        rs.collect { case (rid, rk, s2, e2)
          if lk == rk && s1 <= e2 && s2 <= e1 => (lid, rid) }
      }
      // exact multiset equality: the first-shared-band rule must emit
      // each overlapping pair EXACTLY once, with no distinct stage
      assert(got.sorted.toSeq === want.sorted.toSeq, s"band=$band")
      assert(got.nonEmpty)
    }
  }

  test("intervalOverlapPairs: boundary touch counts, disjoint/invalid rows drop") {
    val l = Seq((1L, "k", 0L, 10L), (2L, "k", 50L, 40L)) // row 2 invalid
      .toDF("lid", "k", "ls", "le")
    val r = Seq((10L, "k", 10L, 20L),   // touches at 10 -> overlap
                (11L, "k", 11L, 20L),   // disjoint
                (12L, "k", 45L, 60L))   // would only match invalid row 2
      .toDF("rid", "k", "rs_", "re")
    val got = RangeJoin.intervalOverlapPairs(l, r, Seq("k"),
      "ls", "le", "rs_", "re", bandTicks = 7L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("banded range join == naive inequality join, including band boundaries") {
    val left = (0 until 60).map(i => (i.toLong % 3, i * 37L % 500, i.toLong))
      .toDF("k", "lts", "lid")
    val right = (0 until 60).map(i => (i.toLong % 3, i * 53L % 500, 1000L + i))
      .toDF("k", "rts", "rid")
    val w = 100L
    val got = RangeJoin.trailingWindowPairs(left, right, Seq("k"), "lts", "rts", w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      l <- left.collect(); r <- right.collect()
      if l.getLong(0) == r.getLong(0)
      if r.getLong(1) > l.getLong(1) - w && r.getLong(1) <= l.getLong(1)
    } yield (l.getLong(2), r.getLong(2))).toSet
    assert(got === want)
  }

  // ---- Components ----

  test("connectedComponents: chains, isolates-in-pairs, min labels") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = Components.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents matches driver-side union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = parent.keys.map(n => n -> find(n)).toMap
    // canonical label = min member per root
    val minPerRoot = roots.groupMapReduce(_._2)(_._1)(math.min)
    val want = roots.map { case (n, r) => n -> minPerRoot(r) }
    assert(got === want)
  }

  test("canonicalPerComponent keeps exactly one doc per cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val comp = Components.connectedComponents(pairs, "a", "b")
    val canon = Components.canonicalPerComponent(comp)
      .collect().map(_.getLong(0)).toSet
    assert(canon === Set(1L, 7L))
  }

  // ---- Quantization ----

  test("perKeyTopN equals the single-window form on any partitioning") {
    val rnd = new scala.util.Random(11)
    // skewed: key 0 dominates (the case the two-phase shape exists for)
    val rows = (1 to 3000).map { i =>
      val k = if (rnd.nextDouble() < 0.7) 0 else rnd.nextInt(8)
      (i.toLong, k, rnd.nextInt(1000))
    }
    val df = rows.toDF("id", "src", "sz").repartition(13)
    val got = Quota.perKeyTopN(df, Seq("src"),
      Seq(desc("sz"), asc("id")), n = 5)
      .select("id", "src", "sz", "rnk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val expect = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("rnk", row_number().over(
        Window.partitionBy("src").orderBy(desc("sz"), asc("id"))))
        .filter(col("rnk") <= 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    }
    assert(got === expect)
    assert(got.size === 8 * 5) // every key has >= 5 rows at these sizes
  }

  test("perKeyTokenBudget equals the single-window form; prefix semantics") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map { i =>
      val k = if (rnd.nextDouble() < 0.7) 0 else rnd.nextInt(8)
      (i.toLong, k, rnd.nextInt(1000), 1L + rnd.nextInt(300))
    }
    val df = rows.toDF("id", "src", "score", "toks").repartition(13)
    val got = Quota.perKeyTokenBudget(df, Seq("src"),
      Seq(desc("score"), asc("id")), "toks", budget = 1500L)
      .select("id", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("src").orderBy(desc("score"), asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cum_tokens", sum(col("toks")).over(w))
        .filter(col("cum_tokens") <= 1500L)
        .select("id", "cum_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got === expect)
    assert(got.nonEmpty)

    // prefix semantics: an oversized row BLOCKS later smaller rows of
    // its key (rank order: id asc — row 2 overflows, so row 3 is out
    // even though it alone would fit)
    val tiny = Seq((1L, "a", 100L), (2L, "a", 950L), (3L, "a", 10L))
      .toDF("id", "src", "toks")
    val admitted = Quota.perKeyTokenBudget(tiny, Seq("src"), Seq(asc("id")),
      "toks", budget = 1000L).select("id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L))
  }

  test("quantized codes stay in int8 range; zero vector is NaN-free") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.99f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(100f, -50f, 25f, -12.5f))
    ).toDF("id", "v")
    val q = Quantization.quantized(df, "v")
    val rows = q.orderBy("id").collect()
    rows.foreach { r =>
      val codes = r.getAs[scala.collection.Seq[Long]]("codes")
      assert(codes.forall(c => c >= -128 && c <= 127), s"codes $codes")
    }
    // zero vector: all-zero codes, cosine guarded to 0.0
    val z = q.filter(col("id") === 2)
    val cos = q.filter(col("id") === 1).select(col("codes").as("a"))
      .crossJoin(z.select(col("codes").as("b")))
      .select(Quantization.quantizedCosine(col("a"), col("b")))
      .head().getDouble(0)
    assert(cos === 0.0)
  }

  test("quantized cosine approximates exact cosine on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(200)
    val q = Quantization.quantized(emb, "embedding")
    val qRow = q.head()
    val qCodes = qRow.getAs[scala.collection.Seq[Long]]("codes").toSeq
    val qVec = qRow.getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val both = q.select(col("vec_id"),
      Quantization.quantizedCosine(col("codes"),
        array(qCodes.map(lit): _*)).as("qcos"),
      graft.functions.VectorFunctions.cosineSim(col("embedding").cast("array<double>"),
        array(qVec.map(v => lit(v.toDouble)): _*)).as("cos"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.02,
        s"vec ${r.get(0)}: qcos=${r.getDouble(1)} cos=${r.getDouble(2)}")
    }
  }

  test("quantization shrinks the on-disk codes ~4x vs float32") {
    // int8 codes as bytes: 64 dims -> 64 bytes vs 256 bytes float32;
    // here codes are longs in memory, so assert the VALUE range admits
    // a byte representation (the storage claim), not the long encoding
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val codes = Quantization.quantized(emb, "embedding")
      .select(explode(col("codes"))).collect().map(_.getLong(0))
    assert(codes.forall(c => c >= Byte.MinValue && c <= Byte.MaxValue))
  }

  test("codeSumAffinity: orthogonal groups pin 0, identical pin 1, 45-degree pins 1/sqrt(2)") {
    // A: two copies of [1,0] -> codes [127,0] each -> resultant [254,0]
    // B: [0,2]              -> codes [0,127]      -> resultant [0,127]
    // C: [1,1]              -> codes [127,127]    -> resultant [127,127]
    // D: duplicate of A     -> resultant [254,0]
    val df = Seq(
      ("A", Array(1f, 0f)), ("A", Array(1f, 0f)),
      ("B", Array(0f, 2f)),
      ("C", Array(1f, 1f)),
      ("D", Array(1f, 0f)), ("D", Array(1f, 0f))).toDF("g", "v")
    val got = Quantization.codeSumAffinity(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got(("A", "B")) === 0.0)
    assert(got(("A", "D")) === 1.0) // identical resultants divide to exactly 1
    assert(math.abs(got(("A", "C")) - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(got.size === 6) // all unordered pairs of 4 groups, a < b
    // partitioning invariance: integer sums, same doubles
    val got2 = Quantization.codeSumAffinity(df.repartition(5), "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got2 === got)
  }
}
