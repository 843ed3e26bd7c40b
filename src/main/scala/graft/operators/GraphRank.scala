package graft.operators

import graft.util.Materialize.MatOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over corpus-derived graphs (Page et al. 1999 —
  * "The PageRank Citation Ranking"): the curation signal web-corpus
  * pipelines propagate over link or similarity structure (a page linked
  * from / similar to high-quality pages is probably higher-quality than
  * its surface features alone suggest — the graph-side complement to
  * the per-document classifier tier).
  *
  * The rank runs in INTEGER micro-units (the [[LangId]] discipline):
  * total mass starts at `Scale` = 10^12, every transfer is a
  * left-to-right long division, sums are exact long sums — zero float
  * accumulation freedom, so a DuckDB oracle replays each iteration
  * bit-for-bit (integer division loses a bounded remainder per edge;
  * that mass evaporates identically on both engines).
  *
  * Scale shape: one shuffle per iteration, carrying (id, score) pairs
  * keyed by edge endpoints — never text, never vectors. Iterations are
  * a fixed small constant (rank stabilizes in O(10) rounds at damping
  * 0.85), so the job count is bounded. The out-degree table is computed
  * once and co-shuffled with the edges. Dangling mass (nodes with no
  * out-edges) evaporates — the standard simplification; kNN-derived
  * graphs have uniform out-degree k, so there it changes nothing.
  */
object GraphRank {

  /** Total integer mass: scores are micro-units of 10^-12 of the graph. */
  val Scale: Long = 1000000000000L

  /** [[hits]]'s renormalization target — smaller than [[Scale]] so the
    * max-normalizing integer product stays inside a long (see hits). */
  val HitsScale: Long = 1000000L

  /** Fixed-round integer PageRank.
    *
    * @param nodes (idCol) — every rankable node (isolated ones included)
    * @param edges (srcCol, dstCol) directed; parallel edges count twice
    * @param rounds fixed iteration count (both engines unroll the same)
    * @param dampNum/dampDen damping as a rational (85/100 = the classic
    *        0.85) so the transfer stays in integers
    * Output: (id, score) — score in micro-units, exact long.
    */
  def pagerank(nodes: DataFrame, idCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               rounds: Int, dampNum: Long = 85L, dampDen: Long = 100L)
      : DataFrame = {
    require(rounds >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val n = ids.count()
    require(n > 0, "pagerank needs at least one node")
    val init = Scale / n
    val base = Scale / n * (dampDen - dampNum) / dampDen
    val deg = edges.groupBy(col(srcCol).as("id"))
      .agg(count(lit(1)).as("__deg"))
    // (src, dst, outdeg) computed once; every round re-joins scores only
    val e = edges.select(col(srcCol).as("id"), col(dstCol).as("__dst"))
      .join(deg, Seq("id"))
      .materializeOnce(eager = false)
    var s = ids.withColumn("score", lit(init))
    var r = 0
    while (r < rounds) {
      // `div` = integer division (long / long in Spark SQL is DOUBLE);
      // left-to-right: (score*num) div den div deg, same as the oracle
      val contrib = e.join(s, Seq("id"))
        .select(col("__dst").as("id"),
          expr(s"score * $dampNum div $dampDen div __deg").as("__c"))
        .groupBy("id").agg(sum("__c").as("__in"))
      s = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("score"))
        .materializeOnce(eager = false)
      r += 1
    }
    s
  }

  /** Similarity-WEIGHTED fixed-round PageRank: mass transfers along an
    * edge in proportion to its integer weight instead of uniformly
    * over out-degree — on the kNN graph the weight is the quantized
    * cosine, so a near-duplicate neighbor receives more rank than a
    * marginal one (the similarity-weighted variant of the standard
    * random-surfer model; Page et al. 1999 §2.4 sketches exactly this
    * generalization). Same integer discipline as [[pagerank]]:
    * transfer = score · dampNum div dampDen · w div W_src, all
    * left-to-right long divisions (score ≤ Scale=10^12, dampNum ≤ 100,
    * w ≤ 10^6 quantized weights → the widest intermediate is
    * ~8.5×10^17, inside a long). Non-positive-weight edges must be
    * filtered by the CALLER (a ≤0-weight transfer has no surfer
    * semantics); nodes whose out-weight sum is 0 are dangling and
    * their mass evaporates, like pagerank's.
    *
    * Scale shape identical to [[pagerank]] — the out-weight table
    * computes once; each round shuffles (id, score) pairs only. */
  def weightedPagerank(nodes: DataFrame, idCol: String,
                       edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, rounds: Int,
                       dampNum: Long = 85L, dampDen: Long = 100L)
      : DataFrame = {
    require(rounds >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val n = ids.count()
    require(n > 0, "weightedPagerank needs at least one node")
    val init = Scale / n
    val base = Scale / n * (dampDen - dampNum) / dampDen
    val wsum = edges.groupBy(col(srcCol).as("id"))
      .agg(sum(col(wCol)).as("__wsum"))
    val e = edges.select(col(srcCol).as("id"), col(dstCol).as("__dst"),
        col(wCol).cast("long").as("__w"))
      .join(wsum, Seq("id"))
      .materializeOnce(eager = false)
    var s = ids.withColumn("score", lit(init))
    var r = 0
    while (r < rounds) {
      val contrib = e.join(s, Seq("id"))
        .select(col("__dst").as("id"),
          expr(s"score * $dampNum div $dampDen * __w div __wsum").as("__c"))
        .groupBy("id").agg(sum("__c").as("__in"))
      s = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("score"))
        .materializeOnce(eager = false)
      r += 1
    }
    s
  }

  /** The DuckDB replay of [[weightedPagerank]] over `nodes(id)` /
    * `edges(src, dst, w)` CTEs — unrolled rounds, the same
    * left-to-right integer chain. Ends at CTE `wpr` = (id, score). */
  def weightedOracleCtes(rounds: Int, dampNum: Long = 85L,
                         dampDen: Long = 100L): String = {
    val keep = dampDen - dampNum
    val steps = (1 to rounds).map { i => s"""
      wc$i AS (
        SELECT e.dst AS id,
          CAST(sum(p.score * $dampNum // $dampDen * e.w // d.wsum)
            AS BIGINT) AS s
        FROM edges e
        JOIN wr${i - 1} p ON p.id = e.src
        JOIN wdeg d ON d.id = e.src
        GROUP BY e.dst),
      wr$i AS (
        SELECT n.id, wn.base + coalesce(c.s, 0) AS score
        FROM nodes n CROSS JOIN wn
        LEFT JOIN wc$i c ON c.id = n.id)"""
    }.mkString(",")
    s"""wn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          ${Scale}::BIGINT // CAST(count(*) AS BIGINT) AS init,
          ${Scale}::BIGINT // CAST(count(*) AS BIGINT)
            * $keep // $dampDen AS base
        FROM nodes),
      wdeg AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS wsum
               FROM edges GROUP BY src),
      wr0 AS (SELECT id, wn.init AS score FROM nodes, wn),$steps,
      wpr AS (SELECT id, score FROM wr$rounds)"""
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004):
    * personalized PageRank whose teleport mass lands ONLY on a trusted
    * seed set — the seed-based quality-propagation technique web-corpus
    * curation uses to expand a small vetted set ("these documents are
    * good") through link/similarity structure. Same integer discipline
    * as [[pagerank]]: seeds start with `Scale // nSeeds` each, every
    * round returns the damped teleport share to the seeds and transfers
    * the rest along edges with long division; non-seed nodes hold only
    * flowed-in mass. Output: (id, score) exact long micro-units.
    *
    * Scale shape identical to [[pagerank]] — the seed table broadcasts
    * into the init/base join, everything else is the same per-round
    * (id, score) shuffle. */
  def trustRank(nodes: DataFrame, idCol: String,
                seeds: DataFrame, seedCol: String,
                edges: DataFrame, srcCol: String, dstCol: String,
                rounds: Int, dampNum: Long = 85L, dampDen: Long = 100L)
      : DataFrame = {
    require(rounds >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val seedIds = seeds.select(col(seedCol).as("id")).distinct()
      .join(ids, Seq("id"), "left_semi")
      .materializeOnce(eager = false)
    val nSeeds = seedIds.count()
    require(nSeeds > 0, "trustRank needs at least one seed inside the graph")
    val init = Scale / nSeeds
    val base = Scale / nSeeds * (dampDen - dampNum) / dampDen
    val flagged = ids.join(broadcast(seedIds.withColumn("__seed", lit(1))),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(0)).as("__seed"))
      .materializeOnce(eager = false)
    val deg = edges.groupBy(col(srcCol).as("id"))
      .agg(count(lit(1)).as("__deg"))
    val e = edges.select(col(srcCol).as("id"), col(dstCol).as("__dst"))
      .join(deg, Seq("id"))
      .materializeOnce(eager = false)
    var s = flagged.select(col("id"),
      (col("__seed").cast("long") * init).as("score"))
    var r = 0
    while (r < rounds) {
      val contrib = e.join(s, Seq("id"))
        .select(col("__dst").as("id"),
          expr(s"score * $dampNum div $dampDen div __deg").as("__c"))
        .groupBy("id").agg(sum("__c").as("__in"))
      s = flagged.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (col("__seed").cast("long") * base +
            coalesce(col("__in"), lit(0L))).as("score"))
        .materializeOnce(eager = false)
      r += 1
    }
    s
  }

  /** The DuckDB replay of [[trustRank]] over caller-provided
    * `nodes(id)` / `seeds(id)` / `edges(src, dst)` CTEs — the
    * [[oracleSqlCtes]] blocks with the teleport restricted to the seed
    * flag. Ends at CTE `pr` = (id, score). */
  def trustRankOracleCtes(rounds: Int, dampNum: Long = 85L,
                          dampDen: Long = 100L): String = {
    val keep = dampDen - dampNum
    val steps = (1 to rounds).map { i => s"""
      c$i AS (
        SELECT e.dst AS id,
          CAST(sum(p.score * $dampNum // $dampDen // d.deg) AS BIGINT) AS s
        FROM edges e
        JOIN r${i - 1} p ON p.id = e.src
        JOIN deg d ON d.id = e.src
        GROUP BY e.dst),
      r$i AS (
        SELECT f.id, f.seed * nn.base + coalesce(c.s, 0) AS score
        FROM flg f CROSS JOIN nn
        LEFT JOIN c$i c ON c.id = f.id)"""
    }.mkString(",")
    s"""sid AS (SELECT DISTINCT s.id FROM seeds s JOIN nodes n ON n.id = s.id),
      nn AS (
        SELECT CAST(count(*) AS BIGINT) AS ns,
          ${Scale}::BIGINT // CAST(count(*) AS BIGINT) AS init,
          ${Scale}::BIGINT // CAST(count(*) AS BIGINT)
            * $keep // $dampDen AS base
        FROM sid),
      flg AS (
        SELECT n.id,
          CAST(CASE WHEN s.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS seed
        FROM nodes n LEFT JOIN sid s ON s.id = n.id),
      deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
              FROM edges GROUP BY src),
      r0 AS (SELECT f.id, f.seed * nn.init AS score
             FROM flg f CROSS JOIN nn),$steps,
      pr AS (SELECT id, score FROM r$rounds)"""
  }

  /** Iterative label propagation (Zhu & Ghahramani 2002, "Learning
    * from Labeled and Unlabeled Data with Label Propagation") — the
    * semi-supervised labeling move: a small vetted label set (language,
    * domain, quality class) spreads over similarity structure to label
    * the rest of the corpus for free. Completes the graph family next
    * to [[pagerank]] (rank) and [[trustRank]] (trust).
    *
    * Synchronous integer-vote rounds: each round every node takes the
    * argmax label over its OUT-neighbors' current labels (vote counts
    * are exact longs; ties break to the SMALLEST label), seed labels
    * are clamped, and nodes none of whose neighbors are labeled stay
    * unlabeled. Fully deterministic — the oracle unrolls the same
    * rounds with the same integer votes and tie-break.
    *
    * Scale shape: one keyed shuffle per round carrying (id, label)
    * pairs over the edge list — labels-only, never features; the
    * argmax window partitions by node id (keyed, never a corpus-wide
    * frame). Output: (id, label) — label NULL if never reached. */
  def labelPropagate(nodes: DataFrame, idCol: String,
                     seeds: DataFrame, seedIdCol: String, labelCol: String,
                     edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 1)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val seed = seeds
      .select(col(seedIdCol).as("id"), col(labelCol).cast("int").as("label"))
      .filter(col("label").isNotNull)
      .groupBy("id").agg(min("label").as("label")) // deterministic dedup
      .join(ids, Seq("id"), "left_semi")
      .materializeOnce(eager = false)
    val e = edges.select(col(srcCol).as("id"), col(dstCol).as("__dst"))
      .materializeOnce(eager = false)
    var lab = seed
    var r = 0
    while (r < rounds) {
      val votes = e.join(lab.select(col("id").as("__dst"),
          col("label")), Seq("__dst"))
        .groupBy("id", "label").agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(desc("__c"), asc("label"))
      val argmax = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).select("id", "label")
      lab = seed.union(argmax.join(seed, Seq("id"), "left_anti"))
        .materializeOnce(eager = false)
      r += 1
    }
    ids.join(lab, Seq("id"), "left")
  }

  /** The DuckDB replay of [[labelPropagate]] over caller-provided
    * `nodes(id)` / `seeds(id, label)` / `edges(src, dst)` CTEs —
    * unrolled synchronous rounds, integer votes, smallest-label
    * tie-break, clamped seeds. Ends at CTE `lp` = (id, label-or-NULL). */
  def labelPropagateOracleCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { i => s"""
      v$i AS (
        SELECT e.src AS id, l.label, CAST(count(*) AS BIGINT) AS c
        FROM edges e JOIN l${i - 1} l ON l.id = e.dst
        GROUP BY e.src, l.label),
      a$i AS (
        SELECT id, label FROM (
          SELECT id, label,
            row_number() OVER (PARTITION BY id
              ORDER BY c DESC, label) AS rn
          FROM v$i) WHERE rn = 1),
      l$i AS (
        SELECT id, label FROM sl
        UNION ALL
        SELECT a.id, a.label FROM a$i a
        WHERE a.id NOT IN (SELECT id FROM sl))"""
    }.mkString(",")
    s"""sl AS (
        SELECT s.id, CAST(min(s.label) AS INT) AS label
        FROM seeds s JOIN nodes n ON n.id = s.id
        WHERE s.label IS NOT NULL GROUP BY s.id),
      l0 AS (SELECT id, label FROM sl),$steps,
      lp AS (
        SELECT n.id, l.label
        FROM nodes n LEFT JOIN l$rounds l ON l.id = n.id)"""
  }

  /** Unsupervised community detection by synchronous label propagation
    * (Raghavan et al. 2007, "Near linear time algorithm to detect
    * community structures in large-scale networks") — the topic/near-dup
    * cluster audit with NO trained model and no seed set, completing
    * the graph family: [[pagerank]] rank, [[trustRank]] trust,
    * [[labelPropagate]] classify, [[triangleStats]] structure, this one
    * partition. Every node starts as its own community (label = own
    * id); each synchronous round every node adopts the argmax label
    * over its OUT-neighbors (exact long vote counts, ties to the
    * SMALLEST label), keeping its current label when it has no
    * out-edges. Nothing is clamped. Raghavan's asynchronous/random
    * variant converges faster but is NON-deterministic — the
    * fixed-round synchronous form is the oracle-replayable one, and on
    * kNN graphs the label landscape is stable after O(5) rounds.
    *
    * Scale shape: identical to [[labelPropagate]] — one keyed shuffle
    * per round carrying (id, label) long pairs over the edge list,
    * argmax windows keyed by node id. Output: (id, community). */
  def communityDetect(nodes: DataFrame, idCol: String,
                      edges: DataFrame, srcCol: String, dstCol: String,
                      rounds: Int): DataFrame = {
    val ids = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .materializeOnce(eager = false)
    val e = edges.select(col(srcCol).cast("long").as("id"),
        col(dstCol).cast("long").as("__dst"))
      .materializeOnce(eager = false)
    var lab = ids.select(col("id"), col("id").as("label"))
    var r = 0
    while (r < rounds) {
      val votes = e.join(lab.select(col("id").as("__dst"),
          col("label")), Seq("__dst"))
        .groupBy("id", "label").agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(desc("__c"), asc("label"))
      val argmax = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).select("id", "label")
      // voteless nodes (no out-edges) keep their current label —
      // the opposite default from labelPropagate's seed clamp
      lab = argmax.union(lab.join(argmax, Seq("id"), "left_anti"))
        .materializeOnce(eager = false)
      r += 1
    }
    ids.join(lab, Seq("id")).select(col("id"), col("label").as("community"))
  }

  /** The DuckDB replay of [[communityDetect]] over caller-provided
    * `nodes(id)` / `edges(src, dst)` CTEs — self-labeled init, unrolled
    * synchronous rounds, smallest-label tie-break, keep-own-label when
    * voteless. A voteless node (no out-edges) never updates, so "keep
    * current" ≡ "keep own id forever" — expressed through the
    * round-independent `ciso` set so each round references the
    * previous one exactly ONCE (a second reference per round inlines
    * the upstream kNN window 2^rounds times in engines that expand
    * CTEs textually). Ends at CTE `comm` = (id, community). */
  def communityOracleCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { i => s"""
      cv$i AS (
        SELECT e.src AS id, l.label, CAST(count(*) AS BIGINT) AS c
        FROM edges e JOIN c${i - 1} l ON l.id = e.dst
        GROUP BY e.src, l.label),
      c$i AS (
        SELECT id, label FROM (
          SELECT id, label,
            row_number() OVER (PARTITION BY id
              ORDER BY c DESC, label) AS rn
          FROM cv$i) WHERE rn = 1
        UNION ALL
        SELECT id, id AS label FROM ciso)"""
    }.mkString(",")
    s"""ciso AS (
        SELECT n.id FROM nodes n
        LEFT JOIN (SELECT DISTINCT src FROM edges) s ON s.src = n.id
        WHERE s.src IS NULL),
      c0 AS (SELECT id, id AS label FROM nodes),$steps,
      comm AS (SELECT id, CAST(label AS BIGINT) AS community
               FROM c$rounds)"""
  }

  /** Directed exact-kNN similarity graph over an embedding column:
    * node → its `k` nearest by (cosine desc, id asc), self excluded —
    * [[VectorSearch.topKBatch]]'s corpus×broadcast-batch shape with the
    * corpus as its own query batch, but with a MAP-SIDE partial top-k:
    * when the query batch is corpus-sized, the ranking window would
    * shuffle all N²cosine-scored rows; instead each task keeps a
    * bounded (cos desc, id asc) heap of k survivors per query, so the
    * shuffle carries ≤ k·N·partitions rows and the final per-query
    * window ranks pre-reduced locals — exact, because a global top-k
    * is the top-k of per-partition top-ks. Exact all-pairs is the
    * CERTIFICATION shape; at 100 TB the candidate generation swaps to
    * the IVF probe or SRP-banded pairs with this same (src, dst)
    * contract ([[knnGraphIvf]] / [[knnGraphSrp]]). The query set (= the
    * corpus here) must be driver/broadcast-sized — the certification
    * regime; ids must be integral. MEMORY BOUND: besides the broadcast,
    * each task holds one ArrayBuffer per query that grows to 4k entries
    * before trimming — O(N·4k) (id, cos) tuples per partition with the
    * corpus as its own query batch; do NOT reuse this shape with large
    * N (that's what [[knnGraphIvf]] is for).
    * Output: (src, dst, cos_sim). */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v")).as[(Long, Array[Float])]
    // queries broadcast as primitive arrays: the local phase streams
    // each corpus partition ONCE, scoring every row against all
    // queries in plain JVM float loops — no N²-row Catalyst
    // intermediate ever materializes
    val qRows = typed.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qRows)
    val local = typed.mapPartitions { it =>
      val qs = bc.value
      val nq = qs.length
      // per-query bounded buffer of (cos desc, id asc) best k
      val bufs = Array.fill(nq)(
        scala.collection.mutable.ArrayBuffer.empty[(Long, Double)])
      def trim(b: scala.collection.mutable.ArrayBuffer[(Long, Double)])
          : Unit = {
        val t = b.sortBy { case (id, c) => (-c, id) }.take(k)
        b.clear(); b ++= t
      }
      it.foreach { case (cid, cv) =>
        var qi = 0
        while (qi < nq) {
          val (qid, qv) = qs(qi)
          if (qid != cid) {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
            while (d < cv.length) {
              dot += cv(d).toDouble * qv(d).toDouble
              na += cv(d).toDouble * cv(d).toDouble
              nb += qv(d).toDouble * qv(d).toDouble
              d += 1
            }
            val c = dot / (math.sqrt(na) * math.sqrt(nb))
            val b = bufs(qi)
            b += ((cid, c))
            if (b.length > 4 * k) trim(b)
          }
          qi += 1
        }
      }
      (0 until nq).iterator.flatMap { qi =>
        trim(bufs(qi))
        bufs(qi).iterator.map { case (cid, c) => (qs(qi)._1, cid, c) }
      }
    }.toDF("src", "dst", "cos_sim")
    // global phase: the per-query ranking window runs over
    // k·partitions rows per query instead of N
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("cos_sim"), asc("dst"))
    local.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("src"), col("dst"), col("cos_sim"))
  }

  /** Per-src top-k over a (src, dst, cos_sim) candidate stream with
    * the exact builder's bounded-heap discipline applied DISTRIBUTED
    * (VERDICT r15 #2a), as ONE native hash aggregate: the
    * [[graft.plans.TopKEdges]] TypedImperativeAggregate folds each
    * task's rows into bounded per-src buffers (map-side PARTIAL
    * top-k), the shuffle carries ≤ k entries per (src, task), and the
    * final merge emits exactly the k best per src — no ranking window
    * ever sees the full candidate volume, and no typed-encoder
    * round-trip per candidate row. Exact: top-k under the total order
    * (cos desc, dst asc) is decomposable. */
  private def perSrcTopK(cand: DataFrame, k: Int): DataFrame = {
    val topk = org.apache.spark.sql.GraftBridge.column(
      graft.plans.TopKEdges(
        org.apache.spark.sql.GraftBridge.expression(
          col("dst").cast("long")),
        org.apache.spark.sql.GraftBridge.expression(
          col("cos_sim").cast("double")), k)
        .toAggregateExpression())
    cand.select(col("src").cast("long").as("src"), col("dst"),
        col("cos_sim"))
      .groupBy("src")
      .agg(topk.as("__top"))
      .select(col("src"), explode(col("__top")).as("__e"))
      .select(col("src"), col("__e.dst").as("dst"),
        col("__e.cos_sim").as("cos_sim"))
  }

  /** The 100 TB kNN edge builder: IVF-probed candidate generation with
    * the same (src, dst, cos_sim) contract as [[knnGraph]] and ZERO
    * driver collects — fully distributed end to end (VERDICT r14 #1).
    *
    * Shape = the certified [[IvfIndex.topKBatch]] probe (q51/q81) with
    * the corpus as its own query set, minus the query broadcast that
    * shape assumes: a seeded k-means partitions the corpus into
    * `nCells` cells (the assignment is a distributed MLlib fit — the
    * corpus never touches the driver); each row ranks the BROADCAST
    * centroid table in-plan (centroids are √N-sized by design — the
    * only driver-adjacent structure) and keeps its `nProbe` nearest
    * cells (ties on distance break to the smaller cell id, matching
    * the probe registry); candidates form by a SHUFFLE equi-join of
    * the probe rows against the cell-keyed corpus — the corpus × corpus
    * cross join never exists and candidate volume is
    * N² · nProbe/nCells; exact cosine + the per-src
    * (cos desc, dst asc) top-k window finish the edge list.
    *
    * `nProbe = nCells` probes every cell → candidate set = all pairs →
    * edge-for-edge ≡ [[knnGraph]] including cos_sim bits (the
    * [[graft.plans.CosineSimilarity]] codegen accumulates in the same
    * left-to-right double order as knnGraph's JVM loop) — the
    * certification mode. `nProbe < nCells` is the scale mode: recall
    * follows the IVF probe curve LIFTED by the reverse harvest (every
    * scored pair is a candidate for both endpoints — cosine is
    * symmetric; round 16), out-degree may still drop below k for rows
    * neither side of whose true pairs probes the other's cell.
    *
    * Skew guard (VERDICT r15 #2b): k-means on a duplicate-heavy corpus
    * can put most rows in ONE cell, fanning |cell|·probes candidate
    * rows into a single join partition. Cells larger than
    * `maxCellSize` split into ⌈size/cap⌉ deterministic hash sub-keys:
    * every probe of a split cell probes ALL its sub-keys (the
    * candidate SET is unchanged — edges are identical at any probe
    * count), but no single join key exceeds ~cap dst rows, so the
    * work parallelizes instead of landing on one task. `maxCellSize
    * <= 0` disables the guard. Candidate ranking runs through
    * [[perSrcTopK]]'s bounded map-side heaps, not a raw window over
    * the full candidate volume (VERDICT r15 #2a).
    * Output: (src, dst, cos_sim). */
  def knnGraphIvf(df: DataFrame, idCol: String, vecCol: String, k: Int,
                  nCells: Int, nProbe: Int, seed: Long = 42L,
                  maxCellSize: Int = 65536): DataFrame = {
    require(nCells >= 1 && nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells, got nProbe=$nProbe nCells=$nCells")
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    // cells must not outnumber vectors — k-means with k > n fails deep
    // in MLlib with an unhelpful error; the count is one cheap job on
    // the build-once artifact path
    val n = typed.count()
    require(nCells <= n,
      s"nCells=$nCells exceeds corpus size $n - shrink the cell count")
    ivfEdgesFrozen(df, idCol, vecCol, k,
      ivfCenters(typed, nCells, seed), nProbe, maxCellSize)
  }

  /** The k-means fit behind [[knnGraphIvf]], exposed so the artifact
    * tier can persist the centroid table next to the edge artifact
    * (incremental maintenance freezes the clustering — see
    * [[knnGraphIvfAppend]]). maxIter 20: the clustering only BLOCKS
    * candidates here (full probe is exact regardless of cell quality;
    * partial probe's recall moves marginally past ~20 iterations) —
    * the serving index keeps its own default. Input must carry
    * (id, __v). */
  private[graft] def ivfCenters(typed: DataFrame, nCells: Int,
                                seed: Long): Array[Array[Double]] =
    IvfIndex.build(typed, "id", "__v", nCells, seed,
      maxIter = 20, cache = false).model.clusterCenters.map(_.toArray)

  /** IVF edge build under a FIXED centroid table: assignment is rank 1
    * of the probe ranking (nearest centroid by squared distance, ties
    * to the smaller cell id — one window serves both roles), so a
    * build and any later delta that reuse the same centers agree on
    * every cell decision. Scoring and the hot-cell split are described
    * on [[knnGraphIvf]]. */
  private[graft] def ivfEdgesFrozen(df: DataFrame, idCol: String,
      vecCol: String, k: Int, centers: Array[Array[Double]], nProbe: Int,
      maxCellSize: Int): DataFrame = {
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    // MAP-ONLY probe ranking (VERDICT r18 #2): the codegen'd
    // [[graft.plans.NearestCells]] top-nProbe over the referenced
    // center array replaces crossJoin(broadcast)+window — the
    // N·nCells vector-carrying exchange is gone from the build path;
    // ordering (dist asc, cell asc) is bit-identical
    // (NearestCellsSpec), so assignments and probes cannot drift
    val ranked = typed
      .select(col("id"), col("__v"),
        posexplode(graft.plans.NearestCells(col("__v"), centers, nProbe))
          .as(Seq("__pos", "__cell")))
      .select(col("id"), col("__v"), col("__cell"),
        (col("__pos") + 1).as("__crn"))
      .materializeOnce(eager = false) // probes AND (rn=1) assignment
    val probes = ranked
      .select(col("id").as("src"), col("__v").as("__qv"), col("__cell"))
    // each dst lives in exactly ONE cell and probes are distinct cells
    // per src, so every (src, dst) pair forms at most once — no dedup.
    // Hot-cell guard (VERDICT r15 #2b): cell sizes are an nCells-row
    // table — the SAME driver regime as the centroid table the probe
    // ranking already broadcasts — so one tiny collect finds cells
    // over the cap. An oversized cell spreads its members across
    // ⌈size/cap⌉ deterministic hash sub-keys and each of its probe
    // rows fans over all of them: the candidate SET is unchanged, the
    // per-group member count is bounded, the work parallelizes
    // instead of landing on one task.
    val assigned = ranked.filter(col("__crn") === 1)
      .select(col("id").as("dst"), col("__v").as("__cv"), col("__cell"))
    val hotSplits: Map[Int, Int] =
      if (maxCellSize <= 0) Map.empty
      else assigned.groupBy("__cell").count().collect()
        .map(r => r.getInt(0) ->
          ((r.getLong(1) + maxCellSize - 1) / maxCellSize).toInt)
        .filter(_._2 > 1).toMap
    // Scoring runs per (cell, sub) via a typed COGROUP, not an equi-join
    // feeding per-row Catalyst machinery: the member block materializes
    // (≤ maxCellSize vectors — the split cap IS the memory bound),
    // probers STREAM through it, and cosines + per-prober bounded heaps
    // run in the same primitive JVM loops as [[knnGraph]] — measured 3x
    // the join+window/aggregate formulation on the full-probe 4M-pair
    // shape, with only ≤ k rows per (src, cell) surviving to the final
    // per-src reduction. Cosine accumulation order matches knnGraph's
    // loop exactly, so full probe stays bit-identical to exact.
    val spark2 = df.sparkSession
    import spark2.implicits._
    val probeRows = probes
      .select(col("__cell"), col("src"), col("__qv"))
      .as[(Int, Long, Array[Float])]
      .flatMap { case (cell, src, qv) =>
        (0 until hotSplits.getOrElse(cell, 1))
          .map(sub => (cell, sub, src, qv)) }
    val dstRows = assigned
      .select(col("__cell"), col("dst"), col("__cv"))
      .as[(Int, Long, Array[Float])]
      .map { case (cell, dst, cv) =>
        (cell, subKey(dst, hotSplits.getOrElse(cell, 1)), dst, cv) }
    val localTop = probeRows.groupByKey(r => (r._1, r._2))
      .cogroup(dstRows.groupByKey(r => (r._1, r._2))) { case (_, ps, ds) =>
        val mem = ds.map(d => (d._3, d._4)).toArray
        if (mem.isEmpty) Iterator.empty
        else {
          def trim(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)])
              : Unit = {
            val t = buf.sortBy { case (id, c) => (-c, id) }.take(k)
            buf.clear(); buf ++= t
          }
          // REVERSE harvest (round 16): every scored pair is a true
          // cosine for BOTH endpoints (commutative multiply — same
          // bits either way), so a member also collects the probers
          // that scored it. Free recall for pairs whose forward
          // orientation never forms (src's probes miss dst's cell but
          // dst's probes cover src's): measured on the 500-vector
          // audit corpus, edge recall at nProbe=8/16 rises 0.873 →
          // 0.976 and the audit agreement curve with it. Member
          // buffers are bounded (≤ 4k entries per member, members ≤
          // split cap per group). At FULL probe every pair already
          // forms forward — the harvest is skipped, not deduped.
          val harvest = nProbe < centers.length
          val memBufs =
            if (harvest) Array.fill(mem.length)(
              scala.collection.mutable.ArrayBuffer.empty[(Long, Double)])
            else Array.empty[scala.collection.mutable.ArrayBuffer[(Long, Double)]]
          val fwd = ps.flatMap { case (_, _, src, qv) =>
            val buf =
              scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
            var i = 0
            while (i < mem.length) {
              val (did, cv) = mem(i)
              if (did != src) {
                var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
                while (d < cv.length) {
                  dot += cv(d).toDouble * qv(d).toDouble
                  na += cv(d).toDouble * cv(d).toDouble
                  nb += qv(d).toDouble * qv(d).toDouble
                  d += 1
                }
                val c = dot / (math.sqrt(na) * math.sqrt(nb))
                buf += ((did, c))
                if (buf.length > 4 * k) trim(buf)
                if (harvest) {
                  val mb = memBufs(i)
                  mb += ((src, c))
                  if (mb.length > 4 * k) trim(mb)
                }
              }
              i += 1
            }
            trim(buf)
            buf.iterator.map { case (did, c) => (src, did, c) }
          }
          if (!harvest) fwd
          else fwd ++ mem.iterator.zipWithIndex.flatMap { case ((did, _), i) =>
            trim(memBufs(i))
            memBufs(i).iterator.map { case (src, c) => (did, src, c) }
          }
        }
      }.toDF("src", "dst", "cos_sim")
    // with the harvest on, a pair can arrive in both orientations with
    // IDENTICAL bits — [[graft.plans.TopKEdges]] dedups them inside its
    // buffer (VERDICT r16 #6), so no distinct() shuffle of the
    // candidate volume is needed before the ranking aggregate.
    perSrcTopK(localTop, k)
  }

  /** Deterministic sub-key for the hot-cell split: splitmix64 finalizer
    * over the id, reduced mod nsplit — balanced even on sequential or
    * strided id spaces. */
  private[graft] def subKey(id: Long, nsplit: Int): Int =
    if (nsplit <= 1) 0
    else {
      var z = id + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (java.lang.Long.remainderUnsigned(z, nsplit.toLong)).toInt
    }

  /** SRP-banded kNN edge builder — the candidate-generation alternative
    * to [[knnGraphIvf]] when no clustering pass is wanted: reuses the
    * q61 sign-random-projection bands ([[VectorSearch.lshNearDupPairs]]'s
    * pipeline) to propose candidate pairs, then exact cosine + the same
    * per-src (cos desc, dst asc) top-k. Fully distributed, zero driver
    * collects; banded rows carry (id, band_key) only — vectors join
    * back for candidate ids. Approximate by construction: a src whose
    * true neighbors never share a band gets fewer than k edges (recall
    * rises with `numBands`, precision with bits per band); the
    * hot-bucket cap bounds any degenerate band at `maxBucketSize`.
    * Output: (src, dst, cos_sim) — directed, both orientations of a
    * colliding pair are candidates. */
  def knnGraphSrp(df: DataFrame, idCol: String, vecCol: String, k: Int,
                  dim: Int, bits: Int = 32, numBands: Int = 8,
                  maxBucketSize: Int = 10000): DataFrame = {
    require(bits % numBands == 0, "bands must tile the signature")
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    val sig = typed.select(col("id"),
      graft.plans.HyperplaneSignature(col("__v"), bits, dim).as("__sig"))
    val keys = (0 until numBands).map { b =>
      concat_ws("_", lit(b.toString),
        (shiftright(col("__sig"), b * bandBits).bitwiseAND(lit(mask)))
          .cast("string"))
    }
    val banded = sig.filter(col("__sig").isNotNull)
      .select(col("id"), explode(array(keys: _*)).as("band_key"))
      .materializeOnce(eager = false)
    val hotKeys = banded.groupBy("band_key").count()
      .filter(col("count") > maxBucketSize)
      .select("band_key")
    val capped = banded.join(broadcast(hotKeys), Seq("band_key"), "left_anti")
    val cands = capped.select(col("band_key"), col("id").as("src"))
      .join(capped.select(col("band_key"), col("id").as("dst")),
        Seq("band_key"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .distinct()
    val cand = cands
      .join(typed.select(col("id").as("src"), col("__v").as("__qv")), Seq("src"))
      .join(typed.select(col("id").as("dst"), col("__v").as("__cv")), Seq("dst"))
      .withColumn("cos_sim",
        graft.plans.CosineSimilarity(col("__cv"), col("__qv")))
    perSrcTopK(cand, k)
  }

  /** [[knnGraph]] as a build-once disk artifact stamped by the
    * embedding corpus content and `k` ([[graft.util.DiskArtifact]] —
    * the trained-LM-tier pattern): the similarity graph is an INDEX of
    * the corpus, not a per-query computation, so the whole graph-audit
    * family (rank, trust, classify, triangles, assortativity, purity)
    * shares ONE materialized edge list per (corpus, k) and a corpus
    * rewrite lands on a fresh stamp → rebuild, never a stale graph.
    * At 100 TB this is the deployment contract anyway — the edge list
    * is maintained alongside the embeddings (the HNSW tier already
    * updates on ingest); recomputing N² per query is the
    * anti-pattern. Edges round-trip exactly (ids are longs, cos_sim a
    * double — parquet preserves both bit-for-bit).
    *
    * `edgeSource` picks the candidate generator (VERDICT r14 #1):
    *   - `"exact"` — [[knnGraph]], the broadcast N² certification shape
    *     (requires driver-sized embeddings);
    *   - `"ivf"` — [[knnGraphIvf]], fully distributed; with
    *     `nProbe = nCells` it is edge-for-edge ≡ exact, with
    *     `nProbe < nCells` it is the 100 TB approximate mode;
    *   - `"srp"` — [[knnGraphSrp]], the banded-LSH candidate path
    *     (`srpDim` = embedding dimension, required);
    *   - `"hnsw"` — [[knnGraphHnsw]], the graph-ANN tier as candidate
    *     generator (O(N log N) build + broadcast batch search; exact
    *     cos re-rank).
    * Non-exact sources stamp under a source-tagged artifact kind so an
    * approximate graph can never be served where exact was asked. */
  def knnGraphArtifact(df: DataFrame, idCol: String, vecCol: String,
                       k: Int, edgeSource: String = "exact",
                       nCells: Int = 16, nProbe: Int = 16,
                       srpDim: Int = 0, seed: Long = 42L): DataFrame = {
    val stamp = graft.util.DiskArtifact.corpusStamp(df, idCol, vecCol)
    val (kind, build) = edgeSource match {
      case "exact" =>
        (s"knn$k-edges", () => knnGraph(df, idCol, vecCol, k))
      case "ivf" =>
        // the clustering persists as a companion artifact (shared
        // across k and nProbe configs of the same corpus) so
        // incremental maintenance can FREEZE it — and a build must
        // reuse a companion that already exists (e.g. carried forward
        // by knnGraphArtifactAppend) or its edges would disagree with
        // the centers a later append deltas from
        (s"knn$k-edges-ivf2-$nCells-$nProbe-$seed",
          () => ivfArtifactBuild(df, idCol, vecCol, k, nCells, nProbe,
            seed, stamp))
      case "srp" =>
        require(srpDim > 0, "srp edge source needs srpDim = embedding dim")
        (s"knn$k-edges-srp$srpDim",
          () => knnGraphSrp(df, idCol, vecCol, k, srpDim))
      case "hnsw" =>
        (s"knn$k-edges-hnsw",
          () => knnGraphHnsw(df, idCol, vecCol, k))
      case "hnsw-sharded" =>
        // the shard handle persists as a stamp-keyed companion (the
        // ivf centroid pattern) so incremental maintenance can
        // ShardedHnsw.insert into the FROZEN clustering + fan instead
        // of rebuilding the index per batch
        (s"knn$k-edges-hnswsh$nCells-$seed",
          () => shardedHnswEdges(
            shardedCompanion(df, idCol, vecCol, nCells, seed, stamp),
            df, idCol, vecCol, k))
      case other =>
        throw new IllegalArgumentException(
          s"unknown edgeSource '$other' " +
            "(exact | ivf | srp | hnsw | hnsw-sharded)")
    }
    graft.util.DiskArtifact.getOrBuild(df.sparkSession, kind, stamp)(build)
  }

  /** HNSW-served kNN edge builder (VERDICT r14 missing-#5: the graph-ANN
    * tier wired into the edge builder): build the serving graph once
    * (O(N log N) — the driver-memory regime the exact builder already
    * occupies, minus its O(N²) compute), then answer the corpus as one
    * BATCH via [[Hnsw.searchKnnBatch]] (broadcast graph, executors
    * answer their partitions). Candidates re-rank by the EXACT codegen
    * cosine (same bits as [[knnGraph]]) so emitted edges carry true
    * cos_sim and the (cos desc, dst asc) contract; `ef` is the recall
    * knob (measured 1.000 at ef=64 on the testdata corpus — SCALE.md
    * round-15). Approximate by construction: a node whose true
    * neighbor the beam missed gets its next-best candidate. */
  def knnGraphHnsw(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   m: Int = 16, efConstruction: Int = 100,
                   ef: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    val g = Hnsw.build(typed.as[(Long, Array[Float])].collect().toSeq,
      m, efConstruction)
    // k+1 beam: the query point itself sits at distance 0 in its own
    // corpus; drop it, keep the k best OTHER candidates by exact cos
    val cand = Hnsw.searchKnnBatch(g, typed, "id", "v",
        k + 1, math.max(ef, k + 1))
      .filter(col("qid") =!= col("id"))
      .select(col("qid").as("src"), col("id").as("dst"))
    val vecs = typed.select(col("id"), col("v"))
    val scored = cand
      .join(vecs.select(col("id").as("src"), col("v").as("__qv")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("__cv")), Seq("dst"))
      .withColumn("cos_sim",
        graft.plans.CosineSimilarity(col("__cv"), col("__qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("cos_sim"), asc("dst"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("src"), col("dst"), col("cos_sim"))
  }

  /** Sharded-HNSW kNN edge builder (round 16): the graph-ANN candidate
    * generator WITHOUT [[knnGraphHnsw]]'s driver-built graph — shards
    * build distributed ([[ShardedHnsw.build]]: mapGroups, no vector
    * reaches the driver), the corpus queries itself as one sharded
    * batch at FULL coverage (every shard answers, so per-shard beam
    * recall is the only approximation), and candidates re-rank by the
    * exact codegen cosine so emitted edges carry true cos bits under
    * the (cos desc, dst asc) contract — through [[perSrcTopK]], never
    * a raw window. Completes the edge-source matrix: every candidate
    * generator (exact / ivf / srp / hnsw) now has a zero-driver-collect
    * construction. Output: (src, dst, cos_sim). */
  def knnGraphShardedHnsw(df: DataFrame, idCol: String, vecCol: String,
                          k: Int, nCells: Int = 16, m: Int = 16,
                          efConstruction: Int = 100, ef: Int = 64,
                          seed: Long = 42L,
                          maxCellSize: Int = 65536): DataFrame = {
    val sh = ShardedHnsw.build(df, idCol, vecCol, nCells, m,
      efConstruction, seed, maxCellSize)
    shardedHnswEdges(sh, df, idCol, vecCol, k, ef)
  }

  /** Edge query half of [[knnGraphShardedHnsw]] against an EXISTING
    * shard handle — shared by the fresh build and the stamp-keyed
    * artifact path, whose handle reloads from the persisted companion
    * instead of rebuilding. */
  private[graft] def shardedHnswEdges(sh: ShardedHnsw.Shards,
                                      df: DataFrame, idCol: String,
                                      vecCol: String, k: Int,
                                      ef: Int = 64): DataFrame = {
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    // k+1 beam: the query point itself sits at distance 0 in its own
    // corpus; drop it, keep the k best OTHER candidates by exact cos.
    // Deliberately the BEAM, not searchBatch's exact mode: exact mode
    // scans each probed sub (O(|sub|) per query -> O(|sub|^2) per
    // block), while the beam keeps the per-block cost ~|sub|·ef — the
    // bounded-cost property this edge source exists for. The
    // full-coverage beam's exactness on the certified corpora is
    // pinned empirically by q178/q179's oracle hash-match; a corpus
    // where beam connectivity breaks (dense near-duplicate clusters)
    // should dedup before graph audits anyway, and q180 certifies the
    // exact mode itself on capped subs.
    val cand = ShardedHnsw.searchBatch(sh,
        typed.select(col("id").as("qid"), col("v").as("qv")),
        "qid", "qv", k + 1, nProbe = sh.centers.length,
        ef = math.max(ef, k + 1))
      .filter(col("qid") =!= col("id"))
      .select(col("qid").as("src"), col("id").as("dst"))
    val vecs = typed.select(col("id"), col("v"))
    val scored = cand
      .join(vecs.select(col("id").as("src"), col("v").as("__qv")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("__cv")), Seq("dst"))
      .withColumn("cos_sim",
        graft.plans.CosineSimilarity(col("__cv"), col("__qv")))
    perSrcTopK(scored, k)
  }

  /** Scored-pair counter for the last [[knnGraphAppend]] /
    * [[knnGraphIvfAppend]] action on THIS THREAD — the spec's O(batch)
    * work assertion reads it (an incremental append must score
    * |corpus|·|batch| pairs, never |corpus|²). Thread-local since
    * round 19: the appends always set it on the calling thread and the
    * specs read it on that same thread, but a JVM-global var let a
    * CONCURRENT suite's ingest hook clobber the value between another
    * suite's write and read (observed once parallel suites gained a
    * second appendToKnnEdges caller). */
  private val lastAppendScoredTl =
    new ThreadLocal[Option[org.apache.spark.util.LongAccumulator]] {
      override def initialValue
          : Option[org.apache.spark.util.LongAccumulator] = None
    }
  private[graft] def lastAppendScored
      : Option[org.apache.spark.util.LongAccumulator] =
    lastAppendScoredTl.get()
  private[graft] def lastAppendScored_=(
      v: Option[org.apache.spark.util.LongAccumulator]): Unit =
    lastAppendScoredTl.set(v)

  /** Incremental EXACT maintenance of a kNN edge list under a corpus
    * append (VERDICT r14 #3): given the exact edges of the OLD corpus
    * C and the appended full corpus C ∪ B, produce the exact edges of
    * C ∪ B with O(|C∪B|·|B|) scoring instead of the O(|C∪B|²) rebuild.
    *
    * Correct because a top-k is decomposable: for an old node, its new
    * true top-k over (C∪B)\{src} is the top-k of (its old top-k over
    * C\{src}) ∪ (its scores against B) — nothing outside those
    * candidates can enter; for a new node the full scan against C∪B is
    * the definition. One distributed pass streams every corpus
    * partition against the BROADCAST batch (the batch is
    * ingest-batch-sized by contract — the same regime as the HNSW
    * ingest hook), emitting (old-src → batch-dst) update candidates
    * and map-side partial top-k rows for the new sources; two keyed
    * windows finish both sides. Cosines are bit-identical to
    * [[knnGraph]]'s in BOTH orientations (IEEE multiply is commutative,
    * the dot accumulates in the same element order).
    *
    * `newIds` must be exactly the appended ids (present in `full`);
    * Output: (src, dst, cos_sim) ≡ knnGraph(full) edge-for-edge. */
  def knnGraphAppend(oldEdges: DataFrame, full: DataFrame, idCol: String,
                     vecCol: String, k: Int, newIds: Seq[Long]): DataFrame = {
    val spark = full.sparkSession
    import spark.implicits._
    val newSet = newIds.toSet
    val typed = full.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v")).as[(Long, Array[Float])]
    val batch = typed.filter(r => newSet(r._1)).collect().sortBy(_._1)
    require(batch.length == newSet.size,
      s"newIds must all be present in full (got ${batch.length} of ${newSet.size})")
    if (batch.isEmpty) return oldEdges
    val bc = spark.sparkContext.broadcast(batch)
    val bcSet = spark.sparkContext.broadcast(newSet)
    val acc = spark.sparkContext.longAccumulator("knnAppendScored")
    lastAppendScored = Some(acc)
    // one corpus pass: rows tagged 0 = update candidates (old src →
    // batch dst, trimmed to the src's top-k over the batch — only those
    // can enter its final top-k, so the trim is lossless under the
    // window's own (cos desc, dst asc) tie-break); rows tagged 1 =
    // partial top-k for the NEW sources. Tag-0 rows STREAM out per
    // corpus row (ADVICE r15: the previous whole-partition ArrayBuffer
    // held O(partitionRows·|batch|) tuples of task heap); live state is
    // the nq bounded new-src buffers plus one O(min(|batch|, k))
    // scratch per in-flight row.
    val scored = typed.mapPartitions { it =>
      val qs = bc.value
      val isNew = bcSet.value
      val nq = qs.length
      val bufs = Array.fill(nq)(
        scala.collection.mutable.ArrayBuffer.empty[(Long, Double)])
      def trim(b: scala.collection.mutable.ArrayBuffer[(Long, Double)])
          : Unit = {
        val t = b.sortBy { case (id, c) => (-c, id) }.take(k)
        b.clear(); b ++= t
      }
      val updRows = it.flatMap { case (cid, cv) =>
        val mine =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        var qi = 0
        while (qi < nq) {
          val (qid, qv) = qs(qi)
          if (qid != cid) {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
            while (d < cv.length) {
              dot += cv(d).toDouble * qv(d).toDouble
              na += cv(d).toDouble * cv(d).toDouble
              nb += qv(d).toDouble * qv(d).toDouble
              d += 1
            }
            val c = dot / (math.sqrt(na) * math.sqrt(nb))
            acc.add(1L)
            // new-src side: cid is a candidate for the batch node qid
            val b = bufs(qi)
            b += ((cid, c))
            if (b.length > 4 * k) trim(b)
            // old-src side: qid is a NEW candidate for the old node cid
            if (!isNew(cid)) {
              mine += ((qid, c))
              if (mine.length > 4 * k) trim(mine)
            }
          }
          qi += 1
        }
        trim(mine)
        mine.iterator.map { case (qid, c) => (0, cid, qid, c) }
      }
      updRows ++ (0 until nq).iterator.flatMap { qi =>
        trim(bufs(qi))
        bufs(qi).iterator.map { case (cid, c) => (1, qs(qi)._1, cid, c) }
      }
    }.toDF("tag", "src", "dst", "cos_sim")
      .materializeOnce(eager = false) // feeds both windows below
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("cos_sim"), asc("dst"))
    val newSrc = scored.filter(col("tag") === 1)
      .select("src", "dst", "cos_sim")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("src", "dst", "cos_sim")
    val oldSrc = oldEdges.select("src", "dst", "cos_sim")
      .union(scored.filter(col("tag") === 0).select("src", "dst", "cos_sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("src", "dst", "cos_sim")
    newSrc.union(oldSrc)
  }

  /** Incremental IVF edge maintenance under a FROZEN clustering
    * (VERDICT r15 #3): given the edges the old corpus built with
    * `centers` (the persisted companion of the IVF artifact) and the
    * appended full corpus, produce the edges [[ivfEdgesFrozen]] would
    * build on the full corpus WITH THE SAME CENTERS — bit-for-bit,
    * spec-pinned — in O(corpus · batch · nProbe/nCells) expected
    * scoring instead of the full N²·nProbe/nCells rebuild. Freezing
    * the clustering per batch is the standard IVF maintenance
    * contract (assign new points to existing cells; re-train on
    * schedule, which here is simply deleting the artifact): a refit
    * would move cell walls and invalidate every old src's candidate
    * set. At full probe frozen-vs-refit is immaterial — every build
    * is the all-pairs graph, so append ≡ rebuild ≡ exact.
    *
    * One streamed corpus pass against the broadcast batch (the
    * [[knnGraphAppend]] shape): each corpus row ranks the frozen
    * centers in-task (bit-identical fold order to the builder's
    * sqDist, so every cell decision agrees), contributes itself to the
    * batch srcs probing its cell (bounded per-task new-src buffers)
    * and, when it is an OLD src, scores only the batch members inside
    * its own probed cells (streamed out trimmed to its lossless
    * top-k). [[lastAppendScored]] counts scored pairs — the spec's
    * work assertion. */
  def knnGraphIvfAppend(oldEdges: DataFrame, centers: Array[Array[Double]],
                        full: DataFrame, idCol: String, vecCol: String,
                        k: Int, nProbe: Int, newIds: Seq[Long]): DataFrame = {
    val spark = full.sparkSession
    import spark.implicits._
    val newSet = newIds.toSet
    val nCells = centers.length
    require(nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells, got nProbe=$nProbe nCells=$nCells")
    val typed = full.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v")).as[(Long, Array[Float])]
    val batch = typed.filter(r => newSet(r._1)).collect().sortBy(_._1)
    require(batch.length == newSet.size,
      s"newIds must all be present in full (got ${batch.length} of ${newSet.size})")
    if (batch.isEmpty) return oldEdges
    // frozen ranking, same fold order as VectorFunctions.sqDist (cast
    // to double, (v-c)^2 accumulated d = 0..dim-1) so every cell
    // decision matches the builder's window bit-for-bit
    def probeCells(v: Array[Float], np: Int): Array[Int] = {
      val ds = new Array[Double](nCells)
      var c = 0
      while (c < nCells) {
        val ctr = centers(c); var s = 0.0; var d = 0
        while (d < ctr.length) {
          val diff = v(d).toDouble - ctr(d); s += diff * diff; d += 1
        }
        ds(c) = s; c += 1
      }
      Array.range(0, nCells).sortBy(i => (ds(i), i)).take(np)
    }
    val batchProbes = batch.map(b => probeCells(b._2, nProbe))
    // cell -> indexes of batch srcs probing it (the new-src fan-in map)
    val probersOfCell: Map[Int, Array[Int]] = batchProbes.zipWithIndex
      .flatMap { case (cells, qi) => cells.map(_ -> qi) }
      .groupBy(_._1).map { case (c, arr) => c -> arr.map(_._2) }
    // cell -> (batch index, id, vec) assigned there (old-src candidates)
    val batchByCell: Map[Int, Array[(Int, Long, Array[Float])]] = batch
      .zipWithIndex.map { case ((bid, bv), qi) => (qi, bid, bv) }
      .groupBy { case (_, _, bv) => probeCells(bv, 1)(0) }
    // id -> batch index, for routing reverse candidates of batch rows
    val newIdx: Map[Long, Int] =
      batch.zipWithIndex.map { case ((bid, _), qi) => bid -> qi }.toMap
    // per batch index: assigned cell + probe set — the source-level
    // dedup guards (a pair whose FORWARD orientation forms must not be
    // inserted again by the reverse harvest: inside a bounded buffer a
    // duplicate could displace the true k-th candidate)
    val batchCell: Array[Int] = batch.map(b => probeCells(b._2, 1)(0))
    val batchProbeSets: Array[Set[Int]] = batchProbes.map(_.toSet)
    val bc = spark.sparkContext.broadcast(
      (batch, probersOfCell, batchByCell, newIdx, batchCell,
        batchProbeSets))
    val acc = spark.sparkContext.longAccumulator("knnIvfAppendScored")
    lastAppendScored = Some(acc)
    val scored = typed.mapPartitions { it =>
      val (qs, probers, byCell, bIdx, bCell, bProbes) = bc.value
      val nq = qs.length
      val bufs = Array.fill(nq)(
        scala.collection.mutable.ArrayBuffer.empty[(Long, Double)])
      def trim(b: scala.collection.mutable.ArrayBuffer[(Long, Double)])
          : Unit = {
        val t = b.sortBy { case (id, c) => (-c, id) }.take(k)
        b.clear(); b ++= t
      }
      def cos(a: Array[Float], q: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
        while (d < a.length) {
          dot += a(d).toDouble * q(d).toDouble
          na += a(d).toDouble * a(d).toDouble
          nb += q(d).toDouble * q(d).toDouble
          d += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val updRows = it.flatMap { case (cid, cv) =>
        val myProbes = probeCells(cv, nProbe)
        val isNewRow = bIdx.contains(cid)
        // this row's update candidates (only emitted when it is OLD):
        // forward scores against batch members of its probed cells,
        // plus the REVERSE harvest from batch srcs that probed its
        // cell — mirroring ivfEdgesFrozen's two orientations
        val mine =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        // new-src side: this row is a member of its ASSIGNED cell
        // (= nearest = first of the ranking); every batch src probing
        // that cell scores it — and the same cosine flows back as this
        // row's reverse candidate
        probers.getOrElse(myProbes(0), Array.empty[Int]).foreach { qi =>
          val (qid, qv) = qs(qi)
          if (qid != cid) {
            acc.add(1L)
            val c = cos(cv, qv)
            val b = bufs(qi)
            b += ((cid, c))
            if (b.length > 4 * k) trim(b)
            // reverse harvest for THIS row — skipped when the forward
            // orientation (qid's assigned cell inside this row's probe
            // set) forms the pair anyway
            if (!myProbes.contains(bCell(qi))) {
              if (isNewRow) {
                // a batch row's reverse candidates route to ITS buffer
                val rb = bufs(bIdx(cid))
                rb += ((qid, c))
                if (rb.length > 4 * k) trim(rb)
              } else {
                mine += ((qid, c))
                if (mine.length > 4 * k) trim(mine)
              }
            }
          }
        }
        if (isNewRow) Iterator.empty
        else {
          // old-src forward side: batch members inside MY probed
          // cells; each cosine also harvests back to the batch
          // member's own buffer
          myProbes.foreach { pc =>
            byCell.getOrElse(pc, Array.empty[(Int, Long, Array[Float])])
              .foreach { case (qi, bid, bv) =>
                if (bid != cid) {
                  acc.add(1L)
                  val c = cos(cv, bv)
                  mine += ((bid, c))
                  if (mine.length > 4 * k) trim(mine)
                  // reverse harvest to the batch member — skipped when
                  // its own forward orientation (this row's cell inside
                  // its probe set) scores the pair anyway
                  if (!bProbes(qi).contains(myProbes(0))) {
                    val rb = bufs(qi)
                    rb += ((cid, c))
                    if (rb.length > 4 * k) trim(rb)
                  }
                }
              }
          }
          trim(mine)
          mine.iterator.map { case (bid, c) => (cid, bid, c) }
        }
      }
      updRows ++ (0 until nq).iterator.flatMap { qi =>
        trim(bufs(qi))
        bufs(qi).iterator.map { case (cid, c) => (qs(qi)._1, cid, c) }
      }
    }.toDF("src", "dst", "cos_sim")
    // one bounded reduction finishes both sides: old srcs rank
    // (old top-k ∪ batch candidates), new srcs rank their partial
    // top-ks — per-src row counts are k-bounded per source partition.
    // A pair arriving in both orientations' harvests carries identical
    // bits and dedups inside TopKEdges' buffer (VERDICT r16 #6) — no
    // distinct() shuffle.
    perSrcTopK(
      oldEdges.select("src", "dst", "cos_sim").union(scored), k)
  }

  /** Stamp-aware incremental maintenance of the [[knnGraphArtifact]]:
    * when the PRE-APPEND corpus (full minus `newIds`) has a
    * materialized edge artifact, the post-append artifact builds from
    * the O(N·batch) delta instead of the full rebuild; with no prior
    * artifact it falls back to the full build. `edgeSource` picks the
    * kind, matching [[knnGraphArtifact]]:
    *   - `"exact"` — [[knnGraphAppend]] delta ≡ the N² rebuild
    *     bit-for-bit;
    *   - `"ivf"` — [[knnGraphIvfAppend]] delta under the FROZEN
    *     clustering read from the persisted centroid companion; the
    *     frozen centers are carried forward under the new stamp so
    *     every subsequent batch deltas too (re-train by deleting the
    *     artifact);
    *   - `"hnsw-sharded"` — the serving companion (shard blob table +
    *     meta) maintains through [[ShardedHnsw.insert]] under its
    *     FROZEN clustering and fan and lands under the new stamp,
    *     while the edge delta itself rides [[knnGraphAppend]]'s exact
    *     O(corpus·batch) decomposability pass: the batch srcs' edges
    *     and every old src's batch candidates come out exact — at
    *     least as good as re-querying the beam, in the same single
    *     pass the old-src side needs anyway — so at full coverage
    *     append ≡ rebuild ≡ exact (VERDICT r16 #2);
    *   - `"hnsw"` / `"srp"` — the same [[knnGraphAppend]] edge delta
    *     over the prior kind-tagged artifact (the delta needs only
    *     the OLD EDGES; `srpDim` is required for srp, matching the
    *     builder).
    * In every kind the result lands under the full corpus's own content
    * stamp — a reader asking for the graph of THIS corpus state gets
    * it or rebuilds, never a stale set (crash-torn writes rebuild via
    * the `_SUCCESS` check, pinned in `CrashRecoverySpec`). */
  def knnGraphArtifactAppend(full: DataFrame, idCol: String,
                             vecCol: String, k: Int, newIds: Seq[Long],
                             edgeSource: String = "exact",
                             nCells: Int = 16, nProbe: Int = 16,
                             seed: Long = 42L,
                             srpDim: Int = 0): DataFrame = {
    val spark = full.sparkSession
    val newSet = newIds.toSet
    val old = full.filter(!col(idCol).cast("long").isInCollection(newSet))
    val oldStamp = graft.util.DiskArtifact.corpusStamp(old, idCol, vecCol)
    val newStamp = graft.util.DiskArtifact.corpusStamp(full, idCol, vecCol)
    edgeSource match {
      case "exact" =>
        val kind = s"knn$k-edges"
        graft.util.DiskArtifact.getOrBuild(spark, kind, newStamp)(
          () =>
            if (graft.util.DiskArtifact.exists(kind, oldStamp))
              knnGraphAppend(
                graft.util.DiskArtifact.getOrBuild(spark, kind,
                  oldStamp)(() => knnGraph(old, idCol, vecCol, k)),
                full, idCol, vecCol, k, newIds)
            else knnGraph(full, idCol, vecCol, k))
      case "ivf" =>
        val kind = s"knn$k-edges-ivf2-$nCells-$nProbe-$seed"
        val centKind = ivfCentKind(nCells, seed)
        graft.util.DiskArtifact.getOrBuild(spark, kind, newStamp)(() =>
          if (graft.util.DiskArtifact.exists(kind, oldStamp) &&
              graft.util.DiskArtifact.exists(centKind, oldStamp)) {
            val centers = readCenters(spark, centKind, oldStamp)
            // carry the frozen clustering to the new stamp so the NEXT
            // batch deltas from it too
            persistCenters(spark, centKind, newStamp, centers)
            knnGraphIvfAppend(
              graft.util.DiskArtifact.getOrBuild(spark, kind, oldStamp)(
                () => knnGraphIvf(old, idCol, vecCol, k, nCells, nProbe,
                  seed)),
              centers, full, idCol, vecCol, k, nProbe, newIds)
          } else
            // build directly — wrapping knnGraphArtifact would re-enter
            // getOrBuild for THIS (kind, newStamp) and self-overwrite
            ivfArtifactBuild(full, idCol, vecCol, k, nCells, nProbe,
              seed, newStamp))
      case "hnsw-sharded" =>
        val kind = s"knn$k-edges-hnswsh$nCells-$seed"
        val ik = shardedIdxKind(nCells, seed)
        val mk = shardedMetaKind(nCells, seed)
        graft.util.DiskArtifact.getOrBuild(spark, kind, newStamp)(() =>
          if (graft.util.DiskArtifact.exists(kind, oldStamp) &&
              graft.util.DiskArtifact.exists(ik, oldStamp) &&
              graft.util.DiskArtifact.exists(mk, oldStamp)) {
            import spark.implicits._
            // maintain the serving companion: the batch inserts into
            // the FROZEN clustering + fan, only touched shards rewrite,
            // and the maintained index lands under the new stamp so the
            // NEXT batch deltas from it too
            val oldSh = ShardedHnsw.fromFrames(
              graft.util.DiskArtifact.getOrBuild(spark, ik, oldStamp)(
                () => throw new IllegalStateException(
                  s"$ik@$oldStamp should exist")),
              graft.util.DiskArtifact.getOrBuild(spark, mk, oldStamp)(
                () => throw new IllegalStateException(
                  s"$mk@$oldStamp should exist")))
            val batch = full
              .select(col(idCol).cast("long").as("id"), col(vecCol))
              .as[(Long, Array[Float])]
              .filter(r => newSet(r._1)).collect().sortBy(_._1).toSeq
            require(batch.length == newSet.size,
              s"newIds must all be present in full " +
                s"(got ${batch.length} of ${newSet.size})")
            persistSharded(spark, ShardedHnsw.insert(oldSh, batch),
              ik, mk, newStamp)
            // exact O(corpus·batch) edge delta (decomposability): new
            // srcs and old srcs' batch candidates come out exact — the
            // beam cannot beat it, and the single pass is the same
            // work the old-src side needs regardless
            knnGraphAppend(
              graft.util.DiskArtifact.getOrBuild(spark, kind, oldStamp)(
                () => throw new IllegalStateException(
                  s"$kind@$oldStamp should exist")),
              full, idCol, vecCol, k, newIds)
          } else
            shardedHnswEdges(
              shardedCompanion(full, idCol, vecCol, nCells, seed,
                newStamp),
              full, idCol, vecCol, k))
      // the decomposability delta needs only the OLD EDGES (an old
      // src's new top-k ⊆ old top-k ∪ its exact batch scores; a new
      // src's side is exact by construction), so the hnsw and srp
      // kinds append through the same pass — batch srcs come out
      // EXACT, at least as good as the candidate generator's beam or
      // bands would give a rebuild
      case "hnsw" =>
        val kind = s"knn$k-edges-hnsw"
        graft.util.DiskArtifact.getOrBuild(spark, kind, newStamp)(() =>
          if (graft.util.DiskArtifact.exists(kind, oldStamp))
            knnGraphAppend(
              graft.util.DiskArtifact.getOrBuild(spark, kind, oldStamp)(
                () => throw new IllegalStateException(
                  s"$kind@$oldStamp should exist")),
              full, idCol, vecCol, k, newIds)
          else knnGraphHnsw(full, idCol, vecCol, k))
      case "srp" =>
        require(srpDim > 0, "srp append needs srpDim = embedding dim")
        val kind = s"knn$k-edges-srp$srpDim"
        graft.util.DiskArtifact.getOrBuild(spark, kind, newStamp)(() =>
          if (graft.util.DiskArtifact.exists(kind, oldStamp))
            knnGraphAppend(
              graft.util.DiskArtifact.getOrBuild(spark, kind, oldStamp)(
                () => throw new IllegalStateException(
                  s"$kind@$oldStamp should exist")),
              full, idCol, vecCol, k, newIds)
          else knnGraphSrp(full, idCol, vecCol, k, srpDim))
      case other =>
        throw new IllegalArgumentException(
          s"unknown edgeSource '$other' for append " +
            "(exact | ivf | srp | hnsw | hnsw-sharded)")
    }
  }

  private[graft] def ivfCentKind(nCells: Int, seed: Long): String =
    s"ivfcent$nCells-$seed"

  /** Fresh-build half of the ivf artifact: resolve (or fit + persist)
    * the stamp-keyed centroid companion, then build the frozen-center
    * edges. Factored out of [[knnGraphArtifact]] so the append path's
    * no-prior-artifact fallback can build DIRECTLY inside its own
    * getOrBuild — re-entering getOrBuild for the same (kind, stamp)
    * would overwrite the parquet path it is simultaneously reading. */
  private def ivfArtifactBuild(df: DataFrame, idCol: String,
                               vecCol: String, k: Int, nCells: Int,
                               nProbe: Int, seed: Long,
                               stamp: String): DataFrame = {
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    val centKind = ivfCentKind(nCells, seed)
    val centers =
      if (graft.util.DiskArtifact.exists(centKind, stamp))
        readCenters(df.sparkSession, centKind, stamp)
      else {
        val n = typed.count()
        require(nCells <= n,
          s"nCells=$nCells exceeds corpus size $n")
        val c = ivfCenters(typed, nCells, seed)
        persistCenters(df.sparkSession, centKind, stamp, c)
        c
      }
    ivfEdgesFrozen(df, idCol, vecCol, k, centers, nProbe, 65536)
  }

  private[graft] def shardedIdxKind(nCells: Int, seed: Long): String =
    s"hnswshidx$nCells-$seed"
  private[graft] def shardedMetaKind(nCells: Int, seed: Long): String =
    s"hnswshmeta$nCells-$seed"

  /** Get-or-build the persisted sharded-HNSW companion for (corpus
    * stamp, nCells, seed): the shard blob table + meta land as two
    * stamp-keyed artifacts, so the serving index of a corpus state
    * materializes exactly once and incremental maintenance
    * ([[knnGraphArtifactAppend]] hnsw-sharded) can insert into the
    * FROZEN clustering instead of rebuilding. The returned handle's
    * table reads the PERSISTED copy — the artifact serves, session
    * frames don't linger. */
  private def shardedCompanion(df: DataFrame, idCol: String,
                               vecCol: String, nCells: Int, seed: Long,
                               stamp: String): ShardedHnsw.Shards = {
    val spark = df.sparkSession
    val ik = shardedIdxKind(nCells, seed)
    val mk = shardedMetaKind(nCells, seed)
    if (graft.util.DiskArtifact.exists(ik, stamp) &&
        graft.util.DiskArtifact.exists(mk, stamp))
      ShardedHnsw.fromFrames(
        graft.util.DiskArtifact.getOrBuild(spark, ik, stamp)(() =>
          throw new IllegalStateException(s"$ik@$stamp should exist")),
        graft.util.DiskArtifact.getOrBuild(spark, mk, stamp)(() =>
          throw new IllegalStateException(s"$mk@$stamp should exist")))
    else {
      val sh = ShardedHnsw.build(df, idCol, vecCol, nCells, seed = seed)
      persistSharded(spark, sh, ik, mk, stamp)
    }
  }

  /** Land a shard handle's frames under (kind, stamp) and return the
    * handle re-bound to the persisted table. */
  private def persistSharded(spark: org.apache.spark.sql.SparkSession,
                             sh: ShardedHnsw.Shards, ik: String,
                             mk: String, stamp: String)
      : ShardedHnsw.Shards = {
    val table = graft.util.DiskArtifact.getOrBuild(spark, ik, stamp)(
      () => sh.table)
    val meta = graft.util.DiskArtifact.getOrBuild(spark, mk, stamp)(
      () => ShardedHnsw.metaFrame(sh))
    ShardedHnsw.fromFrames(table, meta)
  }

  private[graft] def readCenters(spark: org.apache.spark.sql.SparkSession,
                                 centKind: String, stamp: String)
      : Array[Array[Double]] =
    graft.util.DiskArtifact.getOrBuild(spark, centKind, stamp)(() =>
        throw new IllegalStateException(
          s"centers artifact $centKind@$stamp should already exist"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray).sortBy(_._1).map(_._2)

  private[graft] def persistCenters(spark: org.apache.spark.sql.SparkSession,
                                    centKind: String, stamp: String,
                                    centers: Array[Array[Double]]): Unit = {
    val rows = centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
    graft.util.DiskArtifact.getOrBuild(spark, centKind, stamp)(() =>
      spark.createDataFrame(rows).toDF("__cell", "__center"))
    ()
  }

  /** Fixed-round synchronous k-core peeling (Seidman 1983, "Network
    * structure and minimum degree") over the MUTUAL subgraph: each
    * round removes EVERY node whose current mutual degree is below
    * `coreK` simultaneously, then recounts — after enough rounds the
    * survivors are exactly the k-core (the densely-interconnected
    * near-duplicate mass a curation audit wants separated from the
    * sparse periphery). The synchronous fixed-round form is the
    * oracle-replayable one (the classic sequential peel is
    * order-dependent); `rounds` bounds the unrolled replay, and the
    * output marks survival AFTER that many rounds — both engines run
    * the identical schedule, converged or not (kNN graphs converge in
    * O(5) rounds: each peel strictly shrinks the node set or stops).
    *
    * Scale shape: per round one ids-only degree count over surviving
    * edges + two semi-joins — never features, no windows. Output:
    * (id, in_core int 0/1). */
  def kCore(nodes: DataFrame, idCol: String,
            edges: DataFrame, srcCol: String, dstCol: String,
            coreK: Int, rounds: Int): DataFrame = {
    require(coreK >= 1 && rounds >= 1)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val d1 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val d2 = edges.select(col(dstCol).as("a"), col(srcCol).as("b"))
    // ordered mutual pairs, BOTH orientations (degree = row count per a)
    val und0 = d1.join(d2, Seq("a", "b"), "left_semi")
      .materializeOnce(eager = false)
    var live = ids
    var und = und0
    var r = 0
    while (r < rounds) {
      val deg = und.groupBy(col("a").as("id"))
        .agg(count(lit(1)).as("__deg"))
      live = live.join(deg.filter(col("__deg") >= coreK),
          Seq("id"), "left_semi")
        .materializeOnce(eager = false)
      und = und
        .join(live.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(live.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .materializeOnce(eager = false)
      r += 1
    }
    ids.join(live.withColumn("__in", lit(1)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__in"), lit(0)).as("in_core"))
  }

  /** The DuckDB replay of [[kCore]] over caller-provided `nodes(id)` /
    * `edges(src, dst)` CTEs — mutual symmetrization, unrolled
    * simultaneous-removal rounds. Every round references the previous
    * one exactly ONCE (the q161 lesson: textual-CTE engines inline a
    * doubly-referenced round 2^rounds times): survival of BOTH
    * endpoints folds into the same scan as two count() windows — in
    * the symmetric edge list deg(x) = rows with a = x = rows with
    * b = x, so PARTITION BY a and PARTITION BY b both read the true
    * mutual degree. Ends at CTE `kc` = (id, in_core). */
  def kCoreOracleCtes(coreK: Int, rounds: Int): String = {
    val steps = (1 until rounds).map { i => s"""
      u$i AS (
        SELECT a, b FROM (
          SELECT a, b,
            count(*) OVER (PARTITION BY a) AS da,
            count(*) OVER (PARTITION BY b) AS db
          FROM u${i - 1})
        WHERE da >= $coreK AND db >= $coreK)"""
    }.mkString(",")
    val sep = if (rounds > 1) "," else ""
    s"""u0 AS (
        SELECT e1.src AS a, e1.dst AS b FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst AND e2.dst = e1.src)$sep$steps,
      lfin AS (SELECT a AS id FROM u${rounds - 1}
               GROUP BY a HAVING count(*) >= $coreK),
      kc AS (
        SELECT n.id,
          CAST(CASE WHEN l.id IS NULL THEN 0 ELSE 1 END AS INT) AS in_core
        FROM nodes n LEFT JOIN lfin l ON l.id = n.id)"""
  }

  /** Fixed-round integer HITS (Kleinberg 1999, "Authoritative sources
    * in a hyperlinked environment"): hub and authority scores over the
    * directed edge set — on a kNN similarity graph, high AUTHORITY =
    * chosen as neighbor by many strong hubs (a centrality complementary
    * to [[pagerank]]'s teleport-damped flow). Each round:
    * a_i = Σ_{j→i} h_j then renormalize to max [[HitsScale]] by
    * LEFT-TO-RIGHT long arithmetic (a·HitsScale div max — both engines
    * replay the same divisions), then the mirror step for h. All
    * integer, zero float freedom. Nodes outside the edge set hold 0.
    *
    * HitsScale is 10^6 (not [[Scale]]'s 10^12) because the
    * renormalization's intermediate product is Σ ≤ maxInDeg·HitsScale
    * times HitsScale again — exact longs require
    * maxInDeg · HitsScale² < 2^63, i.e. in-degree < 9.2×10^6 at 10^6
    * (any kNN graph qualifies; for power-law webgraphs rescale or move
    * the product to decimal(38,0) on both engines).
    *
    * Scale shape: two (id, score)-keyed shuffles per round plus one
    * single-row max aggregate — metadata-sized driver traffic only.
    * Output: (id, hub, authority) exact longs in [0, HitsScale]. */
  def hits(nodes: DataFrame, idCol: String,
           edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int): DataFrame = {
    require(rounds >= 1)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .materializeOnce(eager = false)
    var h = ids.withColumn("score", lit(HitsScale))
    var a = ids.withColumn("score", lit(0L))
    var r = 0
    while (r < rounds) {
      val aRaw = e.join(h.select(col("id").as("src"), col("score")),
          Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum("score").as("__s"))
        .materializeOnce(eager = false)
      val aMax = math.max(1L,
        Option(aRaw.agg(max("__s")).head().get(0))
          .fold(0L)(_.asInstanceOf[Long]))
      a = ids.join(aRaw, Seq("id"), "left")
        .select(col("id"),
          expr(s"coalesce(__s, 0L) * ${HitsScale}L div ${aMax}L")
            .as("score"))
        .materializeOnce(eager = false)
      val hRaw = e.join(a.select(col("id").as("dst"), col("score")),
          Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum("score").as("__s"))
        .materializeOnce(eager = false)
      val hMax = math.max(1L,
        Option(hRaw.agg(max("__s")).head().get(0))
          .fold(0L)(_.asInstanceOf[Long]))
      h = ids.join(hRaw, Seq("id"), "left")
        .select(col("id"),
          expr(s"coalesce(__s, 0L) * ${HitsScale}L div ${hMax}L")
            .as("score"))
        .materializeOnce(eager = false)
      r += 1
    }
    h.select(col("id"), col("score").as("hub"))
      .join(a.select(col("id"), col("score").as("authority")), Seq("id"))
  }

  /** The DuckDB replay of [[hits]] over `nodes(id)` / `edges(src, dst)`
    * CTEs — unrolled rounds with identical left-to-right integer
    * normalization. Each CTE references its predecessor exactly ONCE
    * (the q161 lesson): the per-round max comes from a `max() OVER ()`
    * window inside the normalizing CTE, never a second scalar-subquery
    * reference that a textual-CTE engine would inline exponentially.
    * Ends at CTE `ht` = (id, hub, authority). */
  def hitsOracleCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { i => s"""
      ar$i AS (SELECT e.dst AS id, CAST(sum(h.score) AS BIGINT) AS s
               FROM edges e JOIN h${i - 1} h ON h.id = e.src
               GROUP BY e.dst),
      a$i AS (SELECT id,
                s * ${HitsScale} // greatest(max(s) OVER (), 1) AS score
              FROM ar$i),
      hr$i AS (SELECT e.src AS id, CAST(sum(a.score) AS BIGINT) AS s
               FROM edges e JOIN a$i a ON a.id = e.dst
               GROUP BY e.src),
      h$i AS (SELECT id,
                s * ${HitsScale} // greatest(max(s) OVER (), 1) AS score
              FROM hr$i)"""
    }.mkString(",")
    s"""h0 AS (SELECT id, ${HitsScale}::BIGINT AS score FROM nodes),$steps,
      ht AS (SELECT n.id,
               coalesce(h.score, 0) AS hub,
               coalesce(a.score, 0) AS authority
             FROM nodes n
             LEFT JOIN h$rounds h ON h.id = n.id
             LEFT JOIN a$rounds a ON a.id = n.id)"""
  }

  /** Fixed-round seed-hop distance (unrolled Bellman-Ford over unit
    * weights): minimum number of directed edge hops from a trusted
    * seed set — [[trustRank]]'s structural cousin ("HOW FAR is this
    * document from vetted territory" instead of "how much trust mass
    * reached it"); the curation cut "keep everything within h hops of
    * the seed set" reads straight off it. Round r improves
    * dist(dst) = min(dist(dst), dist(src) + 1) simultaneously across
    * all edges — after `rounds` rounds the column holds exact hop
    * distances ≤ rounds and NULL past the horizon (both engines replay
    * the same unrolled schedule, so un-converged states still match).
    *
    * Scale shape: one (id, dist)-keyed shuffle per round over the edge
    * list, integer minimum folds. Output: (id, hops-or-NULL). */
  def seedDistance(nodes: DataFrame, idCol: String,
                   seeds: DataFrame, seedCol: String,
                   edges: DataFrame, srcCol: String, dstCol: String,
                   rounds: Int): DataFrame = {
    require(rounds >= 1)
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .materializeOnce(eager = false)
    val e = edges.select(col(srcCol).as("id"), col(dstCol).as("__dst"))
      .materializeOnce(eager = false)
    var dist = seeds.select(col(seedCol).as("id")).distinct()
      .join(ids, Seq("id"), "left_semi")
      .withColumn("hops", lit(0L))
      .materializeOnce(eager = false)
    var r = 0
    while (r < rounds) {
      val relax = e.join(dist, Seq("id"))
        .select(col("__dst").as("id"), (col("hops") + 1L).as("hops"))
      dist = dist.union(relax)
        .groupBy("id").agg(min("hops").as("hops"))
        .materializeOnce(eager = false)
      r += 1
    }
    ids.join(dist, Seq("id"), "left")
  }

  /** The DuckDB replay of [[seedDistance]] over `nodes(id)` /
    * `seeds(id)` / `edges(src, dst)` CTEs. Ends at CTE `sd` =
    * (id, hops-or-NULL). */
  def seedDistanceOracleCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { i => s"""
      s$i AS (
        SELECT id, CAST(min(hops) AS BIGINT) AS hops FROM (
          SELECT id, hops FROM s${i - 1}
          UNION ALL
          SELECT e.dst AS id, p.hops + 1 AS hops
          FROM edges e JOIN s${i - 1} p ON p.id = e.src)
        GROUP BY id)"""
    }.mkString(",")
    s"""s0 AS (
        SELECT DISTINCT s.id, CAST(0 AS BIGINT) AS hops
        FROM seeds s JOIN nodes n ON n.id = s.id),$steps,
      sd AS (SELECT n.id, d.hops FROM nodes n
             LEFT JOIN s$rounds d ON d.id = n.id)"""
  }

  /** Per-node triangle count and local clustering coefficient (Watts &
    * Strogatz 1998) over the MUTUAL subgraph of a directed edge set —
    * the graph-density audit of the similarity structure (a kNN graph
    * whose mutual edges close into triangles is clustered/duplicative;
    * a near-triangle-free one is dispersed). Mutuality (both directions
    * present) is the standard symmetrization that keeps kNN degree
    * bounded by k.
    *
    * Triangles enumerate once each as ordered (a < b < c): adjacent
    * pairs of each apex (bounded C(k,2) fanout per node — the mutual
    * degree inherits the kNN out-degree bound) semi-joined against the
    * undirected edge set; per-node counts explode the 3 corners. All
    * joins are hash-keyed on node ids — ids-only shuffles, never
    * features; no window wider than a node's neighbor list.
    * lcc = 2·T / (deg·(deg−1)) is one double division of exact longs
    * (0.0 when deg < 2 — the isolated/leaf convention).
    *
    * Output: (id, degree, n_tri, lcc-double) — one row per node. */
  def triangleStats(nodes: DataFrame, idCol: String,
                    edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val d1 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val d2 = edges.select(col(dstCol).as("a"), col(srcCol).as("b"))
    val und = d1.join(d2, Seq("a", "b"), "left_semi")
      .filter(col("a") < col("b"))
      .materializeOnce(eager = false)
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val pairs = und
      .join(und.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") < col("c"))
    val tris = pairs.join(
      und.select(col("a").as("b"), col("b").as("c")),
      Seq("b", "c"), "left_semi")
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    nodes.select(col(idCol).as("id")).distinct()
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          (lit(2L) * col("n_tri")).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Degree assortativity (Newman 2002, "Assortative Mixing in
    * Networks") of the MUTUAL subgraph of a directed edge set: the
    * Pearson correlation of endpoint degrees over ordered edge pairs.
    * Positive r = hubs prefer hubs (clustered near-dup mass);
    * negative r = hub-leaf structure. Over the symmetric ordered-pair
    * edge list both endpoint marginals coincide, so
    * r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²) — every operand an EXACT
    * integer (decimal(38,0) sums; degrees are bounded by k on kNN
    * graphs but corpus-scale M·Σ products overflow longs), then ONE
    * double division: bit-identical in any replaying engine. NULL when
    * the degree distribution is constant (zero variance).
    *
    * Scale: mutual edges + degree join are keyed shuffles on node ids;
    * the moment aggregate is a single fold to one row.
    * Output: one row (m_ordered_edges, assortativity). */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val d1 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val d2 = edges.select(col(dstCol).as("a"), col(srcCol).as("b"))
    // ordered mutual pairs — BOTH orientations kept (the standard
    // symmetric edge-list convention for undirected assortativity)
    val ord = d1.join(d2, Seq("a", "b"), "left_semi")
      .materializeOnce(eager = false)
    val deg = ord.groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("deg"))
    val paired = ord
      .join(deg.select(col("id").as("a"), col("deg").as("ja")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("jb")), Seq("b"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    paired.agg(
        count(lit(1)).as("m"),
        sum(dec(col("ja"))).as("__sj"),
        sum(dec(col("ja")) * dec(col("jb"))).as("__sjk"),
        sum(dec(col("ja")) * dec(col("ja"))).as("__sj2"))
      .select(col("m").as("m_ordered_edges"),
        when(dec(col("m")) * col("__sj2") - col("__sj") * col("__sj")
            =!= dec(lit(0)),
          (dec(col("m")) * col("__sjk") - col("__sj") * col("__sj"))
            .cast("double") /
            (dec(col("m")) * col("__sj2") - col("__sj") * col("__sj"))
              .cast("double"))
          .as("assortativity"))
  }

  /** The DuckDB replay of [[triangleStats]] over caller-provided
    * `nodes(id)` / `edges(src, dst)` CTEs — mutual symmetrization,
    * ordered-triple enumeration, per-corner counts, the same single
    * division. Ends at CTE `tstats` = (id, degree, n_tri, lcc). */
  def triangleOracleCtes: String = s"""
      und AS (
        SELECT e1.src AS a, e1.dst AS b FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst AND e2.dst = e1.src
        WHERE e1.src < e1.dst),
      dg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
               SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
             GROUP BY id),
      tri AS (
        SELECT p.a, p.b, p.c
        FROM (SELECT e1.a, e1.b, e2.b AS c FROM und e1
              JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b) p
        JOIN und e3 ON e3.a = p.b AND e3.b = p.c),
      tc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM (
               SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri
               UNION ALL SELECT c AS id FROM tri)
             GROUP BY id),
      tstats AS (
        SELECT n.id, coalesce(d.degree, 0) AS degree,
          coalesce(t.n_tri, 0) AS n_tri,
          CASE WHEN coalesce(d.degree, 0) >= 2
               THEN CAST(2 * coalesce(t.n_tri, 0) AS DOUBLE) /
                    CAST(d.degree * (d.degree - 1) AS DOUBLE)
               ELSE 0.0 END AS lcc
        FROM nodes n
        LEFT JOIN dg d ON d.id = n.id
        LEFT JOIN tc t ON t.id = n.id)"""

  /** The DuckDB replay of [[pagerank]] over a `nodes(id)` /
    * `edges(src, dst)` CTE pair the caller provides: unrolled
    * fixed-round blocks, each the same integer arithmetic
    * (`//` = left-to-right long division). Ends at CTE `pr` =
    * (id, score). */
  def oracleSqlCtes(rounds: Int, dampNum: Long = 85L,
                    dampDen: Long = 100L): String = {
    val keep = dampDen - dampNum
    val steps = (1 to rounds).map { i => s"""
      c$i AS (
        SELECT e.dst AS id,
          CAST(sum(p.score * $dampNum // $dampDen // d.deg) AS BIGINT) AS s
        FROM edges e
        JOIN r${i - 1} p ON p.id = e.src
        JOIN deg d ON d.id = e.src
        GROUP BY e.dst),
      r$i AS (
        SELECT n.id, nn.base + coalesce(c.s, 0) AS score
        FROM nodes n CROSS JOIN nn
        LEFT JOIN c$i c ON c.id = n.id)"""
    }.mkString(",")
    s"""nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          ${Scale}::BIGINT // CAST(count(*) AS BIGINT) AS init,
          ${Scale}::BIGINT // CAST(count(*) AS BIGINT)
            * $keep // $dampDen AS base
        FROM nodes),
      deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
              FROM edges GROUP BY src),
      r0 AS (SELECT id, nn.init AS score FROM nodes, nn),$steps,
      pr AS (SELECT id, score FROM r$rounds)"""
  }
}
