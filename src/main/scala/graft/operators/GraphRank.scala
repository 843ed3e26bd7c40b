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
    * contract. The query set (= the corpus here) must be
    * driver/broadcast-sized — the certification regime; ids must be
    * integral. Output: (src, dst, cos_sim). */
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
