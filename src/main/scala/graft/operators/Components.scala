package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Materialize.MatOps

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/n-gram verify output)
  * into duplicate CLUSTERS, so canonicalization can keep exactly one
  * document per cluster. Without it, pairwise dedup leaks: A~B and B~C
  * dropping B still keeps both A and C.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * rewrites the edge set with two local operations that preserve
  * connectivity while monotonically flattening it toward a forest of
  * depth-1 stars whose root is the component minimum:
  *
  *  - large-star(u): every neighbor LARGER than u re-attaches to
  *    m = min(N(u) ∪ {u});
  *  - small-star(u): u and its smaller neighbors all attach to their
  *    minimum.
  *
  * Convergence is O(log² n) rounds worst-case and ~log n in practice —
  * crucially INDEPENDENT of component diameter, unlike min-label
  * propagation (O(diameter) rounds), which a chain-shaped component
  * (crawl mirrors, citation chains) can push past any fixed round
  * budget. Per round: two groupBy+join passes over the edge set, one
  * lazy materialization, and ONE action that both materializes the new
  * edge set and measures it (count + order-independent checksum) — the
  * convergence check rides the materializing job instead of running as
  * a second per-round action.
  *
  * Termination is verified structurally, not just by the checksum: the
  * final edge set must be a star forest (no node is both a parent and a
  * child; every child has exactly one parent). A star forest is a
  * fixpoint of both operations, and since both preserve connectivity,
  * its stars ARE the components with the minimum member as root — so
  * the check converts any early stop (round budget, checksum collision)
  * into a loud failure instead of silently wrong labels.
  */
object Components {

  /** (node, component) for every node appearing in `pairs`; `component`
    * is the minimum node id of the component (any ordered id type).
    *
    * ADAPTIVE EXECUTION: the iterative star algorithm pays a fixed
    * ~2-job cost per round, which dominates below ~10⁶ edges (the
    * q56/q90 small-data regime — measured 5-13 s of pure round
    * overhead at 3k-500k edges). Dup-pair edge lists are usually MUCH
    * smaller than the corpus that produced them, so when the distinct
    * edge set is small (`localEdgeThreshold`) and ids are longs, the
    * closure runs as ONE task: a union-find over the slim edge list,
    * with roots fixed to the component minimum — output identical to
    * the star fixpoint (spec-asserted against the iterative path on
    * random graphs). This is a single-TASK pass over data the cluster
    * already reduced, not a driver collect; set the threshold to 0 to
    * force the iterative path (billion-edge graphs take it
    * automatically). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          localEdgeThreshold: Long = 1L << 21): DataFrame = {
    // ONE materialization barrier over the raw pair list, for two
    // reasons: (1) the pair source is typically the expensive half of
    // dedup (LSH candidate generation + verification) and is consumed
    // twice below (node universe + edge list) — without the barrier it
    // would evaluate twice; (2) the barrier stops the canonicalization
    // predicates from being pushed INTO the pair-generation join, where
    // Catalyst is free to reorder them in front of the expensive
    // similarity conjunct (measured 10× on the n-gram Jaccard source:
    // the pushed filter landed before the set-intersection predicate
    // and forced it onto every blocked candidate pair).
    val p0 = pairs.select(col(aCol).as("pa"), col(bCol).as("pb"))
      .materializeOnce(eager = false)
    // single consumer (the final anti-join) and reads p0's blocks — a
    // checkpoint here would only add a job
    val allNodes = p0.select(col("pa").as("node"))
      .unionByName(p0.select(col("pb").as("node")))
      .distinct()
    // canonical child>parent orientation; self-pairs carry no
    // connectivity and would survive as self-loops, so drop them
    var edges = p0
      .select(greatest(col("pa"), col("pb")).as("a"),
        least(col("pa"), col("pb")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .materializeOnce(eager = false)
    // adaptive dispatch: the count doubles as the materializing action
    val bothLong = edges.schema.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (bothLong && edges.count() <= localEdgeThreshold) {
      val members = localComponents(edges)
      val selfLabeled0 = allNodes
        .join(members.select("node"), Seq("node"), "left_anti")
        .withColumn("component", col("node"))
      return members.unionByName(selfLabeled0)
    }
    // fast path: a star forest IS the fixpoint, so one structural probe
    // (which doubles as the materializing action for `edges`) both
    // certifies correctness and skips the loop — dedup graphs are
    // mostly tiny pre-flattened clusters, making this the common case
    if (starViolations(edges) > 0) {
      var sig = edgeSignature(edges)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val next = smallStar(largeStar(edges)).materializeOnce(eager = false)
        val nextSig = edgeSignature(next) // materializes + measures, one job
        converged = nextSig == sig
        sig = nextSig
        edges = next
        iter += 1
      }
      // a depth-1 star forest is a fixpoint of both star operations
      // and — because they preserve connectivity — the correct
      // component decomposition. Anything else here means the round
      // budget was too small (or the checksum collided): fail loudly,
      // never mislabel.
      val leftover = starViolations(edges)
      require(leftover == 0,
        s"connectedComponents not at fixpoint after $iter rounds " +
          s"(maxIter=$maxIter): $leftover star-forest violations — " +
          "raise maxIter")
    }
    // star edges are (member, componentMin); roots and isolated nodes
    // label themselves
    val members = edges
      .select(col("a").as("node"), col("b").as("component"))
    val selfLabeled = allNodes
      .join(members.select("node"), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    members.unionByName(selfLabeled)
  }

  /** Single-task union-find closure over a small long-id edge list.
    * Roots are kept at the component MINIMUM (merging attaches the
    * larger root under the smaller; both roots are their sets' minima,
    * so the survivor is the union's minimum), with full path
    * compression — the same (node, min-of-component) relation the star
    * fixpoint yields. Emits one row per node APPEARING IN AN EDGE;
    * isolated nodes self-label in the caller (shared with the
    * iterative path). */
  private def localComponents(edges: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("component",
        org.apache.spark.sql.types.LongType, nullable = false)))
    edges.repartition(1).mapPartitions { it =>
      val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      def find(x0: Long): Long = {
        var r = x0
        while ({ val p = parent.get(r); p != null && p != r }) r = parent.get(r)
        var c = x0 // path compression
        while ({ val p = parent.get(c); p != null && p != c }) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        r
      }
      val nodes = new java.util.TreeSet[java.lang.Long]()
      it.foreach { row =>
        val a = row.getLong(0)
        val b = row.getLong(1)
        nodes.add(a); nodes.add(b)
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      nodes.forEach { n =>
        out += org.apache.spark.sql.Row(n.longValue, find(n.longValue))
      }
      out.iterator
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** large-star: for each node u, every strictly-larger neighbor
    * re-attaches to min(N(u) ∪ {u}). Output keeps the child>parent
    * orientation (emitted edges are (v, m) with m ≤ u < v). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val mins = nbrs.groupBy("u")
      .agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // no distinct here: duplicates do not disturb smallStar's min
    // aggregation, and its final distinct canonicalizes the round's
    // output — one fewer shuffle per round
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
  }

  /** small-star: for each node u, u and its smaller neighbors all
    * attach to their common minimum. Input/output both child>parent, so
    * N≤(u) is exactly the parent column and m = min(parents). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("a").agg(min("b").as("mn"))
    val selfEdge = mins.select(col("a"), col("mn").as("b"))
    val moved = edges.join(mins, "a")
      .filter(col("b") =!= col("mn"))
      .select(col("b").as("a"), col("mn").as("b"))
    selfEdge.unionByName(moved).distinct()
  }

  /** Edge-set fingerprint (count, order-independent checksum), computed
    * in one action so it doubles as the materializing job. Checksum
    * equality across rounds is the cheap convergence signal; the
    * structural star-forest check below is the correctness proof. */
  private def edgeSignature(edges: DataFrame): (Long, Long) = {
    // XOR-fold, not sum: commutative, duplicate-free input (the set is
    // distinct), and immune to ANSI-mode long-overflow on the sum
    val r = edges.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Count of star-forest violations, both classes in ONE action: a
    * node appearing as both parent and child (depth > 1), or a child
    * with several distinct parents. Zero ⇔ the edge set is a depth-1
    * star forest ⇔ fixpoint of both star operations. */
  private def starViolations(edges: DataFrame): Long = {
    val chained = edges.select(col("b").as("n")).distinct()
      .join(edges.select(col("a").as("n")).distinct(), Seq("n"), "left_semi")
      .select(lit("parent-is-child").as("violation"))
    val multiParent = edges.groupBy("a").agg(countDistinct("b").as("np"))
      .filter(col("np") > 1)
      .select(lit("multi-parent").as("violation"))
    chained.unionByName(multiParent).count()
  }

  /** One canonical row per duplicate cluster: the member with the
    * minimum id (== the component label) survives. */
  def canonicalPerComponent(components: DataFrame): DataFrame =
    components.filter(col("node") === col("component"))
      .select(col("node").as("canonical_id"))

  /** Cluster-size histogram over a components labeling — the dedup
    * PROFILE a curation run reports before committing to a removal
    * policy: how much of the duplicated mass sits in pairs vs giant
    * boilerplate clusters (the long tail and the head call for
    * different handling). Two keyed aggregates (component → size →
    * histogram), each map-side combined; output is bounded by the
    * largest cluster size.
    *
    * Output per distinct size: (cluster_size, n_clusters, n_docs,
    * removable_docs) — `removable_docs` = docs beyond the canonical
    * one per cluster under keep-one dedup. */
  def sizeProfile(components: DataFrame,
                  componentCol: String = "component"): DataFrame =
    components.groupBy(col(componentCol))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters"))
          .as("removable_docs"))
}
