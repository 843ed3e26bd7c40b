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
  * Iterative min-label propagation (the standard Pregel formulation,
  * no graph library needed): every node starts labeled with itself;
  * each round, a node adopts the minimum label among itself and its
  * neighbors; fixpoint = component-minimum everywhere. Rounds needed =
  * graph diameter — near-dup clusters are small and dense (diameter a
  * handful), so this converges in a few shuffles even when the PAIR
  * list is huge. Each round is one equi-join + one aggregation on the
  * node id; per-round `localCheckpoint` keeps the plan flat and the
  * convergence check (a changed-label count) rides on the materialized
  * result.
  */
object Components {

  /** (node, component) for every node appearing in `pairs`; `component`
    * is the minimum node id of the component (any ordered id type). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val sym = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .materializeOnce(eager = false) // reused every round
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .materializeOnce(eager = false)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val viaNeighbor = sym.join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("component"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy("node").agg(min("component").as("component"))
        .materializeOnce() // eager: materialize before the change count
      changed = next.alias("n")
        .join(labels.alias("o"), Seq("node"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = next
      iter += 1
    }
    // a silent non-fixpoint would return wrong labels (nodes > maxIter
    // hops from their component minimum) — fail loudly instead
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — raise maxIter above the " +
        "component diameter")
    labels
  }

  /** One canonical row per duplicate cluster: the member with the
    * minimum id (== the component label) survives. */
  def canonicalPerComponent(components: DataFrame): DataFrame =
    components.filter(col("node") === col("component"))
      .select(col("node").as("canonical_id"))
}
