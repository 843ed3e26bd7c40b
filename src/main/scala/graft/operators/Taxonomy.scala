package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Materialize.MatOps

/** SKOS-style taxonomy graph operators.
  *
  * The reference stores a polyhierarchy as an edge table and walks it
  * with recursive CTEs (/root/reference/src/services/TaxonomyService.ts:
  * 387-423). Here the edge table is a DataFrame `(child, parent)` and the
  * transitive closure is an iterative frontier-join loop to fixpoint —
  * semantically `WITH RECURSIVE ... UNION` (dedup per step). Taxonomies
  * are broadcast-sized in practice; the loop exists for generality and
  * each step is a broadcast join, so even a deep hierarchy costs
  * depth × tiny-join.
  */
object Taxonomy {

  /** Direct broader (parents) of a node — reference getBroader (J4). */
  def broader(edges: DataFrame, concepts: DataFrame, id: String): DataFrame =
    edges.filter(col("child") === id)
      .join(broadcast(concepts), col("parent") === concepts("id"))
      .drop("child", "parent")

  /** Direct narrower (children) of a node. */
  def narrower(edges: DataFrame, concepts: DataFrame, id: String): DataFrame =
    edges.filter(col("parent") === id)
      .join(broadcast(concepts), col("child") === concepts("id"))
      .drop("child", "parent")

  /** Full transitive closure of an edge table `(child, parent)`:
    * all (node, ancestor) pairs at any depth. Iterative fixpoint —
    * `UNION`-dedup like the reference CTE, deferred to one final pass.
    *
    * `acyclic = true` (taxonomies are DAGs) drops the per-step
    * `except(closure)` cycle guard: in a DAG path lengths strictly
    * increase, so the frontier empties on its own and the except — a
    * full shuffle of the whole closure per step — buys nothing. Results
    * are identical either way (the guard only affects how much work a
    * cyclic input wastes before maxDepth stops it). */
  def ancestorClosure(edges: DataFrame, maxDepth: Int = 20,
                      acyclic: Boolean = true): DataFrame = {
    val base = edges.select(col("child").as("node"), col("parent").as("ancestor"))
    var closure = base
    var frontier = base
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      val stepped = frontier.alias("f")
        .join(base.alias("b"), col("f.ancestor") === col("b.node"))
        .select(col("f.node").as("node"), col("b.ancestor").as("ancestor"))
        .distinct() // collapse duplicate same-length paths (diamonds)
      val next = (if (acyclic) stepped else stepped.except(closure))
        .materializeOnce() // truncate lineage: loop plans grow exponentially otherwise
      frontier = next
      closure = closure.unionByName(next)
      depth += 1
    }
    // a silently truncated closure is wrong query output, not a partial
    // answer — fail loudly (same convention as Components)
    require(frontier.isEmpty,
      s"ancestorClosure did not reach fixpoint within maxDepth=$maxDepth " +
        "— raise maxDepth above the graph depth; for cyclic inputs pass " +
        "acyclic=false (the except-mode fixpoint terminates on cycles)")
    closure.distinct()
  }

  /** Ancestors of one node (reference getAncestors, J5). */
  def ancestors(edges: DataFrame, id: String): DataFrame =
    ancestorClosure(edges).filter(col("node") === id).select("ancestor")

  /** Descendants of one node. */
  def descendants(edges: DataFrame, id: String): DataFrame =
    ancestorClosure(edges).filter(col("ancestor") === id).select("node")

  /** Tree assembly without the reference's N+1 per-concept loop
    * (/root/reference/src/cli.ts:281-327): one aggregation producing
    * (parent, children[]) plus a roots list. */
  def childrenByParent(edges: DataFrame): DataFrame =
    edges.groupBy("parent").agg(sort_array(collect_list(col("child"))).as("children"))

  def roots(concepts: DataFrame, edges: DataFrame): DataFrame =
    concepts.join(edges, concepts("id") === edges("child"), "left_anti")

  /** Symmetric related-edges: store one direction, query both — the
    * reference stores both directions (TaxonomyService.ts:429-445);
    * the union-of-reversed view is equivalent and halves the storage. */
  def symmetrized(related: DataFrame): DataFrame =
    related.select(col("a"), col("b"))
      .unionByName(related.select(col("b").as("a"), col("a").as("b")))
      .distinct()
}
