package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Descending, Expression, In, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** IVF index acceleration as a Catalyst optimizer rule — the SURVEY
  * §4.2 "custom Rule/Strategy" tier: rewrite
  *
  *   ORDER BY cosine_similarity(vec, <query literal>) DESC LIMIT k
  *
  * over an IVF-partitioned table (written by
  * [[graft.operators.IvfIndex.persist]], hive-partitioned on `__cell`)
  * into the same plan with a `__cell IN (<nProbe nearest centroids>)`
  * filter injected below the sort. Catalyst's partition pruning then
  * skips every non-probed cell's files — the scan reads nProbe/k of the
  * data, which is the entire point of an ANN index at 100 TB.
  *
  * The rewrite fires only for tables registered in [[IvfRegistry]] and
  * changes RESULTS only when nProbe < nCells (approximate, like any IVF
  * probe); nProbe = nCells is provably exact. Registration is explicit
  * opt-in, mirroring the reference's explicit `vector_top_k` index probe
  * (LibSQLDatabase.ts:325-337) — but here plain declarative SQL/DataFrame
  * code gets accelerated without calling a special operator.
  */
object IvfRegistry {
  /** Partition id of the delta bucket: vectors appended after an index
    * build land here (Library.appendToVectorIndex) and every probe —
    * the registry path in ivfScored AND the optimizer-rule path below —
    * must include it, or appended vectors silently vanish from
    * rule-rewritten top-k's. Pruning a nonexistent `__cell=-1`
    * directory costs nothing, so the rule adds it unconditionally. */
  val DeltaCell = -1

  /** `idCol`/`vecCol` are the persisted table's column names — the
    * `ann_topk` SQL table function scores `vecCol` and tie-breaks the
    * top-k on `idCol` (the optimizer-rule path never needs them: it
    * rewrites whatever columns the user's own query scored). */
  case class Entry(centers: Array[Array[Double]], nProbe: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding")
  private val entries = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  def register(pathPrefix: String, centers: Array[Array[Double]], nProbe: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    entries.put(normalize(pathPrefix), Entry(centers, nProbe, idCol, vecCol))
  def unregister(pathPrefix: String): Unit = entries.remove(normalize(pathPrefix))
  def clear(): Unit = entries.clear()

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def lookup(paths: Seq[String]): Option[Entry] = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // exact dir or a path inside it — a bare startsWith would let a
      // sibling like ".../emb2" match a registered ".../emb"
      if (paths.exists { p =>
        val n = normalize(p)
        n == e.getKey || n.startsWith(e.getKey + "/")
      }) return Some(e.getValue)
    }
    None
  }

  /** nProbe nearest centroid ids to the query vector (squared-Euclidean,
    * matching the k-means quantizer). */
  /** Index of the nearest centroid by squared Euclidean distance, ties
    * to the lowest cell id — the same rule (and tie-break) as
    * [[probeCells]], so vectors assigned here during a delta fold are
    * self-consistent with every later probe: the fold's chosen cell is
    * by construction among the nProbe nearest for any query that ranks
    * this vector highly. */
  def nearestCell(centers: Array[Array[Double]], v: Array[Float]): Int = {
    // same guard as probeCells: a silent prefix-distance over mismatched
    // dims (e.g. a delta fold after an embedding-model change against
    // stale centroids) would permanently file vectors in wrong cells
    require(centers.isEmpty || centers.head.length == v.length,
      s"centroid dim ${centers.headOption.map(_.length).getOrElse(0)} != " +
        s"vector dim ${v.length} — stale index vs new embeddings?")
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < centers.length) {
      val c = centers(i)
      var d = 0.0
      var j = 0
      while (j < c.length) { val t = c(j) - v(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  def probeCells(centers: Array[Array[Double]], query: Array[Double],
                 nProbe: Int): Seq[Int] = {
    // a silent prefix-distance over mismatched dims probes the wrong
    // cells (e.g. a stale index after an embedding-model change)
    require(centers.isEmpty || centers.head.length == query.length,
      s"query dim ${query.length} != index centroid dim ${centers.head.length}")
    centers.zipWithIndex.map { case (c, i) =>
      var d = 0.0; var j = 0
      while (j < c.length) {
        val t = c(j) - query(j); d += t * t; j += 1
      }
      (i, d)
    }.sortBy(_._2).take(nProbe).map(_._1).toSeq
  }
}

case class IvfProbeRule() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // DataFrame shape: limit directly over the sort
    case gl @ GlobalLimit(le, LocalLimit(ll, s: Sort)) if candidate(s) =>
      rewrittenSort(s).map(s2 =>
        GlobalLimit(le, LocalLimit(ll, s2))).getOrElse(gl)
    // SQL shape (round 20): `ORDER BY cosine_similarity(...) DESC
    // LIMIT k` sorts by an expression outside the SELECT list, so the
    // analyzer interposes a Project that drops the hidden sort column
    // between the limit and the sort — same probe, one more hop
    case gl @ GlobalLimit(le, LocalLimit(ll, p @ Project(_, s: Sort)))
        if candidate(s) =>
      rewrittenSort(s).map(s2 =>
        GlobalLimit(le, LocalLimit(ll, p.copy(child = s2)))).getOrElse(gl)
  }

  private def candidate(s: Sort): Boolean =
    s.global && s.order.nonEmpty &&
      s.order.head.direction == Descending &&
      sortKeyQuery(s.order.head.child, s.child).isDefined

  /** The sort with the probed `__cell IN (...)` filter injected below
    * it, when every precondition holds. */
  private def rewrittenSort(s: Sort): Option[Sort] = {
    val (vecExpr, queryLit) = sortKeyQuery(s.order.head.child, s.child).get
    rewrite(s, s.child, vecExpr, queryLit)
  }

  /** The sort key is either `cosine_similarity(col, <lit>)` directly or
    * an attribute aliased to it in the child projection. Returns the
    * vector-side expression too, so the rewrite can verify the sort
    * actually scores THIS relation's vectors. */
  private def sortKeyQuery(key: Expression,
                           child: LogicalPlan): Option[(Expression, Literal)] =
    key match {
      case CosineSimilarity(v, l: Literal) => Some((v, l))
      case a: Attribute => child match {
        case p: Project => p.projectList.collectFirst {
          case al @ Alias(CosineSimilarity(v, l: Literal), _)
            if al.exprId == a.exprId => (v, l)
        }
        case _ => None
      }
      case _ => None
    }

  private def rewrite(sort: Sort, child: LogicalPlan,
                      vecExpr: Expression, queryLit: Literal): Option[Sort] = {
    // idempotency: the fixed-point optimizer re-runs this rule on its
    // own output — a plan already carrying a __cell predicate must not
    // get another (it would never converge). Match ANY filter touching
    // __cell, not the exact In() shape: OptimizeIn rewrites a 1-element
    // In to EqualTo and a long In to InSet, and CombineFilters merges
    // the injected filter into the user's own predicates — a structural
    // In-only guard stops seeing its own output after those rewrites.
    // (Conservative: a user's own __cell filter also disables the probe.)
    val alreadyPruned = child.collectFirst {
      case f: Filter if f.condition.references.exists(_.name == "__cell") => ()
    }.isDefined
    if (alreadyPruned) return None
    // locate the file relation and its __cell partition attribute
    val relOpt = child.collectFirst {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
        if lr.output.exists(_.name == "__cell") =>
        (lr, fs.location.rootPaths.map(_.toString))
    }
    for {
      (lr, paths) <- relOpt
      // the scored vector must come from THIS relation — a join that
      // sorts by cosine over the OTHER side's vectors must not have the
      // IVF side pruned against an unrelated query (conservative: any
      // renaming in between also disables the rewrite)
      if vecExpr.references.nonEmpty && vecExpr.references.subsetOf(lr.outputSet)
      entry <- IvfRegistry.lookup(paths)
      query <- queryVector(queryLit)
      // dim mismatch (stale index): skip the rewrite — the exact scan is
      // correct; crashing the optimizer or probing wrong cells is not
      if entry.centers.isEmpty || entry.centers.head.length == query.length
      if entry.nProbe < entry.centers.length // full probe: no-op, stay exact
    } yield {
      val cells = IvfRegistry.probeCells(entry.centers, query, entry.nProbe)
      val cellAttr = lr.output.find(_.name == "__cell").get
      val pruned = child.transformUp {
        case l: LogicalRelation if l.eq(lr) =>
          // delta bucket always probed — appends must stay visible
          Filter(In(cellAttr,
            (cells :+ IvfRegistry.DeltaCell).map(c => Literal(c))), l)
      }
      sort.copy(child = pruned)
    }
  }

  private def queryVector(lit: Literal): Option[Array[Double]] =
    lit.value match {
      case a: ArrayData => Some(a.toFloatArray().map(_.toDouble))
      case _ => None
    }
}

/** `SparkSession.builder().withExtensions(new IvfExtensions)` — or
  * `spark.sql.extensions=graft.plans.IvfExtensions`. */
class IvfExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => IvfProbeRule())
}
