package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-suite 10× scale certification (SCALE.md "Suite-wide 10×
  * certification"): runs EVERY driver query at sf0.1 and at a
  * synthesized 10× copy of the whole star schema, and records
  * per-query minima, the large/small ratio, and a physical-plan audit
  * of the 10× run (shuffle count, broadcast joins, and — the hard
  * failure — any CartesianProduct). The point: the 100 TB claim for
  * each operator rests on a measured growth curve plus the executed
  * 10× plan, not on the hand-picked subset `CurationScaleBench` covers.
  *
  * The 10× dataset replicates each fact table `factor` times with
  * disjoint id ranges; foreign keys shift by the OWNING table's span so
  * copy i references copy i (orders.o_custkey→customer,
  * lineitem.{l_orderkey,l_partkey,l_suppkey}→orders/part/supplier) and
  * every join's key cardinality honestly scales. `region`/`nation`
  * stay 1× — they are dimensions whose broadcast-sized-forever status
  * is itself part of the design (SCALE.md "Scans & layout").
  * `documents.text` gets a per-copy suffix so the dedup tiers can't
  * collapse the copies back to 1× work; `n_chars` is recomputed to
  * keep the length invariant the quality heuristics read. `events.ts`
  * is written back as int64 nanoseconds — the layout `Tables.events`
  * expects from the driver's generator.
  *
  * Ratios are computed over per-query MINIMA (the noise-robust
  * statistic the bench artifact also carries): a contended run inflates
  * medians but almost never minima. Queries whose 10× regime is
  * superlinear BY DESIGN of their fixed-k oracle replay (q69/q73) are
  * annotated, and the deployment contract (autoK) is measured
  * alongside as `c69_semdedup_autok` so the linear-regime claim is a
  * number, not prose.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (small dir), SPARK_GRAFT_SCALE_FACTOR
  * (default 10), SPARK_GRAFT_SCALE_DIR (default /tmp/graft_sf_x{f}),
  * SPARK_GRAFT_SCALE_RUNS (timed runs per dir, default 3),
  * SPARK_GRAFT_SCALE_ONLY (comma-separated qNN prefixes to run a
  * subset while iterating). Artifacts: scale_suite.json (machine) and
  * scale_suite.md (table for SCALE.md) in the working directory.
  */
object SuiteScaleBench {

  /** factor copies with per-copy id offsets; FK columns use the owning
    * table's span so referential integrity holds within each copy. */
  private def replicate(df: DataFrame, factor: Int,
                        offsets: Map[String, Long]): DataFrame =
    (0 until factor).map { i =>
      offsets.foldLeft(df) { case (d, (c, span)) =>
        d.withColumn(c, col(c) + lit(i * span))
      }
    }.reduce(_ unionByName _)

  private def span(df: DataFrame, key: String): Long =
    df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

  def synthesize(spark: SparkSession, src: String, dst: String,
                 factor: Int): Unit = {
    val docs = Tables.documents(spark, src)
    val emb = Tables.embeddings(spark, src)
    val cust = Tables.customer(spark, src)
    val supp = Tables.supplier(spark, src)
    val part = Tables.part(spark, src)
    val ord = Tables.orders(spark, src)
    val li = Tables.lineitem(spark, src)
    val ev = Tables.events(spark, src)

    val custSpan = span(cust, "c_custkey")
    val suppSpan = span(supp, "s_suppkey")
    val partSpan = span(part, "p_partkey")
    val ordSpan = span(ord, "o_orderkey")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // dimensions stay 1× by design — see scaladoc
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(replicate(cust, factor, Map("c_custkey" -> custSpan)), "customer")
    write(replicate(supp, factor, Map("s_suppkey" -> suppSpan)), "supplier")
    write(replicate(part, factor, Map("p_partkey" -> partSpan)), "part")
    write(replicate(ord, factor,
      Map("o_orderkey" -> ordSpan, "o_custkey" -> custSpan)), "orders")
    write(replicate(li, factor, Map("l_orderkey" -> ordSpan,
      "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)), "lineitem")

    // per-copy text perturbation keeps exact/near-dup stages at honest
    // 10× work (byte-identical copies would collapse at the first
    // dedup); n_chars recomputed to preserve n_chars == length(text)
    val docSpan = span(docs, "doc_id")
    val bigDocs = (0 until factor).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text", concat(col("text"), lit(s" variant$i")))
    }.reduce(_ unionByName _).withColumn("n_chars", length(col("text")).cast("long"))
    write(bigDocs, "documents")

    write(replicate(emb, factor, Map("vec_id" -> span(emb, "vec_id"))),
      "embeddings")

    // user_id offsets so session/window key cardinality scales too;
    // ts back to the generator's int64-nanos layout (unix_micros stays
    // in long space — see Tables.events on why never through a double)
    val evBig = replicate(ev, factor, Map(
        "event_id" -> span(ev, "event_id"), "user_id" -> span(ev, "user_id")))
      .withColumn("ts", expr("unix_micros(ts)") * lit(1000L))
    write(evBig, "events")

    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dst/.complete"),
      s"factor=$factor src=$src".getBytes("UTF-8"))
  }

  /** fixed-k oracle replays whose 10× regime is superlinear by design
    * — the contract row below measures the deployment regime. */
  private val designedSuperlinear = Map(
    "q69_semdedup" -> "fixed k=10 oracle replay; contract is autoK (c69 row)",
    "q73_curation_v2" -> "contains the q69 fixed-k stage; same contract")

  /** graph-audit queries whose kNN edges come from the shared
    * build-once (corpus, k) disk artifact: the N² certification build
    * is paid once, in whichever of these runs first — the min of every
    * other row measures the deployment regime (edges read from disk). */
  private val artifactNote = "kNN edges from the shared (corpus,k) " +
    "artifact; the N^2 build lands once in whichever graph query runs first"
  private val artifactShared = Seq("q140_knn_pagerank", "q147_trustrank",
    "q148_label_propagation", "q150_knn_triangles",
    "q156_degree_assortativity", "q160_knn_label_purity",
    "q161_knn_communities").map(_ -> artifactNote).toMap

  private def planCounts(plan: String): Map[String, Int] = {
    def c(re: String) = re.r.findAllIn(plan).length
    Map(
      "shuffles" -> c("Exchange (hash|range|SinglePartition)"),
      "bcast" -> c("BroadcastExchange"),
      "smj" -> c("SortMergeJoin"),
      "bhj" -> c("BroadcastHashJoin"),
      "bnlj" -> c("BroadcastNestedLoopJoin"),
      "cartesian" -> c("CartesianProduct"))
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val big = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_sf_x$factor")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "3").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/.complete"))) {
      println(s"[scale] synthesizing ${factor}x dataset at $big ...")
      synthesize(spark, src, big, factor)
    }

    case class Row(name: String, sMin: Double, sMed: Double, lMin: Double,
                   lMed: Double, sRows: Long, lRows: Long,
                   plan: Map[String, Int], note: String) {
      def ratio: Double = lMin / sMin
      // output growth normalizes pair-enumeration queries: the 10×
      // corpus has 10 near-copies of every document, so TRUE dup-pair
      // outputs grow ~quadratically in copies — a time ratio below the
      // OUTPUT ratio is sublinear in the work actually produced
      def rowsRatio: Double = if (sRows > 0) lRows.toDouble / sRows else 1.0
    }

    def time(fn: (SparkSession, String) => DataFrame, dir: String,
             n: Int): (Vector[Double], String, Long) = {
      var planStr = ""
      var rows = 0L
      val ts = (1 to n).map { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        rows = df.count()
        val el = (System.nanoTime() - t0) / 1e9
        if (i == n)
          planStr = try df.queryExecution.executedPlan.toString
                    catch { case _: Throwable => "" }
        graft.util.Materialize.releaseAll(spark)
        el
      }.toVector.sorted
      (ts, planStr, rows)
    }

    val contractRows: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      // the SemDeDup deployment contract measured as a query: k scales
      // with n (target cluster size fixed) so the pair join stays
      // O(n·target) — the linear-regime companion to q69/q73's fixed-k
      "c69_semdedup_autok" -> ((s: SparkSession, d: String) =>
        graft.operators.SemDedup.semDedupAutoK(
          Tables.embeddings(s, d), "vec_id", "embedding",
          targetClusterSize = 200L, threshold = 0.3)))

    val all: Seq[(String, (SparkSession, String) => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1) ++ contractRows
    val picked = only.fold(all) { sel =>
      all.filter { case (n, _) => sel.exists(n.startsWith) } }

    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val rows = picked.flatMap { case (name, fn) =>
      try {
        time(fn, src, 1) // warmup: codegen, model/index/warehouse builds
        val (s, _, sRows) = time(fn, src, runs)
        time(fn, big, 1)
        val (l, plan, lRows) = time(fn, big, runs)
        val pc = planCounts(plan)
        val note = designedSuperlinear.getOrElse(name,
          artifactShared.getOrElse(name, ""))
        val r = Row(name, s.head, s(s.length / 2), l.head, l(l.length / 2),
          sRows, lRows, pc, note)
        println(f"${r.name}%-26s 1x ${r.sMin}%6.2fs  ${factor}x ${r.lMin}%6.2fs  " +
          f"ratio ${r.ratio}%6.2fx  rows ${sRows}%d->${lRows}%d  " +
          f"shuffles=${pc("shuffles")}%d bhj=${pc("bhj")}%d " +
          f"smj=${pc("smj")}%d bnlj=${pc("bnlj")}%d cart=${pc("cartesian")}%d" +
          (if (note.nonEmpty) s"  [$note]" else ""))
        Some(r)
      } catch {
        case e: Throwable =>
          failed += (name -> String.valueOf(e.getMessage).take(200))
          System.err.println(s"[scale] $name FAILED: ${e.getMessage}")
          None
      }
    }

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val json = rows.map { r =>
      s""""${r.name}":{"small":${f2(r.sMin)},"large":${f2(r.lMin)},""" +
      s""""ratio":${f2(r.ratio)},"smallMed":${f2(r.sMed)},"largeMed":${f2(r.lMed)},""" +
      s""""smallRows":${r.sRows},"largeRows":${r.lRows},"rowsRatio":${f2(r.rowsRatio)},""" +
      s""""shuffles":${r.plan("shuffles")},"bhj":${r.plan("bhj")},"smj":${r.plan("smj")},""" +
      s""""bnlj":${r.plan("bnlj")},"cartesian":${r.plan("cartesian")}}"""
    }.mkString("{", ",", "}")
    // full JSON string escaping: analysis-exception messages carry
    // newlines, backslashes (regexes, paths), and control chars
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val failedJson = failed.map { case (n, m) =>
      s""""$n":"${esc(m)}"""" }.mkString("{", ",", "}")
    val cart = rows.filter(_.plan("cartesian") > 0).map(_.name)
    val out =
      s"""{"factor":$factor,"runs":$runs,"queries":$json,"failed":$failedJson,""" +
      s""""cartesian_products":${cart.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""small":"$src","large":"$big"}"""
    // subset runs (SCALE_ONLY) must not clobber the full-suite
    // artifact of record — they land in *_partial files
    val suffix = if (only.isDefined) "_partial" else ""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"scale_suite$suffix.json"),
      out.getBytes("UTF-8"))

    val md = new StringBuilder
    md ++= s"| query | 1× min (s) | ${factor}× min (s) | time ratio | output ratio | shuffles | bhj | smj | bnlj | note |\n"
    md ++= "|---|---|---|---|---|---|---|---|---|---|\n"
    rows.foreach { r =>
      md ++= s"| ${r.name} | ${f2(r.sMin)} | ${f2(r.lMin)} | ${f2(r.ratio)}× | " +
        s"${f2(r.rowsRatio)}× | " +
        s"${r.plan("shuffles")} | ${r.plan("bhj")} | ${r.plan("smj")} | " +
        s"${r.plan("bnlj")} | ${r.note} |\n"
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"scale_suite$suffix.md"),
      md.toString.getBytes("UTF-8"))

    println(s"[scale] ${rows.size} queries, ${failed.size} failed, " +
      s"cartesian=${cart.mkString(",")}")
    spark.stop()
    if (failed.nonEmpty || cart.nonEmpty) sys.exit(1)
  }
}
