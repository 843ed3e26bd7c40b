package graft.operators

import graft.util.Materialize.MatOps
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded HNSW serving (round 16, VERDICT r15 #7): per-IVF-cell HNSW
  * subgraphs so the graph-ANN tier stops being bounded by one JVM's
  * memory — the scale path [[Hnsw]]'s own scale-envelope note defers
  * to.
  *
  * Build: a seeded k-means partitions the corpus into `nCells` cells
  * (the [[IvfIndex]] coarse quantizer — same centers, same
  * assignment tie-break as [[GraphRank.knnGraphIvf]]); each cell's
  * members build their OWN deterministic HNSW subgraph in a
  * distributed `mapGroups` — no vector ever reaches the driver, and
  * the per-executor memory bound is its largest shard: `maxCellSize`
  * caps it (oversized cells sub-shard by the splitmix64
  * [[GraphRank.subKey]]; a probe of a split cell searches ALL its
  * sub-shards, so splitting costs work, never recall). Shards persist
  * as one binary-blob row per (cell, sub) — a plain parquet table,
  * exportable like every warehouse artifact.
  *
  * The sub-shard fan per cell FREEZES at build time and travels in the
  * [[Shards]] handle (and the persisted meta table) — never inferred
  * from per-cell row counts, which undercount when splitmix64 leaves a
  * (cell, sub) key unpopulated (ADVICE r16: a count-inferred fan made
  * the populated high-numbered sub unreachable and silently dropped
  * inserts routed to the empty one). Insert fills a routed-to key that
  * has no blob row with a fresh subgraph instead of dropping it.
  *
  * Serve: queries rank the BROADCAST centroid table in-plan and
  * SHUFFLE to their `nProbe` nearest shards (a cogroup — the shard
  * table never broadcasts, executors answer for the shards they
  * hold); each shard answers with the same in-memory pointer-chasing
  * as [[Hnsw.searchKnn]] (same beam, same (dist asc, id asc)
  * tie-break), and a per-query window over the ≤ k·nProbe·subs
  * survivors finishes. `nProbe = nCells` searches every shard — the
  * full-coverage mode whose recall the spec pins against the
  * monolithic graph and the exact scan.
  *
  * Persistence (round 17, VERDICT r16 #1): [[save]] lands the blob
  * table as a parquet table PARTITIONED BY `__cell` plus a meta table
  * (frozen centers, per-cell fan, build params); [[insertPersisted]]
  * maintains it with TRUE O(touched) I/O — only the cell leaves the
  * batch routes to are read or rewritten, each through the per-leaf
  * rename + swap discipline (`TableSwap.rewriteVia`, scratch OUTSIDE
  * the table root so crash leftovers never enter partition
  * discovery); untouched leaves are not even listed. Torn swaps are
  * healed by [[repairLeaves]] (wired into `Library.repair`).
  *
  * Output contract ≡ [[Hnsw.searchKnnBatch]]: (qid, rn, id, cos_dist),
  * rn 1..k by (dist asc, id asc). */
object ShardedHnsw {

  /** Handle: the shard table (cell, sub, graph-bytes), the frozen
    * centers, the frozen per-cell sub-shard fan (`subsOf`; cells
    * absent from the map have fan 1), and the build parameters
    * (needed to interpret blobs). */
  final class Shards(val table: DataFrame,
                     val centers: Array[Array[Double]],
                     val m: Int, val efConstruction: Int,
                     val seed: Long,
                     val subsOf: Map[Int, Int]) extends Serializable

  private[operators] def serialize(g: Hnsw.Graph): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(g); oos.close()
    bos.toByteArray
  }

  private[operators] def deserialize(bytes: Array[Byte]): Hnsw.Graph = {
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val g = ois.readObject().asInstanceOf[Hnsw.Graph]
    ois.close(); g
  }

  /** Distributed shard build. One k-means fit (centroids are the only
    * driver-adjacent structure, √N-sized by convention) + one grouped
    * pass building each (cell, sub)'s subgraph where its rows live. */
  def build(df: DataFrame, idCol: String, vecCol: String, nCells: Int,
            m: Int = 16, efConstruction: Int = 100, seed: Long = 42L,
            maxCellSize: Int = 65536): Shards = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    val n = typed.count()
    require(nCells >= 1 && nCells <= n,
      s"need 1 <= nCells <= corpus size, got nCells=$nCells n=$n")
    val centers = GraphRank.ivfCenters(typed, nCells, seed)
    val centersDf = spark.createDataFrame(
      centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
      .toDF("__cell", "__center")
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(asc("__cdist"), asc("__cell"))
    val assigned = typed
      .crossJoin(broadcast(centersDf))
      .withColumn("__cdist", graft.functions.VectorFunctions.sqDist(
        col("__v").cast("array<double>"), col("__center")))
      .withColumn("__crn", row_number().over(probeW))
      .filter(col("__crn") === 1)
      .select(col("__cell"), col("id"), col("__v"))
      .materializeOnce(eager = false) // sizes + the grouped build
    val splits: Map[Int, Int] =
      if (maxCellSize <= 0) Map.empty
      else assigned.groupBy("__cell").count().collect()
        .map(r => r.getInt(0) ->
          ((r.getLong(1) + maxCellSize - 1) / maxCellSize).toInt)
        .filter(_._2 > 1).toMap
    val table = assigned.as[(Int, Long, Array[Float])]
      .groupByKey { case (cell, id, _) =>
        (cell, GraphRank.subKey(id, splits.getOrElse(cell, 1))) }
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Long, Array[Float])]) =>
        val rows = it.map { case (_, id, v) => (id, v) }.toSeq
        (key._1, key._2,
          serialize(Hnsw.build(rows, m, efConstruction, seed)))
      }
      .toDF("__cell", "__sub", "__graph")
      .materializeOnce(eager = false)
    new Shards(table, centers, m, efConstruction, seed, splits)
  }

  // ------------------------------------------------------------ maintenance

  private def cellOf(centers: Array[Array[Double]],
                     v: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c); var s = 0.0; var d = 0
      while (d < ctr.length) {
        val diff = v(d).toDouble - ctr(d); s += diff * diff; d += 1
      }
      if (s < bestD) { bestD = s; best = c } // ties keep the lower cell
      c += 1
    }
    best
  }

  /** Route `batch` by the frozen clustering + frozen fan: the same
    * squared-distance fold and low-cell tie-break as the build. */
  private def routeBatch(centers: Array[Array[Double]],
                         subsOf: Map[Int, Int],
                         batch: Seq[(Long, Array[Float])])
      : Map[(Int, Int), Seq[(Long, Array[Float])]] =
    batch.groupBy { case (id, v) =>
      val cell = cellOf(centers, v)
      (cell, GraphRank.subKey(id, subsOf.getOrElse(cell, 1)))
    }.map { case (k, rows) => k -> rows.sortBy(_._1).toSeq }

  /** Ingest-time maintenance (the [[Hnsw.insert]] contract, sharded):
    * the batch assigns to the FROZEN centers and routes by the FROZEN
    * per-cell fan, and only the touched (cell, sub) shards rewrite —
    * each deserializes, [[Hnsw.insert]]s its new members,
    * re-serializes; untouched blob rows pass through unchanged. A
    * routed-to key with no blob row (an empty sub, or a cell the
    * build left without members) gets a fresh subgraph — no row is
    * ever dropped. An inserted shard grows past the cap the way the
    * monolithic ingest hook's graph does (re-shard = rebuild, the
    * same re-train-by-delete contract as the IVF edge artifact). The
    * batch is ingest-batch-sized by contract (it broadcasts).
    *
    * NOTE this in-memory path re-materializes the whole table frame
    * per insert; the warehouse tier uses [[insertPersisted]], whose
    * I/O is bounded by the TOUCHED cell partitions. */
  def insert(sh: Shards, batch: Seq[(Long, Array[Float])]): Shards = {
    if (batch.isEmpty) return sh
    val spark = sh.table.sparkSession
    import spark.implicits._
    val byKey = routeBatch(sh.centers, sh.subsOf, batch)
    val bc = spark.sparkContext.broadcast(byKey)
    val m = sh.m; val efC = sh.efConstruction; val seed = sh.seed
    val updated = sh.table.as[(Int, Int, Array[Byte])]
      .map { case (cell, sub, bytes) =>
        bc.value.get((cell, sub)) match {
          case None => (cell, sub, bytes)
          case Some(rows) =>
            (cell, sub,
              serialize(Hnsw.insert(deserialize(bytes), rows)))
        }
      }.toDF("__cell", "__sub", "__graph")
    // routed-to keys with no blob row build fresh — cells×subs-sized
    // metadata collect, never the blobs
    val present = sh.table.select("__cell", "__sub").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val missing = byKey.keys.filterNot(present).toSeq
    val table2 =
      if (missing.isEmpty) updated
      else updated.union(
        spark.createDataFrame(missing.map { case (cell, sub) =>
          (cell, sub, serialize(Hnsw.build(byKey((cell, sub)), m, efC,
            seed)))
        }).toDF("__cell", "__sub", "__graph"))
    new Shards(table2.materializeOnce(eager = false), sh.centers,
      m, efC, seed, sh.subsOf)
  }

  /** Batch search over the shards: queries shuffle to their probed
    * (cell, sub) shards, each shard deserializes ONCE per task and
    * answers its cogroup's queries in-memory. The sub-shard fan-out is
    * the handle's FROZEN fan — a probe of a split cell fans over every
    * sub the build could have populated (probing an empty one costs a
    * no-op cogroup bucket, never recall). */
  def searchBatch(sh: Shards, queries: DataFrame, qidCol: String,
                  qvecCol: String, k: Int, nProbe: Int,
                  ef: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val nCells = sh.centers.length
    require(nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells, got nProbe=$nProbe nCells=$nCells")
    val centersDf = spark.createDataFrame(
      sh.centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
      .toDF("__cell", "__center")
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(asc("__cdist"), asc("__cell"))
    val subsOf = sh.subsOf
    val probes = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("__qv"))
      .crossJoin(broadcast(centersDf))
      .withColumn("__cdist", graft.functions.VectorFunctions.sqDist(
        col("__qv").cast("array<double>"), col("__center")))
      .withColumn("__crn", row_number().over(probeW))
      .filter(col("__crn") <= nProbe)
      .select(col("__cell"), col("qid"), col("__qv"))
      .as[(Int, Long, Array[Float])]
      .flatMap { case (cell, qid, qv) =>
        (0 until subsOf.getOrElse(cell, 1)).map(sub =>
          (cell, sub, qid, qv)) }
    val shardKV = sh.table.as[(Int, Int, Array[Byte])]
    val local = probes.groupByKey(r => (r._1, r._2))
      .cogroup(shardKV.groupByKey(r => (r._1, r._2))) { case (_, qs, gs) =>
        gs.toSeq.headOption match {
          case None => Iterator.empty
          case Some((_, _, bytes)) =>
            val g = deserialize(bytes)
            qs.flatMap { case (_, _, qid, qv) =>
              Hnsw.searchKnn(g, qv, k, ef).iterator.map {
                case (id, d) => (qid, id, d) }
            }
        }
      }.toDF("qid", "id", "cos_dist")
    // per-query survivors are ≤ k·nProbe·subs — window-safe volume
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(asc("cos_dist"), asc("id"))
    local.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("id"), col("cos_dist"))
  }

  // ------------------------------------------------------------ persistence

  private def metaDf(spark: SparkSession, sh: Shards): DataFrame = {
    import spark.implicits._
    sh.centers.zipWithIndex.toSeq.map { case (c, i) =>
      (i, c.toSeq, sh.subsOf.getOrElse(i, 1), sh.m, sh.efConstruction,
        sh.seed)
    }.toDF("__cell", "__center", "__nsplit", "m", "efc", "seed")
  }

  /** Persist the tier: the blob table partitioned by `__cell` (so
    * maintenance can rewrite single leaves) + the meta table (frozen
    * centers, frozen fan, build params). Whole-table swaps — the
    * initial build rewrites everything anyway. */
  def save(sh: Shards, shardsPath: String, metaPath: String): Unit = {
    graft.util.TableSwap.rewrite(shardsPath, sh.table,
      partitionBy = Seq("__cell"))
    graft.util.TableSwap.rewrite(metaPath,
      metaDf(sh.table.sparkSession, sh))
  }

  private def parseMeta(rows: Array[org.apache.spark.sql.Row])
      : (Array[Array[Double]], Map[Int, Int], Int, Int, Long) = {
    val centers = rows.map(r => r.getInt(0) ->
      r.getSeq[Double](1).toArray).sortBy(_._1).map(_._2)
    val subsOf = rows.map(r => r.getInt(0) -> r.getInt(2))
      .filter(_._2 > 1).toMap
    val h = rows.head
    (centers, subsOf, h.getInt(3), h.getInt(4), h.getLong(5))
  }

  private def readMeta(spark: SparkSession, metaPath: String)
      : (Array[Array[Double]], Map[Int, Int], Int, Int, Long) =
    parseMeta(spark.read.parquet(metaPath).collect())

  /** The handle's meta table as a frame — the persisted companion form
    * the stamp-keyed artifact store uses (`GraphRank`'s hnsw-sharded
    * edge maintenance); column contract ≡ the warehouse meta table. */
  private[graft] def metaFrame(sh: Shards): DataFrame =
    metaDf(sh.table.sparkSession, sh)

  /** Rebuild a handle from persisted frames — the inverse of
    * persisting `sh.table` + [[metaFrame]]; the select pins the
    * canonical column order regardless of how the store laid it out. */
  private[graft] def fromFrames(table: DataFrame, meta: DataFrame)
      : Shards = {
    val (centers, subsOf, m, efc, seed) = parseMeta(meta.collect())
    new Shards(table.select("__cell", "__sub", "__graph"),
      centers, m, efc, seed, subsOf)
  }

  /** Reload the persisted tier. The blob table reads lazily — a reload
    * costs one meta read until a search actually probes shards. */
  def load(spark: SparkSession, shardsPath: String,
           metaPath: String): Shards = {
    val (centers, subsOf, m, efc, seed) = readMeta(spark, metaPath)
    // hive partition discovery appends __cell LAST; restore the
    // canonical order the tuple-typed readers bind positionally
    new Shards(
      spark.read.parquet(shardsPath).select("__cell", "__sub", "__graph"),
      centers, m, efc, seed, subsOf)
  }

  private def leafPath(shardsPath: String, cell: Int): String =
    s"$shardsPath/__cell=$cell"

  /** Move-aside sibling for a single-leaf swap — OUTSIDE the table
    * root, so a crash leftover never enters partition discovery; the
    * name matches the `embeddings_ivf_cell<N>_old` convention
    * `Library`'s crash sweep already recognizes. (The matching
    * `_cell<N>_tmp` name is LEGACY: the round-17 per-leaf rewriteVia
    * wrote it, the current one-job writers never do — [[repairLeaves]]
    * keeps sweeping it for warehouses that crashed under that form.) */
  private def leafOld(shardsPath: String, cell: Int): String =
    s"${shardsPath}_cell${cell}_old"

  /** O(touched) ingest maintenance of the PERSISTED tier (VERDICT r16
    * #1): route the batch by the frozen clustering + fan, read ONLY
    * the touched cell partition leaves (per-leaf paths — untouched
    * leaves are neither listed, read, nor rewritten; the maintenance
    * I/O is bounded by the touched partitions, not the index), update
    * the routed-to blobs ([[Hnsw.insert]]; blobs of other subs in the
    * same leaf pass through as bytes, never deserialized), land every
    * rewritten leaf in ONE write job into scratch OUTSIDE the table
    * root, then swap each touched leaf in via the per-leaf rename
    * discipline. One job instead of two per touched leaf — a
    * 1000-chunk batch costs 2 jobs, not ~2000 (round-17 bench: the
    * per-leaf-job form was 3.6x slower than a FULL rewrite at 20k
    * vectors purely on job overhead). A routed-to (cell, sub) with no
    * blob row gets a fresh subgraph row in its leaf. Crash-safe: a
    * torn swap leaves the original leaf recoverable in `_old` and
    * stranded scratch sweeps ([[repairLeaves]]); a retry of the whole
    * batch is idempotent ([[Hnsw.insert]] skips ids the subgraph
    * already holds). */
  def insertPersisted(spark: SparkSession, shardsPath: String,
                      metaPath: String,
                      batch: Seq[(Long, Array[Float])]): Unit = {
    if (batch.isEmpty) return
    import spark.implicits._
    val (centers, subsOf, m, efc, seed) = readMeta(spark, metaPath)
    val byKey = routeBatch(centers, subsOf, batch)
    val fs = graft.util.TableSwap.fileSystem(spark, shardsPath)
    val touched: Seq[Int] = byKey.keys.map(_._1).toSeq.distinct.sorted
    val liveLeaves = touched.filter(c =>
      fs.exists(new HPath(leafPath(shardsPath, c))))
    val existing = liveLeaves.map { cell =>
        spark.read.parquet(leafPath(shardsPath, cell))
          .select(lit(cell).as("__cell"), col("__sub"), col("__graph"))
      }.reduceOption(_ unionByName _)
    val present: Set[(Int, Int)] = existing.map(
        _.select("__cell", "__sub").as[(Int, Int)].collect().toSet)
      .getOrElse(Set.empty)
    val bc = spark.sparkContext.broadcast(byKey)
    val updated = existing.map(_.as[(Int, Int, Array[Byte])].map {
      case (cell, sub, bytes) =>
        bc.value.get((cell, sub)) match {
          case None => (cell, sub, bytes)
          case Some(rows) =>
            (cell, sub, serialize(Hnsw.insert(deserialize(bytes), rows)))
        }
    }.toDF("__cell", "__sub", "__graph"))
    val freshKeys = byKey.keys.filterNot(present).toSeq.sorted
    val freshDf =
      if (freshKeys.isEmpty) None
      else Some(spark.createDataFrame(freshKeys.map { case (cell, sub) =>
        (cell, sub, serialize(Hnsw.build(byKey((cell, sub)), m, efc, seed)))
      }).toDF("__cell", "__sub", "__graph"))
    val next = (updated.toSeq ++ freshDf.toSeq).reduce(_ unionByName _)
    val scratch = batchScratch(shardsPath)
    graft.util.TableSwap.delete(fs, new HPath(scratch))
    next.write.partitionBy("__cell").parquet(scratch)
    touched.foreach { cell =>
      val live = new HPath(leafPath(shardsPath, cell))
      val old = new HPath(leafOld(shardsPath, cell))
      val from = new HPath(s"$scratch/__cell=$cell")
      if (!fs.exists(from))
        throw new IllegalStateException(s"no scratch leaf for cell $cell")
      if (fs.exists(live) && !fs.rename(live, old))
        throw new java.io.IOException(s"swap failed moving aside $live")
      if (!fs.rename(from, live))
        throw new java.io.IOException(s"swap failed installing $live")
      graft.util.TableSwap.delete(fs, old)
    }
    graft.util.TableSwap.delete(fs, new HPath(scratch))
  }

  /** Scratch root for the one-job batch write — OUTSIDE the table
    * root, so a crash leftover never enters partition discovery. */
  private def batchScratch(shardsPath: String): String =
    s"${shardsPath}_batch_tmp"

  /** Physically retire deleted members from the PERSISTED tier.
    * Serving already tolerates deletes (dead ids drop at the caller's
    * live join), so this is the COMPACTION path — without it, deleted
    * vectors accumulate in the blobs forever. A dead id's location is
    * unknown (routing needs its vector, which is gone from the
    * embeddings table), so one pass READS every blob to find the
    * touched cells — but only the touched leaves REWRITE: each
    * affected subgraph rebuilds from its surviving members (the blob
    * itself holds their vectors — nothing is needed from outside the
    * tier), untouched subs of a touched leaf pass through as bytes, a
    * fully-dead sub drops its row, and a fully-dead LEAF deletes (the
    * frozen fan keeps its key probe-able — an absent row is a no-op
    * cogroup bucket). Same one-write-job + per-leaf swap discipline
    * as [[insertPersisted]]; idempotent (a retry finds no dead ids in
    * the already-compacted leaves). */
  def compactPersisted(spark: SparkSession, shardsPath: String,
                       metaPath: String, deadIds: Set[Long]): Unit = {
    if (deadIds.isEmpty) return
    import spark.implicits._
    val fs = graft.util.TableSwap.fileSystem(spark, shardsPath)
    if (!fs.exists(new HPath(shardsPath))) return
    val bc = spark.sparkContext.broadcast(deadIds)
    val table = spark.read.parquet(shardsPath)
      .select("__cell", "__sub", "__graph")
    // pass 1: which cells hold dead members (ids only — cells×subs rows)
    val touched = table.as[(Int, Int, Array[Byte])].flatMap {
      case (cell, _, bytes) =>
        if (deserialize(bytes).ids.exists(bc.value)) Iterator.single(cell)
        else Iterator.empty
    }.distinct().collect().sorted.toSeq
    compactLeaves(spark, shardsPath, metaPath, deadIds, touched)
  }

  /** [[compactPersisted]] for callers that still HOLD the dead
    * members' vectors (e.g. `Library.compactTombstones`, which
    * captures them before the embeddings rewrite): the touched cells
    * come from ROUTING the vectors through the frozen clustering —
    * the same assignment insert used — so the whole-index discovery
    * scan is skipped and the compaction is O(touched leaves) like
    * insert. A dead id whose vector the caller no longer has must go
    * through the scanning overload instead. */
  def compactPersisted(spark: SparkSession, shardsPath: String,
                       metaPath: String,
                       dead: Seq[(Long, Array[Float])]): Unit = {
    if (dead.isEmpty) return
    val fs = graft.util.TableSwap.fileSystem(spark, shardsPath)
    if (!fs.exists(new HPath(shardsPath))) return
    val (centers, _, _, _, _) = readMeta(spark, metaPath)
    val touched = dead.map { case (_, v) => cellOf(centers, v) }
      .distinct.sorted
      .filter(c => fs.exists(new HPath(leafPath(shardsPath, c))))
    compactLeaves(spark, shardsPath, metaPath,
      dead.map(_._1).toSet, touched)
  }

  /** Shared tail of both compaction overloads: rewrite ONLY `touched`
    * leaves (per-leaf paths — untouched leaves are not re-read),
    * rebuilding each affected subgraph from its surviving members'
    * vectors (held in the blob itself), passing clean subs through as
    * bytes, dropping fully-dead subs, deleting fully-dead leaves.
    * Same one-write-job + per-leaf swap discipline as
    * [[insertPersisted]]. */
  private def compactLeaves(spark: SparkSession, shardsPath: String,
                            metaPath: String, deadIds: Set[Long],
                            touched: Seq[Int]): Unit = {
    if (touched.isEmpty) return
    import spark.implicits._
    val fs = graft.util.TableSwap.fileSystem(spark, shardsPath)
    val (_, _, m, efc, seed) = readMeta(spark, metaPath)
    val bc = spark.sparkContext.broadcast(deadIds)
    val next = touched.map { cell =>
        spark.read.parquet(leafPath(shardsPath, cell))
          .select(lit(cell).as("__cell"), col("__sub"), col("__graph"))
      }.reduce(_ unionByName _)
      .as[(Int, Int, Array[Byte])].flatMap { case (cell, sub, bytes) =>
        val g = deserialize(bytes)
        val dead = bc.value
        if (!g.ids.exists(dead)) Iterator.single((cell, sub, bytes))
        else {
          val survivors = g.ids.zip(g.vecs)
            .filterNot { case (id, _) => dead(id) }.toSeq
          if (survivors.isEmpty) Iterator.empty // fully-dead sub: drop
          else Iterator.single(
            (cell, sub, serialize(Hnsw.build(survivors, m, efc, seed))))
        }
      }.toDF("__cell", "__sub", "__graph")
    val scratch = batchScratch(shardsPath)
    graft.util.TableSwap.delete(fs, new HPath(scratch))
    next.write.partitionBy("__cell").parquet(scratch)
    touched.foreach { cell =>
      val live = new HPath(leafPath(shardsPath, cell))
      val old = new HPath(leafOld(shardsPath, cell))
      val from = new HPath(s"$scratch/__cell=$cell")
      if (fs.exists(live) && !fs.rename(live, old))
        throw new java.io.IOException(s"swap failed moving aside $live")
      // a fully-dead leaf has no scratch output — the move-aside IS
      // the delete
      if (fs.exists(from) && !fs.rename(from, live))
        throw new java.io.IOException(s"swap failed installing $live")
      graft.util.TableSwap.delete(fs, old)
    }
    graft.util.TableSwap.delete(fs, new HPath(scratch))
  }

  /** Heal torn single-leaf swaps: any `<shards>_cell<N>_old` whose
    * live leaf is missing renames back (the swap died between
    * move-aside and install); every scratch sibling — per-leaf
    * `_cell<N>_(tmp|old)` and the one-job batch write's `_batch_tmp`
    * root — then clears. Idempotent; wired into `Library.repair`'s
    * crash sweep. */
  def repairLeaves(spark: SparkSession, shardsPath: String): Unit = {
    val fs = graft.util.TableSwap.fileSystem(spark, shardsPath)
    val root = new HPath(shardsPath)
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) return
    val name = root.getName
    val Scratch = (java.util.regex.Pattern.quote(name) +
      "_cell(-?\\d+)_(tmp|old)").r
    val scratch = fs.listStatus(parent).map(_.getPath)
      .filter(p => Scratch.pattern.matcher(p.getName).matches())
    scratch.filter(_.getName.endsWith("_old")).foreach { old =>
      val cell = Scratch.findFirstMatchIn(old.getName).get.group(1)
      val live = new HPath(leafPath(shardsPath, cell.toInt))
      if (!fs.exists(live) && !fs.rename(old, live))
        throw new java.io.IOException(
          s"crash recovery failed restoring $live")
    }
    scratch.foreach(graft.util.TableSwap.delete(fs, _))
    graft.util.TableSwap.delete(fs, new HPath(batchScratch(shardsPath)))
  }
}
