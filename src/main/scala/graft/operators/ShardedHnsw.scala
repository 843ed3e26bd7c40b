package graft.operators

import graft.util.Materialize.MatOps
import org.apache.spark.sql.{DataFrame, Dataset}
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
  * Output contract ≡ [[Hnsw.searchKnnBatch]]: (qid, rn, id, cos_dist),
  * rn 1..k by (dist asc, id asc). */
object ShardedHnsw {

  /** Handle: the shard table (cell, sub, graph-bytes), the frozen
    * centers, and the build parameters (needed to interpret blobs). */
  final class Shards(val table: DataFrame,
                     val centers: Array[Array[Double]],
                     val m: Int, val efConstruction: Int,
                     val seed: Long) extends Serializable

  private def serialize(g: Hnsw.Graph): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(g); oos.close()
    bos.toByteArray
  }

  private def deserialize(bytes: Array[Byte]): Hnsw.Graph = {
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
    new Shards(table, centers, m, efConstruction, seed)
  }

  /** Ingest-time maintenance (the [[Hnsw.insert]] contract, sharded):
    * the batch assigns to the FROZEN centers (same squared-distance
    * fold and low-cell tie-break as the build), and only the touched
    * (cell, sub) shards rewrite — each deserializes, [[Hnsw.insert]]s
    * its new members, re-serializes; untouched blob rows pass through
    * unchanged, so the maintenance job is O(touched shards), not a
    * rebuild. The sub-shard fan is frozen at build time: an inserted
    * shard grows past the cap the way the monolithic ingest hook's
    * graph does (re-shard = rebuild, the same re-train-by-delete
    * contract as the IVF edge artifact). The batch is
    * ingest-batch-sized by contract (it broadcasts). */
  def insert(sh: Shards, batch: Seq[(Long, Array[Float])]): Shards = {
    if (batch.isEmpty) return sh
    val spark = sh.table.sparkSession
    import spark.implicits._
    val nCells = sh.centers.length
    def cellOf(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < nCells) {
        val ctr = sh.centers(c); var s = 0.0; var d = 0
        while (d < ctr.length) {
          val diff = v(d).toDouble - ctr(d); s += diff * diff; d += 1
        }
        if (s < bestD) { bestD = s; best = c } // ties keep the lower cell
        c += 1
      }
      best
    }
    val subsOf: Map[Int, Int] = sh.table.groupBy("__cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
    val byKey: Map[(Int, Int), Seq[(Long, Array[Float])]] = batch
      .groupBy { case (id, v) =>
        val cell = cellOf(v)
        (cell, GraphRank.subKey(id, subsOf.getOrElse(cell, 1)))
      }.map { case (k, rows) => k -> rows.sortBy(_._1).toSeq }
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
    // a batch member landing in a cell the build left without a shard
    // row (possible only on degenerate layouts) gets a fresh subgraph
    val missing = byKey.keys.filterNot(k => subsOf.contains(k._1)).toSeq
    val table2 =
      if (missing.isEmpty) updated
      else updated.union(
        spark.createDataFrame(missing.map { case (cell, sub) =>
          (cell, sub, serialize(Hnsw.build(byKey((cell, sub)), m, efC,
            seed)))
        }).toDF("__cell", "__sub", "__graph"))
    new Shards(table2.materializeOnce(eager = false), sh.centers,
      m, efC, seed)
  }

  /** Batch search over the shards: queries shuffle to their probed
    * (cell, sub) shards, each shard deserializes ONCE per task and
    * answers its cogroup's queries in-memory. */
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
    // sub-shard fan-out reads off the shard table itself (one tiny
    // metadata collect — cells × subs rows)
    val subsOf: Map[Int, Int] = sh.table.groupBy("__cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
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
}
