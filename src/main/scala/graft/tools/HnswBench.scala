package graft.tools

import graft.operators.Hnsw
import org.apache.spark.sql.SparkSession

object HnswBenchMath {
  def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 1.0 else 1.0 - dot / d
  }
}

/** SCALE.md evidence: HNSW single-query latency + recall vs brute force
  * on the testdata embeddings — the serving-regime numbers next to
  * BASELINE.md's DiskANN figures. */
object HnswBench {
  import HnswBenchMath.cosDist
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    var t0 = System.nanoTime()
    val g = Hnsw.build(vecs.toSeq, m = 16, efConstruction = 100)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2fs over ${vecs.length} vectors, dim ${vecs.head._2.length}")

    def brute(q: Array[Float], k: Int) =
      vecs.map { case (id, v) => (id, cosDist(v, q)) }
        .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet

    val queries = vecs.indices.by(math.max(vecs.length / 200, 1)).take(200)
      .map(i => vecs(i)._2)
    for (ef <- Seq(32, 64, 128)) {
      // warm
      queries.take(20).foreach(q => Hnsw.searchKnn(g, q, 10, ef))
      t0 = System.nanoTime()
      val res = queries.map(q => Hnsw.searchKnn(g, q, 10, ef).map(_._1).toSet)
      val perQ = (System.nanoTime() - t0) / 1e3 / queries.length
      val recall = queries.zip(res)
        .map { case (q, got) => (brute(q, 10) & got).size.toDouble / 10.0 }
        .sum / queries.length
      println(f"ef=$ef%3d: ${perQ}%.0f us/query, recall@10 = $recall%.4f")
    }
    t0 = System.nanoTime()
    queries.foreach(q => brute(q, 10))
    println(f"brute driver-side: ${(System.nanoTime() - t0) / 1e3 / queries.length}%.0f us/query")
    spark.stop()
  }
}
