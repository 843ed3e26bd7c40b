package graft.tools

import graft.Tables
import graft.operators.BpeTraining
import org.apache.spark.sql.SparkSession

/** SCALE.md evidence: batched BPE training to a real merge budget on the
  * documents corpus — wall-clock per merge count, plus job-count shape
  * (rounds × 3 jobs vs sequential's merges × 2). */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    var t0 = System.nanoTime()
    val seq40 = BpeTraining.train(docs, "text", 40)
    val tSeq40 = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val bat40 = BpeTraining.trainBatched(docs, "text", 40)
    val tBat40 = (System.nanoTime() - t0) / 1e9
    println(f"40 merges: sequential $tSeq40%.1fs, batched $tBat40%.1fs, equal=${seq40 == bat40}")

    t0 = System.nanoTime()
    val batN = BpeTraining.trainBatched(docs, "text", merges)
    val tBatN = (System.nanoTime() - t0) / 1e9
    println(f"$merges merges batched: $tBatN%.1fs (${batN.size} trained, " +
      f"${tBatN / math.max(batN.size, 1) * 1000}%.0f ms/merge)")

    t0 = System.nanoTime()
    val autoN = BpeTraining.trainAuto(docs, "text", merges)
    val tAuto = (System.nanoTime() - t0) / 1e9
    println(f"$merges merges auto(local): $tAuto%.1fs, equal=${autoN == batN}")

    // batch-size profile on a Zipf-DIVERSE corpus (the spec's synthetic
    // generator): how wide do non-interacting prefixes actually get?
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrst"
    val vocabWords = (0 until 1500).map { _ =>
      (0 until (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(20))).mkString
    }
    val texts = (0 until 300).map { _ =>
      (0 until 40).map { _ =>
        vocabWords((math.pow(rnd.nextDouble(), 2.0) * vocabWords.size).toInt
          .min(vocabWords.size - 1))
      }.mkString(" ")
    }
    val divDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var truncs = 0
    t0 = System.nanoTime()
    val div = BpeTraining.trainBatched(divDf, "text", 1000, 2,
      onRound = (b, tr) => { sizes += b; if (tr) truncs += 1 })
    println(f"diverse corpus: ${div.size} merges in ${sizes.size} rounds " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1fs), mean batch " +
      f"${sizes.sum.toDouble / sizes.size}%.1f, max ${sizes.max}, " +
      f"preemption truncations $truncs")
    spark.stop()
  }
}
