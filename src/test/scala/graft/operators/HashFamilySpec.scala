package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The md5/xxh64 hash-family toggle: md5 stays the oracle-certified
  * mode; xxh64 is the production mode and must be a drop-in — same
  * output range, same verdicts at the dedup threshold (the verify join
  * re-checks exact Jaccard, so the family only steers candidate
  * recall), same DSIR contract. */
class HashFamilySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("fastHash32 lands in the unsigned 32-bit range; dispatch rejects unknown families") {
    val vals = Seq("", "a", "hello world", "é中文").toDF("s")
      .select(TextFunctions.fastHash32(col("s")).as("h"))
      .as[Long].collect()
    assert(vals.forall(h => h >= 0L && h < (1L << 32)))
    intercept[IllegalArgumentException] {
      TextFunctions.hash32(col("s"), "fnv")
    }
  }

  test("xxh64 minhash signatures differ from md5 (the switch is real)") {
    val md5Sig = Dedup.minhashSignature(docs.limit(20), "doc_id", "text", 8, 5)
      .collect().map(_.toSeq).toSeq
    val xxhSig = Dedup.minhashSignature(docs.limit(20), "doc_id", "text", 8, 5,
      hashFamily = TextFunctions.HashXxh64).collect().map(_.toSeq).toSeq
    assert(md5Sig !== xxhSig)
    // ...but every hash still lands in the shared unsigned-32 range
    assert(xxhSig.flatMap(_.drop(1)).forall {
      case h: Long => h >= 0L && h < (1L << 32)
      case _ => false
    })
  }

  test("minhash dup verdicts at threshold are identical across families") {
    def pairs(fam: String) = Dedup.minhashDupPairs(
      docs, "doc_id", "text", hashFamily = fam)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs(TextFunctions.HashMd5) === pairs(TextFunctions.HashXxh64))
  }

  test("xxh64 DSIR weights keep the output contract and track the md5 weights") {
    def weights(fam: String) = ImportanceSampling.dsirWeights(
      docs, "doc_id", "text", col("doc_id") % 5 === 0, hashFamily = fam)
    val md5W = weights(TextFunctions.HashMd5)
    val xxhW = weights(TextFunctions.HashXxh64)
    assert(md5W.columns.toSeq === xxhW.columns.toSeq)
    assert(md5W.count() === xxhW.count())
    // any consistent hash is a valid DSIR bucketing: with 4096 buckets
    // the collision sets differ but the target-vs-source signal is the
    // same, so the two weight vectors must be strongly correlated
    val joined = md5W.select(col("id"), col("weight").as("w_md5"))
      .join(xxhW.select(col("id"), col("weight").as("w_xxh")), Seq("id"))
    val corr = joined.stat.corr("w_md5", "w_xxh")
    assert(corr > 0.9, s"family change altered the DSIR signal: corr=$corr")
  }
}
