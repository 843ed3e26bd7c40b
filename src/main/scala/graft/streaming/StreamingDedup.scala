package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING near-duplicate detection: MinHash-LSH dedup of an unbounded
  * document stream against everything already seen.
  *
  * The batch tier ([[graft.operators.Dedup.minhashDupPairs]]) re-scans
  * the corpus per run; a crawl pipeline instead receives documents
  * incrementally and must answer "is this a near-dup of ANYTHING seen so
  * far" without re-reading history. This operator keeps the LSH bucket
  * membership in streaming GroupState: signatures are a stateless
  * map (the same [[graft.plans.MinHashSignature]] expression as batch),
  * band keys explode statelessly, and each band bucket's members live in
  * that bucket's state — an arriving document compares against ONLY its
  * bucket-mates (the LSH candidate semantics), never the whole history.
  *
  * Verification is by SIGNATURE AGREEMENT (n_agree of numHashes minhash
  * components equal, an unbiased Jaccard estimate) — the state carries
  * signatures, never text or shingle sets, so per-bucket state is
  * numHashes longs per member. Exact-Jaccard re-verification of emitted
  * pairs is a stateless downstream join against the document store (the
  * batch [[Dedup.verifyPairs]]), kept out of the stream state.
  *
  * Semantics are BATCH-REPLAYABLE: executed over a bounded frame (each
  * group processed once, empty initial state), the emitted pair set is
  * exactly the batch LSH candidate set filtered to `minAgree` — the
  * oracle form (q95). Within a micro-batch, members process in id order,
  * so output is deterministic under any arrival interleaving; a pair is
  * emitted by every band that buckets it together — distinct downstream
  * (batch: `.dropDuplicates`; live stream: the sink's idempotent upsert,
  * keeping this operator single-stateful).
  *
  * 100 TB shape: state shards by band key across executors; hot buckets
  * (boilerplate) should be dropped by the same broadcast hot-key guard
  * as batch LSH BEFORE this operator (a per-batch pre-filter), and
  * unbounded retention swaps `NoTimeout` for a processing-time TTL when
  * the dedup horizon is bounded (e.g. recrawl windows) — both leave the
  * per-document work unchanged.
  */
object StreamingDedup {

  case class BucketState(ids: Array[Long], sigs: Array[Array[Long]])

  /** Near-dup pairs of a document stream (or a bounded frame — same
    * semantics, empty initial state).
    *
    * @param docs      (idCol: long, textCol: string); streaming or batch
    * @param minAgree  minimum agreeing minhash components (estimated
    *                  Jaccard >= minAgree/numHashes)
    * @return (id_a, id_b, n_agree, est_jaccard), id_a < id_b; may
    *         repeat a pair once per agreeing band — distinct downstream
    */
  def lshDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 8, numBands: Int = 2,
                        shingleK: Int = 5, minAgree: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / numBands
    require(numBands * rowsPerBand == numHashes, "bands must tile the signature")
    require(minAgree >= 1 && minAgree <= numHashes,
      s"minAgree=$minAgree not in [1, $numHashes]")
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = Dedup.minhashSignature(docs, idCol, textCol, numHashes, shingleK)
    val keys = (0 until numBands).map { b =>
      concat_ws("_",
        (lit(b.toString) +:
          (0 until rowsPerBand).map(r =>
            col(s"mh${b * rowsPerBand + r}").cast("string"))): _*)
    }
    val banded = sig
      .select(col("id").cast("long").as("id"),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"),
        explode(array(keys: _*)).as("bk"))
      // NULL-text docs have no signature — they cannot near-dup anything
      .filter(element_at(col("sig"), 1).isNotNull)
      .as[(Long, Array[Long], String)]
    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, Array[Long], String)],
         state: GroupState[BucketState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          var ids = state.getOption.map(_.ids.toList).getOrElse(Nil)
          var sigs = state.getOption.map(_.sigs.toList).getOrElse(Nil)
          val seen = scala.collection.mutable.HashSet.empty[Long] ++ ids
          // id order within the micro-batch: deterministic output under
          // any arrival interleaving (and the batch-mode group iterator)
          rows.toSeq.sortBy(_._1).foreach { case (id, s, _) =>
            if (!seen.contains(id)) { // redelivery-idempotent
              var i = ids
              var g = sigs
              while (i.nonEmpty) {
                val oid = i.head
                val os = g.head
                var agree = 0
                var d = 0
                while (d < s.length) {
                  if (s(d) == os(d)) agree += 1
                  d += 1
                }
                if (agree >= minAgree)
                  out += ((math.min(id, oid), math.max(id, oid), agree))
                i = i.tail
                g = g.tail
              }
              ids = id :: ids
              sigs = s :: sigs
              seen += id
            }
          }
          state.update(BucketState(ids.toArray, sigs.toArray))
          out.iterator
      }
      .toDF("id_a", "id_b", "n_agree")
      .withColumn("est_jaccard",
        col("n_agree").cast("double") / lit(numHashes.toDouble))
  }
}
