package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard export — the last mile of a curation pipeline: lay
  * the admitted documents out in the deterministic global training
  * order ([[Sampling.trainOrder]]) and cut the stream into
  * ~`shardTokens`-sized shards a loader (WebDataset / streaming-
  * dataset style) consumes sequentially, with a per-shard manifest
  * (doc count, token count, order-invariant content fingerprint) the
  * run can verify against after any re-materialization.
  *
  * Scale design: the shard boundary is a GLOBAL running token total —
  * [[Packing.packSequences]]'s distributed prefix sum (one range
  * shuffle, the same sort the write needs anyway), never a
  * single-partition window. The write itself is a `partitionBy` on the
  * shard id, so each shard lands as its own directory of files and a
  * 1000-executor cluster writes all shards concurrently. The manifest
  * is a per-shard aggregate (bounded: one row per shard); its
  * fingerprint is an order-independent XOR of row hashes, so it
  * verifies content without imposing a read order.
  *
  * Epoch semantics: `epoch` salts the training order — each epoch is
  * an independent deterministic permutation (the
  * [[Mixture.materializeEpochs]] contract), so a multi-epoch run
  * exports per-epoch shard sets that interleave sources differently
  * while staying bit-reproducible run-to-run.
  */
object ShardedExport {

  /** Assign every doc its shard: the shard where the doc's stream
    * offset starts (`shard_id`), plus `cum_tokens` / `seq_pos` from
    * the underlying packing. A shard's token sum is bounded by
    * `shardTokens` + the largest single document. */
  def shardAssignments(df: DataFrame, idCol: String, tokensCol: String,
                       shardTokens: Long, epoch: Int = 0): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    Packing.packSequences(df, idCol, tokensCol,
        Seq(Sampling.trainOrder(col(idCol), epoch).asc),
        seqLen = shardTokens)
      .withColumnRenamed("seq_id", "shard_id")
      .drop("spans")
  }

  /** Per-shard manifest over an assignment: (shard_id, n_docs,
    * n_tokens, fingerprint). The fingerprint XORs each row's
    * xxhash64(id, tokens), so it is independent of row order and
    * partitioning but pins exact shard membership. */
  def manifest(assigned: DataFrame, idCol: String, tokensCol: String)
      : DataFrame =
    assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        expr(s"bit_xor(xxhash64($idCol, $tokensCol))").as("fingerprint"))

  /** Write the sharded export: one directory per shard under `path`
    * (`shard_id=N/`), rows sorted by stream position within each
    * shard, plus the manifest at `path/_shard_manifest`. Returns the
    * manifest. */
  def write(df: DataFrame, idCol: String, tokensCol: String, path: String,
            shardTokens: Long, epoch: Int = 0): DataFrame = {
    val assigned = shardAssignments(df, idCol, tokensCol,
      shardTokens, epoch)
    assigned
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("cum_tokens"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard_id").parquet(path)
    val m = manifest(assigned, idCol, tokensCol)
    m.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/_shard_manifest")
    m
  }
}
