package graft.util

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Safe overwrite-by-swap for Parquet table directories (Parquet has no
  * in-place update): materialize to a temp dir, move the live dir aside,
  * rename the temp in, delete the old. Every rename result is checked —
  * a failed swap must throw with the original data still recoverable in
  * `<table>_old`, never silently leave an empty table.
  *
  * All filesystem traffic goes through the Hadoop [[FileSystem]] resolved
  * from the session's Hadoop conf, NOT `java.io.File`, so the warehouse
  * may live on any supported store (local, HDFS, S3A, ...). On HDFS the
  * two renames are atomic metadata ops; on object stores without atomic
  * dir rename (S3A) the move is a copy under the hood — the swap contract
  * (original recoverable in `_old` until the install lands) still holds,
  * it just stops being O(1). Crash leftovers (`_tmp`/`_old`) are swept and
  * recovered by `Library.repair()`.
  */
object TableSwap {

  def rewrite(tablePath: String, df: DataFrame,
              partitionBy: Seq[String] = Nil): Unit =
    rewriteVia(tablePath, df, tablePath + "_tmp", tablePath + "_old",
      partitionBy)

  /** [[rewrite]] with caller-chosen scratch locations. Needed when the
    * target is a PARTITION LEAF inside a hive-partitioned table: the
    * default `<path>_tmp`/`<path>_old` siblings would live inside the
    * table root with `=` in their names, so a crash leftover (e.g.
    * `__cell=3_old`) would enter partition discovery, degrade the
    * partition column to string, and double-count the cell's rows.
    * Scratch dirs outside the table root are invisible to discovery in
    * every state. */
  def rewriteVia(tablePath: String, df: DataFrame,
                 tmpPath: String, oldPath: String,
                 partitionBy: Seq[String] = Nil): Unit = {
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(tmpPath)
    val fs = fileSystem(df.sparkSession, tablePath)
    val dir = new HPath(tablePath)
    val old = new HPath(oldPath)
    delete(fs, old)
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new java.io.IOException(s"swap failed moving aside $tablePath")
    if (!fs.rename(new HPath(tmpPath), dir))
      throw new java.io.IOException(s"swap failed installing $tablePath")
    delete(fs, old)
  }

  /** The [[FileSystem]] serving `path` under the session's Hadoop conf —
    * the one handle every warehouse-maintenance path must use, so a
    * scheme-qualified warehouse (`hdfs://...`, `s3a://...`) routes to its
    * store and a bare path routes to the configured default FS. */
  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Recursive delete, no-op when absent. */
  def delete(fs: FileSystem, p: HPath): Unit =
    if (fs.exists(p)) fs.delete(p, true)

  /** Local-only convenience for tests tearing down scratch warehouses. */
  def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
