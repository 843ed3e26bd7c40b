package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Safe overwrite-by-swap for Parquet table directories (Parquet has no
  * in-place update): materialize to a temp dir, move the live dir aside,
  * rename the temp in, delete the old. Every rename result is checked —
  * a failed swap must throw with the original data still recoverable in
  * `<table>_old`, never silently leave an empty table. */
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
    val dir = new java.io.File(tablePath)
    val old = new java.io.File(oldPath)
    if (old.exists()) delete(old)
    if (dir.exists() && !dir.renameTo(old))
      throw new java.io.IOException(s"swap failed moving aside $tablePath")
    if (!new java.io.File(tmpPath).renameTo(dir))
      throw new java.io.IOException(s"swap failed installing $tablePath")
    delete(old)
  }

  def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
