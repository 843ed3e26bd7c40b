package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Safe overwrite-by-swap for Parquet table directories (Parquet has no
  * in-place update): materialize to a temp dir, move the live dir aside,
  * rename the temp in, delete the old. Every rename result is checked —
  * a failed swap must throw with the original data still recoverable in
  * `<table>_old`, never silently leave an empty table. */
object TableSwap {

  def rewrite(tablePath: String, df: DataFrame,
              partitionBy: Seq[String] = Nil): Unit = {
    val tmp = tablePath + "_tmp"
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(tmp)
    val dir = new java.io.File(tablePath)
    val old = new java.io.File(tablePath + "_old")
    if (old.exists()) delete(old)
    if (dir.exists() && !dir.renameTo(old))
      throw new java.io.IOException(s"swap failed moving aside $tablePath")
    if (!new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(s"swap failed installing $tablePath")
    delete(old)
  }

  def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
