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

  /** EXECUTABLE incremental ingest: watch a directory of markdown files
    * and pipe each micro-batch through `Library.addMarkdown` — the SAME
    * document/chunk/embedding appends, FTS postings append and IVF delta
    * maintenance as the batch path, so a stream-built library is
    * indistinguishable from a batch-built one (asserted in
    * StreamingIngestSpec).
    *
    * Exactly-once story: the file source's checkpoint makes each file
    * appear in exactly one micro-batch under normal operation, and
    * `addMarkdown`'s path anti-join makes REDELIVERED files (restart
    * after an uncheckpointed batch) idempotent — the batch and streaming
    * paths share one dedup rule instead of inventing a second one.
    *
    * 100 TB shape: the file source lists incrementally
    * (`maxFilesPerTrigger` bounds batch size); every per-batch transform
    * is the batch ingest code, which is already distributed. */
  def markdownIngestSink(lib: graft.Library, watchDir: String,
                         checkpointDir: String,
                         maxFilesPerTrigger: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = lib.spark
    import spark.implicits._
    spark.readStream
      .option("wholetext", true)
      .option("pathGlobFilter", "*.md")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(watchDir)
      .select(col("_metadata.file_path").as("path"), col("value").as("content"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        lib.addMarkdown(batch.select("path", "content").as[(String, String)])
      }
      .start()
  }

  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(userId: Long, startSec: Long, endSec: Long, nEvents: Int)

  /** Fold a sorted batch of event seconds into (closed sessions, open
    * trailing session), continuing from `initial` when a prior session
    * is still open. */
  private def foldSessions(userId: Long, secs: Seq[Long], gapSec: Long,
                           initial: Option[SessionState])
      : (Seq[SessionOut], Option[SessionState]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var st = initial
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
    (out.toSeq, st)
  }

  /** BATCH sessionization: one fold per user over the whole input, the
    * trailing session emitted immediately (there is no "later" in a
    * batch). This is the oracle-checkable form (q13); on a real stream
    * use [[sessionizeStream]] — this formulation would split sessions
    * at every micro-batch boundary. */
  def sessionize(events: Dataset[(Long, Long)], gapSec: Long)
                (implicit enc1: org.apache.spark.sql.Encoder[SessionState],
                 enc2: org.apache.spark.sql.Encoder[SessionOut]): Dataset[SessionOut] =
    events.groupByKey(_._1)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], _: GroupState[SessionState]) =>
          val (closed, open) =
            foldSessions(userId, rows.map(_._2).toSeq.sorted, gapSec, None)
          (closed ++ open.map(c => SessionOut(userId, c.start, c.last, c.n)))
            .iterator
      }

  /** STREAMING sessionization: the open session lives in GroupState and
    * continues across micro-batches; it closes when a later event's gap
    * exceeds `gapSec`, or when the event-time WATERMARK passes the
    * session end + gap (timeout flush). Sessions never split at batch
    * boundaries — the failure mode of running the batch fold per
    * micro-batch — and event-time timeouts make the behavior
    * deterministic and replayable (processing-time timeouts would also
    * livelock processAllAvailable with continuous empty batches). */
  def sessionizeStream(events: Dataset[(Long, Long)], gapSec: Long,
                       watermarkDelay: String = "0 seconds")
                (implicit enc1: org.apache.spark.sql.Encoder[SessionState],
                 enc2: org.apache.spark.sql.Encoder[SessionOut]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("userId", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val cur = state.get
            state.remove()
            Iterator.single(SessionOut(userId, cur.start, cur.last, cur.n))
          } else {
            val (closed, open) = foldSessions(userId,
              rows.map(_._2).toSeq.sorted, gapSec, state.getOption)
            open match {
              case Some(cur) =>
                state.update(cur)
                // flush when the watermark passes session end + gap
                // (must stay above the current watermark or Spark rejects it)
                state.setTimeoutTimestamp(math.max(
                  (cur.last + gapSec) * 1000L,
                  state.getCurrentWatermarkMs() + 1L))
              case None => if (state.exists) state.remove()
            }
            closed.iterator
          }
      }
  }
}
