package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Engine-side worker introspection (SURVEY.md §2.11 ST8 — the reference's
  * `inspect().active()/.reserved()` REST endpoints, celery/utils.py:27–38):
  * a [[StreamingQueryListener]] that records per-batch progress of every
  * stage query, queryable as a DataFrame alongside
  * [[StreamingRunner.stageProgress]]'s executions-side counts.
  *
  * Scale note: the buffer holds one small row per (query, batch) on the
  * driver, capped at `maxRows` (oldest evicted) — introspection must never
  * become the memory leak it is monitoring.
  */
final case class BatchProgress(query_name: String, batch_id: Long,
                               input_rows: Long, duration_ms: Long, ts: String)

final class ProgressListener(maxRows: Int = 10000) extends StreamingQueryListener {

  private val rows = ArrayBuffer.empty[BatchProgress]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    rows.synchronized {
      val p = e.progress
      rows += BatchProgress(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L),
        p.timestamp)
      if (rows.length > maxRows) rows.remove(0, rows.length - maxRows)
    }

  /** Recorded progress as a DataFrame (active-worker introspection). */
  def progress(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.synchronized { rows.toSeq }.toDF()
  }
}

object Metrics {
  /** Attach a progress listener to the session; returns it for querying. */
  def attach(spark: SparkSession, maxRows: Int = 10000): ProgressListener = {
    val l = new ProgressListener(maxRows)
    spark.streams.addListener(l)
    l
  }
}
