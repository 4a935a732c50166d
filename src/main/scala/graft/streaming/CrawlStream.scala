package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.CrawlFunctions
import graft.functions.CrawlFunctions.CrawlParams

/** Streaming twin of the batch crawl lifecycle — the q198 composition in
  * its incremental regime: each micro-batch of fetched WARC records
  * flows extract → batch-internal pairing → persisted-index probes →
  * append of survivors into the crawl state, via
  * [[CrawlFunctions.appendCrawlBatch]] under `foreachBatch`. The
  * StatefulAggregates discipline applies: streaming state after N
  * micro-batches is BIT-IDENTICAL to [[CrawlFunctions.multimodalKeepers]]
  * over the union of every batch (CrawlStreamSpec pins two-batch ≡
  * one-batch, and q183's oracle already pins the underlying append
  * machinery).
  *
  * Exactly-once, two layers:
  *  1. a batch-id high-water mark in the state dir short-circuits
  *     Spark's own re-delivery (a restart re-runs the last micro-batch
  *     with the SAME batchId — skipped without reading the state);
  *  2. the append path's replay shield (ingest's rid anti-join against
  *     members) makes a re-delivered or manually re-sent batch — even
  *     under a NEW batchId, the at-least-once-source case — dedupe to
  *     zero appended rows: no index growth, no generation churn, no
  *     n_members inflation.
  * The high-water mark writes AFTER the append commits; a crash between
  * the two re-runs the batch on restart and layer 2 absorbs it.
  *
  * Scale shape: per micro-batch cost is batch extraction + two index
  * probes + the scoped relabel — O(batch + affected components), never
  * O(corpus) (the [[CrawlFunctions]] contract); the stream's payloads
  * die in the foreachBatch scan exactly as in the batch form. Single
  * writer per state dir, like every index family here.
  *
  * Role anchor: the reference's streaming half is its Celery queues —
  * new scenes arrive continuously and only NEW ones dispatch against the
  * published catalog (tasks.py:135–240); this is the same re-run
  * discipline for a continuous WARC feed. */
object CrawlStream {

  private def hwPath(stateDir: String) =
    new org.apache.hadoop.fs.Path(
      s"${stateDir.stripSuffix("/")}/_stream_batch")

  /** Highest micro-batch id whose append committed; -1 before the first. */
  def lastCommittedBatch(spark: SparkSession, stateDir: String): Long = {
    val p = hwPath(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeHighWater(spark: SparkSession, stateDir: String,
                             batchId: Long): Unit = {
    val p = hwPath(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** One micro-batch through the lifecycle (public so a spec — or a
    * custom sink — can drive it without a StreamingQuery). Returns true
    * when the batch was processed, false when the high-water mark
    * short-circuited a re-delivery. */
  def processBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                   batchId: Long, p: CrawlParams = CrawlParams()): Boolean = {
    if (batchId <= lastCommittedBatch(spark, stateDir)) return false
    if (!CrawlFunctions.stateInitialized(spark, stateDir))
      CrawlFunctions.initCrawlState(spark, stateDir, batch, p)
    else
      CrawlFunctions.appendCrawlBatch(spark, stateDir, batch, p)
    writeHighWater(spark, stateDir, batchId)
    true
  }

  /** Start the stream: `warcStream` must carry the WARC record columns
    * the batch form reads (record_index, target_uri, http_status,
    * http_content_type, payload) with record_index globally unique
    * across the stream's lifetime (the [[CrawlFunctions]] id contract).
    * Query the live corpus anytime with [[CrawlFunctions.crawlKeepers]]. */
  def run(spark: SparkSession, stateDir: String, warcStream: DataFrame,
          checkpointDir: String,
          p: CrawlParams = CrawlParams()): StreamingQuery =
    warcStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, stateDir, batch, batchId, p); ()
      }
      .start()
}
