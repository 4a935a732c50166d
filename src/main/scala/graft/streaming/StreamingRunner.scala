package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.Pipeline

/** Structured-Streaming stage runner: the Celery queue layer re-expressed
  * (SURVEY.md §2.11 ST1–ST6).
  *
  * Reference semantics:
  *  - 4 named queues with per-queue workers (celery/tasks.py:130, 243, 350,
  *    391; docker-compose concurrency 2) → one streaming query per stage,
  *    each reading the shared activity-queue directory filtered by its
  *    `activity_type`; parallelism comes from partitions, not worker counts.
  *  - acks-late / exactly-once-ish (celery/__init__.py:59–72) →
  *    checkpointed `foreachBatch`: a batch re-runs after crash, writes are
  *    idempotent merges on the activity key.
  *  - retry with fixed backoff, max 72 × 900 s (tasks.py:129–134) → RETRY
  *    rows re-enqueued with `not_before = now + delay`; the source filter
  *    admits rows only once `now() >= not_before`; `retry_count` caps.
  *  - execution history (models.py:90–128) → an append-only `executions`
  *    parquet sink written from every batch.
  *
  * Queue encoding: JSON files in `queueDir` (one dir per deployment), rows:
  * {sceneid, collection_id, activity_type, retry_count, not_before}. At
  * cluster scale this source swaps for Kafka (same DataFrame shape) without
  * touching the stage logic.
  */
object StreamingRunner {

  val queueSchema = "sceneid STRING, collection_id INT, activity_type STRING, " +
    "retry_count INT, not_before TIMESTAMP"

  /** Enqueue activities (append JSON to the queue dir). */
  def enqueue(acts: DataFrame, queueDir: String): Unit =
    acts.select(col("sceneid"), col("collection_id"), col("activity_type"),
        coalesce(col("retry_count"), lit(0)).as("retry_count"),
        coalesce(col("not_before"), current_timestamp()).as("not_before"))
      .write.mode("append").json(queueDir)

  /** Start one stage's streaming query (one "queue worker").
    *
    * Each micro-batch: admit due rows of this stage → run the kernel →
    * append executions → re-enqueue RETRY rows with backoff until
    * `maxRetries` → enqueue child stages for SUCCESS rows.
    */
  def runStage(spark: SparkSession, queueDir: String, checkpointDir: String,
               executionsDir: String, stage: String, kernel: Pipeline.StageKernel,
               childStages: Seq[String], maxRetries: Int = 72,
               retryDelaySeconds: Long = 900L,
               drainAndStop: Boolean = false): StreamingQuery = {
    val in = spark.readStream.schema(queueSchema).json(queueDir)
      .filter(col("activity_type") === stage)
    in.writeStream
      .queryName(s"stage-$stage")
      .option("checkpointLocation", s"$checkpointDir/$stage")
      // drainAndStop = Trigger.AvailableNow: process everything enqueued so
      // far, checkpoint, and terminate — the batch-deployment mode (run the
      // four stage queries in sequence from a cron, exactly-once preserved)
      .trigger(if (drainAndStop) Trigger.AvailableNow() else Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, queueDir, executionsDir, stage, kernel,
          childStages, maxRetries, retryDelaySeconds)
      }
      .start()
  }

  /** One micro-batch of a stage queue — factored out of `foreachBatch` so
    * replay semantics are testable.
    *
    * Exactly-once story (acks-late, celery/__init__.py:59–72): after a
    * crash the checkpoint replays the batch with the SAME `batchId`. The
    * executions log is written with dynamic partition-overwrite on
    * `batch_id`, so a replay overwrites its own partition instead of
    * appending duplicates — the log is exactly-once. Re-enqueues (retry /
    * deferred / child stages) are at-least-once appends; duplicates there
    * are absorbed by the idempotent activity MERGE key downstream
    * (Pipeline.mergeByKey = the reference's get_or_create, utils.py:64–91),
    * which is the same effective-exactly-once contract the reference runs.
    */
  def processBatch(batch: DataFrame, batchId: Long, queueDir: String,
                   executionsDir: String, stage: String, kernel: Pipeline.StageKernel,
                   childStages: Seq[String], maxRetries: Int = 72,
                   retryDelaySeconds: Long = 900L): Unit = {
    val due = batch.filter(col("not_before") <= current_timestamp())
    val deferred = batch.filter(col("not_before") > current_timestamp())
    // per-stage subdirectory: concurrent stage queries must not share a
    // FileOutputCommitter _temporary dir (committer collisions corrupt
    // appends) — same isolation a per-queue Celery worker had
    val stageExecDir = s"$executionsDir/stage=$stage"
    if (!due.isEmpty) {
      val res = kernel(due).localCheckpoint(true)
      val dead = res.filter(col("status") === "RETRY" && col("retry_count") >= maxRetries)
        .withColumn("status", lit("FAILURE"))
      res.unionByName(dead)
        .select(col("sceneid"), col("collection_id"), col("activity_type"),
          col("status"), col("retry_count"), current_timestamp().as("ts"),
          lit(batchId).as("batch_id"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(stageExecDir)
      val retry = res.filter(col("status") === "RETRY" && col("retry_count") < maxRetries)
        .withColumn("retry_count", col("retry_count") + 1)
        .withColumn("not_before",
          col("not_before") + expr(s"interval $retryDelaySeconds seconds"))
      if (!retry.isEmpty) enqueue(retry, queueDir)
      // chain: SUCCESS rows spawn the child stage activities (ST2)
      val ok = res.filter(col("status") === "SUCCESS")
      childStages.foreach { child =>
        if (!ok.isEmpty)
          enqueue(ok.withColumn("activity_type", lit(child))
            .withColumn("retry_count", lit(0))
            .withColumn("not_before", current_timestamp()), queueDir)
      }
    }
    // rows not yet due simply re-enter the queue (bounded: files are
    // consumed exactly once, so this re-materializes them for later)
    if (!deferred.isEmpty) enqueue(deferred, queueDir)
    ()
  }

  /** Stage-progress introspection (celery/utils.py:27–38 inspect()):
    * per-stage status counts from the executions log. */
  def stageProgress(spark: SparkSession, executionsDir: String): DataFrame =
    spark.read.option("basePath", executionsDir).parquet(s"$executionsDir/stage=*")
      .groupBy(col("activity_type"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("activity_type"), col("status"))
}
