package graft.streaming

import graft.SparkSpec
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingRunnerSpec extends SparkSpec {

  test("streaming chain download→publish with retry and execution log (ST1–ST3)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream").toString
    val queueDir = s"$base/queue"
    val ckpt = s"$base/ckpt"
    val execDir = s"$base/exec"

    // seed: two scenes at the download stage
    val seed = Seq(("s1", 1, "download", 0), ("s2", 1, "download", 0))
      .toDF("sceneid", "collection_id", "activity_type", "retry_count")
      .withColumn("not_before", current_timestamp())
    StreamingRunner.enqueue(seed, queueDir)

    // download: s1 succeeds; s2 transient-fails once then succeeds
    val download: Pipeline.StageKernel = df => df.withColumn("status",
      when(col("sceneid") === "s1", "SUCCESS")
        .when(col("sceneid") === "s2" && col("retry_count") >= 1, "SUCCESS")
        .otherwise("RETRY"))
    val publish: Pipeline.StageKernel = df => df.withColumn("status", lit("SUCCESS"))

    val q1 = StreamingRunner.runStage(spark, queueDir, ckpt, execDir,
      "download", download, childStages = Seq("publish"),
      maxRetries = 3, retryDelaySeconds = 0L)
    val q2 = StreamingRunner.runStage(spark, queueDir, ckpt, execDir,
      "publish", publish, childStages = Nil)

    // drive the micro-batches until the chain settles
    val deadline = System.currentTimeMillis() + 60000
    def publishedOk(): Boolean =
      new java.io.File(s"$execDir/stage=publish").exists() &&
        spark.read.parquet(s"$execDir/stage=publish")
          .filter(col("status") === "SUCCESS")
          .select("sceneid").distinct().count() == 2
    while (System.currentTimeMillis() < deadline && !publishedOk()) {
      q1.processAllAvailable(); q2.processAllAvailable()
}
    q1.stop(); q2.stop()

    assert(publishedOk(), "both scenes must reach publish SUCCESS")
    val execs = spark.read.option("basePath", execDir).parquet(s"$execDir/stage=*")
    // s2 retried at least once at download
    assert(execs.filter(col("sceneid") === "s2" && col("activity_type") === "download" &&
      col("status") === "RETRY").count() >= 1)
    // progress introspection (ST8)
    val prog = StreamingRunner.stageProgress(spark, execDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(prog(("publish", "SUCCESS")) == 2L)
  }

  test("executions log is exactly-once under micro-batch replay (ST4 acks-late)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-replay").toString
    val batch = Seq(("r1", 1, "download", 0), ("r2", 1, "download", 0))
      .toDF("sceneid", "collection_id", "activity_type", "retry_count")
      .withColumn("not_before", current_timestamp())
    val kernel: Pipeline.StageKernel = df => df.withColumn("status", lit("SUCCESS"))
    // a crash between the executions write and the checkpoint commit makes
    // Structured Streaming re-run the SAME batchId — the sink must not
    // duplicate
    StreamingRunner.processBatch(batch, batchId = 7L, s"$base/queue", s"$base/exec",
      "download", kernel, childStages = Nil)
    StreamingRunner.processBatch(batch, batchId = 7L, s"$base/queue", s"$base/exec",
      "download", kernel, childStages = Nil)
    val execs = spark.read.parquet(s"$base/exec/stage=download")
    assert(execs.count() == 2, "replayed batch must overwrite its own partition, not append")
    // a genuinely new batch appends alongside
    StreamingRunner.processBatch(batch, batchId = 8L, s"$base/queue", s"$base/exec",
      "download", kernel, childStages = Nil)
    assert(spark.read.parquet(s"$base/exec/stage=download").count() == 4)
  }

  test("stage query restarts from its checkpoint without reprocessing (ST1/ST4)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-restart").toString
    def enq(ids: String*): Unit = StreamingRunner.enqueue(
      ids.map((_, 1, "download", 0)).toDF("sceneid", "collection_id", "activity_type", "retry_count")
        .withColumn("not_before", current_timestamp()), s"$base/queue")
    val kernel: Pipeline.StageKernel = df => df.withColumn("status", lit("SUCCESS"))
    def startStage() = StreamingRunner.runStage(spark, s"$base/queue", s"$base/ckpt",
      s"$base/exec", "download", kernel, childStages = Nil)

    enq("r1", "r2")
    val q1 = startStage()
    try q1.processAllAvailable() finally q1.stop()
    def execCount() = spark.read.parquet(s"$base/exec/stage=download")
      .select("sceneid", "batch_id").distinct().count()
    val afterFirst = execCount()
    assert(afterFirst >= 2, "first run must process both seeds")

    // second incarnation on the SAME checkpoint: picks up only new work
    enq("r3")
    val q2 = startStage()
    try q2.processAllAvailable() finally q2.stop()
    val execs = spark.read.parquet(s"$base/exec/stage=download")
    assert(execs.filter(col("sceneid") === "r3").count() == 1, "new row processed once")
    assert(execs.filter(col("sceneid").isin("r1", "r2")).select("sceneid").distinct().count() == 2)
    assert(execs.groupBy("sceneid").count().filter(col("count") > 1).isEmpty,
      "restart must not reprocess checkpointed batches")
  }

  test("drain-and-stop mode processes the backlog then terminates (AvailableNow)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-drain").toString
    StreamingRunner.enqueue(
      Seq(("d1", 1, "download", 0), ("d2", 1, "download", 0))
        .toDF("sceneid", "collection_id", "activity_type", "retry_count")
        .withColumn("not_before", current_timestamp()), s"$base/queue")
    val kernel: Pipeline.StageKernel = df => df.withColumn("status", lit("SUCCESS"))
    val q = StreamingRunner.runStage(spark, s"$base/queue", s"$base/ckpt",
      s"$base/exec", "download", kernel, childStages = Nil, drainAndStop = true)
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    assert(spark.read.parquet(s"$base/exec/stage=download")
      .filter(col("status") === "SUCCESS").select("sceneid").distinct().count() == 2)
  }

  test("LTA offline→retry handshake over live HTTP: 202 polls re-enqueue, then SUCCESS; exhaustion dead-letters (ST3 + S2)") {
    import spark.implicits._
    import graft.sources.{FixtureCatalogServer, HttpCatalogProvider, RemoteCatalog}
    val base = Files.createTempDirectory("graft-lta").toString
    val queueDir = s"$base/queue"
    val destDir = s"$base/downloads"
    val payload = "GRANULE-BYTES".getBytes("UTF-8")
    // sOn: online after 2 offline polls (within maxRetries = 3);
    // sDead: stays offline past every retry → must dead-letter
    val server = new FixtureCatalogServer(
      records = Seq(RemoteCatalog.SceneRecord("sOn", "S2", 1.0, 0L, ""),
        RemoteCatalog.SceneRecord("sDead", "S2", 1.0, 0L, "")),
      assets = Map("sOn" -> payload, "sDead" -> payload),
      offlinePolls = Map("sOn" -> 2, "sDead" -> 99))
    try {
      StreamingRunner.enqueue(
        Seq(("sOn", 1, "download", 0), ("sDead", 1, "download", 0))
          .toDF("sceneid", "collection_id", "activity_type", "retry_count")
          .withColumn("not_before", current_timestamp()), queueDir)
      val kernel: Pipeline.StageKernel =
        HttpCatalogProvider.downloadKernel(server.baseUrl, destDir)
      // each drain is one exactly-once pass over everything enqueued so
      // far (Trigger.AvailableNow + checkpoint); RETRY rows re-enqueue
      // with backoff 0 and are picked up by the NEXT drain — the cron-
      // driven deployment shape
      def drain(): Unit = {
        val q = StreamingRunner.runStage(spark, queueDir, s"$base/ckpt",
          s"$base/exec", "download", kernel, childStages = Nil,
          maxRetries = 3, retryDelaySeconds = 0L, drainAndStop = true)
        assert(q.awaitTermination(60000))
      }
      def execs() = spark.read.parquet(s"$base/exec/stage=download")
      (1 to 5).foreach(_ => drain())

      // sOn: two offline polls logged as RETRY, then the third attempt
      // fetched real bytes
      assert(execs().filter($"sceneid" === "sOn" && $"status" === "RETRY").count() === 2)
      assert(execs().filter($"sceneid" === "sOn" && $"status" === "SUCCESS").count() === 1)
      val got = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(destDir, "sOn"))
      assert(java.util.Arrays.equals(got, payload), "downloaded bytes must round-trip")
      assert(server.downloads.count(_ == "sOn") === 3,
        "each poll must be one real wire request")

      // sDead: retries exhaust at maxRetries → dead-lettered FAILURE with
      // the final retry_count; no further polls after exhaustion
      val dead = execs().filter($"sceneid" === "sDead" && $"status" === "FAILURE")
        .select("retry_count").collect().map(_.getInt(0))
      assert(dead.toSeq === Seq(3), "exhausted activity must dead-letter exactly once")
      val polls = server.downloads.count(_ == "sDead")
      assert(polls === 4, s"maxRetries+1 attempts expected, saw $polls")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(destDir, "sDead")))
    } finally server.stop()
  }

  test("streaming group fan-out: download → [correction, publish] run in parallel (ST2)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    val queueDir = s"$base/queue"
    StreamingRunner.enqueue(
      Seq(("sA", 1, "download", 0)).toDF("sceneid", "collection_id", "activity_type", "retry_count")
        .withColumn("not_before", current_timestamp()), queueDir)
    val okKernel: Pipeline.StageKernel = df => df.withColumn("status", lit("SUCCESS"))
    val qs = Seq(
      StreamingRunner.runStage(spark, queueDir, s"$base/ckpt", s"$base/exec",
        "download", okKernel, childStages = Seq("correction", "publish")),
      StreamingRunner.runStage(spark, queueDir, s"$base/ckpt", s"$base/exec",
        "correction", okKernel, childStages = Nil),
      StreamingRunner.runStage(spark, queueDir, s"$base/ckpt", s"$base/exec",
        "publish", okKernel, childStages = Nil))
    val deadline = System.currentTimeMillis() + 60000
    def done(): Boolean =
      Seq("correction", "publish").forall { st =>
        new java.io.File(s"$base/exec/stage=$st").exists() &&
          spark.read.parquet(s"$base/exec/stage=$st")
            .filter(col("status") === "SUCCESS").count() == 1
      }
    try {
      while (System.currentTimeMillis() < deadline && !done())
        qs.foreach(_.processAllAvailable())
      assert(done(), "both group branches must complete from one parent SUCCESS")
    } finally qs.foreach(_.stop())
  }
}
