package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-10 brief item 6: promote the ST1–ST5 streaming scale story from
  * spec to datapoint. Replays the (replicated) events corpus as a bounded
  * file stream in fixed-size microbatches through the two stateful shapes —
  * `EventAggregates.userSessions` (session_window aggregation) and
  * `EventAggregates.correlateWithin` (watermark-bounded stream-stream
  * join) — and reports rows/s plus PEAK state rows/bytes from the progress
  * feed. The watermark bound is the claim under test: state must plateau
  * (evicted as event time advances), not grow with the corpus.
  *
  * Usage: sbt "runMain graft.tools.StreamBench [eventsDir] [filesPerTrigger]"
  *   eventsDir defaults to the MakeSf1 output (/tmp/graft-sf1).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = (if (args.length > 0) args(0) else "/tmp/graft-sf1") + "/events.parquet"
    val perTrigger = if (args.length > 1) args(1).toInt else 4
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // AQE is batch-only anyway
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // arg 3 "rocksdb": the spill-to-disk state store (state larger than
    // the heap — the 100 TB configuration); default is HDFS-backed in-heap
    if (args.length > 2 && args(2) == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.EventAggregates

    val schema = spark.read.parquet(dir).schema
    val totalRows = spark.read.parquet(dir).count()
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", perTrigger).parquet(dir)

    def run(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"sb_$name").toString
      val q = build.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      var inRows = 0L; var outRows = 0L
      var peakStateRows = 0L; var peakStateBytes = 0L; var batches = 0
      for (p <- q.recentProgress) {
        inRows += p.numInputRows; batches += 1
        for (s <- p.stateOperators) {
          outRows += s.numRowsUpdated
          peakStateRows = math.max(peakStateRows, s.numRowsTotal)
          peakStateBytes = math.max(peakStateBytes, s.memoryUsedBytes)
        }
      }
      println(f"[stream] $name%-18s $inRows%,d rows in $batches batches, " +
        f"$wall%.1f s = ${inRows / wall}%,.0f rows/s; " +
        f"peak state $peakStateRows%,d rows / ${peakStateBytes / 1e6}%.1f MB")
    }

    println(s"[stream] corpus $dir: $totalRows rows, $perTrigger files/trigger, " +
      s"provider=${spark.conf.get("spark.sql.streaming.stateStore.providerClass", "default(HDFSBackedStateStore)")}")

    run("userSessions") {
      EventAggregates.userSessions(stream(), gap = "10 minutes", watermark = "30 minutes")
    }
    run("correlateWithin") {
      val purchases = stream().filter(col("event_type") === "purchase")
      val errors = stream().filter(col("event_type") === "error")
      EventAggregates.correlateWithin(purchases, errors, "user_id",
        gapSeconds = 600, watermark = "30 minutes")
    }
    spark.stop()
  }
}
