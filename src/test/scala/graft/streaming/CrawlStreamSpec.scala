package graft.streaming

import graft.SparkSpec
import graft.functions.CrawlFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental crawl × Structured Streaming: appendCrawlBatch as a
  * foreachBatch body over a file-source stream of crawl record frames —
  * the continuous-ingestion twin of q183. Each micro-batch pays
  * extraction + batch-internal pairing + index probes; the persisted
  * state converges to EXACTLY the batch answer over everything streamed,
  * in any arrival order the batch contract allows. */
class CrawlStreamSpec extends SparkSpec {
  private val C = CrawlFunctions

  /** The committed fixture's record frame (the columns the crawl front
    * half reads), parsed once driver-side. */
  private lazy val recordRows: Seq[(Long, String, Int, String, Array[Byte])] = {
    val in = getClass.getResourceAsStream("/graft/warc/tiny.warc")
    val bytes = try in.readAllBytes() finally in.close()
    graft.sources.Warc.parseWarc(bytes).map { r =>
      (r.record_index.toLong, r.target_uri, r.http_status,
        r.http_content_type, r.payload)
    }
  }

  private def frame(rows: Seq[(Long, String, Int, String, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("record_index", "target_uri", "http_status",
      "http_content_type", "payload")
  }

  test("streamed micro-batches converge to the batch-union keepers") {
    val all = frame(recordRows)
    val expected = C.multimodalKeepers(all)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val dir = java.nio.file.Files.createTempDirectory("crawl-stream")
    val state = java.nio.file.Files.createTempDirectory("crawl-stream-state").toString
    // three arrival waves: the text pages, the images + first tone, the
    // rest — cross-micro-batch dup pairs in every modality
    frame(recordRows.filter(_._1 <= 11)).write.parquet(dir.resolve("f0").toString)
    Thread.sleep(1100) // distinct mtimes => deterministic file order
    frame(recordRows.filter(r => r._1 >= 12 && r._1 <= 15))
      .write.parquet(dir.resolve("f1").toString)
    Thread.sleep(1100)
    frame(recordRows.filter(_._1 >= 16)).write.parquet(dir.resolve("f2").toString)

    val p = C.CrawlParams()
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/f*")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          if (batchId == 0L) C.initCrawlState(spark, state, batch, p)
          else C.appendCrawlBatch(spark, state, batch, p)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = C.crawlKeepers(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected,
      s"streamed state must equal the batch union, got $got")
  }
}
