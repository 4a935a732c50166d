package graft.streaming

import graft.SparkSpec
import graft.functions.CrawlFunctions
import org.apache.spark.sql.functions._

/** Streaming crawl lifecycle ≡ batch — the StatefulAggregates
  * discipline applied to the persisted crawl state: micro-batched
  * appends land bit-identically to one batch over the union, and
  * re-delivery (same batchId OR a re-sent identical batch under a new
  * one) changes nothing. */
class CrawlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def warcFixture() = {
    val dir = java.nio.file.Files.createTempDirectory("crawlstream-warc")
    val in = getClass.getResourceAsStream("/graft/warc/tiny.warc.gz")
    val bytes = try in.readAllBytes() finally in.close()
    java.nio.file.Files.write(dir.resolve("tiny.warc.gz"), bytes)
    graft.sources.Warc.readWarc(spark, dir.toString)
  }

  private def keepersOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("modality"), col("keeper_uri"), col("n_members"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("streaming two-batch ≡ batch union; re-sent batch dedupes to zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val warc = warcFixture().localCheckpoint(true)
    val rows = warc
      .select(col("record_index"), col("target_uri"), col("http_status"),
        col("http_content_type"), col("payload"))
      .as[(Int, String, Int, String, Array[Byte])].collect()
    val (batch1, batch2) = rows.partition(_._1 <= 12) // the q183 split
    assert(batch1.nonEmpty && batch2.nonEmpty)

    val state = java.nio.file.Files.createTempDirectory("crawlstream-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawlstream-ckpt").toString
    val mem = MemoryStream[(Int, String, Int, String, Array[Byte])]
    val q = CrawlStream.run(spark, state,
      mem.toDF().toDF("record_index", "target_uri", "http_status",
        "http_content_type", "payload"),
      ckpt)
    try {
      mem.addData(batch1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(batch2.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = keepersOf(CrawlFunctions.crawlKeepers(spark, state))
      val batch = keepersOf(CrawlFunctions.multimodalKeepers(warc))
      assert(streamed === batch,
        "streaming state after two micro-batches must equal the one-batch corpus")
      assert(streamed.nonEmpty)

      // re-send batch2 verbatim: a NEW micro-batch id, identical rows —
      // the replay shield (rid anti-join) must append nothing at all
      val hwBefore = CrawlStream.lastCommittedBatch(spark, state)
      mem.addData(batch2.toIndexedSeq: _*); q.processAllAvailable()
      assert(CrawlStream.lastCommittedBatch(spark, state) > hwBefore,
        "the re-sent batch was processed (new id), not skipped")
      assert(keepersOf(CrawlFunctions.crawlKeepers(spark, state)) === batch,
        "a re-sent batch must dedupe to zero: no n_members inflation")
    } finally q.stop()

    // layer 1: Spark's own re-delivery (same batchId after a restart)
    // short-circuits on the high-water mark without touching the state
    val replayed = CrawlStream.processBatch(spark, state,
      warc.filter(col("record_index") >= 13), batchId = 0L)
    assert(!replayed, "an already-committed batchId must be skipped")
  }
}
