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

  // a synthetic WARC-shaped row: long enough main text to pass the gate
  private def htmlRow(rid: Long, url: String, text: String) =
    (rid, url, 200, "text/html",
      s"<html><body><p>$text</p></body></html>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private val warcCols =
    Seq("record_index", "target_uri", "http_status", "http_content_type", "payload")

  test("replay shield: a mixed batch keeps the NEW record even when its text equals a replayed member's") {
    val t1 = "the quick brown fox jumps over the lazy dog and keeps on running far beyond the fence line"
    val t2 = "a completely different second document whose words share nothing with the first one at all"
    val state = java.nio.file.Files.createTempDirectory("crawl-mixed").toString
    val b1 = Seq(htmlRow(1L, "http://a.example/p1", t1),
      htmlRow(2L, "http://a.example/p2", t2)).toDF(warcCols: _*)
    CrawlFunctions.initCrawlState(spark, state, b1)
    // batch 2 = record 1 REPLAYED verbatim + a NEW record with
    // byte-identical text: exact-dup grouping before the rid anti-join
    // would key the group by rid 1 and silently drop record 9
    val b2 = Seq(htmlRow(1L, "http://a.example/p1", t1),
      htmlRow(9L, "http://b.example/copy", t1)).toDF(warcCols: _*)
    CrawlFunctions.appendCrawlBatch(spark, state, b2)
    val got = keepersOf(CrawlFunctions.crawlKeepers(spark, state))
    assert(got === Set(("text", "http://a.example/p1", 2L),
      ("text", "http://a.example/p2", 1L)),
      "the new identical-text record must fold into the member's component")
    // and the streaming-state ≡ batch-union identity holds on this shape:
    // the union sees rid 1 once (a set of records), the state saw it twice
    val union = b1.unionByName(b2).dropDuplicates("record_index")
    assert(keepersOf(CrawlFunctions.multimodalKeepers(union)) === got)
  }

  test("high-water robustness: a truncated marker reads as -1 and layer 2 absorbs the replay") {
    val t1 = "an entirely ordinary page body that clears the forty character main text gate with room"
    val state = java.nio.file.Files.createTempDirectory("crawl-hw").toString
    val b1 = Seq(htmlRow(1L, "http://a.example/p1", t1)).toDF(warcCols: _*)
    assert(CrawlStream.processBatch(spark, state, b1, batchId = 0L))
    val before = keepersOf(CrawlFunctions.crawlKeepers(spark, state))
    // simulate the crash-truncated marker the old non-atomic writer could
    // leave: an EMPTY high-water file must read as -1, not wedge restarts
    val hw = java.nio.file.Paths.get(state, "_stream_batch")
    java.nio.file.Files.write(hw, Array.empty[Byte])
    assert(CrawlStream.lastCommittedBatch(spark, state) === -1L)
    // the stream re-delivers batch 0: layer 1 no longer skips it, so the
    // rid anti-join (layer 2) must dedupe it to zero appended rows
    assert(CrawlStream.processBatch(spark, state, b1, batchId = 0L))
    assert(keepersOf(CrawlFunctions.crawlKeepers(spark, state)) === before)
    assert(CrawlStream.lastCommittedBatch(spark, state) === 0L,
      "the re-committed marker is whole again")
  }

  // ---- the closed loop: plan → fetch → ingest → re-plan ----------------

  private def robotsRow(rid: Long, host: String, body: String) =
    (rid, s"http://$host/robots.txt", 200, "text/plain",
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def pageRow(rid: Long, url: String, text: String, hrefs: Seq[String]) =
    (rid, url, 200, "text/html",
      (s"<html><body><p>$text</p>" +
        hrefs.map(h => s"""<a href="$h">x</a>""").mkString +
        "</body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def planSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet

  test("closed loop: two-batch streaming plan ≡ the batch plan on the union; re-delivery plans nothing new") {
    val R = graft.functions.RobotsFunctions
    val U = graft.functions.UrlFunctions
    val H = graft.functions.HtmlFunctions
    val text1 = "landing page body with enough characters to clear the main text gate comfortably today"
    val text2 = "a second page whose body also stretches past the gate so the corpus keeps both documents"
    val aRobots = "User-agent: graftbot\nDisallow: /private/\nCrawl-delay: 2\n"
    val b1 = Seq(
      robotsRow(0L, "a.example", aRobots),
      pageRow(1L, "http://a.example/", text1,
        Seq("/p1", "/private/x", "http://b.example/q1"))).toDF(warcCols: _*)
    val b2 = Seq(
      pageRow(2L, "http://a.example/p1", text2, Seq("/p2", "/p3")),
      pageRow(3L, "http://b.example/q1", text2 + " twin", Seq.empty)).toDF(warcCols: _*)

    val state = java.nio.file.Files.createTempDirectory("crawl-loop").toString
    val plan1 = planSet(CrawlStream.ingestAndPlan(spark, state, b1, 0L, "graftbot"))
    // batch 1's frontier: the two out-links the gate allows, NOT the
    // fetched landing page and NOT the /private/ link
    assert(plan1.map(_._1) === Set("http://a.example/p1", "http://b.example/q1"))
    val plan2 = CrawlStream.ingestAndPlan(spark, state, b2, 1L, "graftbot")

    // the batch replay: the SAME composition over the union, built from
    // the raw parts (robots parse from latest bodies, link extraction,
    // fetched-set anti-join, ladder) — q206's shape, computed from scratch
    val union = b1.unionByName(b2)
    val robots = CrawlStream.robotsOf(union)
    val rules = R.robotsRules(robots, "host", "body", "graftbot")
    val delays = R.robotsCrawlDelay(robots, "host", "body", "graftbot")
    val fetched = union.select(U.canonicalizeUrl(col("target_uri")).as("url")).distinct()
    val links = union
      .filter(col("http_status") === 200 && col("http_content_type").startsWith("text/html"))
      .select(col("target_uri"),
        explode(H.extractLinks(H.decodeBody(col("payload"), col("http_content_type")))).as("l"))
      .select(U.canonicalizeUrl(U.resolveUrl(col("target_uri"), col("l.href"))).as("url"))
    val discovered = fetched.unionByName(links).distinct()
    val remaining = R.filterByRobots(discovered, rules, "url")
      .join(fetched, Seq("url"), "left_anti")
    val batchPlan = planSet(R.scheduleFrontier(remaining, delays, "url", 1.0)
      .select(col("url"), col("crawl_delay"), col("fetch_at")))
    assert(planSet(plan2) === batchPlan,
      "the streaming loop's plan after two batches must equal the batch plan on the union")
    assert(batchPlan.map(_._1) === Set("http://a.example/p2", "http://a.example/p3"),
      "fetched URLs left, /private/ stayed gated, only the new a-host links remain")
    assert(batchPlan.forall(_._2 == 2.0), "a.example's Crawl-delay serves from the cache")

    // re-delivered batch (same id): every write skips, the plan is identical
    val replanned = planSet(CrawlStream.ingestAndPlan(spark, state, b2, 1L, "graftbot"))
    assert(replanned === batchPlan, "a re-delivered batch must plan zero new fetches")
    // and a re-SENT batch under a new id: layer 2 + distinct logs absorb it
    val resent = planSet(CrawlStream.ingestAndPlan(spark, state, b2, 2L, "graftbot"))
    assert(resent === batchPlan)
  }

  test("closed loop maintenance cadence: compaction is plan-transparent and bounds the log read") {
    val text1 = "landing page body with enough characters to clear the main text gate comfortably today"
    val text2 = "a second page whose body also stretches past the gate so the corpus keeps both documents"
    val aRobots = "User-agent: graftbot\nDisallow: /private/\nCrawl-delay: 2\n"
    val b1 = Seq(
      robotsRow(0L, "a.example", aRobots),
      pageRow(1L, "http://a.example/", text1,
        Seq("/p1", "/private/x", "http://b.example/q1"))).toDF(warcCols: _*)
    val b2 = Seq(
      pageRow(2L, "http://a.example/p1", text2, Seq("/p2", "/p3")),
      pageRow(3L, "http://b.example/q1", text2 + " twin", Seq.empty)).toDF(warcCols: _*)

    // two state dirs: plain vs compact-after-every-batch — every emitted
    // plan must be bit-identical (compaction is read-transparent)
    val plain = java.nio.file.Files.createTempDirectory("crawl-plain").toString
    val caded = java.nio.file.Files.createTempDirectory("crawl-caded").toString
    for ((b, id) <- Seq((b1, 0L), (b2, 1L), (b2, 2L))) { // incl. a re-SEND
      val p0 = planSet(CrawlStream.ingestAndPlan(spark, plain, b, id, "graftbot"))
      val p1 = planSet(CrawlStream.ingestAndPlan(spark, caded, b, id, "graftbot",
        compactEvery = 1))
      assert(p1 === p0, s"batch $id: cadenced plan diverged from plain")
    }

    // the bound: the re-sent batch appended its whole discovered set again,
    // so the PLAIN log carries duplicate rows; the compacted log's raw row
    // count equals its distinct count — the planFrontier read is O(unique)
    def logDir(state: String) = s"$state/discovered"
    def rawRows(state: String) = {
      val root = new java.io.File(logDir(state))
      val epochs = root.listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith("c=") &&
        new java.io.File(f, "_SUCCESS").exists())
      val latest = epochs.maxBy(_.getName.stripPrefix("c=").toLong)
      spark.read.parquet(s"$latest/urls")
    }
    val plainRaw = rawRows(plain).count()
    val cadedRaw = rawRows(caded).count()
    val uniq = rawRows(plain).distinct().count()
    assert(plainRaw > uniq, "the plain log must carry the re-send's duplicate rows")
    assert(cadedRaw === uniq, "the compacted log must be exactly the distinct set")
    // GC: at most two epochs remain (the replaced one and the live one)
    val epochDirs = new java.io.File(logDir(caded)).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c=")).map(_.getName)
    assert(epochDirs.length <= 2, s"stale epochs not GC'd: ${epochDirs.mkString(",")}")

    // crash-mid-compact: an UNCOMMITTED epoch (no _SUCCESS) is invisible —
    // readers stay on the last committed epoch and the plan is unchanged
    val before = planSet(CrawlStream.planFrontier(spark, caded))
    val debris = java.nio.file.Paths.get(logDir(caded), "c=99", "urls")
    java.nio.file.Files.createDirectories(debris)
    Seq("http://evil.example/phantom").toDF("url")
      .write.mode("overwrite").parquet(debris.toString)
    assert(planSet(CrawlStream.planFrontier(spark, caded)) === before,
      "an uncommitted compaction epoch must never serve reads")
  }
}
