package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental crawl state ([[CrawlFunctions.initCrawlState]] /
  * appendCrawlBatch / crawlKeepers): the contract is EXACT equivalence to
  * the batch run over the union of every batch —
  * `crawlKeepers(init(B1) + append(B2) + …)` ≡ `multimodalKeepers(∪Bᵢ)` —
  * at any split of the record stream, including the component-BRIDGE case
  * (a batch doc near two previously-separate corpus components must merge
  * them into one keeper) that probe-and-drop incremental dedup gets
  * wrong. Also pins the crash story: a half-appended batch (indices
  * written, members generation never published) retries cleanly, and
  * marker-less members generations are invisible to readers. */
class IncrementalCrawlSpec extends SparkSpec {
  private val C = CrawlFunctions

  private def fixtureWarc(): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("inc-crawl-warc")
    val in = getClass.getResourceAsStream("/graft/warc/tiny.warc.gz")
    val bytes = try in.readAllBytes() finally in.close()
    java.nio.file.Files.write(dir.resolve("tiny.warc.gz"), bytes)
    graft.sources.Warc.readWarc(spark, dir.toString)
  }

  private def keeperSet(df: DataFrame): Set[(String, String, Long)] =
    df.select("modality", "keeper_uri", "n_members").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("inc-crawl-state").toString

  test("two-batch incremental == batch union (record-order split)") {
    val warc = fixtureWarc().localCheckpoint(true)
    val expected = keeperSet(C.multimodalKeepers(warc))
    val state = tmpState()
    val p = C.CrawlParams()
    // B1 = text pages + first image; B2 = rest of the media — cross-batch
    // image dup (12 ↔ 13), batch-internal audio/video dups, empty text
    // path in B2
    C.initCrawlState(spark, state, warc.filter(col("record_index") <= 12), p)
    C.appendCrawlBatch(spark, state, warc.filter(col("record_index") >= 13), p)
    assert(keeperSet(C.crawlKeepers(spark, state)) === expected)
  }

  test("two-batch incremental == batch union (parity split: cross-batch pairs everywhere)") {
    val warc = fixtureWarc().localCheckpoint(true)
    val expected = keeperSet(C.multimodalKeepers(warc))
    val state = tmpState()
    val p = C.CrawlParams()
    C.initCrawlState(spark, state, warc.filter(col("record_index") % 2 === 0), p)
    C.appendCrawlBatch(spark, state, warc.filter(col("record_index") % 2 === 1), p)
    assert(keeperSet(C.crawlKeepers(spark, state)) === expected)
  }

  test("three-batch chain == batch union; keepers view stable after each append") {
    val warc = fixtureWarc().localCheckpoint(true)
    val expected = keeperSet(C.multimodalKeepers(warc))
    val state = tmpState()
    val p = C.CrawlParams()
    C.initCrawlState(spark, state, warc.filter(col("record_index") <= 8), p)
    // mid-state keepers must equal the batch run over just B1
    val midExpected = keeperSet(
      C.multimodalKeepers(warc.filter(col("record_index") <= 8)))
    assert(keeperSet(C.crawlKeepers(spark, state)) === midExpected)
    C.appendCrawlBatch(spark, state, warc.filter(
      col("record_index") >= 9 && col("record_index") <= 14), p)
    C.appendCrawlBatch(spark, state, warc.filter(col("record_index") >= 15), p)
    assert(keeperSet(C.crawlKeepers(spark, state)) === expected)
  }

  // ---- the bridge: a batch doc near two separate corpus components ----

  /** Minimal WARC frame (just the columns the crawl front half reads). */
  private def htmlFrame(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("record_index", "target_uri", "body")
      .select(col("record_index"), col("target_uri"),
        lit(200).as("http_status"),
        lit("text/html").as("http_content_type"),
        concat(lit("<html><body><p>"), col("body"),
          lit("</p></body></html>")).cast("binary").as("payload"))
  }

  // two docs from DISJOINT vocabularies (shingle overlap exactly zero)
  // and a bridge doc C containing both: J(A,C) ≈ J(B,C) ≈ 0.45 clears
  // the 0.25 threshold, J(A,B) = 0 never can. Banding uses 8 bands ×
  // 1 row so a 0.45-jaccard pair band-collides with near-certainty —
  // the precondition test pins that these exact strings DO collide, so
  // the bridge case stays deterministic
  private val bridgeParams = C.CrawlParams(jaccardThreshold = 0.25,
    minhashBands = 8, rowsPerBand = 1)
  private val textA =
    ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim
  private val textB =
    ("one two three four five six seven eight nine ten " * 3).trim
  private val textC = textA + " " + textB

  test("bridge precondition: C pairs with A and with B, A never with B") {
    val docs = htmlFrame(Seq((0L, "http://a.example/a", textA),
      (1L, "http://b.example/b", textB), (2L, "http://c.example/c", textC)))
    val p = bridgeParams
    val groups = docs.select(col("record_index").cast("long").as("rid"),
      UrlFunctions.canonicalizeUrl(col("target_uri")).as("canon"),
      HtmlFunctions.mainText(col("payload").cast("string")).as("mt"))
    val pairs = DedupFunctions.neardupPairsLocal(groups, "mt", "rid",
        p.shingleN, p.minhashBands, p.rowsPerBand, p.jaccardThreshold)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), "A–C must band-collide and verify")
    assert(pairs.contains((1L, 2L)), "B–C must band-collide and verify")
    assert(!pairs.contains((0L, 1L)), "A–B must stay separate")
  }

  test("bridge batch merges two corpus components into one keeper") {
    val p = bridgeParams
    val b1 = htmlFrame(Seq((0L, "http://a.example/a", textA),
      (1L, "http://b.example/b", textB)))
    val b2 = htmlFrame(Seq((2L, "http://c.example/c", textC)))
    val state = tmpState()
    C.initCrawlState(spark, state, b1, p)
    assert(keeperSet(C.crawlKeepers(spark, state)) === Set(
      ("text", "http://a.example/a", 1L), ("text", "http://b.example/b", 1L)))
    C.appendCrawlBatch(spark, state, b2, p)
    val after = keeperSet(C.crawlKeepers(spark, state))
    assert(after === Set(("text", "http://a.example/a", 3L)),
      s"bridge must merge both components under the first-crawled keeper, got $after")
    // and it matches the batch run over the union, per the contract
    assert(after === keeperSet(C.multimodalKeepers(
      b1.unionByName(b2), minMainChars = p.minMainChars,
      minhashBands = p.minhashBands, rowsPerBand = p.rowsPerBand,
      jaccardThreshold = p.jaccardThreshold)))
  }

  // ---- crash stories --------------------------------------------------

  test("retry after half-appended batch (indices written, members unpublished)") {
    val warc = fixtureWarc().localCheckpoint(true)
    val expected = keeperSet(C.multimodalKeepers(warc))
    val state = tmpState()
    val p = C.CrawlParams()
    val b1 = warc.filter(col("record_index") <= 12)
    val b2 = warc.filter(col("record_index") >= 13)
    C.initCrawlState(spark, state, b1, p)
    // simulate the crash window: the batch's index rows land, the members
    // generation never publishes
    val tg = b2.filter(col("http_status") === 200)
      .filter(col("http_content_type").startsWith("text/html"))
      .select(col("record_index").cast("long").as("rid"),
        UrlFunctions.canonicalizeUrl(col("target_uri")).as("canon"),
        HtmlFunctions.mainText(col("payload").cast("string")).as("mt"))
      .filter(length(col("mt")) >= p.minMainChars)
      .groupBy(col("mt")).agg(min(col("rid")).as("rid"),
        min_by(col("canon"), col("rid")).as("canon"), count(lit(1)).as("n_copies"))
    DedupFunctions.appendToLshIndex(tg, "mt", "rid", s"$state/text_index",
      p.shingleN, p.minhashBands, p.rowsPerBand)
    val media = b2.filter(col("http_status") === 200)
      .filter(col("http_content_type").startsWith("image/") ||
        col("http_content_type").startsWith("audio/") ||
        col("http_content_type").startsWith("video/"))
      .select(col("record_index").cast("long").as("rid"), col("http_content_type"),
        when(col("http_content_type").startsWith("image/"), "image")
          .when(col("http_content_type").startsWith("audio/"), "audio")
          .otherwise("video").as("modality"), col("payload"))
    val sigs = MultimodalFunctions.mediaSignatures(media, "rid", "modality", "payload")
    DedupFunctions.appendToHammingIndex(sigs, "sig", "rid", s"$state/media_index",
      partitionCols = Seq("modality"), p.hammingBands)
    // the retry runs the whole append — duplicate index rows must wash out
    C.appendCrawlBatch(spark, state, b2, p)
    assert(keeperSet(C.crawlKeepers(spark, state)) === expected)
  }

  test("marker-less members generation is invisible; next publish replaces it") {
    val warc = fixtureWarc().localCheckpoint(true)
    val state = tmpState()
    val p = C.CrawlParams()
    C.initCrawlState(spark, state, warc.filter(col("record_index") <= 12), p)
    val before = keeperSet(C.crawlKeepers(spark, state))
    // crashed publish debris: a gen directory with data but no _SUCCESS
    val debris = java.nio.file.Paths.get(state, "members", "gen=1")
    java.nio.file.Files.createDirectories(debris)
    java.nio.file.Files.write(debris.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    assert(keeperSet(C.crawlKeepers(spark, state)) === before,
      "reader must stay on the last complete generation")
    C.appendCrawlBatch(spark, state, warc.filter(col("record_index") >= 13), p)
    assert(keeperSet(C.crawlKeepers(spark, state)) ===
      keeperSet(C.multimodalKeepers(warc)))
  }
}
