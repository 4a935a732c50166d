package graft

import graft.functions.{DedupFunctions => D, SamplingFunctions, TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-data curation pipeline, end to end: scrub → quality
  * filter → exact dedup → near dedup → chunk → pack → split. Every stage
  * is one of the engine's first-class operators; the test pins the row
  * flow, determinism under repartitioning, and the invariants a corpus
  * build must hold (no PII survives, no duplicate survives, every chunk
  * respects the token budget).
  */
class TrainingDataPipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def pipeline(docs: DataFrame): DataFrame = {
    val scrubbed = docs.withColumn("text", T.redactPii($"text"))
    val quality = scrubbed
      .filter(T.tokenCount($"text") >= 5 && T.charEntropy($"text") > 1.0)
    val exact = D.dedupExact(quality, "text", "doc_id")
    val near = D.dedupNear(exact, "text", "doc_id",
      n = 3, bands = 2, rowsPerBand = 2, jaccardThreshold = 0.8)
    val chunked = near
      .select($"doc_id", $"source", explode(T.chunkTokens($"text", 64, 8)).as("c"))
      .select($"doc_id", $"source", $"c.chunk_idx".as("chunk_idx"),
        $"c.chunk_text".as("chunk_text"))
    val packed = chunked
      .withColumn("n_tok", T.tokenCount($"chunk_text"))
      .withColumn("bin", T.packBins($"n_tok", 256,
        Seq($"source"), Seq($"doc_id", $"chunk_idx")))
    packed.withColumn("split",
      when(T.hashBucket($"chunk_text", 100) < 90, "train").otherwise("holdout"))
  }

  test("curation pipeline: invariants hold and output is partition-invariant") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      // plant PII + an exact dup + near-dup pair to prove the stages act
      .unionByName(Seq(
        (90001L, "reach me at alice@example.com or 10.1.2.3 about the quarterly data results soon", "planted", "en", 80L),
        (90002L, "the quick brown fox jumps over the lazy dog every single morning", "planted", "en", 64L),
        (90003L, "the quick brown fox jumps over the lazy dog every single morning", "planted", "en", 64L), // exact dup
        (90004L, "the quick brown fox jumps over the lazy dog every single evening", "planted", "en", 64L)  // near dup
      ).toDF("doc_id", "text", "source", "lang", "n_chars"))

    val out = pipeline(docs).cache()

    // 1. no raw PII survives scrubbing
    assert(out.filter($"chunk_text".contains("example.com") ||
      $"chunk_text".rlike("\\b10\\.1\\.2\\.3\\b")).count() === 0)
    assert(out.filter($"chunk_text".contains("<EMAIL>")).count() > 0,
      "planted email must surface as a placeholder")
    // 2. dedup kept exactly one of the planted trio
    val planted = out.filter($"doc_id" >= 90002L && $"doc_id" <= 90004L)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(planted === Set(90002L), s"expected only the canonical doc, got $planted")
    // 3. chunks respect the token budget
    assert(out.filter(T.tokenCount($"chunk_text") > 64).count() === 0)
    // 4. packing: a bin holds ≤ budget + one overflowing chunk's tokens
    val maxBin = out.groupBy($"source", $"bin").agg(sum($"n_tok").as("t"))
      .agg(max($"t")).as[Long].head()
    assert(maxBin <= 256 + 64, s"bin of $maxBin tokens exceeds budget+overflow")
    // 5. split fractions are sane and content-determined
    val splits = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits("train") > splits.getOrElse("holdout", 0L))
    // 6. identical output regardless of input partitioning
    val again = pipeline(docs.repartition(13))
      .select("doc_id", "chunk_idx", "chunk_text", "bin", "split")
    val base = out.select("doc_id", "chunk_idx", "chunk_text", "bin", "split")
    assert(base.exceptAll(again).count() === 0 && again.exceptAll(base).count() === 0)
    out.unpersist()
  }

  test("crawl front door: WARC -> main text -> canonical URLs -> near-dedup -> shards") {
    import graft.functions.{HtmlFunctions => H, UrlFunctions => U}
    // the committed WARC fixture (independent python generator) carries
    // the duplicate shape a real crawl has: coded-body twins (exact dups),
    // a lightly-edited mirror copy (near dup), and two registered domains
    val dir = java.nio.file.Files.createTempDirectory("crawl-e2e")
    Seq("tiny.warc.gz").foreach { n =>
      val in = getClass.getResourceAsStream(s"/graft/warc/$n")
      val bytes = try in.readAllBytes() finally in.close()
      java.nio.file.Files.write(dir.resolve(n), bytes)
    }
    val docs = graft.sources.Warc.readWarc(spark, dir.toString)
      .filter($"http_status" === 200 && $"http_content_type".startsWith("text/html"))
      .select($"record_index".cast("long").as("rid"),
        U.canonicalizeUrl($"target_uri").as("canon"),
        U.registeredDomain($"target_uri").as("regdom"),
        H.mainText($"payload".cast("string")).as("mt"))
      .filter(length($"mt") >= 40)
    assert(docs.count() === 8) // all 8 html-200 pages clear the quality gate
    // keeper = the min-rid ROW (min_by), so canon/regdom/rid stay
    // mutually consistent when a duplicate group spans domains — and the
    // URL expressions stay prunable from sub-plans that only need (mt, rid)
    val exact = docs.groupBy($"mt")
      .agg(min($"rid").as("rid"),
        min_by(struct($"canon", $"regdom"), $"rid").as("k"),
        count(lit(1)).as("n_copies"))
      .select($"mt", $"k.canon".as("canon"), $"k.regdom".as("regdom"),
        $"rid", $"n_copies")
    // coded twins collapsed: 8 rows -> 5 unique contents
    assert(exact.count() === 5)
    val near = D.dedupNear(exact, "mt", "rid",
      n = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.6)
    // the mirror's lightly-edited page-a copy collapses onto the original
    assert(near.count() === 4)
    assert(near.filter($"canon".contains("page-a-variant")).count() === 0)
    val capped = SamplingFunctions.capPerGroup(near, $"regdom", $"canon", 2)
      .withColumn("tokens", T.tokenCount($"mt").cast("long"))
    assert(capped.groupBy("regdom").count().collect().forall(_.getLong(1) <= 2))
    val sharded = SamplingFunctions.shardByTokenBudget(
      capped, $"rid", $"tokens", "crawl", 30L)
    // every doc landed in a shard; shard ids are dense from 0
    val shards = sharded.select($"shard").distinct().as[Long].collect().sorted
    assert(shards.head === 0L && shards === (0L until shards.length).toArray)
    // partition invariance of the whole walk
    val again = SamplingFunctions.shardByTokenBudget(
      SamplingFunctions.capPerGroup(
        D.dedupNear(docs.repartition(7).groupBy($"mt")
          .agg(min($"rid").as("rid"),
            min_by(struct($"canon", $"regdom"), $"rid").as("k"),
            count(lit(1)).as("n_copies"))
          .select($"mt", $"k.canon".as("canon"), $"k.regdom".as("regdom"),
            $"rid", $"n_copies"),
          "mt", "rid", n = 3, bands = 4, rowsPerBand = 2,
          jaccardThreshold = 0.6),
        $"regdom", $"canon", 2).withColumn("tokens", T.tokenCount($"mt").cast("long")),
      $"rid", $"tokens", "crawl", 30L)
      .select("canon", "regdom", "n_copies", "tokens", "shard")
    val base = sharded.select("canon", "regdom", "n_copies", "tokens", "shard")
    assert(base.exceptAll(again).count() === 0 && again.exceptAll(base).count() === 0)
  }

  test("multimodal crawl: media records near-dedup on the same signature plane as text") {
    import graft.functions.{MultimodalFunctions => M, UrlFunctions => U}
    val dir = java.nio.file.Files.createTempDirectory("crawl-mm")
    Seq("tiny.warc.gz").foreach { n =>
      val in = getClass.getResourceAsStream(s"/graft/warc/$n")
      val bytes = try in.readAllBytes() finally in.close()
      java.nio.file.Files.write(dir.resolve(n), bytes)
    }
    val warc = graft.sources.Warc.readWarc(spark, dir.toString)
      .filter($"http_status" === 200)
    val media = warc.filter($"http_content_type".startsWith("image/") ||
        $"http_content_type".startsWith("audio/") ||
        $"http_content_type".startsWith("video/"))
      .select($"record_index".cast("long").as("rid"),
        U.canonicalizeUrl($"target_uri").as("canon"),
        when($"http_content_type".startsWith("image/"), "image")
          .when($"http_content_type".startsWith("audio/"), "audio")
          .otherwise("video").as("modality"), $"payload")
    assert(media.count() === 8) // 3 PNGs + 2 WAVs + 3 MP4s
    val isig = M.imagePhash(media.filter($"modality" === "image")
        .select("rid", "payload"), "rid", "payload")
      .select(lit("image").as("modality"), $"rid", $"phash".as("sig"))
    val asig = M.audioPhash(media.filter($"modality" === "audio")
        .select("rid", "payload"), "rid", "payload")
      .select(lit("audio").as("modality"), $"rid", $"afp".as("sig"))
    val vsig = M.videoPhash(media.filter($"modality" === "video")
        .select("rid", "payload"), "rid", "payload")
      .select(lit("video").as("modality"), $"rid", $"phash".as("sig"))
    val sigs = isig.unionByName(asig).unionByName(vsig)
    // every media payload really decoded (none dropped by the kernels)
    assert(sigs.count() === 8)
    val pairs = D.neardupPairsByHamming64(sigs, "sig", "rid",
        partitionCols = Seq("modality"), bands = 8, maxDistance = 4)
      .select($"modality", $"id_a", $"id_b", $"dist")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the planted twins — and ONLY the twins — pair, all at distance 0:
    // the cross-domain PNG copy (12,13), the ×2-gain WAV (15,16), and
    // the re-hosted byte-identical clip (17,18)
    assert(pairs === Set(("image", 12L, 13L, 0L), ("audio", 15L, 16L, 0L),
      ("video", 17L, 18L, 0L)))
    // survivors after dropping near-dups: the fixture.example originals
    // keep, the mirror copies and the gain twin are gone
    val kept = D.dropByPairGraph(
        media.select($"rid", $"canon", $"modality"), "rid",
        spark.createDataFrame(pairs.toSeq.map(p => (p._2, p._3)))
          .toDF("id_a", "id_b"))
      .select($"canon").as[String].collect().toSet
    assert(kept === Set(
      "http://fixture.example/img-a.png",
      "http://fixture.example/img-b.png",
      "http://fixture.example/tone-a.wav",
      "http://fixture.example/clip-a.mp4",
      "http://fixture.example/clip-b.mp4"))
  }
}
