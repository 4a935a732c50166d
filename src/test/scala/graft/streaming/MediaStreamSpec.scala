package graft.streaming

import graft.SparkSpec
import graft.functions.{DedupFunctions => D, MultimodalFunctions => M}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The signature plane × streams: [[EventAggregates.dedupMediaStream]]
  * (exact-signature dedup within the watermark horizon — byte re-hosts,
  * re-encodes, gain-scaled audio and perceptually-identical images all
  * collide at distance 0) and [[EventAggregates.dedupMediaAgainstIndex]]
  * (the foreachBatch body of the INCREMENTAL hamming-τ loop: probe the
  * persisted index, drop hits and batch-internal near-dups, append
  * survivors). Media rows come from the committed WARC fixture's media
  * records — the same planted twins q175 is oracled on. */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  /** The fixture's 8 media records: (rid, modality, payload). 12/13 =
    * perceptual PNG twins, 14 distinct PNG, 15/16 = gain-twin WAVs,
    * 17/18 = byte-identical MP4s, 19 distinct MP4. */
  private lazy val mediaRows: Seq[(Long, String, Array[Byte])] = {
    val in = getClass.getResourceAsStream("/graft/warc/tiny.warc")
    val bytes = try in.readAllBytes() finally in.close()
    graft.sources.Warc.parseWarc(bytes)
      .filter(r => r.http_status == 200 &&
        !r.http_content_type.startsWith("text/"))
      .map { r =>
        val modality =
          if (r.http_content_type.startsWith("image/")) "image"
          else if (r.http_content_type.startsWith("audio/")) "audio"
          else "video"
        (r.record_index.toLong, modality, r.payload)
      }
  }

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])],
                      tsBase: Int = 0): DataFrame =
    rows.zipWithIndex.map { case ((id, m, p), i) =>
      (id, m, p, java.sql.Timestamp.valueOf(f"2026-08-15 10:${tsBase + i}%02d:00"))
    }.toDF("media_id", "modality", "content", "ts")

  test("mediaSignatures ≡ the per-modality kernels bit-for-bit") {
    val df = mediaDf(mediaRows)
    val unified = M.mediaSignatures(df, "media_id", "modality", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val img = M.imagePhash(df.filter($"modality" === "image")
        .select("media_id", "content"), "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aud = M.audioPhash(df.filter($"modality" === "audio")
        .select("media_id", "content"), "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vid = M.videoPhash(df.filter($"modality" === "video")
        .select("media_id", "content"), "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unified === img ++ aud ++ vid)
    assert(unified.size === 8, "every fixture payload must decode")
  }

  test("streaming exact-signature dedup == batch; twins collapse across micro-batches") {
    val df = mediaDf(mediaRows)
    val expected = EventAggregates.dedupMediaStream(df)
      .select("modality", "sig")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expected.size === 5) // 8 payloads -> 5 unique signatures

    // originals in file 0, twins + the distinct items in file 1; one file
    // per micro-batch so the originals' batch commits first
    val dir = java.nio.file.Files.createTempDirectory("media-stream")
    val originals = mediaRows.filter(r => Set(12L, 15L, 17L).contains(r._1))
    val rest = mediaRows.filterNot(r => Set(12L, 15L, 17L).contains(r._1))
    // all event times inside the 10-minute delay: within it the dedup
    // guarantee is absolute; beyond it state eviction makes dropping a
    // duplicate best-effort (the contract dedupMediaStream documents)
    mediaDf(originals, 0).write.parquet(dir.resolve("f0").toString)
    mediaDf(rest, 3).write.parquet(dir.resolve("f1").toString)
    val stream = spark.readStream.schema(mediaDf(mediaRows).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/f*")
    val q = EventAggregates.dedupMediaStream(stream)
      .writeStream.format("memory").queryName("mediadedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("mediadedup")
      val gotSigs = got.select("modality", "sig")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(gotSigs === expected)
      // the first-arriving originals are the survivors of each twin pair
      val ids = got.select("media_id").as[Long].collect().toSet
      assert(Set(12L, 15L, 17L).subsetOf(ids), s"got $ids")
      assert(ids.intersect(Set(13L, 16L, 18L)).isEmpty,
        s"later-arriving twins must be dropped, got $ids")
    } finally q.stop()
  }

  test("incremental index loop: two batches end in the same survivors as one global dedup") {
    val sigs = M.mediaSignatures(mediaDf(mediaRows),
      "media_id", "modality", "content")
      .withColumnRenamed("media_id", "id")
    val batch1 = sigs.filter($"id".isin(12L, 15L, 17L)).localCheckpoint(true)
    val batch2 = sigs.filter(!$"id".isin(12L, 15L, 17L)).localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("media-idx").toString
    // bootstrap: first batch has no index yet — self-dedup then build
    val kept1 = D.dropByPairGraph(batch1, "id",
      D.neardupPairsByHamming64(batch1, "sig", "id", Seq("modality"), 8, 4))
    D.writeHammingIndex(kept1, "sig", "id", dir, Seq("modality"), bands = 8)
    // second batch through the foreachBatch body
    val kept2 = EventAggregates.dedupMediaAgainstIndex(batch2, dir)
    val finalIds = (kept1.select("id").as[Long].collect() ++
      kept2.select("id").as[Long].collect()).toSet
    // == the global batch answer: one keeper per near-dup component
    val globalKept = D.dropByPairGraph(sigs, "id",
        D.neardupPairsByHamming64(sigs, "sig", "id", Seq("modality"), 8, 4))
      .select("id").as[Long].collect().toSet
    assert(finalIds === Set(12L, 14L, 15L, 17L, 19L))
    assert(finalIds === globalKept)
    // the index now contains exactly the survivors — a third batch of
    // re-sends drops everything
    val kept3 = EventAggregates.dedupMediaAgainstIndex(batch1, dir)
    assert(kept3.isEmpty)
  }
}
