package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the video-fingerprint kernel ([[MultimodalFunctions.videoPhash]]):
  * one keyframe decode per clip through the REAL codecs (baseline H.264
  * and MJPEG), hashed by the same PHash64Expr as still images — so video,
  * image, audio and text near-dup all live on one 64-bit hamming plane.
  * The bit-exact values themselves are pinned by q173's oracle (the
  * python encoder's reconstruction replayed through an independent
  * pooling+DCT+sign implementation); this spec pins the kernel's
  * distribution, codec dispatch, and drop semantics. */
class VideoPhashSpec extends SparkSpec {
  import spark.implicits._

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    try in.readAllBytes() finally in.close()
  }

  test("H.264 and MJPEG keyframes both hash; non-video rows drop") {
    val rows = Seq(
      (0L, resource("/graft/h264/corpus/clip_00.mp4")),
      (1L, resource("/graft/h264/corpus/clip_01.mp4")),
      (2L, resource("/graft/tiny_mjpeg.mp4")),           // ImageIO path
      (3L, MultimodalFunctions.AudioCodec.pcm16Wav(Array.fill[Short](512)(3), 8000)),
      (4L, "not media at all".getBytes("UTF-8")))
    val got = MultimodalFunctions.videoPhash(
        rows.toDF("media_id", "content"), "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(0L, 1L, 2L), s"got ${got.keySet}")
    assert(got(0L) !== got(1L), "distinct clips must not collide")
  }

  test("identical content under different ids collides exactly; partition-invariant") {
    val clip = resource("/graft/h264/corpus/clip_03.mp4")
    val rows = (0 until 6).map(i => (i.toLong, clip))
    val df1 = MultimodalFunctions.videoPhash(
      rows.toDF("media_id", "content").repartition(1), "media_id", "content")
    val df4 = MultimodalFunctions.videoPhash(
      rows.toDF("media_id", "content").repartition(4), "media_id", "content")
    val h1 = df1.select("phash").distinct().as[Long].collect()
    val h4 = df4.select("phash").distinct().as[Long].collect()
    assert(h1.length === 1 && h4.length === 1 && h1(0) === h4(0))
  }

  test("the corpus keyframe hash equals image-pHash of the decoded plane") {
    // the kernel must be EXACTLY PHash64 over planeLumaGrid — no hidden
    // normalization between the video and image paths
    val clip = resource("/graft/h264/corpus/clip_05.mp4")
    val mp4 = Mp4Demux.demux(clip).get
    val track = mp4.tracks.find(_.handler == "vide").get
    val key = Mp4Demux.keyframes(clip, 1).head
    val frame = graft.sources.H264Decode.decodeAvccSamples(
      track.codecConfig, Seq(Mp4Demux.samplePayload(clip, key))).head
    val grid = MultimodalFunctions.planeLumaGrid(
      frame.y, frame.width, frame.height, 32)
    val expected = graft.expr.PHash64.hash(grid)
    val got = MultimodalFunctions.videoPhash(
        Seq((5L, clip)).toDF("media_id", "content"), "media_id", "content")
      .head().getLong(1)
    assert(got === expected)
  }

  test("multi-keyframe signatures: the re-cut twin pairs at min-hamming 0, escapes first-keyframe") {
    val rows = Seq(
      (8L, resource("/graft/h264/corpus/gop_00.mp4")),   // 2 GOPs, 2 IDRs
      (9L, resource("/graft/h264/corpus/gop_01.mp4")),   // re-cut: GOP 2 only
      (0L, resource("/graft/h264/corpus/clip_00.mp4")))
    val sigs = MultimodalFunctions.videoPhashK(
        rows.toDF("media_id", "content"), "media_id", "content", maxKeyframes = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(8L).length === 2 && sigs(9L).length === 1 && sigs(0L).length === 1)
    // the shared keyframe hashes identically; the FIRST keyframes do not
    assert(sigs(8L)(1) === sigs(9L)(0))
    assert(java.lang.Long.bitCount(sigs(8L)(0) ^ sigs(9L)(0)) > 4,
      "a first-keyframe-only hash must MISS the re-cut (the planted escape)")
    // single-keyframe videoPhash indeed misses it
    val first = MultimodalFunctions.videoPhash(
        rows.toDF("media_id", "content"), "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(first(8L) ^ first(9L)) > 4)
    // ...and videoPhashK's first signature matches videoPhash exactly
    assert(first(8L) === sigs(8L)(0) && first(0L) === sigs(0L)(0))
  }

  test("cross-modal signature plane (q174): exactly the planted twins pair up") {
    val rows = graft.SparkEntry.queries("q174_crossmodal_neardup")(spark, "")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("audio", 0L, 16L, 0L),  // x2 gain: energies scale exactly, all signs hold
      ("audio", 0L, 17L, 0L),  // +1 every 7th sample
      ("audio", 16L, 17L, 0L),
      ("image", 0L, 12L, 0L),  // +1 at a fifth of the pixels
      ("video", 0L, 8L, 0L)))  // byte-identical clip under a new id
  }
}
