package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import MultimodalFunctions._
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def jpegBytes(n: Int): Array[Byte] = {
    val b = Array.tabulate(n)(i => (i % 251).toByte)
    b(0) = 0xFF.toByte; b(1) = 0xD8.toByte; b
  }

  test("media schema + stub meta columns are deterministic") {
    val df = Seq((1L, jpegBytes(1000)), (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G')))
      .toDF("media_id", "content")
    val got = df.select(col("media_id"), mediaMetaColumns(col("content")).as("meta"))
      .select("media_id", "meta.format", "meta.width", "meta.duration_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got(0) == ((1L, "jpeg", 1000 % 640 + 1, 1000L)))
    assert(got(1) == ((2L, "png", 5, 4L)))
  }

  test("extractFeatures: fixed-width vectors, deterministic, partition-count independent") {
    val rows = (0 until 20).map(i => MediaRow(i.toLong, "image", jpegBytes(100 + i * 37),
      StubCodec.decodeMeta(jpegBytes(100 + i * 37))))
    val ds1 = spark.createDataset(rows).repartition(1)
    val ds4 = spark.createDataset(rows).repartition(4)
    val f1 = extractFeatures(ds1, dim = 16).collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f4 = extractFeatures(ds4, dim = 16).collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f4)                       // partitioning must not change results
    assert(f1.values.forall(_.size == 16)) // fixed width for downstream ANN
    assert(f1(0L) != f1(1L))               // content-sensitive
  }

  test("balanceBySize range-partitions by payload size") {
    val rows = (0 until 100).map(i => (i.toLong, Array.fill[Byte](if (i < 50) 10 else 10000)(1)))
    val df = rows.toDF("media_id", "content")
    val parts = balanceBySize(df, 4)
      .select(spark_partition_id().as("p"), length(col("content")).as("sz"))
      .groupBy("p").agg(max("sz").as("mx"), min("sz").as("mn"))
      .collect()
    // each partition holds similar sizes (range partitioning on size)
    assert(parts.forall(r => r.getInt(1) == r.getInt(2) || parts.length <= 2))
  }

  test("frame sampling stub is bounded and deterministic") {
    val offs = StubCodec.sampleFrameOffsets(100000L, 4096)
    assert(offs == StubCodec.sampleFrameOffsets(100000L, 4096))
    assert(offs.size <= 32 && offs.forall(_ < 100000L))
  }

  test("frameOffsets column matches the stub sampler and caps at maxFrames") {
    val df = Seq((1L, 100000L), (2L, 300L), (3L, 1L)).toDF("media_id", "n_bytes")
    val got = df.select(col("media_id"),
        frameOffsets(col("n_bytes"), everyNth = 4096, maxFrames = 32).as("offs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == StubCodec.sampleFrameOffsets(100000L, 4096))
    assert(got(2L) == Seq(0L) && got(3L) == Seq(0L))
  }

  private def realPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 101) & 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageCodec decodes real PNGs: true dimensions, not the stub fake") {
    val bytes = realPng(37, 23, seed = 1)
    val meta = ImageCodec.decodeMeta(bytes).get
    assert(meta.width === 37 && meta.height === 23 && meta.format === "png")
    // the stub would have derived width from byte length — ensure the real
    // path is actually used for decodable payloads
    assert(ImageCodec.decodeMeta("not an image".getBytes).isEmpty)
  }

  test("ImageCodec intensity features: 8x8 luma grid in [0,1], brightness ordering") {
    val dark = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos) // all black
      bos.toByteArray
    }
    val fDark = ImageCodec.intensityFeatures(dark).get
    val fPat = ImageCodec.intensityFeatures(realPng(64, 64, 2)).get
    assert(fDark.length === 64 && fPat.length === 64)
    assert(fDark.forall(_ == 0.0f), "black image → zero luma everywhere")
    assert(fPat.forall(v => v >= 0f && v <= 1f))
    assert(fPat.sum > fDark.sum)
  }

  test("resize real path: decoded output has the target dimensions") {
    val resized = ImageCodec.resize(realPng(100, 80, 3), 50, 40).get
    val meta = ImageCodec.decodeMeta(resized).get
    assert(meta.width === 50 && meta.height === 40)
  }

  test("extractFeatures kernel: real images get intensity features, mixed media still flows") {
    implicit val s = spark
    val img = MediaRow(1L, "image", realPng(32, 32, 4),
      ImageCodec.decodeMeta(realPng(32, 32, 4)).get)
    val junk = MediaRow(2L, "audio", Array.fill[Byte](100)(7),
      StubCodec.decodeMeta(Array.fill[Byte](100)(7)))
    val out = extractFeatures(spark.createDataset(Seq(img, junk)), dim = 64)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(out(1L).toSeq ===
      ImageCodec.intensityFeatures(realPng(32, 32, 4)).get.toSeq)
    assert(out(2L).toSeq ===
      StubCodec.extractFeatures(Array.fill[Byte](100)(7), 64).toSeq)
  }

  private def realWav(seconds: Double, hz: Double, sampleRate: Int = 8000): Array[Byte] = {
    val n = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / sampleRate) * 16384).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioCodec decodes real WAVs: header meta + RMS envelope features") {
    val wav = realWav(seconds = 0.5, hz = 440)
    val meta = AudioCodec.decodeMeta(wav).get
    assert(meta.sampleRate === 8000 && meta.channels === 1)
    assert(math.abs(meta.durationMs - 500L) <= 1)
    val tone = AudioCodec.rmsFeatures(wav, 16).get
    assert(tone.length === 16)
    // a constant-amplitude sine has RMS amplitude/sqrt(2) ≈ 0.354 everywhere
    tone.foreach(v => assert(math.abs(v - 16384.0 / 32768 / math.sqrt(2)) < 0.01))
    // silence → zeros
    val silent = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](8000)), fmt, 4000L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(AudioCodec.rmsFeatures(silent, 16).get.forall(_ === 0f))
    assert(AudioCodec.decodeMeta("not audio".getBytes).isEmpty)
  }

  test("extractFeatures kernel routes WAV payloads through the audio codec") {
    implicit val s = spark
    val wav = realWav(0.25, 220)
    val row = MediaRow(9L, "audio", wav, AudioCodec.decodeMeta(wav).get)
    val out = extractFeatures(spark.createDataset(Seq(row)), dim = 10)
      .collect().head
    assert(out.features.toSeq === AudioCodec.rmsFeatures(wav, 10).get.toSeq)
  }

  test("pcm16Wav: canonical WAV round-trips through the JDK decoder bit-exact") {
    val samples = Array.tabulate(300)(n => ((n * 37) % 4001 - 2000).toShort)
    val wav = AudioCodec.pcm16Wav(samples, 8000)
    val meta = AudioCodec.decodeMeta(wav).get
    assert(meta.format === "wav" && meta.sampleRate === 8000 && meta.channels === 1)
    assert(AudioCodec.decodePcm16(wav).get.toSeq === samples.toSeq)
  }

  test("spectralFrames: WHT bands, zcr, energy on analytic signals") {
    // constant signal: all mass in coefficient 0 (band 0), zero crossings 0
    val c = Array.fill(64)(100.toShort)
    val Seq(f0) = AudioCodec.spectralFrames(AudioCodec.pcm16Wav(c, 8000), 64, 4).get
    assert(f0.zcr === 0 && f0.energy === 64L * 100 * 100)
    assert(f0.bands.toSeq === Seq(6400L, 0L, 0L, 0L))
    // alternating sign: x_n·(−1)^popcount(n&1) is constant, so ALL mass in
    // coefficient k=1 (still band 0); 63 crossings
    val alt = Array.tabulate(64)(n => (if (n % 2 == 0) 100 else -100).toShort)
    val Seq(f1) = AudioCodec.spectralFrames(AudioCodec.pcm16Wav(alt, 8000), 64, 4).get
    assert(f1.zcr === 63)
    assert(f1.bands.toSeq === Seq(6400L, 0L, 0L, 0L))
    // Walsh function for k=16 lands in band 1 (coefficients 16..31)
    val w16 = Array.tabulate(64)(n =>
      (if (java.lang.Integer.bitCount(n & 16) % 2 == 0) 50 else -50).toShort)
    val Seq(f2) = AudioCodec.spectralFrames(AudioCodec.pcm16Wav(w16, 8000), 64, 4).get
    assert(f2.bands.toSeq === Seq(0L, 3200L, 0L, 0L))
    // incomplete trailing frame dropped; garbage undecodable
    assert(AudioCodec.spectralFrames(
      AudioCodec.pcm16Wav(Array.fill(130)(1.toShort), 8000), 64, 4).get.size === 2)
    assert(AudioCodec.spectralFrames("not audio".getBytes, 64, 4).isEmpty)
  }

  test("audioSpectral dataset op: per-frame rows; undecodable payloads drop") {
    val wav = AudioCodec.pcm16Wav(
      Array.tabulate(192)(n => ((n * 13) % 201 - 100).toShort), 8000)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "audio", wav, AudioCodec.decodeMeta(wav).get),
      MediaRow(2L, "audio", "junk".getBytes,
        MediaMeta("bin", 0, 0, 0, 0, 0))))
    val out = audioSpectral(rows, 64, 4).collect()
    assert(out.map(_.media_id).toSet === Set(1L))
    assert(out.length === 3)
    val direct = AudioCodec.spectralFrames(wav, 64, 4).get
    assert(out.sortBy(_.frame).map(r => (r.frame, r.zcr, r.energy, r.bands.toSeq)).toSeq
      === direct.map(f => (f.frame, f.zcr, f.energy, f.bands.toSeq)))
  }

  test("Mp4Demux: real frame inventory from the checked-in MP4 fixture") {
    // tiny_clip.mp4 was hand-assembled by an independent generator: one
    // avc1 64x48 track, timescale 600, 6 samples of sizes 10..20 in two
    // 3-sample chunks, sync samples {1, 4}, 100-tick (166 ms) frame spacing
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/tiny_clip.mp4").toURI))
    val info = Mp4Demux.demux(bytes).get
    assert(info.brand == "isom")
    val t = info.tracks.find(_.handler == "vide").get
    assert(t.codec == "avc1" && t.width == 64 && t.height == 48)
    assert(t.timescale == 600 && t.durationMs == 1000 && t.sampleCount == 6)
    val s = info.videoSamples
    assert(s.map(_.size) == Seq(10, 12, 14, 16, 18, 20))
    assert(s.map(_.sync) == Seq(true, false, false, true, false, false))
    assert(s.map(_.timeMs) == Seq(0L, 166L, 333L, 500L, 666L, 833L))
    // chunk layout: samples 0-2 contiguous from chunk 1, 3-5 from chunk 2
    assert(s(1).offset == s(0).offset + 10 && s(2).offset == s(1).offset + 12)
    assert(s(3).offset == s(0).offset + 10 + 12 + 14)
    // payloads cut from the real ranges: sample i is byte 'A'+i repeated
    assert(Mp4Demux.samplePayload(bytes, s(0)).toSeq == Array.fill(10)('A'.toByte).toSeq)
    assert(Mp4Demux.samplePayload(bytes, s(5)).toSeq == Array.fill(20)('F'.toByte).toSeq)
    assert(Mp4Demux.keyframes(bytes).map(_.index) == Seq(0, 3))
    assert(Mp4Demux.demux("definitely not a video".getBytes).isEmpty)
  }

  test("videoFrames kernel samples container-true frames distributed") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/tiny_clip.mp4").toURI))
    val meta = videoMeta(bytes).get
    assert(meta.format == "avc1" && meta.width == 64 && meta.durationMs == 1000)
    val rows = Seq(
      MediaRow(1L, "video", bytes, meta),
      MediaRow(2L, "video", Array.fill[Byte](64)(9), StubCodec.decodeMeta(Array.fill[Byte](64)(9))))
    val frames = videoFrames(spark.createDataset(rows), everyNth = 2, maxFrames = 8)
      .collect().sortBy(_.frame_index)
    // non-MP4 row contributes nothing; MP4 row yields frames 0, 2, 4
    assert(frames.forall(_.media_id == 1L))
    assert(frames.map(_.frame_index).toSeq == Seq(0, 2, 4))
    assert(frames.map(_.payload.length).toSeq == Seq(10, 14, 18))
  }

  // closed-form pixel value of the MJPEG fixture (scripts/
  // gen_mjpeg_fixture.py): frame f, 48x32 px of constant 8x8 blocks
  private def mjpegPx(f: Int, y: Int, x: Int): Int =
    ((f * 53 + (y / 8) * 17 + (x / 8) * 29) % 32) * 8 + 4

  private lazy val mjpegBytes = {
    val in = getClass.getResourceAsStream("/graft/tiny_mjpeg.mp4")
    try in.readAllBytes() finally in.close()
  }

  test("VideoCodec: MJPEG frames decode EXACTLY to the generator's closed form") {
    // the fixture is built for exactness (DC-only blocks, unit quant
    // table, values divisible by 8 after level shift), so any conformant
    // JPEG decoder must reproduce every pixel bit-for-bit — this pins the
    // whole coded-frame path (demux byte ranges + entropy decode) against
    // the independent pure-Python encoder
    val info = Mp4Demux.demux(mjpegBytes).get
    val t = info.tracks.find(_.handler == "vide").get
    assert(t.codec == "jpeg" && t.width == 48 && t.height == 32)
    assert(VideoCodec.isMjpeg(t.codec) && VideoCodec.canDecode(mjpegBytes))
    assert(info.videoSamples.size == 6)
    assert(info.videoSamples.forall(_.sync), "no stss box ⇒ every frame sync")
    info.videoSamples.foreach { s =>
      val (h, w, px) = VideoCodec.decodeFramePlane(
        Mp4Demux.samplePayload(mjpegBytes, s)).get
      assert(h == 32 && w == 48)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == mjpegPx(s.index, y, x).toFloat,
          s"frame ${s.index} pixel ($y,$x)")
    }
    // an avc1 track is NOT decodable on this JVM — the guard must say so
    val avc1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/tiny_clip.mp4").toURI))
    assert(!VideoCodec.canDecode(avc1))
    assert(VideoCodec.decodeFramePlane("not a jpeg".getBytes).isEmpty)
  }

  test("decodeVideoFrames kernel: distributed decode, frames-as-rasters") {
    val meta = videoMeta(mjpegBytes).get
    val avc1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/tiny_clip.mp4").toURI))
    val rows = Seq(
      MediaRow(1L, "video", mjpegBytes, meta),
      MediaRow(2L, "video", avc1, videoMeta(avc1).get))   // undecodable codec
    val frames = decodeVideoFrames(
      spark.createDataset(rows).repartition(3), everyNth = 1, maxFrames = 16)
      .collect().sortBy(_.frame_index)
    assert(frames.forall(_.media_id == 1L), "avc1 track yields no planes")
    assert(frames.map(_.frame_index).toSeq == (0 until 6))
    assert(frames.map(_.time_ms).toSeq == Seq(0L, 100L, 200L, 300L, 400L, 500L))
    frames.foreach { fr =>
      assert(fr.height == 32 && fr.width == 48 && fr.sync)
      assert(fr.pixels(0) == mjpegPx(fr.frame_index, 0, 0).toFloat)
      assert(fr.pixels.length == 48 * 32)
    }
    // the planes feed the raster stack directly: tile a frame and band-math it
    val scenes = frames.take(1).map(fr => (s"v1_f${fr.frame_index}", "L",
      fr.height, fr.width, -1f, fr.pixels)).toSeq
      .toDF("scene_id", "band", "height", "width", "nodata", "pixels")
    val tiles = graft.raster.SceneIO.tileScene(scenes, 16, 16)
    assert(tiles.count() == 6) // 48x32 in 16x16 windows
  }

  test("decodeVideoFrames: avc1 (baseline H.264) decodes distributed, bit-exact luma") {
    val h264 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/tiny_h264.mp4").toURI))
    val oracle = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/h264/tiny_h264.yuv").toURI))
    val meta = videoMeta(h264).get
    assert(meta.format == "avc1")
    val frames = decodeVideoFrames(
      spark.createDataset(Seq(MediaRow(7L, "video", h264, meta))).repartition(2),
      everyNth = 1, maxFrames = 16)
      .collect().sortBy(_.frame_index)
    assert(frames.length == 3)
    val fb = 48 * 32 + 2 * 24 * 16
    frames.foreach { fr =>
      assert(fr.height == 32 && fr.width == 48 && fr.sync)
      val base = fr.frame_index * fb
      for (i <- 0 until 48 * 32)
        assert(fr.pixels(i) == (oracle(base + i) & 0xFF).toFloat,
          s"frame ${fr.frame_index} px $i")
    }
  }

  test("extractFeatures kernel: avc1 video rows get REAL H.264 keyframe features") {
    val h264 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/tiny_h264.mp4").toURI))
    val out = extractFeatures(
      spark.createDataset(Seq(MediaRow(9L, "video", h264, videoMeta(h264).get))),
      dim = 64)
      .collect().head
    val oracle = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/h264/tiny_h264.yuv").toURI))
    val expected = MultimodalFunctions.lumaGridFeatures(
      java.util.Arrays.copyOfRange(oracle, 0, 48 * 32), 48, 32, 8)
    assert(out.features.toSeq === expected.toSeq)
    assert(out.features.toSeq !==
      StubCodec.extractFeatures(h264, 64).toSeq)
  }

  test("extractFeatures kernel: MJPEG video rows get REAL keyframe features") {
    val meta = videoMeta(mjpegBytes).get
    val out = extractFeatures(
      spark.createDataset(Seq(MediaRow(5L, "video", mjpegBytes, meta))), dim = 64)
      .collect().head
    val expected = ImageCodec.intensityFeatures(
      Mp4Demux.samplePayload(mjpegBytes, Mp4Demux.keyframes(mjpegBytes, 1).head),
      8).get
    assert(out.features.toSeq === expected.toSeq)
    // and NOT the byte-hash stub
    assert(out.features.toSeq !==
      StubCodec.extractFeatures(mjpegBytes, 64).toSeq)
  }

  test("Mp4Demux + video kernels survive truncation/corruption fuzz") {
    // the ingest contract at corpus scale: a damaged container yields None
    // or fewer frames — it never throws out of the kernel functions (one
    // bad file in a 100 TB media scan must not fail its task)
    def kernelsNeverThrow(b: Array[Byte]): Unit = {
      Mp4Demux.demux(b) // Option, or would throw here
      Mp4Demux.sampleFrames(b, 1, 16).foreach { s =>
        Mp4Demux.samplePayloadOpt(b, s).foreach(p =>
          VideoCodec.decodeFramePlane(p))
      }
      VideoCodec.canDecode(b)
    }
    // every truncation prefix (box walks must stop at the cliff)
    var n = 0
    while (n < mjpegBytes.length) {
      kernelsNeverThrow(java.util.Arrays.copyOf(mjpegBytes, n))
      n += 3
    }
    // deterministic single-byte corruptions across the whole container
    // (box sizes, sample tables, JPEG entropy data all get hit)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val b = mjpegBytes.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      kernelsNeverThrow(b)
    }
    // a sample table pointing outside the file drops frames, not tasks:
    // find stsz via a demuxed sample and forge an oversized range
    val good = Mp4Demux.demux(mjpegBytes).get.videoSamples.head
    val forged = good.copy(offset = mjpegBytes.length.toLong - 2, size = 100)
    assert(Mp4Demux.samplePayloadOpt(mjpegBytes, forged).isEmpty)
    assert(intercept[IllegalArgumentException](
      Mp4Demux.samplePayload(mjpegBytes, forged)).getMessage.contains("outside"))
    // a forged huge entry count in ANY sample table must be rejected by the
    // box-size check BEFORE allocation (a 0x7fffffff count would otherwise
    // size a multi-GB array — OutOfMemoryError, which kills the task
    // outright rather than surfacing as a droppable bad file)
    for (table <- Seq("stsz", "stco", "stsc", "stts", "stss")) {
      val pat = table.getBytes("US-ASCII")
      val at = mjpegBytes.indexOfSlice(pat)
      if (at >= 0) {
        val b = mjpegBytes.clone()
        // entry count: stsz keeps it at +12 (after fixed-size), others at +8
        val countAt = at + (if (table == "stsz") 12 else 8)
        b(countAt) = 0x7f.toByte; b(countAt + 1) = 0xff.toByte
        b(countAt + 2) = 0xff.toByte; b(countAt + 3) = 0xff.toByte
        kernelsNeverThrow(b)
      }
    }
  }

  test("resize kernel rewrites payload + meta, deterministic across partitioning") {
    val rows = (0 until 10).map(i => MediaRow(i.toLong, "image", jpegBytes(500 + i),
      StubCodec.decodeMeta(jpegBytes(500 + i))))
    val r1 = resize(spark.createDataset(rows).repartition(1), 64, 48).collect()
      .map(r => r.media_id -> (r.content.toSeq, r.meta)).toMap
    val r4 = resize(spark.createDataset(rows).repartition(4), 64, 48).collect()
      .map(r => r.media_id -> (r.content.toSeq, r.meta)).toMap
    assert(r1 == r4)
    assert(r1.values.forall { case (bytes, meta) =>
      bytes.size == 64 * 48 && meta.width == 64 && meta.height == 48 })
  }
}
