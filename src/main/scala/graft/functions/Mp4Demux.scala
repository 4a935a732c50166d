package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Real MP4 / ISO-BMFF container demuxer (video path of SURVEY §multimodal).
  *
  * The JDK has no video DECODER, but container demux needs none: the ISO
  * base-media box structure (ftyp/moov/trak/mdia/minf/stbl) is plain
  * big-endian byte parsing, the same class of work as the
  * [[graft.raster.GeoTiff]] and [[graft.sources.Hdf4]] layers. From the
  * sample tables (stsd/stts/stsz/stsc/stco/stss) this recovers, per video
  * track, the REAL frame inventory: byte offset + size + timestamp + sync
  * flag for every sample — which is exactly what frame-sampling pipelines
  * need (cut keyframe payloads, ship them to a decode stage). Decoding the
  * H.264/H.265 payload itself remains out of scope (no JDK codec); the
  * payload bytes come out verbatim for a downstream decoder.
  *
  * Parsing is executor-local and allocation-light; at corpus scale it runs
  * inside `mapPartitions` over `binaryFile` rows like the other codecs.
  */
object Mp4Demux {

  /** `codecConfig`: the decoder-configuration child box payload of the
    * sample entry when one exists (avcC for 'avc1', hvcC for 'hvc1'/'hev1',
    * esds for 'mp4a'...) — the out-of-band parameter sets a NAL-sample
    * decoder needs. Empty for self-contained codecs (MJPEG). */
  final case class Track(handler: String, codec: String, timescale: Long,
                         durationMs: Long, width: Int, height: Int,
                         sampleCount: Int,
                         codecConfig: Array[Byte] = Array.empty)
  /** One sample (= one video frame for video tracks): real byte range in
    * the file, presentation time, and whether it is a sync (key) frame. */
  final case class Sample(index: Int, offset: Long, size: Int,
                          timeMs: Long, sync: Boolean)
  final case class Mp4Info(brand: String, tracks: Seq[Track],
                           videoSamples: Seq[Sample])

  /** None when the payload is not ISO-BMFF. */
  def demux(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes.length < 16) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (fourcc(buf, 4) != "ftyp") return None
    try {
      val brand = fourcc(buf, 8)
      val tracks = ArrayBuffer.empty[Track]
      var videoSamples: Seq[Sample] = Nil
      foreachBox(buf, 0, bytes.length) { (typ, start, end) =>
        if (typ == "moov") foreachBox(buf, start, end) { (t2, s2, e2) =>
          if (t2 == "trak") {
            val (track, samples) = parseTrak(buf, s2, e2)
            tracks += track
            if (track.handler == "vide" && videoSamples.isEmpty)
              videoSamples = samples
          }
        }
      }
      Some(Mp4Info(brand, tracks.toSeq, videoSamples))
    } catch { case _: Exception => None }
  }

  /** Every `everyNth`-th video frame (up to `maxFrames`), with real byte
    * ranges — the container-true replacement for byte-stride sampling. */
  def sampleFrames(bytes: Array[Byte], everyNth: Int, maxFrames: Int): Seq[Sample] =
    demux(bytes).map(_.videoSamples.grouped(everyNth).map(_.head)
      .take(maxFrames).toSeq).getOrElse(Nil)

  /** Keyframes only (the usual thumbnail/shot-detection sampling set). */
  def keyframes(bytes: Array[Byte], maxFrames: Int = Int.MaxValue): Seq[Sample] =
    demux(bytes).map(_.videoSamples.filter(_.sync).take(maxFrames)).getOrElse(Nil)

  /** Cut a sample's payload out of the container (verbatim coded bytes). */
  def samplePayload(bytes: Array[Byte], s: Sample): Array[Byte] = {
    require(s.offset >= 0 && s.offset + s.size <= bytes.length,
      s"sample range [${s.offset}, ${s.offset + s.size}) outside payload")
    java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.size)
  }

  /** Range-checked payload cut: None when a (corrupt) stsz/stco points a
    * sample outside the file. The streaming kernels use this so one bad
    * container drops its frames instead of failing the ingest task. */
  def samplePayloadOpt(bytes: Array[Byte], s: Sample): Option[Array[Byte]] =
    if (s.offset >= 0 && s.size >= 0 && s.offset + s.size <= bytes.length)
      Some(java.util.Arrays.copyOfRange(bytes, s.offset.toInt,
        s.offset.toInt + s.size))
    else None

  // ------------------------------------------------------------------ boxes

  private def fourcc(buf: ByteBuffer, pos: Int): String =
    new String(Array(buf.get(pos), buf.get(pos + 1), buf.get(pos + 2),
      buf.get(pos + 3)), "US-ASCII")

  /** Iterate the child boxes of [from, until): f(type, payloadStart, payloadEnd). */
  private def foreachBox(buf: ByteBuffer, from: Int, until: Int)
                        (f: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p + 8 <= until) {
      val size32 = buf.getInt(p).toLong & 0xffffffffL
      val typ = fourcc(buf, p + 4)
      val (size, hdr) =
        if (size32 == 1) (buf.getLong(p + 8), 16) // 64-bit largesize
        else if (size32 == 0) ((until - p).toLong, 8) // box runs to EOF
        else (size32, 8)
      require(size >= hdr && p + size <= until, s"malformed box '$typ' at $p")
      f(typ, p + hdr, p + size.toInt)
      p += size.toInt
    }
  }

  private def findBox(buf: ByteBuffer, from: Int, until: Int,
                      typ: String): Option[(Int, Int)] = {
    var r: Option[(Int, Int)] = None
    foreachBox(buf, from, until) { (t, s, e) => if (t == typ && r.isEmpty) r = Some((s, e)) }
    r
  }

  /** Validate a sample-table entry count BEFORE allocating for it: the
    * count field is untrusted input, and a corrupt u32 there would size an
    * `Array.tabulate` in the gigabytes — an OutOfMemoryError that no
    * `catch Exception` contains. The box payload length bounds the real
    * count exactly (n fixed-size entries must fit in [tableStart, end)). */
  private def checkedCount(n: Int, tableStart: Int, end: Int,
                           entrySize: Int, what: String): Int = {
    require(n >= 0 && n.toLong * entrySize <= (end - tableStart).toLong,
      s"$what entry count $n exceeds box payload ${end - tableStart}")
    n
  }

  private def parseTrak(buf: ByteBuffer, from: Int, until: Int): (Track, Seq[Sample]) = {
    val (mdiaS, mdiaE) = findBox(buf, from, until, "mdia")
      .getOrElse(throw new IllegalArgumentException("trak without mdia"))
    // mdhd: version(1)+flags(3), then v0: ctime/mtime u32 ×2, timescale u32, duration u32
    val (mdhdS, _) = findBox(buf, mdiaS, mdiaE, "mdhd")
      .getOrElse(throw new IllegalArgumentException("mdia without mdhd"))
    val v = buf.get(mdhdS) & 0xff
    val (timescale, duration) =
      if (v == 1) (buf.getInt(mdhdS + 20).toLong & 0xffffffffL, buf.getLong(mdhdS + 24))
      else (buf.getInt(mdhdS + 12).toLong & 0xffffffffL,
        buf.getInt(mdhdS + 16).toLong & 0xffffffffL)
    val (hdlrS, _) = findBox(buf, mdiaS, mdiaE, "hdlr")
      .getOrElse(throw new IllegalArgumentException("mdia without hdlr"))
    val handler = fourcc(buf, hdlrS + 8)
    val (minfS, minfE) = findBox(buf, mdiaS, mdiaE, "minf")
      .getOrElse(throw new IllegalArgumentException("mdia without minf"))
    val (stblS, stblE) = findBox(buf, minfS, minfE, "stbl")
      .getOrElse(throw new IllegalArgumentException("minf without stbl"))

    // stsd: entry count, then first sample entry: size u32 + fourcc; for
    // video entries width/height live at fixed offsets 24/26 into the entry
    val (codec, width, height, codecCfg) = findBox(buf, stblS, stblE, "stsd").map { case (s, e) =>
      val entry = s + 8
      val cc = fourcc(buf, entry + 4)
      if (handler == "vide") {
        // decoder-configuration child boxes (avcC/hvcC/...) follow the
        // 78-byte VisualSampleEntry fixed part (size+fourcc excluded)
        val entryEnd = math.min(entry + buf.getInt(entry), e)
        var p = entry + 8 + 78
        var cfg = Array.empty[Byte]
        while (cfg.isEmpty && p + 8 <= entryEnd) {
          val bl = buf.getInt(p)
          val bt = fourcc(buf, p + 4)
          if (bl < 8 || p + bl > entryEnd) p = entryEnd // malformed: stop
          else if (bt == "avcC" || bt == "hvcC" || bt == "esds") {
            cfg = new Array[Byte](bl - 8)
            var i = 0
            while (i < cfg.length) { cfg(i) = buf.get(p + 8 + i); i += 1 }
          } else p += bl
        }
        (cc, buf.getShort(entry + 32) & 0xffff,
          buf.getShort(entry + 34) & 0xffff, cfg)
      } else (cc, 0, 0, Array.empty[Byte])
    }.getOrElse(("", 0, 0, Array.empty[Byte]))

    val sizes: Array[Int] = findBox(buf, stblS, stblE, "stsz").map { case (s, e) =>
      val fixed = buf.getInt(s + 4)
      val n = buf.getInt(s + 8)
      // fixed-size mode carries no table, so the box can't bound n; the n
      // samples of `fixed` bytes each must still FIT in the file, so the
      // sound cap is n·fixed ≤ capacity (entrySize = fixed, floored at 1
      // so a corrupt fixed ≤ 0 can't defeat the bound)
      if (fixed != 0)
        Array.fill(checkedCount(n, 0, buf.capacity(), math.max(fixed, 1), "stsz"))(fixed)
      else Array.tabulate(checkedCount(n, s + 12, e, 4, "stsz"))(i => buf.getInt(s + 12 + 4 * i))
    }.getOrElse(Array.empty)

    val chunkOffsets: Array[Long] =
      findBox(buf, stblS, stblE, "stco").map { case (s, e) =>
        val n = checkedCount(buf.getInt(s + 4), s + 8, e, 4, "stco")
        Array.tabulate(n)(i => buf.getInt(s + 8 + 4 * i).toLong & 0xffffffffL)
      }.orElse(findBox(buf, stblS, stblE, "co64").map { case (s, e) =>
        val n = checkedCount(buf.getInt(s + 4), s + 8, e, 8, "co64")
        Array.tabulate(n)(i => buf.getLong(s + 8 + 8 * i))
      }).getOrElse(Array.empty)

    // stsc runs: (first_chunk, samples_per_chunk, desc_idx)
    val stscRuns: Array[(Int, Int)] = findBox(buf, stblS, stblE, "stsc").map { case (s, e) =>
      val n = checkedCount(buf.getInt(s + 4), s + 8, e, 12, "stsc")
      Array.tabulate(n)(i =>
        (buf.getInt(s + 8 + 12 * i), buf.getInt(s + 12 + 12 * i)))
    }.getOrElse(Array.empty)

    // stts runs: (sample_count, sample_delta) → per-sample decode times
    val sttsRuns: Array[(Int, Int)] = findBox(buf, stblS, stblE, "stts").map { case (s, e) =>
      val n = checkedCount(buf.getInt(s + 4), s + 8, e, 8, "stts")
      Array.tabulate(n)(i => (buf.getInt(s + 8 + 8 * i), buf.getInt(s + 12 + 8 * i)))
    }.getOrElse(Array.empty)

    val syncSet: Set[Int] = findBox(buf, stblS, stblE, "stss").map { case (s, e) =>
      val n = checkedCount(buf.getInt(s + 4), s + 8, e, 4, "stss")
      (0 until n).map(i => buf.getInt(s + 8 + 4 * i)).toSet // 1-based
    }.getOrElse(Set.empty)
    val allSync = syncSet.isEmpty // no stss box ⇒ every sample is sync

    // walk chunks: expand stsc runs, lay samples into chunk offsets
    val samples = ArrayBuffer.empty[Sample]
    if (sizes.nonEmpty && chunkOffsets.nonEmpty && stscRuns.nonEmpty) {
      // run sample-counts are values (not entry counts), so the box size
      // can't bound their sum — cap the expansion at the validated sample
      // count before materializing
      val times = sttsRuns.iterator
        .flatMap { case (c, d) => Iterator.fill(math.max(c, 0))(d.toLong) }
        .scanLeft(0L)(_ + _).take(sizes.length + 1).toArray
      var sample = 0
      var chunk = 0
      while (chunk < chunkOffsets.length && sample < sizes.length) {
        val perChunk = stscRuns.reverseIterator
          .find(_._1 <= chunk + 1).map(_._2).getOrElse(1)
        var ofs = chunkOffsets(chunk)
        var i = 0
        while (i < perChunk && sample < sizes.length) {
          val tMs = if (sample < times.length && timescale > 0)
            times(sample) * 1000L / timescale else 0L
          samples += Sample(sample, ofs, sizes(sample), tMs,
            allSync || syncSet.contains(sample + 1))
          ofs += sizes(sample)
          sample += 1
          i += 1
        }
        chunk += 1
      }
    }
    val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
    (Track(handler, codec, timescale, durMs, width, height, sizes.length,
      codecCfg),
      samples.toSeq)
  }
}
