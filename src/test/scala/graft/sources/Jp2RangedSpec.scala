package graft.sources

import graft.SparkSpec

/** The ranged JP2 decode's two contracts: (1) the IO strategy never
  * changes the answer — bit-identity with the in-memory windowed decode
  * on every fixture shape; (2) only planned bytes matter — serving the
  * same reads from a garbage-filled copy of the file (every unfetched
  * byte corrupted) still produces the identical result, which proves the
  * planner's byte ranges cover everything the decoder touches. */
class Jp2RangedSpec extends SparkSpec {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def readerOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
    (ofs, len) => java.util.Arrays.copyOfRange(bytes, ofs.toInt, ofs.toInt + len)

  /** Reader that records fetched ranges, serving from `bytes`. */
  private final class Recording(bytes: Array[Byte]) {
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val read: (Long, Int) => Array[Byte] = { (ofs, len) =>
      ranges += ((ofs, len))
      java.util.Arrays.copyOfRange(bytes, ofs.toInt, ofs.toInt + len)
    }
  }

  // fixture names are h x w (battery convention); tuples below are (res, w, h)
  private val windowedFixtures = Seq(
    ("/graft/jp2/plt_96x64_d12_p5.j2k", 64, 96),            // PLT + precincts
    ("/graft/jp2/pltkakadu_96x96_d12_t64.j2k", 96, 96),     // PLT + tiles + 2 tile-parts
    ("/graft/jp2/pltlayers_48x48_d12_l3.j2k", 48, 48),      // PLT + 3 layers
    ("/graft/jp2/prec_96x64_d12_p5.j2k", 64, 96),           // precincts, NO PLT (fallback)
    ("/graft/jp2/kakadu_96x96_d12_t64.j2k", 96, 96),        // tiles, NO PLT
    ("/graft/tiny_band_B02.jp2", 97, 61))                   // JP2 container

  // fixtures are a few KB, so observable pruning needs sub-file blocks;
  // production uses the 64 KB default (headers are KBs, bodies are MBs)
  private val B = 256

  test("ranged window decode is bit-identical to the in-memory decode, on garbage too") {
    for ((res, w, h) <- windowedFixtures) {
      val bytes = resource(res)
      val windows = Seq(
        (0, 0, 16, 16), (w - 9, h - 7, 9, 7),
        (w / 3, h / 3, math.min(24, w - w / 3), math.min(24, h - h / 3)),
        (w / 2, h / 2, 1, 1), (0, 0, w, h))
      for ((x0, y0, ww, wh) <- windows) {
        val expect = Jp2Decode.decodeWindow(bytes, x0, y0, ww, wh)
        val rec = new Recording(bytes)
        val (got, io) = Jp2Ranged.decodeWindow(rec.read, bytes.length, x0, y0, ww, wh, blockSize = B)
        assert(got.height == expect.height && got.width == expect.width &&
          got.comps == expect.comps, s"$res window ($x0,$y0,$ww,$wh) dims")
        for (c <- 0 until got.comps)
          assert(got.planes(c).sameElements(expect.planes(c)),
            s"$res window ($x0,$y0,$ww,$wh) comp $c pixels differ")
        assert(io.bytesRead <= 2L * bytes.length, s"$res io accounting sane")
        // garbage-independence: corrupt every byte OUTSIDE the recorded
        // ranges; the same decode must not notice
        val garbled = bytes.clone()
        val touched = new Array[Boolean](bytes.length)
        rec.ranges.foreach { case (o, l) =>
          var i = 0; while (i < l) { touched(o.toInt + i) = true; i += 1 }
        }
        var i = 0
        while (i < garbled.length) {
          if (!touched(i)) garbled(i) = 0xA5.toByte
          i += 1
        }
        val (got2, _) = Jp2Ranged.decodeWindow(readerOf(garbled), garbled.length,
          x0, y0, ww, wh, blockSize = B)
        for (c <- 0 until got.comps)
          assert(got2.planes(c).sameElements(expect.planes(c)),
            s"$res window ($x0,$y0,$ww,$wh): decode read an unplanned byte")
      }
    }
  }

  test("PLT streams fetch a FRACTION of the body for a small window; no-PLT tiles fall back whole") {
    // the PLT fixture: a corner probe must not fetch the whole stream
    val plt = resource("/graft/jp2/plt_96x64_d12_p5.j2k")
    val (_, ioPlt) = Jp2Ranged.decodeWindow(readerOf(plt), plt.length, 0, 0, 8, 8, blockSize = B)
    assert(ioPlt.bytesRead < plt.length,
      s"PLT probe fetched ${ioPlt.bytesRead} of ${plt.length} — no pruning?")
    assert(ioPlt.fallbackWholeBody === 0L,
      "a complete PLT must not report any whole-body fallback")
    // same geometry WITHOUT PLT: the needed tile's body fetches whole, so
    // strictly more bytes than the PLT plan (headers are tiny here, so
    // compare the probes directly)
    val noPlt = resource("/graft/jp2/prec_96x64_d12_p5.j2k")
    val (_, ioNo) = Jp2Ranged.decodeWindow(readerOf(noPlt), noPlt.length, 0, 0, 8, 8, blockSize = B)
    assert(ioNo.bytesRead >= noPlt.length - 64,
      "single-tile stream without PLT must fetch ~the whole body")
    assert(ioNo.fallbackWholeBody === 1L,
      "the needed no-PLT tile must surface in the fallback stat")
    // tiled stream without PLT: a one-tile window fetches ~that tile only
    val kdu = resource("/graft/jp2/kakadu_96x96_d12_t64.j2k")
    val full = Jp2Decode.decodeWindow(kdu, 0, 0, 8, 8)
    val (gotK, ioK) = Jp2Ranged.decodeWindow(readerOf(kdu), kdu.length, 0, 0, 8, 8, blockSize = B)
    assert(gotK.planes(0).sameElements(full.planes(0)))
    assert(ioK.bytesRead < kdu.length,
      s"2x2-tile corner probe fetched ${ioK.bytesRead} of ${kdu.length}")
  }

  test("ranged overview read matches the in-memory reduced-resolution decode") {
    for ((res, _, _) <- windowedFixtures) {
      val bytes = resource(res)
      val expect = Jp2Decode.decodeMulti(bytes, discardLevels = 2)
      val (got, io) = Jp2Ranged.decodeLevel(readerOf(bytes), bytes.length,
        discardLevels = 2, blockSize = B)
      assert(got.height == expect.height && got.width == expect.width, res)
      for (c <- 0 until got.comps)
        assert(got.planes(c).sameElements(expect.planes(c)),
          s"$res overview pixels differ")
      assert(io.bytesRead <= 2L * bytes.length)
    }
    // with PLT the dropped resolutions' packets stay unfetched
    val plt = resource("/graft/jp2/pltlayers_48x48_d12_l3.j2k")
    val (_, io2) = Jp2Ranged.decodeLevel(readerOf(plt), plt.length, discardLevels = 2, blockSize = B)
    assert(io2.bytesRead < plt.length,
      s"overview fetched ${io2.bytesRead} of ${plt.length} — detail packets not pruned?")
  }

  test("readJp2ScenesRanged: distributed ranged reads match the in-memory reader") {
    val dir = java.nio.file.Files.createTempDirectory("jp2ranged")
    for ((res, _, _) <- windowedFixtures.take(3)) { // the PLT trio
      val name = res.substring(res.lastIndexOf('/') + 1)
        .replace(".j2k", "").replace(".jp2", "")
      java.nio.file.Files.write(dir.resolve(s"S_${name}__B02.j2k"), resource(res))
    }
    val win = Some((4, 8, 20, 12))
    val ranged = graft.raster.SceneIO
      .readJp2ScenesRanged(spark, dir.toString, window = win)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getSeq[Float](5).toSeq, r.getLong(6), r.getLong(7))).sortBy(_._1)
    val plain = graft.raster.SceneIO
      .readJp2Scenes(spark, dir.toString, window = win)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getSeq[Float](5).toSeq)).sortBy(_._1)
    assert(ranged.length == 3 && plain.length == 3)
    ranged.zip(plain).foreach { case ((id, b, h, w, px, bytes, reqs), (id2, b2, h2, w2, px2)) =>
      assert(id == id2 && b == b2 && h == h2 && w == w2)
      assert(px == px2, s"$id ranged pixels differ from in-memory")
      assert(bytes > 0 && reqs > 0, s"$id must report its IO")
    }
  }

  test("multi-component (RGB + RCT) container decodes ranged, windowed, bit-exact") {
    val bytes = resource("/graft/pvi_64x96_d8_l2.jp2")
    val expect = Jp2Decode.decodeWindow(bytes, 10, 20, 30, 25)
    val (got, _) = Jp2Ranged.decodeWindow(readerOf(bytes), bytes.length, 10, 20, 30, 25, blockSize = B)
    assert(got.comps == 3)
    for (c <- 0 until 3)
      assert(got.planes(c).sameElements(expect.planes(c)), s"comp $c differs")
  }
}
