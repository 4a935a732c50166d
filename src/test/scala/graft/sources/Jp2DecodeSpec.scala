package graft.sources

import graft.SparkSpec
import graft.raster.{RasterKernels, SceneIO}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Conformance of the JPEG 2000 reversible-path decoder against fixtures
  * generated AND self-checked by an independent implementation
  * (scripts/jp2codec.py, written from ITU-T T.800 separately from
  * Jp2Decode) — the same two-implementations method as tiny_scene_B1.tif
  * for the GeoTIFF codec. Both fixtures carry deterministic closed-form
  * pixels, so expectations here recompute the formula, not the file. */
class Jp2DecodeSpec extends SparkSpec {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  // fixture formulas (scripts/gen_jp2_fixture.py)
  private def containerPx(r: Int, c: Int): Float = ((r * 31 + c * 7) % 3000).toFloat
  private def rawPx(r: Int, c: Int): Float = ((r * 13 + c * 5) % 997).toFloat

  test("JP2 container fixture decodes bit-exact (97x61, 12-bit, 2 levels, ragged 32x32 blocks)") {
    val img = Jp2Decode.decode(resource("/graft/tiny_band_B02.jp2"))
    assert(img.height == 61 && img.width == 97 && img.depth == 12)
    for (r <- 0 until 61; c <- 0 until 97)
      assert(img.pixels(r * 97 + c) == containerPx(r, c),
        s"pixel ($r,$c): ${img.pixels(r * 97 + c)} != ${containerPx(r, c)}")
    // the header parser and the pixel decoder must agree on geometry
    val meta = Jp2.parse(resource("/graft/tiny_band_B02.jp2"))
    assert(meta.height == img.height && meta.width == img.width &&
      meta.bitDepth == img.depth && meta.components == 1)
  }

  test("raw J2K codestream fixture decodes bit-exact (23x10, 10-bit, 1 level, sub-block dims)") {
    val img = Jp2Decode.decode(resource("/graft/tiny_band_raw.j2k"))
    assert(img.height == 10 && img.width == 23 && img.depth == 10)
    for (r <- 0 until 10; c <- 0 until 23)
      assert(img.pixels(r * 23 + c) == rawPx(r, c))
  }

  test("parameter-space battery: 24 independently-encoded fixtures decode bit-exact") {
    // scripts/gen_jp2_battery.py — each stream self-checked by the Python
    // reference decoder before check-in; expectations below recompute each
    // fixture's closed-form formula, independent of both codecs. The matrix
    // walks the subset's edges: levels=0 (no wavelet), 1x1 / single-row /
    // single-column images, sub-code-block and ragged multi-block grids,
    // cb 16..64, depth 8/12/16, an all-empty-packet constant image, and
    // hash-noise (dense sign coding, RL interruptions, deep bitplanes).
    final case class Case(name: String, h: Int, w: Int, depth: Int,
                          px: (Int, Int) => Int)
    def lin(w: Int, a: Int, b: Int, m: Int): (Int, Int) => Int =
      (r, c) => (r * a + c * b) % m
    def hashPx(w: Int, depth: Int): (Int, Int) => Int = { (r, c) =>
      val i = r.toLong * w + c
      (((i * 2654435761L) >> 13) & ((1L << depth) - 1)).toInt
    }
    val cases = Seq(
      Case("lv0_16x16_d8", 16, 16, 8, lin(16, 11, 3, 256)),
      Case("lv1_1x1_d8", 1, 1, 8, (_, _) => 0),
      Case("lv2_1x37_d8", 1, 37, 8, lin(37, 0, 9, 251)),
      Case("lv2_29x1_d8", 29, 1, 8, lin(1, 7, 0, 241)),
      Case("lv1_5x3_d8", 5, 3, 8, lin(3, 17, 29, 256)),
      Case("lv3_40x33_d12_cb16", 40, 33, 12, lin(33, 59, 23, 4096)),
      Case("lv5_96x80_d16_cb64", 96, 80, 16, lin(80, 131, 61, 65536)),
      Case("const_33x17_d12", 33, 17, 12, (_, _) => 2048),
      Case("noise_47x31_d12_cb16", 47, 31, 12, hashPx(31, 12)),
      Case("noise_64x64_d16_cb64", 64, 64, 16, hashPx(64, 16)),
      // tiled codestreams (the Sentinel-2 container shape): ragged tile
      // grids, per-tile wavelet + packets, multi-tile-part with Psot=0
      Case("tiled_80x112_d12_t48", 80, 112, 12, hashPx(112, 12)),
      Case("tiled_53x71_d10_t32", 53, 71, 10, lin(71, 41, 13, 1024)),
      Case("tileparts_64x64_d12_tp3", 64, 64, 12, hashPx(64, 12)),
      // SOP/EPH packet framing over a tiled stream (Scod bits 1|2)
      Case("sopeph_48x80_d12_t32", 48, 80, 12, hashPx(80, 12)),
      // custom precincts: multiple packets per resolution, block size
      // clamped to the precinct; plus the full Kakadu Sentinel-2 shape
      // (tiled + per-resolution precincts + SOP/EPH) in miniature
      Case("prec_96x64_d12_p5", 96, 64, 12, hashPx(64, 12)),
      Case("kakadu_96x96_d12_t64", 96, 96, 12, hashPx(96, 12)),
      // quality layers (B.10 layer machinery: tag-tree first inclusion at
      // threshold layer+1, 1-bit re-inclusion, Lblock across packets) in
      // all three in-subset progressions; plus everything-at-once
      Case("layers3_48x48_d12_lrcp", 48, 48, 12, hashPx(48, 12)),
      Case("layers2_40x56_d12_rlcp", 40, 56, 12, hashPx(56, 12)),
      Case("works_64x96_d12_l3", 64, 96, 12, hashPx(96, 12)),
      // the position-major progressions (T.800 B.12.1.4/5): PCRL over a
      // tiled stream, CPRL with small precincts — positions genuinely
      // interleave resolutions in both
      Case("pcrl_48x80_d12_t32", 48, 80, 12, hashPx(80, 12)),
      Case("cprl_64x64_d12_p4", 64, 64, 12, hashPx(64, 12)),
      // PLT packet-length tables (A.7.3): full decode must be identical
      // with the length index present (walked packets cross-check their
      // Iplt entries) — standalone, the full Kakadu shape with 2
      // tile-parts (per-tile-part PLT slices), and quality layers
      Case("plt_96x64_d12_p5", 96, 64, 12, hashPx(64, 12)),
      Case("pltkakadu_96x96_d12_t64", 96, 96, 12, hashPx(96, 12)),
      Case("pltlayers_48x48_d12_l3", 48, 48, 12, hashPx(48, 12)))
    for (c <- cases) {
      val img = Jp2Decode.decode(resource(s"/graft/jp2/${c.name}.j2k"))
      assert(img.height == c.h && img.width == c.w && img.depth == c.depth,
        s"${c.name}: geometry ${img.width}x${img.height}@${img.depth}")
      for (r <- 0 until c.h; x <- 0 until c.w)
        assert(img.pixels(r * c.w + x) == c.px(r, x).toFloat,
          s"${c.name} pixel ($r,$x): ${img.pixels(r * c.w + x)} != ${c.px(r, x)}")
    }
  }

  test("a PLT length that disagrees with the walked packet fails loudly") {
    // encoder/decoder drift in the length table must not desync later
    // seeks silently — the walked-packet cross-check names PLT
    val raw = resource("/graft/jp2/plt_96x64_d12_p5.j2k")
    var i = 0
    while (!((raw(i) & 0xFF) == 0xFF && (raw(i + 1) & 0xFF) == 0x90)) i += 1
    val plt = i + 12 // single tile-part: PLT directly follows the SOT segment
    assert((raw(plt) & 0xFF) == 0xFF && (raw(plt + 1) & 0xFF) == 0x58,
      "fixture layout drifted: no PLT after SOT")
    val lplt = ((raw(plt + 2) & 0xFF) << 8) | (raw(plt + 3) & 0xFF)
    val last = plt + 2 + lplt - 1 // final varint byte = last packet's length
    raw(last) = (raw(last) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Jp2Decode.decode(raw))
    assert(e.getMessage.contains("PLT"), e.getMessage)
  }

  test("multi-component battery: RGB with and without the RCT decodes bit-exact per plane") {
    // scripts/gen_jp2_battery.py MULTI_CASES — per-component closed-form
    // hash planes v(ci, i) = ((i * (2654435761 + ci*97)) >> 13) & mask.
    // Covers 3-component packets in LRCP/RPCL/PCRL/CPRL, the reversible
    // color transform (T.800 G.2), and the PVI-quicklook miniature
    // (RGB + RCT + tiled + precincts + SOP/EPH + layers in a JP2
    // container with an sRGB colr box — the publish.py:178-179 asset).
    def plane(ci: Int, w: Int, depth: Int): (Int, Int) => Int = { (r, c) =>
      val i = r.toLong * w + c
      (((i * (2654435761L + ci * 97L)) >> 13) & ((1L << depth) - 1)).toInt
    }
    val cases = Seq(
      ("rgb_40x56_d8_lrcp.j2k", 40, 56, 8),
      ("rgb_33x47_d8_pcrl.j2k", 33, 47, 8),
      ("rct_48x64_d8_rpcl.j2k", 48, 64, 8),
      ("rct_56x40_d8_cprl.j2k", 56, 40, 8),
      ("pvi_64x96_d8_l2.jp2", 64, 96, 8))
    for ((name, h, w, depth) <- cases) {
      val img = Jp2Decode.decodeMulti(resource(s"/graft/jp2/$name"))
      assert(img.height == h && img.width == w && img.depth == depth &&
        img.comps == 3, s"$name: geometry/components")
      for (ci <- 0 until 3; r <- 0 until h; c <- 0 until w)
        assert(img.planes(ci)(r * w + c) == plane(ci, w, depth)(r, c).toFloat,
          s"$name comp $ci pixel ($r,$c)")
    }
    // the single-component entry point refuses multi-component streams
    // with a pointer at decodeMulti, not a wrong answer
    val e = intercept[IllegalArgumentException](
      Jp2Decode.decode(resource("/graft/jp2/pvi_64x96_d8_l2.jp2")))
    assert(e.getMessage.contains("decodeMulti"), e.getMessage)
    // and the container header agrees with the pixel decoder
    val meta = Jp2.parse(resource("/graft/jp2/pvi_64x96_d8_l2.jp2"))
    assert(meta.components == 3 && meta.height == 64 && meta.width == 96)
  }

  test("irreversible 9/7 battery: bit-exact vs the independent decoder, bounded error vs the source") {
    // scripts/gen_jp2_battery.py IRREV_CASES — the lossy path (scalar
    // quantization, float 9/7 DWT, ICT for RGB) is not bit-exact against
    // the input formula, so conformance is two-sided: (1) the decode must
    // BIT-match the `.px.txt` sidecar written by the independent Python
    // decoder (both implement the same IEEE-double dequant + synthesis +
    // ICT + half-even rounding, so agreement is exact), and (2) it must
    // sit within the quantization error bound of the closed-form source
    // pixels — an expectation independent of BOTH implementations, so a
    // shared misreading of T.800 cannot fake (2) green.
    def srcPx(ci: Int, w: Int, depth: Int)(r: Int, c: Int): Int = {
      val i = r.toLong * w + c
      (((i * (2654435761L + ci * 97L)) >> 13) & ((1L << depth) - 1)).toInt
    }
    val cases = Seq(
      // name, h, w, depth, ncomp, qstep, ext
      ("i97_40x56_d8", 40, 56, 8, 1, 0.0625, "j2k"),
      ("i97_1x37_d8", 1, 37, 8, 1, 0.0625, "j2k"),        // single row
      ("i97_29x1_d8", 29, 1, 8, 1, 0.0625, "j2k"),        // single column
      ("i97der_47x31_d12", 47, 31, 12, 1, 0.25, "j2k"),   // derived quant
      ("i97coarse_64x64_d12_q8", 64, 64, 12, 1, 8.0, "j2k"), // deep loss
      ("ict_33x47_d8", 33, 47, 8, 3, 0.03125, "j2k"),     // ICT RGB
      ("pvi97_64x96_d8_l2", 64, 96, 8, 3, 0.0625, "jp2")) // full regime
    for ((name, h, w, depth, ncomp, qstep, ext) <- cases) {
      val img = Jp2Decode.decodeMulti(resource(s"/graft/jp2/$name.$ext"))
      assert(img.height == h && img.width == w && img.depth == depth &&
        img.comps == ncomp, s"$name: geometry/components")
      val sidecar = new String(resource(s"/graft/jp2/$name.px.txt"), "US-ASCII")
        .trim.split("\n").map(_.toFloat)
      assert(sidecar.length == ncomp * h * w, s"$name: sidecar length")
      for (ci <- 0 until ncomp; i <- 0 until h * w)
        assert(img.planes(ci)(i) == sidecar(ci * h * w + i),
          s"$name comp $ci px $i: ${img.planes(ci)(i)} != ${sidecar(ci * h * w + i)}")
      val bound = 3 * qstep + 2
      for (ci <- 0 until ncomp; r <- 0 until h; c <- 0 until w)
        assert(math.abs(img.planes(ci)(r * w + c) - srcPx(ci, w, depth)(r, c)) <= bound,
          s"$name comp $ci ($r,$c) outside the quantization bound")
    }
    // windowed 9/7 decode: the longer filters need the wider (±4/level)
    // support margin; equality with full-decode-then-crop proves it
    val bytes = resource("/graft/jp2/pvi97_64x96_d8_l2.jp2")
    val full = Jp2Decode.decodeMulti(bytes)
    for ((x0, y0, ww, wh) <- Seq((0, 0, 16, 16), (30, 30, 40, 20),
                                 (89, 59, 7, 5), (47, 31, 2, 2))) {
      val win = Jp2Decode.decodeWindow(bytes, x0, y0, ww, wh)
      for (ci <- 0 until 3; r <- 0 until wh; c <- 0 until ww)
        assert(win.planes(ci)(r * ww + c) == full.planes(ci)((y0 + r) * 96 + x0 + c),
          s"9/7 window ($x0,$y0,$ww,$wh) comp $ci pixel ($r,$c)")
    }
    // reduced-resolution 9/7 read matches the independent decoder's
    // discard=1 sidecar (detail bands below never entropy-decode)
    val red = Jp2Decode.decode(resource("/graft/jp2/i97coarse_64x64_d12_q8.j2k"),
      discardLevels = 1)
    val redExpect = new String(resource("/graft/jp2/i97coarse_64x64_d12_q8.r1.txt"),
      "US-ASCII").trim.split("\n").map(_.toFloat)
    assert(red.height == 32 && red.width == 32)
    assert(red.pixels.toSeq == redExpect.toSeq, "9/7 reduced read mismatch")
    // a stream whose transform/quantization pairing is inconsistent
    // (9/7 COD with a no-quant QCD) fails loudly, not wrongly: flip the
    // reversible fixture's SPcod transform byte to 0
    val raw = resource("/graft/tiny_band_raw.j2k").clone()
    // SPcod transform byte at codestream offset 2 (SOC) + 2+41 (SIZ) +
    // 2+2 (COD marker+len) + 9 (Scod+SGcod+levels+cb+cbstyle) = 58
    assert(raw(58) == 1, "fixture layout drifted")
    raw(58) = 0
    val eMix = intercept[IllegalArgumentException](Jp2Decode.decode(raw))
    assert(eMix.getMessage.contains("mismatch"), eMix.getMessage)
  }

  test("windowed decode (decodeWindow) equals full-decode-then-crop, any window") {
    // the reference's S5 windowed read (ds.read(1, window=w),
    // index_generator.py:123): only code-blocks whose 5/3 synthesis
    // support intersects the window entropy-decode, and disjoint tiles
    // never packet-walk — asserted here by bit-equality against the
    // full decode over windows chosen to hit tile interiors, tile seams,
    // block-partition seams and the image border
    val cases = Seq(
      ("tiled_80x112_d12_t48.j2k", 80, 112),  // ragged 2x3 tile grid
      ("works_64x96_d12_l3.j2k", 64, 96),     // layered RPCL + precincts
      ("pcrl_48x80_d12_t32.j2k", 48, 80),     // position-major + tiled
      ("lv5_96x80_d16_cb64.j2k", 96, 80),     // 5 levels, deep support
      // PLT streams take the seek path: unneeded precincts skip by their
      // Iplt length instead of parsing headers — same bit-exact contract
      ("plt_96x64_d12_p5.j2k", 96, 64),
      ("pltkakadu_96x96_d12_t64.j2k", 96, 96),
      ("pltlayers_48x48_d12_l3.j2k", 48, 48))
    for ((name, h, w) <- cases) {
      val bytes = resource(s"/graft/jp2/$name")
      val full = Jp2Decode.decodeMulti(bytes)
      val windows = Seq(
        (0, 0, math.min(16, w), math.min(16, h)),         // corner
        (w / 3, h / 3, w / 2 - w / 3, h / 2 - h / 3),     // interior
        (w - 7, h - 5, 7, 5),                             // far corner
        (5, 0, w - 10, h),                                // full-height strip
        (w / 2 - 1, h / 2 - 1, 2, 2))                     // 2x2 probe on seams
      for ((x0, y0, ww, wh) <- windows if ww > 0 && wh > 0) {
        val win = Jp2Decode.decodeWindow(bytes, x0, y0, ww, wh)
        assert(win.height == wh && win.width == ww, s"$name window dims")
        for (r <- 0 until wh; c <- 0 until ww)
          assert(win.planes(0)(r * ww + c) == full.planes(0)((y0 + r) * w + x0 + c),
            s"$name window ($x0,$y0,$ww,$wh) pixel ($r,$c)")
      }
    }
    // multi-component + RCT windows: the cross-component transform must
    // see identical (not just window-covering) coefficient support
    val pvi = resource("/graft/jp2/pvi_64x96_d8_l2.jp2")
    val fullPvi = Jp2Decode.decodeMulti(pvi)
    val win = Jp2Decode.decodeWindow(pvi, 30, 30, 40, 20)
    for (ci <- 0 until 3; r <- 0 until 20; c <- 0 until 40)
      assert(win.planes(ci)(r * 40 + c) == fullPvi.planes(ci)((30 + r) * 96 + 30 + c),
        s"pvi window comp $ci pixel ($r,$c)")
    // windowed + reduced-resolution composes when aligned, rejects when not
    val red = Jp2Decode.decodeWindow(resource("/graft/jp2/kakadu_96x96_d12_t64.j2k"),
      32, 32, 32, 32, discardLevels = 1)
    val fullRed = Jp2Decode.decode(resource("/graft/jp2/kakadu_96x96_d12_t64.j2k"),
      discardLevels = 1)
    assert(red.height == 16 && red.width == 16)
    for (r <- 0 until 16; c <- 0 until 16)
      assert(red.planes(0)(r * 16 + c) == fullRed.pixels((16 + r) * 48 + 16 + c))
    intercept[IllegalArgumentException](
      Jp2Decode.decodeWindow(resource("/graft/jp2/kakadu_96x96_d12_t64.j2k"),
        33, 32, 31, 32, discardLevels = 1))
  }

  test("randomized window sweep: every window equals full-decode-then-crop (crop-synthesis property)") {
    // the window-cropped synthesis path (band grids, lifting and output
    // restricted to the support pyramid) must be bit-exact for EVERY
    // window geometry, not just the curated seams above — deterministic
    // LCG sweep over three structurally different streams, both wavelet
    // paths, with and without PLT
    val cases = Seq(
      ("pltkakadu_96x96_d12_t64.j2k", 96, 96),  // tiled+precincts+PLT+SOP/EPH
      ("works_64x96_d12_l3.j2k", 64, 96),       // layered RPCL + precincts
      ("i97coarse_64x64_d12_q8.j2k", 64, 64))   // irreversible 9/7
    var seed = 0x2545F4914F6CDD1DL
    @inline def next(n: Int): Int = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      (((seed >>> 33) % n).toInt + n) % n
    }
    for ((name, h, w) <- cases) {
      val bytes = resource(s"/graft/jp2/$name")
      val full = Jp2Decode.decodeMulti(bytes)
      for (_ <- 0 until 40) {
        val x0 = next(w); val y0 = next(h)
        val ww = 1 + next(w - x0); val wh = 1 + next(h - y0)
        val win = Jp2Decode.decodeWindow(bytes, x0, y0, ww, wh)
        assert(win.height == wh && win.width == ww, s"$name ($x0,$y0,$ww,$wh) dims")
        for (ci <- 0 until win.comps; r <- 0 until wh; c <- 0 until ww)
          assert(win.planes(ci)(r * ww + c) == full.planes(ci)((y0 + r) * w + x0 + c),
            s"$name window ($x0,$y0,$ww,$wh) comp $ci pixel ($r,$c)")
      }
    }
  }

  test("reduced-resolution decode (discardLevels) matches the forward-DWT LL sidecars") {
    // the GDAL/rasterio overview-level read: discard k wavelet levels and
    // return the LL at level k — dims shrink by 2^k and the dropped detail
    // bands (1 - 4^-k of all coefficients) never entropy-decode. Sidecar
    // expectations were computed by the independent Python codec and
    // pinned there against the FORWARD transform of the input pixels.
    val cases = Seq(
      ("lv3_40x33_d12_cb16", 40, 33, Seq(1, 2)),
      ("kakadu_96x96_d12_t64", 96, 96, Seq(1, 2)),
      ("works_64x96_d12_l3", 64, 96, Seq(1)))
    for ((name, h, w, ks) <- cases; k <- ks) {
      val expect = new String(resource(s"/graft/jp2/$name.r$k.txt"), "US-ASCII")
        .trim.split("\n").map(_.toFloat)
      val img = Jp2Decode.decode(resource(s"/graft/jp2/$name.j2k"), discardLevels = k)
      val (rh, rw) = ((h + (1 << k) - 1) >> k, (w + (1 << k) - 1) >> k)
      assert(img.height == rh && img.width == rw,
        s"$name r$k: ${img.width}x${img.height} != ${rw}x$rh")
      assert(img.pixels.toSeq == expect.toSeq, s"$name r$k: pixel mismatch")
    }
    // discard past the stream's decomposition count clamps to the deepest LL
    val deep = Jp2Decode.decode(resource("/graft/jp2/lv3_40x33_d12_cb16.j2k"),
      discardLevels = 99)
    assert(deep.height == 5 && deep.width == 5) // ceil(40/8) x ceil(33/8)
  }

  test("corrupt/truncated input fails fast instead of hanging or allocating") {
    val good = resource("/graft/tiny_band_B02.jp2")
    intercept[Exception](Jp2Decode.decode(good.take(40)))
    intercept[Exception](Jp2Decode.decode(Array.fill[Byte](64)(0x11)))
    // a hostile SIZ claiming a huge image must be rejected before allocation
    val cs = resource("/graft/tiny_band_raw.j2k").clone()
    // Xsiz lives at codestream offset 2 (SOC) + 2 (marker) + 2 (Lsiz) + 2 (Rsiz)
    val bb = java.nio.ByteBuffer.wrap(cs)
    bb.putInt(8, 0x40000000)
    intercept[Exception](Jp2Decode.decode(cs))
    // markers that would silently change decode semantics are rejected
    // loudly, never skipped: splice an empty COC segment after the SIZ
    // (codestream offset 45 = SOC 2 + SIZ 2+41)
    val raw = resource("/graft/tiny_band_raw.j2k")
    val withCoc = raw.take(45) ++ Array[Byte](0xFF.toByte, 0x53, 0x00, 0x02) ++ raw.drop(45)
    val eCoc = intercept[IllegalArgumentException](Jp2Decode.decode(withCoc))
    assert(eCoc.getMessage.contains("COC/QCC"), eCoc.getMessage)
    // a hostile COD shrinking the precincts must fail on the packet-count
    // guard BEFORE the walk materializes 2^2x packet states per tile
    val hostile = resource("/graft/jp2/works_64x96_d12_l3.j2k").clone()
    // COD SPcod precinct bytes at codestream offsets 59..61 (SOC 2 +
    // SIZ 2+43 + COD header 14); 0x11 = 2x2-sample precincts everywhere,
    // and SGcod layers (offsets 51..52) cranked to 256
    for (i <- 59 to 61) hostile(i) = 0x11
    hostile(51) = 1; hostile(52) = 0
    val e4 = intercept[IllegalArgumentException](Jp2Decode.decode(hostile))
    assert(e4.getMessage.contains("packets exceed"),
      s"expected the packet-count guard, got: ${e4.getMessage}")
    // random flips and truncations over the stateful stream shapes (SOT
    // walk, tile-part concat, stitch bounds, precinct walk, layer state):
    // success or a prompt plain exception, never a hang or wild allocation
    for (fixture <- Seq("/graft/jp2/tileparts_64x64_d12_tp3.j2k",
                        "/graft/jp2/works_64x96_d12_l3.j2k")) {
      val base = resource(fixture)
      val rng = new scala.util.Random(43)
      for (trial <- 0 until 200) {
        val bytes = base.clone()
        try {
          if (trial % 3 == 0) Jp2Decode.decode(bytes.take(2 + rng.nextInt(bytes.length - 2)))
          else {
            for (_ <- 0 to rng.nextInt(4))
              bytes(rng.nextInt(bytes.length)) = rng.nextInt(256).toByte
            Jp2Decode.decode(bytes)
          }
        } catch { case _: Exception => () }
      }
    }
  }

  test("SAFE zip → extract → convertJp2Scenes → COG re-read: the Sentinel publish flow") {
    // the reference's Sentinel path end to end: downloaded .SAFE zip →
    // archive extraction (utils.py:94–101) → rasterio read of the JP2
    // band (publish.py:263–270) → cog_translate out (utils.py:113–154) —
    // here: extractArchive → convertJp2Scenes (distributed decode+encode,
    // no shuffle) → readGeoTiffScenes parity against the fixture formula
    val sceneId = "S2B_T23LLF_0011"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry(
      s"$sceneId.SAFE/GRANULE/IMG_DATA/${sceneId}__B02.jp2"))
    z.write(resource("/graft/tiny_band_B02.jp2")); z.closeEntry(); z.close()

    val entries = ArchiveFunctions.extractArchive(bos.toByteArray)
    assert(ArchiveFunctions.internalName(entries.map(_._1)).contains(s"$sceneId.SAFE"))
    val inDir = Files.createTempDirectory("safe-jp2")
    entries.foreach { case (name, bytes) =>
      Files.write(inDir.resolve(name.substring(name.lastIndexOf('/') + 1)), bytes)
    }

    val outDir = Files.createTempDirectory("safe-cog")
    val manifest = SceneIO.convertJp2Scenes(spark, inDir.toString, outDir.toString,
      tileSize = 16, overviewFactors = Seq(2, 4)).collect()
    assert(manifest.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq((sceneId, "B02")))
    assert(manifest.head.getLong(3) > 0)

    // the written file is a real COG-shaped integer GeoTIFF: overview
    // pyramid present, Sentinel nodata-0 recorded, pixels exact (u16
    // holds the 12-bit range losslessly)
    val img = graft.raster.GeoTiff.decode(
      Files.readAllBytes(Paths.get(manifest.head.getString(2).stripPrefix("file:"))))
    assert(img.main.height == 61 && img.main.width == 97)
    assert(img.overviews.map(o => (o.height, o.width)) == Seq((30, 48), (15, 24)))
    assert(img.meta.nodata.contains(0.0))
    for (r <- 0 until 61; c <- 0 until 97)
      assert(img.main.pixels(r * 97 + c) == containerPx(r, c))

    // and the distributed GeoTIFF reader closes the loop — the converted
    // asset is queryable without ever touching JP2 entropy decode again
    val back = SceneIO.readGeoTiffScenes(spark, outDir.toString)
      .select("scene_id", "band", "height", "width").head()
    assert(back.getString(0) == sceneId && back.getString(1) == "B02")
    assert(back.getInt(2) == 61 && back.getInt(3) == 97)
  }

  test("readJp2RgbScenes → quicklookScenes: the PVI preview asset end to end (publish.py:178–179)") {
    import spark.implicits._
    // the reference builds the published quicklook from the 3-component
    // *PVI*.jp2 preview; here: distributed multi-component decode → one
    // row per component → tile → quicklookScenes PNG, then decode the
    // PNG back and pin pixels against the fixture's closed-form planes
    val dir = Files.createTempDirectory("graft-pvi")
    Files.write(dir.resolve("S2A_T23LLF_0012__PVI.jp2"),
      resource("/graft/jp2/pvi_64x96_d8_l2.jp2"))
    val scenes = SceneIO.readJp2RgbScenes(spark, dir.toString, nodata = -1f)
    assert(scenes.select("band").as[String].collect().toSet == Set("R", "G", "B"))
    assert(scenes.count() == 3)
    val tiles = SceneIO.tileScene(scenes, 16, 16)
    val outDir = Files.createTempDirectory("graft-pvi-ql")
    // 8-bit planes are already display-range (the reference copies PVI
    // pixels into the quicklook rather than re-scaling, publish.py:178):
    // prescaled + native 64x96 keeps the map identity, so expected
    // pixels are the formula values themselves
    val manifest = SceneIO.quicklookScenes(tiles, ("R", "G", "B"),
      outDir.toString, qlH = 64, qlW = 96, prescaled = true).collect()
    assert(manifest.length == 1 && manifest.head.getString(0) == "S2A_T23LLF_0012")
    val png = javax.imageio.ImageIO.read(
      new java.io.File(manifest.head.getString(1).stripPrefix("file:")))
    assert(png.getHeight == 64 && png.getWidth == 96)
    def plane(ci: Int)(r: Int, c: Int): Int =
      ((((r.toLong * 96 + c) * (2654435761L + ci * 97L)) >> 13) & 255L).toInt
    for (r <- 0 until 64 by 7; c <- 0 until 96 by 5) {
      val argb = png.getRGB(c, r)
      val (er, eg, eb) = (plane(0)(r, c), plane(1)(r, c), plane(2)(r, c))
      if (er == 0 && eg == 0 && eb == 0)
        assert((argb >>> 24) == 0, s"($r,$c): nodata must be transparent")
      else
        assert(((argb >> 16) & 255, (argb >> 8) & 255, argb & 255) == ((er, eg, eb)),
          s"($r,$c): quicklook pixel mismatch")
    }
  }

  test("readJp2Scenes window read matches the cropped full read (index_generator.py:123)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jp2-win")
    Files.write(dir.resolve("S2A_T23LLF_0013__B02.jp2"),
      resource("/graft/tiny_band_B02.jp2"))
    val win = SceneIO.readJp2Scenes(spark, dir.toString, nodata = -1f,
      window = Some((32, 16, 40, 24))).head()
    assert(win.getInt(2) == 24 && win.getInt(3) == 40)
    val px = win.getSeq[Float](5)
    for (r <- 0 until 24; c <- 0 until 40)
      assert(px(r * 40 + c) == containerPx(16 + r, 32 + c),
        s"window pixel ($r,$c)")
  }

  test("readJp2Scenes → tileScene → bandMath: the Sentinel-2 ingest seam (publish.py:263–270)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jp2")
    Files.write(dir.resolve("S2A_T23LLF_0009__B02.jp2"),
      resource("/graft/tiny_band_B02.jp2"))
    // a raw-codestream sibling under the .j2k extension: the brace-glob
    // must pick up every JPEG 2000 extension, and a stray .txt must not
    // reach the decoder
    Files.write(dir.resolve("S2A_T23LLF_0009__B08.j2k"),
      resource("/graft/tiny_band_raw.j2k"))
    Files.write(dir.resolve("notes.txt"), "not a raster".getBytes)
    val scenes = SceneIO.readJp2Scenes(spark, dir.toString, nodata = -1f)
    assert(scenes.select("band").as[String].collect().toSet == Set("B02", "B08"))
    val row = scenes.filter(col("band") === "B02").head()
    assert(row.getString(0) == "S2A_T23LLF_0009" && row.getString(1) == "B02")
    assert(row.getInt(2) == 61 && row.getInt(3) == 97)
    // ragged 16x16 tiling, identity band math, then a global checksum
    val tiles = SceneIO.tileScene(scenes.filter(col("band") === "B02"), 16, 16)
    assert(tiles.count() == 28) // ceil(61/16) * ceil(97/16)
    val out = RasterKernels.bandMath(RasterKernels.pivotBands(tiles),
      "B02", "OUT", -1.0, 0.0, 4095.0)
    val sum = out.select(aggregate(col("pixels"), lit(0L),
      (acc, x) => acc + x.cast("long"))).as[Long].collect().sum
    val expect = (for (r <- 0 until 61; c <- 0 until 97)
      yield containerPx(r, c).toLong).sum
    assert(sum == expect, s"decoded pixel mass $sum != $expect")
  }

  // ---- r9 ADVICE regressions: PLT leniency -------------------------------

  /** Locate the PLT segment of the single-tile-part plt_96x64 fixture:
    * returns (sotPos, pltPos, lplt) — SOT marker offset, PLT marker offset,
    * and the PLT segment length field. */
  private def pltFixture(): (Array[Byte], Int, Int, Int) = {
    val raw = resource("/graft/jp2/plt_96x64_d12_p5.j2k")
    var i = 0
    while (!((raw(i) & 0xFF) == 0xFF && (raw(i + 1) & 0xFF) == 0x90)) i += 1
    val plt = i + 12 // single tile-part: PLT directly follows the SOT segment
    assert((raw(plt) & 0xFF) == 0xFF && (raw(plt + 1) & 0xFF) == 0x58,
      "fixture layout drifted: no PLT after SOT")
    val lplt = ((raw(plt + 2) & 0xFF) << 8) | (raw(plt + 3) & 0xFF)
    (raw, i, plt, lplt)
  }

  test("a PLT covering only a subset of packets falls back to the header walk") {
    // clearing one continuation bit splits a multi-byte Iplt varint in two:
    // the table then lists MORE entries than the tile has packets (and with
    // wrong values). Pre-r10 this hard-failed the count require; spec-wise
    // a partial/odd PLT must not reject a stream whose packets are intact —
    // the decoder now ignores the unusable table and walks headers.
    val baseline = Jp2Decode.decode(resource("/graft/jp2/plt_96x64_d12_p5.j2k"))
    val (raw, _, plt, lplt) = pltFixture()
    val contIdx = (plt + 5 until plt + 2 + lplt).find(p => (raw(p) & 0x80) != 0)
      .getOrElse(fail("fixture has no multi-byte Iplt varint to split"))
    raw(contIdx) = (raw(contIdx) & 0x7F).toByte
    val img = Jp2Decode.decode(raw)
    assert(img.height == baseline.height && img.width == baseline.width &&
      img.pixels.sameElements(baseline.pixels),
      "header-walk fallback diverged from the PLT-indexed decode")
  }

  test("a zero-valued leading continuation byte (0x80) in an Iplt varint is accepted") {
    // 0x80 contributes a zero high septet — spec-legal over-long encoding.
    // Insert one before a single-byte varint, growing PLT and tile-part
    // lengths by 1; the table still matches packet count and values, so the
    // seek path must decode bit-exact.
    val baseline = Jp2Decode.decode(resource("/graft/jp2/plt_96x64_d12_p5.j2k"))
    val (raw, sot, plt, lplt) = pltFixture()
    // the accumulator is zero at any varint START, so a 0x80 there is a
    // no-op septet; the first Iplt byte (plt+5) is always a start
    val target = plt + 5
    val out = new Array[Byte](raw.length + 1)
    System.arraycopy(raw, 0, out, 0, target)
    out(target) = 0x80.toByte
    System.arraycopy(raw, target, out, target + 1, raw.length - target)
    // patch Lplt (2 bytes at plt+2) and Psot (4 bytes at sot+6) for the insert
    val newLplt = lplt + 1
    out(plt + 2) = ((newLplt >> 8) & 0xFF).toByte
    out(plt + 3) = (newLplt & 0xFF).toByte
    val psotOfs = sot + 6
    val psot = ((raw(psotOfs) & 0xFF) << 24) | ((raw(psotOfs + 1) & 0xFF) << 16) |
      ((raw(psotOfs + 2) & 0xFF) << 8) | (raw(psotOfs + 3) & 0xFF)
    val newPsot = psot + 1
    out(psotOfs) = ((newPsot >> 24) & 0xFF).toByte
    out(psotOfs + 1) = ((newPsot >> 16) & 0xFF).toByte
    out(psotOfs + 2) = ((newPsot >> 8) & 0xFF).toByte
    out(psotOfs + 3) = (newPsot & 0xFF).toByte
    val img = Jp2Decode.decode(out)
    assert(img.height == baseline.height && img.width == baseline.width &&
      img.pixels.sameElements(baseline.pixels),
      "over-long varint encoding changed the decode")
  }
}
