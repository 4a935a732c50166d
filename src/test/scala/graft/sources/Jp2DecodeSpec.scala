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
  }

  test("readJp2Scenes → tileScene → bandMath: the Sentinel-2 ingest seam (publish.py:263–270)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jp2")
    Files.write(dir.resolve("S2A_T23LLF_0009__B02.jp2"),
      resource("/graft/tiny_band_B02.jp2"))
    val scenes = SceneIO.readJp2Scenes(spark, dir.toString, nodata = -1f)
    val row = scenes.head()
    assert(row.getString(0) == "S2A_T23LLF_0009" && row.getString(1) == "B02")
    assert(row.getInt(2) == 61 && row.getInt(3) == 97)
    // ragged 16x16 tiling, identity band math, then a global checksum
    val tiles = SceneIO.tileScene(scenes, 16, 16)
    assert(tiles.count() == 28) // ceil(61/16) * ceil(97/16)
    val out = RasterKernels.bandMath(RasterKernels.pivotBands(tiles),
      "B02", "OUT", -1.0, 0.0, 4095.0)
    val sum = out.select(aggregate(col("pixels"), lit(0L),
      (acc, x) => acc + x.cast("long"))).as[Long].collect().sum
    val expect = (for (r <- 0 until 61; c <- 0 until 97)
      yield containerPx(r, c).toLong).sum
    assert(sum == expect, s"decoded pixel mass $sum != $expect")
  }
}
