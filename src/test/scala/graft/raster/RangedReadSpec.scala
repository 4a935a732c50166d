package graft.raster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ranged COG read path (r10 stretch): `GeoTiff.decodeWindowRanged`
  * must (a) decode exactly what the in-memory windowed decode produces and
  * (b) FETCH only the header/IFD blocks plus the tiles the window touches —
  * the IO contract that makes a 100 TB object-store archive probeable,
  * complementing the existing decode contract ("disjoint tiles never
  * decompress", GeoTiffSpec). `SceneIO.readGeoTiffScenesRanged` lifts the
  * same contract to the distributed path via Hadoop positional reads.
  */
class RangedReadSpec extends SparkSpec {

  private val (h, w) = (1536, 2048)
  private lazy val px: Array[Float] =
    Array.tabulate(h * w)(i => ((i * 2654435761L >>> 16) % 4096).toFloat)
  private def meta = GeoTiff.GeoMeta(pixelScale = Some((10.0, 10.0)),
    tiepoint = Some((600000.0, 8200000.0)), epsg = Some(32723), nodata = Some(-9999.0))
  private def encode(container: String): Array[Byte] =
    GeoTiff.encode(h, w, px, meta, 64, Seq(2, 4, 8), 6, container = container)

  private def readerOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
    (ofs, n) => java.util.Arrays.copyOfRange(bytes, ofs.toInt, ofs.toInt + n)

  test("ranged window decode equals in-memory decodeWindow, classic and BigTIFF") {
    for (container <- Seq("classic", "bigtiff")) {
      val bytes = encode(container)
      val read = readerOf(bytes)
      for ((x, y, ww, wh, lvl) <- Seq(
          (128, 128, 64, 64, 0),    // tile-aligned, 1 tile
          (100, 100, 64, 64, 0),    // straddles 4 tiles
          (0, 0, 256, 192, 0),      // corner block
          (1990, 1470, 58, 66, 0),  // ragged far edge
          (33, 17, 100, 80, 1)))    // overview-level window
      {
        val (got, io) = GeoTiff.decodeWindowRanged(read, bytes.length, x, y, ww, wh, lvl)
        val want = GeoTiff.decodeWindow(bytes, x, y, ww, wh, lvl)
        assert(got.pages.head.pixels.sameElements(want.pages.head.pixels),
          s"$container ($x,$y,$ww,$wh)@$lvl: ranged pixels diverge")
        assert(got.meta == want.meta, s"$container: ranged meta diverges")
        assert(io.bytesRead > 0 && io.bytesRead <= bytes.length)
      }
    }
  }

  test("a small window fetches a small fraction of the file (the IO contract)") {
    val bytes = encode("classic")
    val (_, io1) = GeoTiff.decodeWindowRanged(readerOf(bytes), bytes.length, 512, 512, 64, 64)
    assert(io1.bytesRead < bytes.length / 20,
      s"1-tile window fetched ${io1.bytesRead} of ${bytes.length} bytes (>5%) — IO pruning broken")
    // and a straddling window fetches more than an aligned one, but still little
    val (_, io4) = GeoTiff.decodeWindowRanged(readerOf(bytes), bytes.length, 500, 500, 64, 64)
    assert(io4.bytesRead > io1.bytesRead && io4.bytesRead < bytes.length / 10,
      s"4-tile straddle fetched ${io4.bytesRead} (1-tile: ${io1.bytesRead})")
    // request count is its own object-store cost axis: the 4 straddled
    // tiles coalesce (same-row neighbours are contiguous in file order),
    // so the whole probe needs only a handful of GETs, not one per tile
    assert(io4.requests <= 8,
      s"4-tile straddle issued ${io4.requests} read requests — coalescing broken")
  }

  test("ranged level read equals decodeLevel and skips the full-res payload") {
    val bytes = encode("classic")
    val (got, io) = GeoTiff.decodeLevelRanged(readerOf(bytes), bytes.length, 2)
    val want = GeoTiff.decodeLevel(bytes, 2)
    assert(got.pages.head.pixels.sameElements(want.pages.head.pixels))
    assert(got.meta == want.meta)
    // level-2 payload is ~1/16 of the file; allow headers + slack
    assert(io.bytesRead < bytes.length / 4,
      s"overview read fetched ${io.bytesRead} of ${bytes.length} bytes")
    // a full level is contiguous tile data: expect very few coalesced reads
    assert(io.requests <= 8, s"level read issued ${io.requests} requests")
  }

  test("readGeoTiffScenesRanged matches readGeoTiffScenes and reports tiny bytes_read") {
    val dir = java.nio.file.Files.createTempDirectory("ranged").toString
    val bytes = encode("classic")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sceneR__B04.tif"), bytes)
    val win = Some((100, 100, 64, 64))
    val viaRanged = SceneIO.readGeoTiffScenesRanged(spark, dir, window = win)
      .select("scene_id", "band", "height", "width", "nodata", "pixels",
        "bytes_read", "read_requests")
      .head()
    val viaFull = SceneIO.readGeoTiffScenes(spark, dir, window = win).head()
    assert(viaRanged.getString(0) == viaFull.getString(0) &&
      viaRanged.getString(1) == viaFull.getString(1) &&
      viaRanged.getInt(2) == viaFull.getInt(2) &&
      viaRanged.getInt(3) == viaFull.getInt(3) &&
      viaRanged.getFloat(4) == viaFull.getFloat(4) &&
      viaRanged.getSeq[Float](5) == viaFull.getSeq[Float](5),
      "ranged distributed read diverges from the binaryFile path")
    val nRead = viaRanged.getLong(6)
    assert(nRead < bytes.length / 10,
      s"distributed ranged read fetched $nRead of ${bytes.length} bytes")
    assert(viaRanged.getLong(7) <= 8,
      s"distributed ranged read issued ${viaRanged.getLong(7)} requests")
  }
}
