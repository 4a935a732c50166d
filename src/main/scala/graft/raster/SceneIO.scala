package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage

/** Scene ↔ tile conversion and edge sinks (SURVEY.md S5/S7/S8/S10).
  *
  *  - S5: the reference reads rasterio block windows
  *    (index_generator.py:121, utils.py:351); here a full-scene band row
  *    explodes into block-window tiles — block boundaries become row
  *    boundaries, so one scene's blocks process on many executors.
  *  - S7/S8: the engine-native "COG" sink is parquet partitioned by
  *    (scene_id, band) with the overview pyramid as extra factor-tagged
  *    rows (RasterKernels.overviews); a real GeoTIFF export is an edge
  *    job outside the engine (needs GDAL).
  *  - S10: quicklook PNG encode uses JDK ImageIO — driver-side, on an
  *    already-downsampled 768×768 composite (publish.py:59–91), so the
  *    collect is ≤ 768·768·3 bytes per scene regardless of input size.
  */
object SceneIO {

  /** S5 — explode a full-scene band image into block-window tiles.
    * Input rows: (scene_id, band, height, width, nodata, pixels).
    * Output: RasterTile rows, one per (blockRow, blockCol) window. */
  def tileScene(scene: DataFrame, blockH: Int, blockW: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val tiles = ColumnBridge.column(graft.expr.TileSceneExpr(
      ColumnBridge.expression(col("pixels")),
      ColumnBridge.expression(col("height")),
      ColumnBridge.expression(col("width")), blockH, blockW))
    scene
      .select(col("scene_id"), col("band"), col("nodata"), explode(tiles).as("t"))
      .select(col("scene_id"), col("band"),
        col("t.window_row").as("window_row"), col("t.window_col").as("window_col"),
        col("t.h").as("height"), col("t.w").as("width"), col("nodata"),
        col("t.pixels").as("pixels"))
  }

  /** S5 pivot-free multi-band tiling: tile ALL bands of a scene in one
    * explode, emitting rows already in the pivoted (scene, window) →
    * band-map shape that [[RasterKernels.bandMath]] consumes — the
    * (scene, window) regroup shuffle of `tileScene → pivotBands`
    * disappears entirely, because every band's native tiling yields its
    * windows in the same deterministic row-major order and `arrays_zip`
    * aligns them scan-side.
    *
    * Input rows: (scene_id, height, width, bands: map<band,pixels>,
    * nodatas: map<band,nodata>) — the shape a multi-band scene reader
    * produces. At 100 TB this turns derived-band computation into a pure
    * narrow pipeline: scan → tile → band math → write, no exchange.
    */
  def tileSceneMultiBand(scene: DataFrame, bandNames: Seq[String],
                         blockH: Int, blockW: Int): DataFrame = {
    require(bandNames.nonEmpty, "bandNames must be non-empty")
    import org.apache.spark.sql.graft.ColumnBridge
    val tiles = ColumnBridge.column(graft.expr.TileSceneMultiExpr(
      ColumnBridge.expression(col("bands")),
      ColumnBridge.expression(col("height")),
      ColumnBridge.expression(col("width")), bandNames, blockH, blockW))
    scene.select(col("scene_id"), col("nodatas"), explode(tiles).as("t"))
      .select(col("scene_id"),
        col("t.window_row").as("window_row"),
        col("t.window_col").as("window_col"),
        col("t.h").as("height"),
        col("t.w").as("width"),
        col("t.bands").as("bands"),
        col("nodatas"))
  }

  /** Inverse of [[tileScene]] for small scenes (test/quicklook path):
    * reassemble one band image from its tiles. Driver-side collect. */
  def assembleScene(tiles: DataFrame, sceneId: String, band: String): (Int, Int, Array[Float]) = {
    val rows = tiles.filter(col("scene_id") === sceneId && col("band") === band)
      .select("window_row", "window_col", "height", "width", "pixels").collect()
    require(rows.nonEmpty, s"no tiles for $sceneId/$band")
    val blockH = rows.map(r => r.getInt(2)).max
    val blockW = rows.map(r => r.getInt(3)).max
    val totalH = rows.map(r => r.getInt(0) * blockH + r.getInt(2)).max
    val totalW = rows.map(r => r.getInt(1) * blockW + r.getInt(3)).max
    val out = new Array[Float](totalH * totalW)
    rows.foreach { r =>
      val (wr, wc, h, w) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      val px = r.getSeq[Float](4)
      var i = 0
      while (i < h * w) {
        val gr = wr * blockH + i / w
        val gc = wc * blockW + i % w
        out(gr * totalW + gc) = px(i)
        i += 1
      }
    }
    (totalH, totalW, out)
  }

  /** S7/S8 — engine-native tile sink: parquet partitioned by (scene, band),
    * zstd-compressed (the reference's deflate rewrite, publish.py:94–111,
    * becomes a codec setting — SURVEY §2.1 S9). */
  def writeTiles(tiles: DataFrame, path: String): Unit =
    tiles.write.mode("overwrite")
      .partitionBy("scene_id", "band")
      .option("compression", "zstd")
      .parquet(path)

  /** S5 physical layer — read a directory of GeoTIFF files into scene-band
    * rows (scene_id, band, height, width, nodata, pixels) ready for
    * [[tileScene]]. File naming convention `<scene_id>_<band>.tif` (the
    * reference derives the same identity from file names,
    * collections/utils.py:335–342). The decode runs on EXECUTORS via
    * Spark's binaryFile source — one file per task unit, so a 100 TB
    * archive decodes with no driver involvement and no shuffle; tiling
    * afterwards is a narrow explode. */
  def readGeoTiffScenes(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tif*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        val stem = name.substring(0, name.lastIndexOf('.'))
        val us = stem.lastIndexOf('_')
        val (sceneId, band) =
          if (us > 0) (stem.substring(0, us), stem.substring(us + 1))
          else (stem, "B1")
        val img = GeoTiff.decode(bytes)
        val m = img.main
        (sceneId, band, m.height, m.width,
          img.meta.nodata.map(_.toFloat).getOrElse(0f), m.pixels)
      }
      .toDF("scene_id", "band", "height", "width", "nodata", "pixels")
  }

  /** S7/S8 physical layer — assemble one (scene, band) from its tiles and
    * write a real tiled-deflate GeoTIFF with a factor-2..64 overview
    * pyramid (reference cog_translate utils.py:113–154 + build_overviews
    * :381–401). The assemble is the same bounded collect as [[quicklook]];
    * the fan-out across (scene, band) pairs is the caller's loop or a
    * foreachPartition over the distinct key set. */
  def writeGeoTiff(tiles: DataFrame, sceneId: String, band: String,
                   file: java.nio.file.Path,
                   meta: GeoTiff.GeoMeta = GeoTiff.GeoMeta(),
                   tileSize: Int = 256,
                   overviewFactors: Seq[Int] = Seq(2, 4, 8, 16, 32, 64)): Unit = {
    val (h, w, px) = assembleScene(tiles, sceneId, band)
    val nodata = meta.nodata.orElse {
      tiles.filter(col("scene_id") === sceneId && col("band") === band)
        .select(col("nodata")).head(1).headOption.map(_.getFloat(0).toDouble)
    }
    val bytes = GeoTiff.encode(h, w, px, meta.copy(nodata = nodata),
      tileSize, overviewFactors)
    java.nio.file.Files.write(file, bytes)
    ()
  }

  /** S10 — RGB quicklook PNG (publish.py:59–91): three pre-scaled 0–255
    * band images of identical shape → PNG bytes via JDK ImageIO; 0 = fully
    * transparent (the reference's alpha mask). */
  def encodeQuicklookPng(h: Int, w: Int, r: Array[Float], g: Array[Float],
                         b: Array[Float]): Array[Byte] = {
    require(r.length == h * w && g.length == h * w && b.length == h * w)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var i = 0
    while (i < h * w) {
      val rv = math.max(0, math.min(255, r(i).toInt))
      val gv = math.max(0, math.min(255, g(i).toInt))
      val bv = math.max(0, math.min(255, b(i).toInt))
      val alpha = if (rv == 0 && gv == 0 && bv == 0) 0 else 255
      img.setRGB(i % w, i / w, (alpha << 24) | (rv << 16) | (gv << 8) | bv)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Full quicklook pipeline for one scene (publish.py:59–91): downsample
    * each RGB band to (qlH×qlW) via nearest, scale/clip/nodata→0, collect,
    * encode. Distributed until the ≤768² collect. */
  def quicklook(tiles: DataFrame, sceneId: String, rgb: (String, String, String),
                qlH: Int = 768, qlW: Int = 768): Array[Byte] = {
    def bandImage(band: String): Array[Float] = {
      val (h, w, px) = assembleScene(
        tiles.filter(col("scene_id") === sceneId && col("band") === band)
          .withColumn("pixels",
            RasterKernels.quicklookScale(col("pixels"), col("nodata"))),
        sceneId, band)
      // nearest downsample driver-side on the already-scaled image
      Array.tabulate(qlH * qlW) { i =>
        val sr = (i / qlW) * h / qlH
        val sc = (i % qlW) * w / qlW
        px(sr * w + sc)
      }
    }
    encodeQuicklookPng(qlH, qlW, bandImage(rgb._1), bandImage(rgb._2), bandImage(rgb._3))
  }
}
