package graft.tools

import graft.raster.{GeoTiff, SceneIO}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput of the physical raster edges (not driver-run; documents the
  * SCALE.md numbers): distributed GeoTIFF export (writeGeoTiffScenes),
  * re-ingest (readGeoTiffScenes → checksum) and the distributed quicklook
  * sink — the three paths a 100 TB archive pays per scene. Pixel volume
  * defaults to ~1 GB so the run measures steady-state codec + shuffle
  * throughput, not startup.
  *
  * Usage: sbt "runMain graft.tools.GeoTiffBench [nScenes] [side]"
  */
object GeoTiffBench {

  /** `window` mode (round-10 brief item 4): the COG analogue of the JP2
    * ROI measurement. Encode ONE production-shaped scene (tiled, 256²,
    * deflate, 2..32 overview pyramid) per requested side, then time
    * full decode vs 256²/1024² windowed decodes at tile-aligned AND
    * tile-straddling origins, plus overview-level reads, plus the Spark
    * `readGeoTiffScenes(window=…)` path. The claim under test: probe cost
    * tracks the TILES TOUCHED by the window, not the scene size — so the
    * same window costs the same on an 8192² and a 4096² scene.
    * Usage: sbt "runMain graft.tools.GeoTiffBench window [side1,side2,...]"
    */
  private def windowMode(sides: Seq[Int]): Unit = {
    import graft.raster.GeoTiff.GeoMeta
    def bestOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    val files = sides.map { side =>
      val px = new Array[Float](side * side)
      var i = 0
      while (i < px.length) { // terrain-like, deflate-compressible
        px(i) = (2048 + 1200 * math.sin((i % side) * 0.0011) *
          math.cos((i / side) * 0.0013)).toFloat
        i += 1
      }
      val f = java.io.File.createTempFile(s"cogbench$side", ".tif")
      val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))
      val enc = new graft.raster.GeoTiff.RowEncoder(os, side,
        GeoMeta(pixelScale = Some((10.0, 10.0)), tiepoint = Some((6e5, 8.2e6)),
          epsg = Some(32723), nodata = Some(-9999.0)),
        tileSize = 256, overviewFactors = Seq(2, 4, 8, 16, 32),
        compressionLevel = 1)
      (0 until side).foreach(r => enc.addRow(px, r * side))
      val n = enc.finish()
      os.close()
      println(f"[cog] encoded ${side}x$side tiled-256 +5 overviews: ${n / 1e6}%.1f MB -> $f")
      (side, f)
    }
    for ((side, f) <- files) {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val full = bestOf(3)(graft.raster.GeoTiff.decode(bytes))
      println(f"[cog] $side full decode: $full%.2f s")
      // windows: (label, x0, y0, w, h) — aligned 1 tile, straddling 2 and
      // 4 tiles, and a 1024² block (16 aligned / 25 straddling tiles)
      val probes = Seq(
        ("256 aligned (1 tile)", 512, 512, 256, 256),
        ("256 straddle-x (2 tiles)", 384, 512, 256, 256),
        ("256 straddle-xy (4 tiles)", 384, 384, 256, 256),
        ("1024 aligned (16 tiles)", 1024, 1024, 1024, 1024),
        ("1024 straddle (25 tiles)", 900, 900, 1024, 1024))
      for ((label, x, y, w, h) <- probes) {
        val t = bestOf(5)(graft.raster.GeoTiff.decodeWindow(bytes, x, y, w, h))
        println(f"[cog] $side window $label%-26s ${t * 1000}%.1f ms (full/probe ${full / t}%.0fx)")
      }
      for (lvl <- Seq(2, 4)) {
        val t = bestOf(5)(graft.raster.GeoTiff.decodeLevel(bytes, lvl))
        println(f"[cog] $side overview level $lvl (${side >> lvl}x${side >> lvl}): ${t * 1000}%.1f ms")
      }
    }
    // the Spark path on the biggest scene: binaryFile scan + pruned decode
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (side, f) = files.maxBy(_._1)
    val dir = java.nio.file.Files.createTempDirectory("cogwin")
    java.nio.file.Files.copy(f.toPath, dir.resolve(s"scene1__B04.tif"))
    def sparkRead(win: Option[(Int, Int, Int, Int)]): Unit = {
      SceneIO.readGeoTiffScenes(spark, dir.toString, window = win)
        .agg(sum(element_at(col("pixels"), 1))).head()
    }
    val tFull = bestOf(3)(sparkRead(None))
    val tWin = bestOf(5)(sparkRead(Some((900, 900, 256, 256))))
    println(f"[cog] $side spark readGeoTiffScenes full: $tFull%.2f s  window 256: ${tWin * 1000}%.1f ms")
    // the ranged path: positional reads of header+IFD+touched tiles only
    def rangedRead(win: Option[(Int, Int, Int, Int)], lvl: Int = 0): (Long, Long) = {
      val r = SceneIO.readGeoTiffScenesRanged(spark, dir.toString, window = win, overviewLevel = lvl)
        .agg(sum(col("bytes_read")), sum(col("read_requests"))).head()
      (r.getLong(0), r.getLong(1))
    }
    var win256 = (0L, 0L)
    val tRanged = bestOf(5) { win256 = rangedRead(Some((900, 900, 256, 256))) }
    val fLen = f.length()
    println(f"[cog] $side spark readGeoTiffScenesRanged window 256: ${tRanged * 1000}%.1f ms, " +
      f"${win256._1}%,d of $fLen%,d bytes (${100.0 * win256._1 / fLen}%.2f%%) in ${win256._2} GETs")
    var ov = (0L, 0L)
    val tOv = bestOf(5) { ov = rangedRead(None, lvl = 3) }
    println(f"[cog] $side spark readGeoTiffScenesRanged overview 3: ${tOv * 1000}%.1f ms, " +
      f"${ov._1}%,d bytes (${100.0 * ov._1 / fLen}%.2f%%) in ${ov._2} GETs")
    files.foreach(_._2.delete())
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.length > 0 && args(0) == "window") {
      windowMode(if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                 else Seq(4096, 8192))
      return
    }
    val nScenes = if (args.length > 0) args(0).toInt else 32
    val side = if (args.length > 1) args(1).toInt else 2048
    val bands = Seq("B02", "B03", "B04")
    // heap comes from the forked JVM's -Xmx (SPARK_DRIVER_MEM env via
    // build.sbt) — spark.driver.memory set here would be a no-op in local
    // mode, the JVM is already running. 2x corpus needs SPARK_DRIVER_MEM=24g.
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val px = side.toLong * side
    val bytes = nScenes.toLong * bands.length * px * 4
    val scenes = spark.range(nScenes.toLong * bands.length)
      .select(
        concat(lit("scene"), (col("id") / bands.length).cast("int")).as("scene_id"),
        element_at(typedLit(bands), (col("id") % bands.length).cast("int") + 1).as("band"),
        lit(side).as("height"), lit(side).as("width"), lit(-9999.0f).as("nodata"),
        transform(sequence(lit(0), lit((px - 1).toInt)),
          i => ((i + col("id") * 7) % 10000).cast("float")).as("pixels"))
    val tiles = SceneIO.tileScene(scenes, 512, 512).localCheckpoint(true)
    val nTiles = tiles.count()

    val outDir = java.nio.file.Files.createTempDirectory("gtbench")
    val t0 = System.nanoTime()
    val manifest = SceneIO.writeGeoTiffScenes(tiles, outDir.toString,
      tileSize = 512, overviewFactors = Seq(2, 4, 8))
    val written = manifest.agg(sum(col("bytes"))).head().getLong(0)
    val wSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val back = SceneIO.readGeoTiffScenes(spark, outDir.toString)
    val checksum = back.agg(sum(element_at(col("pixels"), 1))).head().getDouble(0)
    val rSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val qlDir = java.nio.file.Files.createTempDirectory("gtbenchql")
    val nPng = SceneIO.quicklookScenes(tiles, ("B04", "B03", "B02"), qlDir.toString).count()
    val qSec = (System.nanoTime() - t2) / 1e9

    println(f"corpus: $nScenes scenes x ${bands.length} bands @ ${side}x$side = ${bytes / 1e9}%.1f GB pixels ($nTiles tiles)")
    println(f"writeGeoTiffScenes: $wSec%.1f s  ${bytes / 1e6 / wSec}%.0f MB/s pixels  (${written / 1e6}%.0f MB compressed on disk)")
    println(f"readGeoTiffScenes:  $rSec%.1f s  ${bytes / 1e6 / rSec}%.0f MB/s pixels  (checksum $checksum)")
    println(f"quicklookScenes:    $qSec%.1f s  ${bytes / 1e6 / qSec}%.0f MB/s pixels  ($nPng PNGs)")
    spark.stop()
  }
}
