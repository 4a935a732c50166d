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
  def main(args: Array[String]): Unit = {
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
