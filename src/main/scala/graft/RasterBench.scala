package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.raster.RasterKernels

/** Raster-kernel throughput benchmark (not driver-run; documents the scale
  * claim in README): generates a synthetic tile corpus the shape real
  * ingest produces — `tiles × bands` 256×256 float blocks — and measures
  * end-to-end NDVI band math (pivot → fused expression → checksum).
  *
  * Usage: sbt "runMain graft.RasterBench [nScenes] [blocksPerScene]"
  */
object RasterBench {
  def main(args: Array[String]): Unit = {
    val nScenes = if (args.length > 0) args(0).toInt else 64
    val blocks = if (args.length > 1) args(1).toInt else 16 // per scene per band
    val side = 256
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val px = side * side
    val tiles = spark.range(nScenes.toLong * blocks)
      .select(
        concat(lit("scene"), (col("id") / blocks).cast("int")).as("scene_id"),
        (col("id") % blocks).cast("int").as("window_row"))
      .withColumn("window_col", lit(0))
      .withColumn("height", lit(side)).withColumn("width", lit(side))
      .withColumn("nodata", lit(-9999.0))
      .withColumn("seq", sequence(lit(0), lit(px - 1)))
    val b04 = tiles.withColumn("band", lit("B04"))
      .withColumn("pixels", transform(col("seq"), i => (i % 10000).cast("float"))).drop("seq")
    val b08 = tiles.withColumn("band", lit("B08"))
      .withColumn("pixels", transform(col("seq"), i => ((i * 3) % 10000).cast("float"))).drop("seq")
    val corpus = b04.unionByName(b08)
      .select("scene_id", "band", "window_row", "window_col", "height", "width", "nodata", "pixels")
      .localCheckpoint(true) // materialize inputs so we time the kernel, not the generator

    val nTiles = corpus.count()
    val bytes = nTiles * px * 4L
    val tp0 = System.nanoTime()
    val piv = RasterKernels.pivotBands(corpus).localCheckpoint(true)
    val pivotSec = (System.nanoTime() - tp0) / 1e9
    val t0 = System.nanoTime()
    val out = RasterKernels.bandMath(piv,
      "10000. * ((B08 - B04) / (B08 + B04))", "NDVI", -9999.0, -10000.0, 10000.0)
    val checksum = out.agg(sum(element_at(col("pixels"), 1))).head().getDouble(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val mbps = bytes / 1e6 / sec
    // ingest-path tiling: full 2048x2048 scenes -> 256x256 blocks (S5)
    val sceneSide = 2048
    val scenes = spark.range(math.max(1, nScenes / 8))
      .select(concat(lit("big"), col("id")).as("scene_id"), lit("B04").as("band"),
        lit(sceneSide).as("height"), lit(sceneSide).as("width"), lit(-9999.0).as("nodata"),
        transform(sequence(lit(0), lit(sceneSide * sceneSide - 1)),
          i => (i % 10000).cast("float")).as("pixels"))
      .localCheckpoint(true)
    val sceneBytes = scenes.count() * sceneSide.toLong * sceneSide * 4
    val tt0 = System.nanoTime()
    val nOut = graft.raster.SceneIO.tileScene(scenes, side, side).count()
    val tileSec = (System.nanoTime() - tt0) / 1e9
    // pivot-free path: multi-band scenes -> pivoted windows -> band math,
    // zero exchanges (compare pivot_sec + math_sec on the shuffle path)
    val mbScenes = spark.range(math.max(1, nScenes / 8))
      .select(concat(lit("mb"), col("id")).as("scene_id"),
        lit(sceneSide).as("height"), lit(sceneSide).as("width"),
        map_from_arrays(array(lit("B04"), lit("B08")), array(
          transform(sequence(lit(0), lit(sceneSide * sceneSide - 1)), i => (i % 10000).cast("float")),
          transform(sequence(lit(0), lit(sceneSide * sceneSide - 1)), i => ((i * 3) % 10000).cast("float"))))
          .as("bands"),
        map_from_arrays(array(lit("B04"), lit("B08")),
          array(lit(-9999.0), lit(-9999.0))).as("nodatas"))
      .localCheckpoint(true)
    val mbBytes = mbScenes.count() * 2L * sceneSide * sceneSide * 4
    val tm0 = System.nanoTime()
    val mbOut = RasterKernels.bandMath(
      graft.raster.SceneIO.tileSceneMultiBand(mbScenes, Seq("B04", "B08"), side, side),
      "10000. * ((B08 - B04) / (B08 + B04))", "NDVI", -9999.0, -10000.0, 10000.0)
      .agg(sum(element_at(col("pixels"), 1))).head().getDouble(0)
    val mbSec = (System.nanoTime() - tm0) / 1e9
    println(f"""{"tiles":$nTiles,"pixels_per_tile":$px,"input_mb":${bytes / 1e6}%.0f,"pivot_sec":$pivotSec%.2f,"math_sec":$sec%.2f,"math_mb_per_sec":$mbps%.0f,"tile_scene_mb_per_sec":${sceneBytes / 1e6 / tileSec}%.0f,"tiles_out":$nOut,"pivot_free_mb_per_sec":${mbBytes / 1e6 / mbSec}%.0f,"pivot_free_checksum":$mbOut%.0f,"checksum":$checksum%.0f}""")
    spark.stop()
  }
}
