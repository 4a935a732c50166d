package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate q96_geotiff_roundtrip's phases (write job vs read job) at
  * sf0.1 to attribute bench drift (not part of the library surface). */
object Q96Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    (1 to 5).foreach { i =>
      val scenes = graft.catalog.Tables.embeddings(spark, d)
        .filter(col("vec_id") < 64)
        .select(col("vec_id").cast("string").as("scene_id"),
          lit("B1").as("band"), lit(8).as("height"), lit(8).as("width"),
          lit(-9999.0f).as("nodata"), col("embedding").as("pixels"))
      val dir = java.nio.file.Files.createTempDirectory("q96_prof").toString
      val t0 = System.nanoTime()
      graft.raster.SceneIO.writeGeoTiffScenes(
        graft.raster.SceneIO.tileScene(scenes, 4, 4), dir,
        tileSize = 16, overviewFactors = Seq(2)).count()
      val t1 = System.nanoTime()
      val n = graft.raster.SceneIO.readGeoTiffScenes(spark, dir)
        .select(col("scene_id").cast("long").as("vec_id"),
          round(aggregate(col("pixels"), lit(0.0), (a, p) => a + p.cast("double")), 4)
            .as("checksum"))
        .orderBy(col("vec_id")).collect().length
      val t2 = System.nanoTime()
      println(f"[q96prof] run$i write=${(t1 - t0) / 1e9}%.3f s read=${(t2 - t1) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
