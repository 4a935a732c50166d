package graft

import graft.api.{Api, Forms}
import graft.expr.Geo
import graft.meta.MetaQueries
import graft.pipeline.{Pipeline, Publish}
import graft.raster.{RasterKernels, RasterTile, SceneIO}
import graft.sources.CatalogSearch
import org.apache.spark.sql.functions._

/** SURVEY.md §7 "minimum end-to-end slice": radcor(action=start) in batch
  * mode — validate form → snapshot search → anti-join against published
  * items → activity planning → download/publish stages (publish computes
  * NDVI via the expression compiler and a convex-hull footprint) → item
  * MERGE → metadata queries read the result back. One test, the whole
  * engine path (§3.1 steps 1–8).
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("radcor end-to-end: search → plan → run → publish → query back") {
    // 1. form validation (views.py:52–79)
    val form = Forms.SearchForm(dataset = "S2MSI1C", tiles = Some(Seq("23LLF")),
      startDate = Some("2020-01-01"), endDate = Some("2020-01-31"),
      cloud = 50.0, tasks = Seq("download", "publish"))
    assert(Forms.validate(form) == Forms.Valid)

    // 2. catalog snapshot + search (controller.py:263–295)
    val snapshot = Seq(
      ("S2A_T23LLF_0001", "23LLF", "2020-01-05", 10.0, "https://cat/1"),
      ("S2A_T23LLF_0002", "23LLF", "2020-01-15", 30.0, "https://cat/2"),
      ("S2A_T23LLF_0003", "23LLF", "2020-01-25", 80.0, "https://cat/3"), // cloud > 50
      ("S2A_T24XXX_0004", "24XXX", "2020-01-05", 5.0, "https://cat/4"))  // other tile
      .toDF("scene_id", "tile", "d", "cloud_cover", "link")
      .withColumn("sensing_date", col("d").cast("timestamp"))
    val found = CatalogSearch.searchTiles(snapshot, form.tiles.get,
      form.startDate.get, form.endDate.get, form.cloud)
    assert(found.count() == 2)

    // 2b. the same search through the live DSv2 connector (S1 live path):
    // the provider over-returns everything; Catalyst pushes the supported
    // predicates into the search call and re-applies all of them post-scan
    graft.sources.RemoteCatalog.register("e2e-prov", _ =>
      snapshot.collect().toSeq.map(r => graft.sources.RemoteCatalog.SceneRecord(
        r.getString(0), "S2MSI1C", r.getDouble(3),
        r.getTimestamp(5).getTime * 1000L, r.getString(4))))
    val live = CatalogSearch.live(spark, "e2e-prov")
      .filter(col("scene_id").startsWith("S2A_T23LLF") &&
        col("cloud_cover") <= form.cloud &&
        col("sensing_date").between(lit(form.startDate.get), lit(form.endDate.get)))
    assert(live.select("scene_id").collect().map(_.getString(0)).sorted.toSeq ==
      found.select("scene_id").collect().map(_.getString(0)).sorted.toSeq)

    // 3. skip already-published (controller.py:298–337): 0001 already exists
    val items0 = Seq(("S2A_T23LLF_0001", 1)).toDF("name", "collection_id")
    val work = MetaQueries.notPublished(
      found.select(col("scene_id").as("name")).withColumn("collection_id", lit(1)),
      items0, Seq("name", "collection_id"))
    assert(work.collect().map(_.getString(0)).toSeq == Seq("S2A_T23LLF_0002"))

    // 4. plan the DAG (controller.py:318–365)
    val tree = Pipeline.TaskNode("download", Seq(Pipeline.TaskNode("publish")))
    val (acts, edges) = Pipeline.planActivities(
      work.select(col("name").as("scene_id")), "scene_id", 1, tree)
    assert(acts.count() == 2 && edges.count() == 1)

    // 5. synthetic scene raster: 4×4, two bands, some nodata
    val b04 = Array(2000f, 2000f, -9999f, 2000f,
      2000f, 1000f, 1000f, 2000f,
      2000f, 1000f, 1000f, 2000f,
      2000f, 2000f, 2000f, 2000f)
    val b08 = b04.map(v => if (v == -9999f) -9999f else v * 4)
    val sceneDf = Seq(
      ("S2A_T23LLF_0002", "B04", 4, 4, -9999.0, b04),
      ("S2A_T23LLF_0002", "B08", 4, 4, -9999.0, b08))
      .toDF("scene_id", "band", "height", "width", "nodata", "pixels")
    val tiles = SceneIO.tileScene(sceneDf, 2, 2)   // S5: 4 windows × 2 bands

    // 6. stage kernels: download stub; publish = NDVI + footprint + item row
    var publishedItems: org.apache.spark.sql.DataFrame = null
    val kernels = Map[String, Pipeline.StageKernel](
      "download" -> (df => df.withColumn("status",
        when(col("retry_count") === 0, "RETRY").otherwise("SUCCESS"))), // first try offline (ST3)
      "publish" -> { df =>
        // R1: NDVI via the collection's expression band (loader format)
        val ndvi = RasterKernels.bandMath(RasterKernels.pivotBands(tiles),
          "10000. * ((B08 - B04) / (B08 + B04))", "NDVI", -9999.0, -10000.0, 10000.0)
        // R6: footprint from valid pixels of B04
        val fps = tiles.filter(col("band") === "B04").select(col("scene_id"),
          Geo.tileRowExtremePoints(col("pixels"), col("nodata"), col("height"),
            col("width"), col("window_row"), col("window_col")).as("points"))
        val scenes = df.select(col("sceneid").as("scene_id")).distinct()
          .withColumn("collection_id", lit(1))
          .withColumn("start_date", lit("2020-01-15 00:00:00").cast("timestamp"))
          .withColumn("end_date", lit("2020-01-15 23:59:59").cast("timestamp"))
          .withColumn("cloud_cover", lit(30.0))
          .withColumn("asset_paths", array(lit("out/S2A_T23LLF_0002_B04.tif"),
            lit("out/S2A_T23LLF_0002_B08.tif"), lit("out/S2A_T23LLF_0002_NDVI.tif")))
          .withColumn("tile", lit("23LLF"))
        publishedItems = Publish.assembleItems(scenes, fps)
        // NDVI sanity inside the stage: (4x-x)/(4x+x) = 0.6 → 6000
        val px = ndvi.orderBy("window_row", "window_col").head().getSeq[Float](7)
        assert(px.forall(v => v == 6000.0f || v == -9999.0f))
        df.withColumn("status", lit("SUCCESS"))
      })
    val (finalActs, execs) = Pipeline.runBatch(acts, tree, kernels, maxRetries = 2)

    // 7. item MERGE (S12) — republish is idempotent
    val items1 = Publish.publishItems(
      items0.withColumn("start_date", lit(null).cast("timestamp"))
        .withColumn("end_date", lit(null).cast("timestamp"))
        .withColumn("cloud_cover", lit(null).cast("double"))
        .withColumn("assets", lit(null).cast(publishedItems.schema("assets").dataType))
        .withColumn("bbox", lit(null).cast(publishedItems.schema("bbox").dataType))
        .withColumn("footprint", lit(null).cast(publishedItems.schema("footprint").dataType))
        .withColumn("tile_id", lit(null).cast("string"))
        .withColumn("updated", lit(null).cast("timestamp"))
        .select(publishedItems.columns.map(col): _*),
      publishedItems)
    assert(items1.count() == 2)
    val item = items1.filter(col("name") === "S2A_T23LLF_0002").head()
    val bbox = item.getAs[org.apache.spark.sql.Row]("bbox")
    assert(bbox.getDouble(0) == 0.0 && bbox.getDouble(2) == 3.0 &&
      bbox.getDouble(1) == 0.0 && bbox.getDouble(3) == 3.0)
    assert(item.getAs[Map[String, Any]]("assets").keySet == Set("B04", "B08", "NDVI"))

    // 8. metadata queries over the result (§3.2) — incl. the retry history
    assert(Api.listActivities(finalActs).contains("\"total\":2"))
    val counts = Api.countActivities(finalActs)
    assert(counts.contains("{\"activity_type\":\"download\",\"status\":\"SUCCESS\",\"n\":1}"))
    assert(counts.contains("{\"activity_type\":\"publish\",\"status\":\"SUCCESS\",\"n\":1}"))
    assert(execs.filter(col("status") === "RETRY").count() == 1)
    // quicklook PNG of the published scene (S10)
    val t3 = tiles.filter(col("band") === "B04")
      .unionByName(tiles.filter(col("band") === "B04").withColumn("band", lit("B03")))
      .unionByName(tiles.filter(col("band") === "B04").withColumn("band", lit("B02")))
    val png = SceneIO.quicklook(t3, "S2A_T23LLF_0002", ("B04", "B03", "B02"), 16, 16)
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P')
  }
}
