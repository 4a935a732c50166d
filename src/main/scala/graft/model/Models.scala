package graft.model

/** Core data model (SURVEY.md §1) — case classes mirroring the reference's
  * catalog entities, used as `Dataset[T]` row types and JSON codec targets.
  *
  * Citations: Collection/Band creation utils.py:578–611 and
  * examples/data/sentinel-2-l2a.json; Item publish.py:575–605; Activity
  * models.py:37–63; Execution models.py:90–128; Provider models.py:131–193;
  * GridTile controller.py:504–515.
  */
final case class BandDef(
    name: String,
    common_name: Option[String] = None,
    data_type: String = "int16",
    nodata: Double = -9999.0,
    min_value: Double = Short.MinValue.toDouble,
    max_value: Double = Short.MaxValue.toDouble,
    scale: Option[Double] = None,
    resolution_x: Option[Double] = None,
    resolution_y: Option[Double] = None,
    mime_type: Option[String] = None,
    center_wavelength: Option[Double] = None,
    /** derived-band formula (index_generator.py:75–77 discovers these) */
    expression: Option[String] = None)

final case class CollectionDef(
    name: String,
    version: Int = 1,
    title: Option[String] = None,
    collection_type: String = "collection",
    grid_ref_sys: Option[String] = None,
    /** RGB band triple for quicklooks (landsat-8-l1.json:8–12) */
    quicklook: Seq[String] = Nil,
    bands: Seq[BandDef] = Nil,
    /** processor names from metadata.processors */
    processors: Seq[String] = Nil)

final case class ProviderDef(
    name: String,
    driver_name: String,
    url: Option[String] = None,
    description: Option[String] = None,
    /** JSON credentials kept opaque (models.py:150 JSONB) */
    credentials: Option[String] = None)

final case class CollectionProvider(
    provider_id: Int, collection_id: Int, active: Boolean, priority: Int)

final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

final case class Asset(href: String, mime_type: String, roles: Seq[String] = Nil)

final case class Item(
    name: String,
    collection_id: Int,
    start_date: java.sql.Timestamp,
    end_date: java.sql.Timestamp,
    cloud_cover: Option[Double],
    assets: Map[String, Asset],
    bbox: BBox,
    footprint: Seq[(Double, Double)],
    srid: Int,
    tile_id: Option[String],
    provider_id: Option[Int],
    is_available: Boolean = true)

final case class Activity(
    sceneid: String,
    collection_id: Int,
    activity_type: String,
    args: Option[String] = None,
    tags: Seq[String] = Nil,
    scene_type: Option[String] = None,
    status: String = "PENDING",
    retry_count: Int = 0)

final case class Execution(
    sceneid: String,
    collection_id: Int,
    activity_type: String,
    status: String,
    attempt: Int,
    start: Option[java.sql.Timestamp] = None,
    end: Option[java.sql.Timestamp] = None,
    traceback: Option[String] = None)

final case class GridTile(grid: String, tile: String, bbox: BBox,
                          geom: Seq[(Double, Double)])
