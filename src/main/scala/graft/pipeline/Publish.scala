package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Geo
import graft.functions.SceneFunctions

/** Item publish assembly (SURVEY.md S12 — publish.py:184–617): turn a
  * scene's asset listing + tiles into catalog Item rows and merge them
  * idempotently into the items table.
  */
object Publish {

  /** P8 — asset-name routing (celery/tasks.py:411–419): drop thumbnails and
    * derived indices from the band map, route Fmask4 to the quality slot. */
  def routeAssets(assets: Column): Column = struct(
    map_filter(assets, (k, _) =>
      !k.isin("thumbnail", "ndvi", "evi", "Fmask4")).as("bands"),
    element_at(assets, "Fmask4").as("quality"))

  /** Asset map entries from per-band file paths (publish.py:411–472 asset
    * assembly): band name parsed from the path, mime from the extension.
    * Paths whose band token is not in the known grammar (e.g. HDF-derived
    * `<base>_Surface_Reflectance_Band_1.tif`, hdf.py:85) key on the file
    * stem instead — every file keeps a distinct, stable asset key. */
  def assetsFromPaths(paths: Column): Column =
    map_from_entries(transform(paths, p => {
      val parsed = SceneFunctions.bandFromPath(p)
      val stem = regexp_extract(p, "([^/]+?)(?:\\.[A-Za-z0-9]+)?$", 1)
      struct(
        when(parsed =!= "", parsed).otherwise(stem).as("band"),
        struct(p.as("href"), SceneFunctions.mimeByExtension(p).as("mime_type")).as("asset"))
    }))

  /** R7 — Sentinel footprint from MTD XML content (publish.py:159–174):
    * EXT_POS_LIST is "lat lon lat lon ..."; emit array<struct<x,y>> with
    * x=lon, y=lat. Pure string expressions. */
  def footprintFromXml(xml: Column): Column = {
    val posList = regexp_extract(xml,
      "(?s)<EXT_POS_LIST>\\s*(.*?)\\s*</EXT_POS_LIST>", 1)
    val nums = transform(split(trim(posList), "\\s+"), s => s.cast("double"))
    when(size(nums) >= 4,
      transform(sequence(lit(0), (size(nums) / 2).cast("int") - 1),
        i => struct(element_at(nums, i * 2 + 2).as("x"),
          element_at(nums, i * 2 + 1).as("y"))))
      .otherwise(array().cast("array<struct<x:double,y:double>>"))
  }

  /** R8 — EPSG detection by lookup (utils.py:486–522): the reference falls
    * back to a spatial_ref_sys table lookup; here a broadcast join against
    * a bundled CRS table (utm zone → epsg). */
  def sridForUtmZone(zone: Column, north: Column): Column =
    when(north, lit(32600) + zone).otherwise(lit(32700) + zone)

  /** Assemble Item rows from scene metadata + per-scene footprint points.
    *
    * `scenes`: (scene_id, collection_id, start_date, end_date, cloud_cover,
    * asset_paths array<string>, tile). `footprints`: tile rows already
    * reduced by [[Geo.tileRowExtremePoints]]. The per-scene hull is the
    * hull of collected per-tile extreme points (exact — see Geo scaladoc);
    * the collect_list per scene is bounded at 2·rows-per-scene points. */
  def assembleItems(scenes: DataFrame, footprintPoints: DataFrame): DataFrame = {
    val hulls = footprintPoints
      .groupBy(col("scene_id"))
      .agg(flatten(collect_list(col("points"))).as("pts"))
      .select(col("scene_id"), Geo.convexHullUdf(col("pts")).as("footprint"))
    scenes
      .join(hulls, Seq("scene_id"), "left")
      .select(
        col("scene_id").as("name"),
        col("collection_id"),
        col("start_date"), col("end_date"),
        col("cloud_cover"),
        assetsFromPaths(col("asset_paths")).as("assets"),
        when(col("footprint").isNotNull, Geo.polygonBbox(col("footprint")))
          .otherwise(lit(null)).as("bbox"),
        col("footprint"),
        col("tile").as("tile_id"),
        current_timestamp().as("updated"))
  }

  /** Reproject a UTM footprint polygon to EPSG:4326 (x=lon, y=lat)
    * vertices — the reference publishes footprints in 4326
    * (publish.py:272–273 `from_shape(..., srid=4326)`); scene geometry
    * arrives in the scene's UTM zone. A few vertices per scene → UDF off
    * the hot path, math in [[graft.expr.Crs]]. */
  private val footprintToWgs84Udf = org.apache.spark.sql.functions.udf {
    (pts: Seq[org.apache.spark.sql.Row], zone: Int, north: Boolean) =>
      if (pts == null) null
      else pts.map { p =>
        val (lat, lon) = graft.expr.Crs.utmToWgs84(p.getDouble(0), p.getDouble(1), zone, north)
        (lon, lat)
      }
  }

  def footprintToWgs84(footprint: Column, zone: Column, north: Column): Column =
    footprintToWgs84Udf(footprint, zone, north).cast("array<struct<x:double,y:double>>")

  /** Idempotent publish: MERGE by (name, collection_id) — publish.py:575–605
    * nested-transaction upsert becomes one batched merge. */
  def publishItems(existing: DataFrame, staged: DataFrame): DataFrame =
    Pipeline.mergeByKey(existing, staged, Seq("name", "collection_id"))

  /** STAC 1.0.0 Feature JSON for an assembled item row — the export shape
    * the reference's catalog consumers read (publish.py:575–605 writes the
    * same fields into the PostGIS `Item`: id/collection/bbox/footprint/
    * datetime/cloud cover/assets). One `to_json` projection; the polygon
    * ring is closed (first vertex repeated) per the GeoJSON spec.
    * `ignoreNullFields=false` keeps an explicit `"geometry": null` for
    * footprint-less items (GeoJSON REQUIRES the key), and the 'Z'-suffixed
    * datetimes are shifted through `to_utc_timestamp(current_timezone())`
    * so they are UTC-correct under ANY session time zone, not only when
    * the caller pinned spark.sql.session.timeZone=UTC. */
  def stacItemJson(item: DataFrame): DataFrame = {
    val ring = concat(
      transform(col("footprint"), p => array(p.getField("x"), p.getField("y"))),
      slice(transform(col("footprint"), p => array(p.getField("x"), p.getField("y"))),
        1, 1))
    def utcIso(ts: Column): Column =
      date_format(to_utc_timestamp(ts, current_timezone()),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    item.select(col("name"), to_json(struct(
      lit("Feature").as("type"),
      lit("1.0.0").as("stac_version"),
      col("name").as("id"),
      col("collection_id").cast("string").as("collection"),
      array(col("bbox.xmin"), col("bbox.ymin"), col("bbox.xmax"), col("bbox.ymax"))
        .as("bbox"),
      when(col("footprint").isNotNull,
        struct(lit("Polygon").as("type"), array(ring).as("coordinates")))
        .as("geometry"),
      struct(
        utcIso(col("start_date")).as("datetime"),
        utcIso(col("start_date")).as("start_datetime"),
        utcIso(col("end_date")).as("end_datetime"),
        col("cloud_cover").as("eo:cloud_cover")).as("properties"),
      col("assets").as("assets")),
      Map("ignoreNullFields" -> "false")).as("stac_json"))
  }
}
