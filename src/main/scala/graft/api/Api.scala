package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.MetaQueries
import graft.sources.CatalogSearch

/** Thin API layer (SURVEY.md §7.7): the reference's Flask routes
  * (views.py) as functions DataFrame-in → JSON-out. Each call builds a
  * lazy plan and collects only the page/aggregate actually returned —
  * the DB round-trip of the reference becomes a Spark job.
  */
object Api {

  private def toJson(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** GET /api/activities (views.py:33–49): dynamic filters + pagination. */
  def listActivities(activities: DataFrame, sceneId: Option[String] = None,
                     collectionId: Option[Int] = None, activityTypeContains: Option[String] = None,
                     page: Int = 1, perPage: Int = 10): String = {
    val preds = Seq(
      sceneId.map(s => col("sceneid") === s),
      collectionId.map(c => col("collection_id") === c),
      activityTypeContains.map(t => col("activity_type").contains(t))).flatten
    val filtered = if (preds.isEmpty) activities
      else activities.filter(preds.reduce(_ && _))
    val total = filtered.count()
    val rows = MetaQueries.paginate(filtered, Seq(col("sceneid"), col("activity_type")),
      page, perPage)
    s"""{"total":$total,"page":$page,"per_page":$perPage,"items":${toJson(rows)}}"""
  }

  /** GET /api/count-activities (controller.py:426–445). */
  def countActivities(activities: DataFrame): String =
    toJson(MetaQueries.countBy(activities, Seq(col("activity_type"), col("status")))
      .orderBy(col("activity_type"), col("status")))

  /** GET /api/count-activities-date (controller.py:448–468). */
  def countActivitiesByDay(executions: DataFrame): String =
    toJson(MetaQueries.countBy(executions,
        Seq(to_date(col("ts")).cast("string").as("day"), col("status")))
      .orderBy(col("day"), col("status")))

  /** Latest-run-failed count (controller.py:471–495, J5). */
  def countUnsuccessfullyActivities(executions: DataFrame): String = {
    val n = MetaQueries.latestPerGroup(executions,
        Seq(col("sceneid")), col("ts"), Seq(col("attempt")))
      .filter(col("status") =!= "SUCCESS").count()
    s"""{"failed":$n}"""
  }

  /** POST /api/radcor/restart (controller.py:86–151): reset matching
    * activities to PENDING so the runner re-dispatches them. Requires at
    * least one restriction (the reference errors on unrestricted restarts,
    * controller.py:99); `errorsOnly` mirrors `restart_errors`. Returns the
    * updated activities table (caller persists via merge). */
  def restartActivities(activities: DataFrame, sceneIds: Seq[String] = Nil,
                        collectionId: Option[Int] = None, activityType: Option[String] = None,
                        errorsOnly: Boolean = true): DataFrame = {
    val preds = Seq(
      if (sceneIds.nonEmpty) Some(col("sceneid").isin(sceneIds: _*)) else None,
      collectionId.map(c => col("collection_id") === c),
      activityType.map(t => col("activity_type") === t)).flatten
    val restriction = MetaQueries.conjunctiveFilter(activities, preds)
    val target = if (errorsOnly) restriction.filter(col("status") === "FAILURE") else restriction
    val reset = target.withColumn("status", lit("PENDING"))
      .withColumn("retry_count", lit(0))
    graft.pipeline.Pipeline.mergeByKey(activities, reset,
      Seq("sceneid", "collection_id", "activity_type"))
  }

  /** POST /api/radcor search preview (controller.py:389–391 response). */
  def radcorPreview(snapshot: DataFrame, tiles: Seq[String], startDate: String,
                    endDate: String, cloud: Double): String =
    toJson(CatalogSearch.searchTiles(snapshot, tiles, startDate, endDate, cloud)
      .select(col("scene_id"), col("cloud_cover"), col("link"))
      .orderBy(col("scene_id")))

  /** GET /api/collections (controller.py:623–630): ordered by id. */
  def listCollections(collections: DataFrame): String =
    toJson(collections.select(col("id"), col("name"), col("collection_type"))
      .orderBy(col("id")))

  /** GET /api/grids (controller.py:633–641): ordered by name. */
  def listGrids(grids: DataFrame): String =
    toJson(grids.select(col("name"), col("description")).orderBy(col("name")))

  /** GET /api/collections/<id>/tiles (controller.py:683–690, J3/A4):
    * distinct tile names of a collection's published items. */
  def listCollectionTiles(items: DataFrame, tiles: DataFrame, collectionId: Int): String =
    toJson(tiles.join(items.filter(col("collection_id") === collectionId),
        tiles("id") === items("tile_id"))
      .select(tiles("tile").as("tile")).distinct().orderBy(col("tile")))
}
