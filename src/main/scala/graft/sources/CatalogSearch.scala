package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.meta.MetaQueries

/** Catalog-snapshot search (SURVEY.md S1/ST7): the engine's model of
  * `provider.search` (controller.py:263–295) over a columnar snapshot of
  * the remote catalog (FIXTURES.md §3 schema), plus the Redis-memoization
  * pattern (controller.py:539–602) as snapshot-vs-needed anti-joins.
  *
  * All three search modes push their predicates into the parquet scan
  * (partition columns catalog/dataset/period prune row groups; cloud/date
  * are min-max pruned) — the Catalyst equivalent of the reference pushing
  * bbox/date/cloud into the provider HTTP query.
  */
object CatalogSearch {

  /** Mode 1 — by explicit scene ids (`filename=scene*`,
    * controller.py:264–272). */
  def searchScenes(snapshot: DataFrame, sceneIds: Seq[String]): DataFrame =
    snapshot.filter(col("scene_id").isin(sceneIds.distinct: _*))

  /** Mode 2 — by tiles + date range + cloud (controller.py:274–286). */
  def searchTiles(snapshot: DataFrame, tiles: Seq[String], startDate: String,
                  endDate: String, cloudCover: Double = 100.0): DataFrame =
    snapshot.filter(col("tile").isin(tiles: _*) &&
      col("sensing_date").between(lit(startDate), lit(endDate)) &&
      col("cloud_cover") <= cloudCover)

  /** Mode 3 — by bbox + date range + cloud (controller.py:288–295). The
    * bbox test uses the denormalized bbox struct (P4 prefilter). */
  def searchBbox(snapshot: DataFrame, w: Double, s: Double, e: Double, n: Double,
                 startDate: String, endDate: String, cloudCover: Double = 100.0): DataFrame =
    snapshot.filter(
      MetaQueries.bboxOverlap(col("bbox").getField("xmin"), col("bbox").getField("ymin"),
        col("bbox").getField("xmax"), col("bbox").getField("ymax"), w, s, e, n) &&
        col("sensing_date").between(lit(startDate), lit(endDate)) &&
        col("cloud_cover") <= cloudCover)

  /** Live-provider entry point: the same search surface over the
    * [[RemoteCatalogSource]] DSv2 connector — DataFrame filters compose
    * exactly like the snapshot modes and Catalyst pushes the supported
    * predicates into the provider's search call. Callers filter the
    * result like any DataFrame:
    * {{{
    * CatalogSearch.live(spark, "usgs")
    *   .filter(col("dataset") === "S2_MSI_L1C" && col("cloud_cover") <= 20)
    * }}} */
  def live(spark: org.apache.spark.sql.SparkSession, provider: String,
           partitionSize: Int = 1000): DataFrame =
    spark.read.format("remote_catalog")
      .option("provider", provider)
      .option("partitionSize", partitionSize.toString)
      .load()

  /** ST7 — memoized search: which (tile, period) cells are NOT yet in the
    * snapshot and need a remote fetch. The reference's Redis get/set
    * pipeline becomes one anti-join of the needed grid against the
    * snapshot's (tile, period) partitions. */
  def uncachedCells(needed: DataFrame, snapshot: DataFrame): DataFrame =
    needed.join(snapshot.select(col("tile"), col("period")).distinct(),
      Seq("tile", "period"), "left_anti")
}
