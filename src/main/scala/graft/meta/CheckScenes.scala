package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** POST /api/check-scenes (SURVEY.md §3.3, controller.py:498–620): catalog
  * reconciliation between the external catalog snapshot and published
  * items, per (tile × calendar period), fully parallel — the reference
  * loops tiles×periods sequentially in Python; here it is one plan:
  * broadcast periods × interval-overlap join → anti-joins → counts.
  */
object CheckScenes {

  /** Reconciliation report.
    *
    * @param snapshot external scene records: (scene_id, tile, sensing_date)
    * @param items    published items: (name, collection_id, tile_id, start_date)
    * @return per-collection missing scenes + totals, and external-only ids
    */
  def report(spark: SparkSession, snapshot: DataFrame, items: DataFrame,
             tiles: Seq[String], startDate: String, endDate: String,
             collections: Seq[Int]): DataFrame = {
    // ST9: calendar months covering [start, end] — broadcast (≤ hundreds)
    val periods = spark.range(1).select(explode(sequence(
        date_trunc("month", lit(startDate).cast("timestamp")),
        date_trunc("month", lit(endDate).cast("timestamp")),
        expr("interval 1 month"))).as("period_start"))
      .withColumn("period_end",
        col("period_start") + expr("interval 1 month") - expr("interval 1 second"))
    val external = snapshot
      .filter(col("tile").isin(tiles: _*))
      .join(broadcast(periods),
        col("sensing_date").between(col("period_start"), col("period_end")))
      .select(col("scene_id"), col("tile"), col("period_start"))
      .distinct() // SET2 union over (tile, period) cells
    val perCollection = collections.map { cid =>
      val internal = items.filter(col("collection_id") === cid && col("tile_id").isin(tiles: _*))
        .select(col("name").as("scene_id"))
      val missing = external.join(internal, Seq("scene_id"), "left_anti") // SET3
      missing.agg(
        lit(cid).as("collection_id"),
        count(lit(1)).as("total_missing"),
        countDistinct(col("scene_id")).as("distinct_missing"))
    }
    val totals = external.agg(
      lit(-1).as("collection_id"), // -1 = external universe row
      count(lit(1)).as("total_missing"),
      countDistinct(col("scene_id")).as("distinct_missing"))
    (perCollection :+ totals).reduce(_ unionByName _)
  }

  /** Pairwise inter-collection difference (controller.py:612–618):
    * scenes published in collection A but not in B. */
  def collectionDiff(items: DataFrame, a: Int, b: Int): DataFrame = {
    val inA = items.filter(col("collection_id") === a).select(col("name"))
    val inB = items.filter(col("collection_id") === b).select(col("name"))
    inA.except(inB)
  }
}
