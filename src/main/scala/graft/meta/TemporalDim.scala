package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) maintenance and point-in-time
  * reads — the temporal-versioning layer a warehouse keeps over mutable
  * entities (the reference mutates catalog rows in place and keeps no
  * history; a 100 TB lake wants the history AND cheap as-of reads).
  *
  * Scale shape: everything is per-key windows — ONE exchange keyed by the
  * entity, both window passes (change detection, interval close) ride the
  * same sort. The dimension is entity-sized, not event-sized, after the
  * no-op-change collapse. As-of reads are a scan-side interval predicate —
  * pushable, no join.
  */
object TemporalDim {

  /** Fold an append-only change log into SCD2 validity intervals:
    * (key, state, valid_from, valid_to) with `valid_to` NULL for the
    * current row. Consecutive identical states collapse (a re-assertion of
    * the same value is not a new version). `tiebreak` totalizes
    * within-timestamp order so the result is deterministic. */
  def scd2FromLog(log: DataFrame, keyCol: String, tsCol: String,
                  stateCol: String, tiebreak: String): DataFrame = {
    val wFull = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreak))
    val changes = log
      .withColumn("__prev", lag(col(stateCol), 1).over(wFull))
      .filter(col("__prev").isNull || col(stateCol) =!= col("__prev"))
    val wChanged = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreak))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(wChanged))
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Point-in-time read: the rows whose validity interval covers `at` —
    * `valid_from ≤ at < valid_to` (half-open; NULL valid_to = current).
    * A scan-side predicate, no join, pushdown-eligible. */
  def snapshotAt(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
