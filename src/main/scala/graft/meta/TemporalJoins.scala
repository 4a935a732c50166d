package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the catalog surface implies but the reference
  * delegates to hand-written loops (controller.py:547–602 iterates
  * tiles×periods in Python; the closest SQL shape is the interval-overlap
  * predicate at controller.py:571–575). Both operators here avoid the
  * broadcast-nested-loop plan a naive non-equi join produces — the only
  * formulation that survives a 100 TB fact table.
  */
object TemporalJoins {

  /** As-of join (backward): for every left row, attach the payload of the
    * single right row with the greatest `rightTs` ≤ `leftTs` within the same
    * key group — "most recent catalog state at event time". `direction =
    * "forward"` flips to the earliest right row with `rightTs` ≥ `leftTs`.
    *
    * Implementation is the union–window formulation, not a join: both sides
    * union on the key, ONE hash shuffle partitions by key, and a running
    * `last(payload, ignoreNulls)` over (ts, side) fills each left row with
    * the latest right payload at or before it. No join node appears in the
    * plan at all — compared to the non-equi join (`l.ts >= r.ts` +
    * max-per-group dedup) this replaces O(|L|·|R|/keys) comparisons and two
    * shuffles with one shuffle and a linear scan, and it cannot skew-explode:
    * a hot key costs O(n log n) sort, not O(n²) pairs.
    *
    * Ties: a right row at exactly `leftTs` IS matched (inclusive, DuckDB
    * `ASOF JOIN ON l.ts >= r.ts` semantics). Right rows must be unique per
    * (key, ts) — pre-aggregate otherwise (the window's intra-ts order between
    * duplicate right rows is not defined).
    *
    * Left rows with no preceding right row keep null payloads (LEFT OUTER
    * as-of).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key lists must align")
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward, got $direction")
    val reserved = Seq("__t", "__p", "__side", "__m")
    require(!left.columns.exists(reserved.contains),
      s"left input must not use the reserved columns ${reserved.mkString(", ")}")
    val p = struct(payload.map(col): _*)
    // Right side: keys renamed to the left's names, payload boxed into one
    // nullable struct so unionByName can null-fill it for left rows.
    // Null-key right rows are dropped: SQL equality (and DuckDB ASOF JOIN)
    // never matches NULL = NULL, but window partitionBy groups NULLs
    // together — without the filter, null-key left rows would wrongly
    // receive null-key right payloads.
    val r = right
      .filter(rightKeys.map(col(_).isNotNull).reduce(_ && _))
      .select(rightKeys.map(col) ++ Seq(col(rightTs).as("__t"), p.as("__p")): _*)
      .toDF(leftKeys ++ Seq("__t", "__p"): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at the same timestamp → inclusive
    // match. Backward scans time ascending; forward scans descending (the
    // "next" right row is the last one seen walking backwards from +inf).
    val ord: Seq[Column] = direction match {
      case "backward" => Seq(col("__t").asc, col("__side").asc)
      case "forward"  => Seq(col("__t").desc, col("__side").asc)
    }
    val w = Window.partitionBy(leftKeys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    matched.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(f => col("__m").getField(f).as(f)): _*)
  }

  /** Interval–point range join via time bucketing (SURVEY §4's bucketing
    * trick as a first-class operator): pairs every `points` row with every
    * `intervals` row whose [startCol, endCol] contains its `tsCol`.
    *
    * Each point owns exactly ONE bucket of width `bucketSeconds`; each
    * interval explodes into the buckets it touches (⌈len/width⌉ + 1 rows).
    * The pair search is then an equi-join on the bucket id plus the exact
    * containment residual — a hash/sort-merge join Catalyst can shuffle,
    * AQE-split, and scale, instead of the O(|P|·|I|) broadcast-nested-loop
    * a bare `between` join plans. No dedup is needed: a point matches an
    * interval only in the point's own bucket.
    *
    * Pick `bucketSeconds` ≈ the typical interval length: shorter buckets
    * multiply interval replication, longer buckets widen the residual scan.
    * Measured (graft.tools.ProfileQ68, sf0.1, 30k×30k sides, 2-day
    * intervals): bucket=interval is the flat optimum — candidate:match
    * ratio 1.33 at 2d vs 2.0 at 4d / 6.0 at 16d, while 1d halves the
    * ratio to 1.0 but doubles interval replication and costs ~2× wall;
    * end-to-end ~0.5 s warm, within noise of the pure equi-join control.
    */
  def rangeJoinBuckets(points: DataFrame, intervals: DataFrame,
                       tsCol: String, startCol: String, endCol: String,
                       bucketSeconds: Long): DataFrame = {
    val b = lit(bucketSeconds)
    // Malformed intervals (end < start) are safe: sequence() emits a
    // descending bucket range, but every such pair fails the containment
    // residual, so they contribute no rows (never wrong ones).
    // cast("timestamp") tolerates TIMESTAMP_NTZ columns (parquet default);
    // the session timezone is pinned to UTC so the epoch is deterministic
    def secs(c: Column) = unix_seconds(c.cast("timestamp"))
    val pts = points.withColumn("__bucket", floor(secs(col(tsCol)) / b))
    val ivs = intervals.withColumn("__bucket", explode(sequence(
      floor(secs(col(startCol)) / b),
      floor(secs(col(endCol)) / b))))
    pts.join(ivs, Seq("__bucket"))
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
