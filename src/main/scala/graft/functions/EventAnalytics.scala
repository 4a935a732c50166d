package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-flow analytics over the activity stream: funnel conversion and
  * cohort retention — the product-analytics staples a warehouse engine is
  * expected to answer over its event history (the reference's activity
  * table serves the same dashboards through hand-written Postgres
  * endpoints, SURVEY §2.2/§2.11).
  *
  * Scale shape: both operators reduce the event stream to per-user
  * aggregates FIRST (one hash aggregation keyed user, map-side partials,
  * shuffle volume = users, not events), then do all stage/cohort logic on
  * the user-sized relation. At 100 TB of events with millions of users the
  * expensive exchange carries one row per user per stage — the event
  * payload never re-shuffles.
  */
object EventAnalytics {

  /** Ordered-funnel existence: a user completes stage k if events of types
    * stages(0) < stages(1) < … < stages(k) exist in strict time order.
    * Earliest-chain greedy is exact for existence without a horizon: take
    * the earliest stage-0 event, then the earliest stage-1 event after it,
    * and so on (any valid chain implies the greedy chain exists).
    *
    * Returns one row per stage: (stage_idx, stage, n_users), n_users
    * monotonically non-increasing. */
  def funnelStages(events: DataFrame, stages: Seq[String],
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // fold left: each step is (user, reached_ts) — user-sized after the
    // first aggregation; subsequent steps join user-sized relations
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .join(prev.withColumnRenamed("t", "t_prev"), userCol)
        .filter(col(tsCol) > col("t_prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    }
    reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_)).orderBy(col("stage_idx"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * (event_type, next, n, p) where p is the row-stochastic probability
    * P(next | event_type). One lead() window keyed (user, ts, tiebreak) —
    * the shuffle is the per-user ordering the computation inherently
    * needs — then a types²-sized aggregation. `tiebreakCol` makes the
    * within-timestamp order total so the matrix is deterministic. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type", tsCol: String = "ts",
                       tiebreakCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreakCol))
    val byRow = org.apache.spark.sql.expressions.Window.partitionBy(col(typeCol))
    events
      .withColumn("next", lead(col(typeCol), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col(typeCol), col("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum(col("n")).over(byRow), 4))
  }

  /** Cohort retention: users grouped by their first-activity day; a cohort
    * member is retained at `offset` days if they have ANY event exactly
    * that many days after their cohort day. Output: (cohort_day,
    * day_offset, n_users) for the requested offsets (0 = cohort size). */
  def cohortRetention(events: DataFrame, offsets: Seq[Int],
                      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(offsets.nonEmpty, "need at least one offset")
    val day = col(tsCol).cast("date")
    val cohort = events.groupBy(col(userCol)).agg(min(day).as("cohort_day"))
    val active = events.select(col(userCol), day.as("day")).distinct()
    active.join(cohort, userCol)
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset").isin(offsets.map(Integer.valueOf): _*))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Volume-anomaly detection: bucket events into fixed time windows per
    * type, z-score each bucket against ITS TYPE's own volume distribution,
    * and flag |z| ≥ `threshold` — the standing data-quality monitor for an
    * event pipeline (a collector outage shows as a negative spike, a
    * replay or bot burst as a positive one). Per-type normalization
    * matters: a rare event type's normal hour would sit sigmas below a
    * common type's, so a global baseline drowns exactly the signals worth
    * catching.
    *
    * Scale shape: one groupBy (type, bucket) with map-side partials — the
    * exchange carries bucket counts, never events; the baseline
    * mean/stddev ride a per-type window over the bucket table (bounded:
    * types × buckets rows). Types with a single bucket or zero variance
    * produce no rows (a constant series has no anomalies to score). */
  def volumeAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                      bucket: String = "1 hour",
                      threshold: Double = 2.0): DataFrame = {
    val counts = events
      .groupBy(col(typeCol).as("event_type"),
        window(col(tsCol), bucket)("start").as("bucket_start"))
      .agg(count(lit(1)).as("n"))
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    counts
      .withColumn("mu", avg(col("n")).over(byType))
      .withColumn("sigma", stddev_samp(col("n")).over(byType))
      .filter(col("sigma").isNotNull && col("sigma") > 0)
      .withColumn("z", (col("n") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) >= threshold)
      .select(col("event_type"), col("bucket_start"), col("n"), col("z"))
  }

  /** ROBUST volume anomalies: median/MAD instead of mean/stddev — the
    * hardening [[volumeAnomalies]]' docstring promises: a z-score
    * baseline is SELF-POISONED by the very spike it should flag (one
    * 60× burst inflates σ enough to hide the next one), while the median
    * and the median absolute deviation have a 50% breakdown point.
    * Flags |x − med| / (1.4826·MAD) ≥ `threshold` (1.4826 makes MAD
    * σ-consistent under normality; 3.5 is the Iglewicz–Hoaglin cut).
    *
    * Exact-regime contract (the q128/q99 pattern): medians come from two
    * KLL sketch aggregations (buckets, then absolute deviations), exact
    * while every type's bucket count fits the k = 65536 buffer — ~7 years
    * of hourly buckets per type; beyond that the sketch approximates and
    * the DuckDB quantile_disc parity would break for scale reasons.
    *
    * Scale shape: events collapse to (type, bucket) counts once (map-side
    * partials); both sketch passes and the flag run over the bounded
    * bucket table; per-type scalars attach by broadcast join. */
  def robustVolumeAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                            bucket: String = "1 hour",
                            threshold: Double = 3.5): DataFrame = {
    val med = org.apache.spark.sql.functions.udaf(
      new Sketches.KllAggregator(65536, Array(0.5)))
    val counts = events
      .groupBy(col(typeCol).as("event_type"),
        window(col(tsCol), bucket)("start").as("bucket_start"))
      .agg(count(lit(1)).as("n"))
    val medByType = counts.groupBy(col("event_type"))
      .agg(element_at(med(col("n").cast("double")), 1).as("med"))
    val withMed = counts.join(broadcast(medByType), "event_type")
    val madByType = withMed.groupBy(col("event_type"))
      .agg(element_at(med(abs(col("n") - col("med"))), 1).as("mad"))
    withMed.join(broadcast(madByType), "event_type")
      .filter(col("mad") > 0)
      .withColumn("rz", (col("n") - col("med")) / (lit(1.4826) * col("mad")))
      .filter(abs(col("rz")) >= threshold)
      .select(col("event_type"), col("bucket_start"), col("n"),
        col("med"), col("mad"), col("rz"))
  }
}
