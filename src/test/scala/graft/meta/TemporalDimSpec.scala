package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TemporalDim]] SCD2 semantics and [[graft.functions.EventAnalytics
  * .transitionMatrix]] — hand-built logs where every interval is known. */
class TemporalDimSpec extends SparkSpec {
  import TemporalDim._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // u1: A, A (re-assertion — no new version), B. u2: only C.
  private lazy val log = Seq(
    (1L, 10L, "A", "2024-01-01 10:00:00"),
    (1L, 11L, "A", "2024-01-02 10:00:00"),
    (1L, 12L, "B", "2024-01-03 10:00:00"),
    (2L, 20L, "C", "2024-01-02 12:00:00"))
    .map { case (u, e, st, w) => (u, e, st, ts(w)) }
    .toDF("user_id", "event_id", "event_type", "ts")

  private lazy val dim = scd2FromLog(log, "user_id", "ts", "event_type", "event_id")

  test("SCD2: re-asserted states collapse; intervals chain half-open") {
    val rows = dim.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString))).toSet
    assert(rows === Set(
      (1L, "A", "2024-01-01 10:00:00.0", Some("2024-01-03 10:00:00.0")),
      (1L, "B", "2024-01-03 10:00:00.0", None),
      (2L, "C", "2024-01-02 12:00:00.0", None)))
  }

  test("snapshotAt reads the state valid at the instant (half-open intervals)") {
    def states(at: String): Map[Long, String] =
      snapshotAt(dim, lit(at).cast("timestamp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(states("2024-01-02 11:00:00") === Map(1L -> "A"))
    // exactly at a transition: the NEW state wins (valid_from <= at < valid_to)
    assert(states("2024-01-03 10:00:00") === Map(1L -> "B", 2L -> "C"))
    assert(states("2023-12-31 00:00:00") === Map.empty)
  }

  test("scd2 plan: both windows ride ONE exchange on the entity key") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val plan = scd2FromLog(ev, "user_id", "ts", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size === 1,
      "change detection and interval close must share the per-key sort")
  }

  test("transition matrix: hand-checked counts and row-stochastic p") {
    val e = Seq(
      (1L, 1L, "A", "2024-01-01 10:00:00"), (1L, 2L, "B", "2024-01-01 11:00:00"),
      (1L, 3L, "A", "2024-01-01 12:00:00"), (1L, 4L, "B", "2024-01-01 13:00:00"),
      (2L, 5L, "A", "2024-01-01 10:00:00"), (2L, 6L, "C", "2024-01-01 11:00:00"))
      .map { case (u, i, t, w) => (i, ts(w), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.functions.EventAnalytics.transitionMatrix(e)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // A→B twice, A→C once (p 0.6667/0.3333), B→A once (p 1.0)
    assert(got === Map(
      ("A", "B") -> (2L, 0.6667), ("A", "C") -> (1L, 0.3333),
      ("B", "A") -> (1L, 1.0)))
  }
}
