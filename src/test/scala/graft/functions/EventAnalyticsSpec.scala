package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[EventAnalytics]] — funnel and cohort retention semantics on a
  * hand-built event log where every chain is known. */
class EventAnalyticsSpec extends SparkSpec {
  import EventAnalytics._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // u1: full ordered chain. u2: click BEFORE view — must not count past
  // stage 0 on click? (u2 has view then purchase but no click between.)
  // u3: view only. u4: never views (click+purchase) — not even stage 0.
  private lazy val events = Seq(
    (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:05:00"),
    (1L, "purchase", "2024-01-01 10:30:00"),
    (2L, "click", "2024-01-02 09:00:00"), (2L, "view", "2024-01-02 09:10:00"),
    (2L, "purchase", "2024-01-02 09:20:00"),
    (3L, "view", "2024-01-03 08:00:00"),
    (4L, "click", "2024-01-04 07:00:00"), (4L, "purchase", "2024-01-04 07:10:00"))
    .map { case (u, t, w) => (u, t, ts(w)) }
    .toDF("user_id", "event_type", "ts")

  test("funnel: strict time order per stage; out-of-order steps don't count") {
    val got = funnelStages(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // stage 0: u1, u2, u3 viewed. stage 1: only u1 clicked AFTER viewing.
    // stage 2: only u1 purchased after that click.
    assert(got === Array((0, "view", 3L), (1, "click", 1L), (2, "purchase", 1L)))
  }

  test("funnel: earliest-chain greedy finds a chain whenever one exists") {
    // u5: view(1) click(2) view(3) click(4) purchase(5) — greedy takes
    // view(1)→click(2)→purchase(5); any ordering must reach stage 2
    val e5 = Seq(
      (5L, "view", "2024-01-05 10:01:00"), (5L, "click", "2024-01-05 10:02:00"),
      (5L, "view", "2024-01-05 10:03:00"), (5L, "click", "2024-01-05 10:04:00"),
      (5L, "purchase", "2024-01-05 10:05:00"))
      .map { case (u, t, w) => (u, t, ts(w)) }.toDF("user_id", "event_type", "ts")
    val got = funnelStages(e5, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got === Array((0, 1L), (1, 1L), (2, 1L)))
  }

  test("cohort retention: offset 0 is cohort size; distinct days, not event counts") {
    val e = Seq(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "view", "2024-01-02 10:00:00"), (1L, "view", "2024-01-08 10:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (3L, "view", "2024-01-02 10:00:00"), (3L, "view", "2024-01-03 09:00:00"))
      .map { case (u, t, w) => (u, t, ts(w)) }.toDF("user_id", "event_type", "ts")
    val got = cohortRetention(e, Seq(0, 1, 7))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    // cohort 2024-01-01 = {u1, u2}: day0 both (u1's two events = ONE day),
    // day1 only u1, day7 only u1. cohort 2024-01-02 = {u3}: day0, day1.
    assert(got === Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L, ("2024-01-01", 7) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L))
  }

  test("plan: the event payload aggregates to user-sized relations before any join") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val plan = funnelStages(ev, Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    // every stage filter is pushed to the parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)")
      || plan.contains("EqualTo(event_type,view)"),
      "stage filters must reach the scan")
  }

  test("volumeAnomalies: planted spike flagged, per-type baseline, flat series silent") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // type "steady": 5 events every hour for 24h except hour 12 (50 events)
    val steady = (0 until 24).flatMap { h =>
      val k = if (h == 12) 50 else 5
      (0 until k).map(i => ("steady", ts(h, i % 60)))
    }
    // type "flat": identical count every hour — zero variance, no output
    val flat = (0 until 24).flatMap(h => (0 until 7).map(i => ("flat", ts(h, i))))
    val df = (steady ++ flat).toDF("event_type", "ts")
    val out = volumeAnomalies(df, "event_type", "ts", "1 hour", 2.0)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
    assert(out.length === 1, s"exactly the spike should flag, got ${out.toSeq}")
    assert(out.head._1 === "steady" && out.head._3 === 50L)
    assert(out.head._2.startsWith("2024-01-01 12:"))
    // per-type normalization: the same +8 absolute delta is an anomaly for
    // a rare type but noise for a heavy one
    val rare = (0 until 24).flatMap { h =>
      val k = if (h == 6) 10 else 2
      (0 until k).map(i => ("rare", ts(h, i)))
    }
    val heavy = (0 until 24).flatMap { h =>
      // counts vary 500..508 uniformly-ish; +8 sits inside normal spread
      val k = 500 + (h * 7) % 9
      (0 until k).map(i => ("heavy", ts(h, i % 60)))
    }
    val out2 = volumeAnomalies((rare ++ heavy).toDF("event_type", "ts"),
        "event_type", "ts", "1 hour", 2.0)
      .collect().map(_.getString(0))
    assert(out2.contains("rare"), "the rare type's spike must flag")
    assert(!out2.contains("heavy"), "in-spread variation must not flag")
  }

  test("robustVolumeAnomalies: MAD survives the double spike that poisons the z-score") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00")
    // masking: a 100× burst next to a 20× burst in a 48h series of
    // ~5/hour. The big burst inflates σ to ~87, so the 120-event burst
    // z-scores at ~1.1 — invisible even at threshold 2 — while median/MAD
    // (med ≈ 6, MAD ≈ 1) flags both at rz ≈ 77 and 398: the 50% breakdown
    // point doing its job
    val counts = (0 until 48).map { h =>
      if (h == 12) 600 else if (h == 36) 120 else 5 + (h % 3)
    }
    val events = counts.zipWithIndex.flatMap { case (k, h) =>
      (0 until k).map(i => ("bursty", ts(h, i % 60)))
    }.toDF("event_type", "ts")
    val robust = EventAnalytics.robustVolumeAnomalies(
        events, "event_type", "ts", "1 hour", threshold = 3.5)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getDouble(5)))
    assert(robust.map(_._2).toSet === Set(600L, 120L),
      s"both bursts must flag robustly, got ${robust.toSeq}")
    val classic = volumeAnomalies(events, "event_type", "ts", "1 hour", 2.0)
      .collect().map(_.getLong(2))
    assert(classic.contains(600L) && !classic.contains(120L),
      s"fixture sanity: the classic monitor must mask the smaller burst, got ${classic.toSeq}")
    // constant series: MAD = 0 → silent, never a divide-by-zero
    val flat = (0 until 24).flatMap(h => (0 until 7).map(i => ("flat", ts(h, i))))
      .toDF("event_type", "ts")
    assert(EventAnalytics.robustVolumeAnomalies(flat, "event_type", "ts").isEmpty)
  }
}
