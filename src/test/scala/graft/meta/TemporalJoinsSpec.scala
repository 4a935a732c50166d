package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin backward: latest right at or before left, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
      (4L, 30L, ts("2024-01-01 09:00:00"))  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 12:00:00"), "b"), // tie with left id=2 → matched
      (20L, ts("2024-01-01 23:00:00"), "c")
    ).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoin(left, right,
        Seq("k"), Seq("k"), "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None, 4L -> None))
  }

  test("asofJoin forward: earliest right at or after left") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 13:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 11:00:00"), "a"),
      (10L, ts("2024-01-01 13:00:00"), "b")
    ).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoin(left, right,
        Seq("k"), Seq("k"), "t", "t", Seq("v"), direction = "forward")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> Some("b")))
  }

  test("asofJoin matches the brute-force non-equi formulation on real data") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val left = ev.filter($"event_type" === "purchase")
    val right = ev.filter($"event_type" === "error")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("err_event_id"))
    val fast = TemporalJoins.asofJoin(left, right,
        Seq("user_id"), Seq("user_id"), "ts", "ts", Seq("err_event_id"))
      .select($"event_id", $"err_event_id")
    // brute force: non-equi join + latest-per-left dedup
    val r = right.toDF("r_uid", "r_ts", "r_eid")
    val brute = left.join(r, $"user_id" === $"r_uid" && $"ts" >= $"r_ts", "left")
      .groupBy($"event_id")
      .agg(max_by($"r_eid", struct($"r_ts", $"r_eid")).as("err_event_id"))
    val diff = fast.exceptAll(brute).count() + brute.exceptAll(fast).count()
    assert(diff === 0)
  }

  test("asofJoin forward matches the brute-force non-equi formulation on real data") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val left = ev.filter($"event_type" === "purchase")
    val right = ev.filter($"event_type" === "error")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("next_err"))
    val fast = TemporalJoins.asofJoin(left, right,
        Seq("user_id"), Seq("user_id"), "ts", "ts", Seq("next_err"),
        direction = "forward")
      .select($"event_id", $"next_err")
    // brute force: earliest right at-or-after each left row
    val r = right.toDF("r_uid", "r_ts", "r_eid")
    val brute = left.join(r, $"user_id" === $"r_uid" && $"ts" <= $"r_ts", "left")
      .groupBy($"event_id")
      .agg(min_by($"r_eid", struct($"r_ts", $"r_eid")).as("next_err"))
    val diff = fast.exceptAll(brute).count() + brute.exceptAll(fast).count()
    assert(diff === 0)
  }

  test("asofJoin: null keys never match (SQL equality semantics, not window-NULL grouping)") {
    val left = Seq(
      (1L, Some(10L), ts("2024-01-01 10:00:00")),
      (2L, None, ts("2024-01-01 10:00:00")) // null key → must stay unmatched
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), ts("2024-01-01 09:00:00"), "a"),
      (Option.empty[Long], ts("2024-01-01 09:00:00"), "nullrow")
    ).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoin(left, right,
        Seq("k"), Seq("k"), "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> None))
  }

  test("asofJoin plans no join node — union + one window, one shuffle") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val left = ev.filter($"event_type" === "purchase")
    val right = ev.filter($"event_type" === "error")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("err_event_id"))
    val plan = TemporalJoins.asofJoin(left, right,
        Seq("user_id"), Seq("user_id"), "ts", "ts", Seq("err_event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert(plan.contains("Window"), s"expected window operator:\n$plan")
  }

  test("rangeJoinBuckets matches the naive between join, plans no BNLJ") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("u_key"), $"o_orderdate".as("u_start"),
        ($"o_orderdate" + expr("interval 2 days")).as("u_end"))
    val low = o.filter($"o_orderpriority" === "5-LOW")
      .select($"o_orderkey".as("l_key"), $"o_orderdate".as("l_ts"))
    val fast = TemporalJoins.rangeJoinBuckets(low, urgent,
      "l_ts", "u_start", "u_end", bucketSeconds = 2L * 86400)
    val naive = low.join(urgent, $"l_ts".between($"u_start", $"u_end"))
    val fk = fast.select("l_key", "u_key")
    val nk = naive.select("l_key", "u_key")
    assert(fk.exceptAll(nk).count() === 0 && nk.exceptAll(fk).count() === 0)
    assert(naive.count() > 0, "fixture should produce matches")
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed range join must not plan a nested loop:\n$plan")
  }

  test("rangeJoinBuckets: interval spanning many buckets still matches once per pair") {
    val points = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("p_id", "t")
    val intervals = Seq((100L, ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00")))
      .toDF("i_id", "s", "e")
    val out = TemporalJoins.rangeJoinBuckets(points, intervals, "t", "s", "e",
      bucketSeconds = 3600) // 1h buckets → interval explodes into ~720 rows
    assert(out.count() === 1)
  }
}
