package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ScaleOps.aggState]] / mergeAggState / upsertStatePartitions — the
  * O(delta) rollup-maintenance invariants:
  *   merge(aggState(A), aggState(B)) ≡ aggState(A ∪ B) exactly,
  *   merging is associative (daily → monthly → yearly roll-ups), and
  *   a partition upsert rewrites ONLY the delta's partitions. */
class IncrementalAggSpec extends SparkSpec {
  import ScaleOps._

  private def events = spark.read.parquet(s"$sf0001/events.parquet")
    .withColumn("day", col("ts").cast("date"))

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

  private val keys = Seq(col("event_type"), col("day"))
  private val keyNames = Seq("event_type", "day")

  test("merge(state, delta) ≡ full recompute, bit-exact on n/min/max") {
    val cut = lit("2024-01-20").cast("date")
    val merged = mergeAggState(Seq(
      aggState(events.filter(col("day") < cut), keys, col("value")),
      aggState(events.filter(col("day") >= cut), keys, col("value"))), keyNames)
    val full = aggState(events, keys, col("value"))
    val m = keyed(merged.select(col("event_type"), col("day"), col("n"),
      round(col("sum_v"), 6), col("min_v"), col("max_v")))
    val f = keyed(full.select(col("event_type"), col("day"), col("n"),
      round(col("sum_v"), 6), col("min_v"), col("max_v")))
    assert(m.keySet === f.keySet)
    for ((k, (n, s, mn, mx)) <- f) {
      val (n2, s2, mn2, mx2) = m(k)
      assert(n2 === n, s"count for $k")
      assert(mn2 === mn && mx2 === mx, s"min/max for $k must be bit-exact")
      assert(math.abs(s2 - s) < 1e-6, s"sum for $k")
    }
  }

  test("merging is associative: three daily slices roll up in any grouping") {
    val s1 = aggState(events.filter(col("day") < lit("2024-01-10").cast("date")), keys, col("value"))
    val s2 = aggState(events.filter(col("day").between(
      lit("2024-01-10").cast("date"), lit("2024-01-19").cast("date"))), keys, col("value"))
    val s3 = aggState(events.filter(col("day") > lit("2024-01-19").cast("date")), keys, col("value"))
    val flat = keyed(mergeAggState(Seq(s1, s2, s3), keyNames)
      .select(col("event_type"), col("day"), col("n"), round(col("sum_v"), 6), col("min_v"), col("max_v")))
    val nested = keyed(mergeAggState(Seq(mergeAggState(Seq(s1, s2), keyNames), s3), keyNames)
      .select(col("event_type"), col("day"), col("n"), round(col("sum_v"), 6), col("min_v"), col("max_v")))
    assert(flat.keySet === nested.keySet)
    for ((k, (n, s, mn, mx)) <- flat; (n2, s2, mn2, mx2) = nested(k)) {
      assert(n === n2 && mn === mn2 && mx === mx2)
      assert(math.abs(s - s2) < 1e-6)
    }
  }

  test("upsertStatePartitions rewrites only the delta's partitions") {
    val dir = java.nio.file.Files.createTempDirectory("aggstate").toString
    val state = aggState(events, keys, col("value"))
    state.write.mode("overwrite").partitionBy("day").parquet(dir)
    def partFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
        .map(p => p.getName -> p.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    val before = partFiles()
    assert(before.size > 5, "fixture should have many day partitions")
    // delta: one day recomputed with doubled values
    val delta = aggState(
      events.filter(col("day") === lit("2024-01-15").cast("date"))
        .withColumn("value", col("value") * 2),
      keys, col("value"))
    Thread.sleep(1100) // mtime granularity
    upsertStatePartitions(delta, dir, Seq("day"))
    val after = partFiles()
    assert(after.keySet === before.keySet)
    for ((p, files) <- before if p != "day=2024-01-15")
      assert(after(p) === files, s"untouched partition $p must not be rewritten")
    assert(after("day=2024-01-15") !== before("day=2024-01-15"))
    // and the upserted partition reads back with the delta's content
    val reread = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-15").cast("date"))
      .agg(sum(col("sum_v"))).collect()(0).getDouble(0)
    val expected = delta.agg(sum(col("sum_v"))).collect()(0).getDouble(0)
    assert(math.abs(reread - expected) < 1e-9)
  }

  test("aggState plans one hash aggregation with map-side partials") {
    val plan = aggState(events, keys, col("value"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      "state build must be exactly one exchange")
  }
}
