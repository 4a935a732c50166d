package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Timestamp-flavor robustness: the engine must ingest `events.ts` in every
  * physical flavor a parquet writer can emit and behave identically.
  *
  * Round-8 postmortem: the driver regenerated testdata with
  * `timestamp[us]` WITHOUT UTC adjustment (→ Spark TIMESTAMP_NTZ) where it
  * previously wrote `timestamp[ns]` (→ long under nanosAsLong), and every
  * `unix_micros`/watermark/zorder consumer broke at analysis time. The
  * reference never hits this because SQLAlchemy coerces tz-aware and naive
  * timestamps transparently (alembic 06fab6583881_activities.py:34-35);
  * here [[Tables.normalizeTimestamps]] is that coercion layer, and this
  * spec pins all three flavors so a regeneration can't silently break a
  * class of queries again.
  */
class TsFlavorSpec extends SparkSpec {
  private lazy val tmpRoot = {
    val p = java.nio.file.Files.createTempDirectory("ts_flavor").toString
    val base = Tables.events(spark, sf0001)

    // flavor 1: timestamp[us] NTZ (naive wall-clock — the r8 drift)
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(s"$p/ntz/events.parquet")

    // flavor 2: timestamp[us] UTC-adjusted (plain TIMESTAMP)
    base.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    base.coalesce(1).write.mode("overwrite").parquet(s"$p/utc/events.parquet")

    // flavor 3: int64 epoch-nanos (what timestamp[ns] becomes under
    // spark.sql.legacy.parquet.nanosAsLong=true)
    base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .coalesce(1).write.mode("overwrite").parquet(s"$p/nanos/events.parquet")
    p
  }
  private def flavors: Seq[(String, String)] =
    Seq("ntz", "utc", "nanos").map(f => f -> s"$tmpRoot/$f")

  test("every flavor normalizes to TIMESTAMP (LTZ) at the Tables layer") {
    for ((name, dir) <- flavors) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType, s"flavor $name: ts arrived as $dt")
    }
  }

  test("raw flavor schemas actually differ (the fixture is honest)") {
    assert(spark.read.parquet(s"$tmpRoot/ntz/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$tmpRoot/utc/events.parquet")
      .schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$tmpRoot/nanos/events.parquet")
      .schema("ts").dataType == LongType)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("ts-consuming queries analyze and agree across all flavors") {
    for (q <- Seq("q48_sessionization", "q72_lead_gap")) {
      val baseline = rows(graft.SparkEntry.queries(q)(spark, sf0001))
      assert(baseline.nonEmpty, s"$q produced no rows on the base fixture")
      for ((name, dir) <- flavors) {
        val got = rows(graft.SparkEntry.queries(q)(spark, dir))
        assert(got == baseline, s"$q disagrees on flavor $name")
      }
    }
  }

  test("zorderWrite quantile-buckets a raw NTZ dimension (no Tables layer)") {
    // defense in depth: even if a frame bypasses Tables, numericView must
    // type-dispatch TIMESTAMP_NTZ instead of hitting the ANSI cast wall
    val ntz = spark.read.parquet(s"$tmpRoot/ntz/events.parquet")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = s"$tmpRoot/zorder_ntz"
    graft.meta.ScaleOps.zorderWrite(ntz, Seq("user_id", "ts"), out, numFiles = 2)
    assert(spark.read.parquet(out).count() == ntz.count())
  }

  test("a ts range filter pushes down to the parquet scan through NTZ normalization") {
    // the 100 TB failure mode the normalization layer must NOT introduce:
    // if the NTZ->LTZ cast blocked filter pushdown, every time-range scan
    // would read the whole fact table. Catalyst unwraps the cast (the
    // comparison is a bijection under session-UTC) — pin it.
    val df = Tables.events(spark, s"$tmpRoot/ntz")
      .filter(col("ts") > lit("2024-01-05 00:00:00").cast("timestamp"))
      .select("event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts"),
      s"ts filter not pushed to the parquet scan:\n$plan")
  }

  test("a raw NTZ streaming frame watermarks and matches the batch result") {
    // the streaming surface never passes through Tables: a readStream over
    // naive-timestamp parquet hands EventAggregates a TIMESTAMP_NTZ ts,
    // which without coercion dies with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    import graft.streaming.EventAggregates
    val dir = s"$tmpRoot/ntz/events.parquet"
    val schema = spark.read.parquet(dir).schema
    assert(schema("ts").dataType == TimestampNTZType)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventAggregates.windowedTypeCounts(stream)
      .writeStream.format("memory").queryName("ntz_wtc").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = rows(spark.table("ntz_wtc"))
    val batch = rows(EventAggregates.windowedTypeCounts(
      spark.read.parquet(dir)))
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming NTZ result diverged (${streamed.size} vs ${batch.size} rows)")
  }

  test("an unnormalizable event-time flavor fails loudly with the column name") {
    val bad = Tables.events(spark, sf0001)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    val ex = intercept[IllegalStateException] {
      Tables.requireEventTime(bad, "events", "ts")
    }
    assert(ex.getMessage.contains("ts") && ex.getMessage.contains("events"))
  }
}
