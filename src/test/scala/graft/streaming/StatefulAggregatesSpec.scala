package graft.streaming

import graft.SparkSpec
import graft.catalog.Tables
import org.apache.spark.sql.functions._

class StatefulAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState running totals: streaming final state == batch group-by") {
    val batch = Tables.events(spark, sf0001)
    val expected = batch.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, math.round(r._3 * 100) / 100.0))).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    // NoTimeout here: an armed processing-time timeout keeps the
    // micro-batch engine scheduling empty batches (even AvailableNow does
    // not terminate — verified), so eviction is production-only config
    val q = StatefulAggregates.runningUserTotals(stream)
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // per user, the LAST emitted row is the final running total
      val got = spark.table("running")
        .groupBy("user_id")
        .agg(max(struct($"n_events", $"sum_value")).as("last"))
        .select($"user_id", $"last.n_events", $"last.sum_value")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, math.round(r._3 * 100) / 100.0))).toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("transformWithState (Spark 4 API): streaming over RocksDB == batch group-by") {
    val batch = Tables.events(spark, sf0001)
    val expected = batch.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-tws").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StatefulAggregates.runningUserTotalsTws(stream)
        .writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tws")
          .groupBy("user_id").agg(max("n_events").as("n"))
          .as[(Long, Long)].collect().toMap
        assert(got === expected)
        assert(got.nonEmpty)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("batch input runs the same state function as per-key totals") {
    val batch = Tables.events(spark, sf0001)
    val got = StatefulAggregates.runningUserTotals(batch)
      .as[UserTotals].collect().map(u => u.user_id -> u.n_events).toMap
    val expected = batch.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("online EWMA: streaming final state == q145's batch fold bit-for-bit") {
    import org.apache.spark.sql.functions._
    // the real corpus buckets, globally time-ordered so per-key arrival
    // order across micro-batches honours the watermark contract
    val hourly = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket_start"))
      .agg(count(lit(1)).cast("double").as("x"))
      .orderBy(col("bucket_start"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSeq
    val expected = graft.SparkEntry.queries("q145_ewma_anomaly")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val df = hourly.toDF("event_type", "bucket_start", "x")
      val stream = spark.readStream.schema(df.schema).parquet(dir)
      val q = StatefulAggregates.onlineEwma(stream)
        .writeStream.format("memory").queryName("ewma")
        .outputMode("update").start()
      try {
        // five micro-batches — the fold must survive state-store handoffs
        hourly.grouped(math.max(hourly.size / 5, 1)).foreach { chunk =>
          chunk.toDF("event_type", "bucket_start", "x")
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
        val got = spark.table("ewma")
          .as[StatefulAggregates.EwmaSummary].collect()
          .groupBy(_.event_type)
          .map { case (t, rows) => t -> rows.maxBy(_.n_buckets) }
        assert(got.keySet === expected.keySet)
        got.foreach { case (t, s) =>
          val (nb, ewmaR4, spikes) = expected(t)
          assert(s.n_buckets === nb, s"$t bucket count")
          assert(s.n_spikes === spikes,
            s"$t spike count must match the batch fold exactly")
          assert(math.round(s.ewma * 1e4) / 1e4 === ewmaR4,
            s"$t ewma must be bit-identical before rounding")
        }
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("online anomaly: streaming in micro-batches == driver Welford replay; cold start quiet") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // steady ~5/hour with a spike at hour 12 and a dip at hour 20;
    // "flat" is constant — must stay silent forever
    val counts = (0 until 24).map { h =>
      val n = if (h == 12) 60L else if (h == 20) 0L else 5L + (h % 3)
      ("steady", ts(h), n)
    } ++ (0 until 24).map(h => ("flat", ts(h), 7L))
    // driver-side replay of the exact online definition
    def replay(rows: Seq[(Timestamp, Long)], threshold: Double, minHistory: Int) = {
      var (cnt, mean, m2) = (0L, 0.0, 0.0)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, Long, Double)]
      rows.sortBy(_._1.getTime).foreach { case (t, n) =>
        if (cnt >= minHistory && cnt >= 2) {
          val sigma = math.sqrt(m2 / (cnt - 1))
          if (sigma > 0) {
            val z = (n - mean) / sigma
            if (math.abs(z) >= threshold) out += ((t, n, z))
          }
        }
        cnt += 1; val d = n - mean; mean += d / cnt; m2 += d * (n - mean)
      }
      out.toSeq
    }
    val expectedSteady = replay(
      counts.filter(_._1 == "steady").map(c => (c._2, c._3)), 3.0, 6)
    // the spike must flag; the later dip legitimately may NOT — the spike
    // self-poisons the running variance (documented in the processor)
    assert(expectedSteady.map(_._1.toString.substring(11, 13)).contains("12"),
      s"fixture sanity: the spike must flag, got $expectedSteady")

    // stream the buckets through in FOUR micro-batches (files), in order
    val dir = java.nio.file.Files.createTempDirectory("graft-anom").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val df = counts.toDF("event_type", "bucket_start", "n")
      val stream = spark.readStream.schema(df.schema).parquet(dir)
      val q = StatefulAggregates.onlineVolumeAnomalies(stream, 3.0, 6)
        .writeStream.format("memory").queryName("anom")
        .outputMode("append").start()
      try {
        counts.grouped(12).zipWithIndex.foreach { case (chunk, i) =>
          chunk.toDF("event_type", "bucket_start", "n")
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
        val got = spark.table("anom")
          .as[StatefulAggregates.BucketAnomaly].collect()
        assert(got.forall(_.event_type == "steady"), "flat series must stay silent")
        val gotSteady = got.map(a => (a.bucket_start, a.n,
          math.round(a.z * 1e9) / 1e9)).sortBy(_._1.getTime).toSeq
        val expRounded = expectedSteady.map(e => (e._1, e._2,
          math.round(e._3 * 1e9) / 1e9))
        assert(gotSteady === expRounded,
          s"streaming must equal the sequential replay\n got: $gotSteady\n exp: $expRounded")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("runningTopKPartners: streaming final state == batch topKPerDoc over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // three micro-batches with ties, NaN, and a group that overflows k
    // across (not within) batches — the monotone-fold property under test
    val batches = Seq(
      Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.25)),
      Seq((1L, 12L, 0.9), (1L, 13L, Double.NaN), (2L, 21L, 0.75)),
      Seq((1L, 14L, 0.7), (2L, 22L, 0.75), (3L, 30L, 0.0)))
    for (asc <- Seq(false, true)) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Long, Double)]
      val q = StatefulAggregates.runningTopKPartners(
          mem.toDF().toDF("id_a", "id_b", "score"), k = 2, ascending = asc)
        .writeStream.format("memory").queryName(s"topk_$asc")
        .outputMode("update").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // latest state per key = row with the largest (monotone) n_seen
        val got = spark.table(s"topk_$asc")
          .groupBy($"id_a").agg(max(struct($"n_seen", $"ids", $"scores")).as("l"))
          .select($"id_a", $"l.ids", $"l.scores")
          .as[(Long, Seq[Long], Seq[Double])].collect()
          .flatMap { case (a, ids, ss) => ids.zip(ss).map(p => (a, p._1, p._2)) }
          .toSet
        val union = batches.flatten.toDF("id_a", "id_b", "score")
        val want = graft.functions.SimilarityFunctions.topKPerDoc(
            union, "id_a", "id_b", "score", 2, ascending = asc)
          .as[(Long, Long, Double)].collect().toSet
        assert(got === want, s"ascending=$asc")
        assert(want.nonEmpty)
      } finally q.stop()
    }
  }
}
