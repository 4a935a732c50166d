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
}
