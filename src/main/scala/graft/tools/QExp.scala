package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Micro-benchmark harness for comparing query formulations at sf0.1
  * before they land in SparkEntry (not part of the library surface). */
object QExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(s"[exp] $name run$i: ${math.round((System.nanoTime() - t0) / 1e6) / 1000.0} s ($n rows)")
      }

    def lowUrgent() = {
      val o = Tables.orders(spark, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("u_key"), col("o_orderdate").as("u_start"),
          (col("o_orderdate") + expr("interval 2 days")).as("u_end"))
      val low = o.filter(col("o_orderpriority") === "5-LOW")
        .select(col("o_orderkey").as("l_key"), col("o_orderdate").as("l_ts"))
      (low, urgent)
    }
    time("q68_bucketed_2d") {
      val (low, urgent) = lowUrgent()
      graft.meta.TemporalJoins.rangeJoinBuckets(low, urgent,
          "l_ts", "u_start", "u_end", bucketSeconds = 2L * 86400)
        .groupBy(date_trunc("month", col("l_ts")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_pairs")).count()
    }
    time("q68_bucketed_7d") {
      val (low, urgent) = lowUrgent()
      graft.meta.TemporalJoins.rangeJoinBuckets(low, urgent,
          "l_ts", "u_start", "u_end", bucketSeconds = 7L * 86400)
        .groupBy(date_trunc("month", col("l_ts")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_pairs")).count()
    }
    time("q68_broadcast_bnlj") {
      val (low, urgent) = lowUrgent()
      low.join(broadcast(urgent), col("l_ts").between(col("u_start"), col("u_end")))
        .groupBy(date_trunc("month", col("l_ts")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_pairs")).count()
    }
    spark.stop()
  }
}
