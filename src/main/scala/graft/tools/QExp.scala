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

    for (bs <- Seq(32, 64, 128, 250)) time(s"q53_block$bs") {
      graft.functions.SimilarityFunctions.allPairsCosineBlocked(
          Tables.embeddings(spark, d), "embedding", "vec_id", 0.45, bs)
        .orderBy("id_a", "id_b").count()
    }
    time("q41_bnlj") {
      val o = Tables.orders(spark, d)
        .withColumn("o_end", col("o_orderdate") + expr("interval 30 days"))
      val periods = spark.range(1).select(explode(sequence(
          lit("1997-01-01").cast("timestamp"), lit("1997-12-01").cast("timestamp"),
          expr("interval 1 month"))).as("period_start"))
        .withColumn("period_end",
          col("period_start") + expr("interval 1 month") - expr("interval 1 second"))
      o.join(broadcast(periods),
          col("o_orderdate") <= col("period_end") && col("o_end") >= col("period_start"))
        .groupBy(col("period_start").cast("date").as("month"))
        .agg(count(lit(1)).as("n")).count()
    }
    time("q41_explode") {
      val o = Tables.orders(spark, d)
        .withColumn("o_end", col("o_orderdate") + expr("interval 30 days"))
      o.select(explode(sequence(
          date_trunc("month", col("o_orderdate")),
          date_trunc("month", col("o_end")),
          expr("interval 1 month"))).as("month_ts"))
        .filter(col("month_ts").between(
          lit("1997-01-01").cast("timestamp"), lit("1997-12-01").cast("timestamp")))
        .groupBy(col("month_ts").cast("date").as("month"))
        .agg(count(lit(1)).as("n")).count()
    }
    time("q46_get_json_object") {
      Tables.events(spark, d)
        .select((floor(get_json_object(col("props"), "$.k").cast("int") / 10)).cast("int").as("k_bucket"),
          col("value"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .count()
    }
    time("q46_variant") {
      Tables.events(spark, d)
        .select((floor(variant_get(parse_json(col("props")), "$.k", "int") / 10)).cast("int").as("k_bucket"),
          col("value"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .count()
    }
    time("q46_from_json") {
      Tables.events(spark, d)
        .select((floor(from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k") / 10)).cast("int").as("k_bucket"),
          col("value"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .count()
    }
    spark.stop()
  }
}
