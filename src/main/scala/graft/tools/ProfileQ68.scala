package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiling harness for q68_range_join (VERDICT r4 task 5):
  * breaks the bucketed range join into stages and sweeps `bucketSeconds`
  * so the candidate-pair count vs residual cost trade-off is measured,
  * not guessed. Run: `sbt "runMain graft.tools.ProfileQ68"`. */
object ProfileQ68 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val o = graft.catalog.Tables.orders(spark, sfDir).cache()
    println(s"orders: ${o.count()}")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("u_key"), col("o_orderdate").as("u_start"),
        (col("o_orderdate") + expr("interval 2 days")).as("u_end"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_orderkey").as("l_key"), col("o_orderdate").as("l_ts"))
    println(s"urgent=${urgent.count()} low=${low.count()}")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // stage breakdown at the production bucket width
    for (bucketDays <- Seq(1L, 2L, 4L, 8L, 16L)) {
      val b = bucketDays * 86400
      println(s"bucketSeconds = ${bucketDays}d")
      val joined = graft.meta.TemporalJoins.rangeJoinBuckets(
        low, urgent, "l_ts", "u_start", "u_end", b)
      val candidates = time("candidate pairs (no residual)") {
        low.withColumn("__bucket", floor(unix_seconds(col("l_ts").cast("timestamp")) / b))
          .join(urgent.withColumn("__bucket", explode(sequence(
            floor(unix_seconds(col("u_start").cast("timestamp")) / b),
            floor(unix_seconds(col("u_end").cast("timestamp")) / b)))), Seq("__bucket"))
          .count()
      }
      val matched = time("after residual")(joined.count())
      println(s"  candidates=$candidates matched=$matched")
      time("full q68 (join+agg+sort)") {
        joined.groupBy(date_trunc("month", col("l_ts")).cast("date").as("month"))
          .agg(count(lit(1)).as("n_pairs")).orderBy(col("month")).count()
      }
      // repeat to split planning/JIT from steady-state execution
      time("full q68 (2nd run)") {
        joined.groupBy(date_trunc("month", col("l_ts")).cast("date").as("month"))
          .agg(count(lit(1)).as("n_pairs")).orderBy(col("month")).count()
      }
    }

    // control: how much of the 2.5 s is simply the two scans + agg?
    time("control: scan+filter+agg only") {
      low.join(urgent, col("l_key") === col("u_key"), "left_semi").count()
    }
    spark.stop()
  }
}
