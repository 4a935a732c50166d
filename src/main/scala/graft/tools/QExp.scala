package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.Tables
// scratch experiment harness — not part of the library surface
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
        println(s"[exp] $name run$i: ${math.round((System.nanoTime()-t0)/1e6)/1000.0} s ($n rows)")
      }
    time("preagg") {
      val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(spark, d)
      val rev = Tables.lineitem(spark, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(rev, o("o_orderkey") === rev("l_orderkey"))
        .select(o("o_orderkey"), o("o_orderdate").cast("date").as("o_date"), round(col("rev"),2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10).count()
    }
    time("filterfirst") {
      val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(spark, d)
      val bo = o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"))
      val l = Tables.lineitem(spark, d)
      l.join(bo, l("l_orderkey") === bo("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"), round(col("rev"),2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10).count()
    }
    spark.stop()
  }
}
