package graft.tools

import org.apache.spark.sql.SparkSession

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

    // plan shape + wall for the new curation queries
    Seq("q86_decontaminate", "q87_cap_per_source", "q88_boilerplate").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      println(s"[exp] $q joins: " +
        "BroadcastHashJoin".r.findAllIn(plan).length + " broadcast, " +
        "SortMergeJoin".r.findAllIn(plan).length + " sort-merge, " +
        "NestedLoop".r.findAllIn(plan).length + " nested-loop")
      time(q) { df.count() }
    }
    spark.stop()
  }
}
