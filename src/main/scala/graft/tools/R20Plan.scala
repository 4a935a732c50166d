package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 optimization-round harness: dump `.explain("formatted")` for named
  * SparkEntry queries to plans/r20/<query>_<tag>.txt and time each with
  * the noop sink (guide §1.4 — computes every column, discards the
  * result) best-of-3. Iterative operators (pageRank, recursions) run
  * driver-side jobs while CONSTRUCTING the DataFrame, so the dumped plan
  * is the final composition reading their checkpointed outputs; the
  * timing still covers the full construction + execution. Not part of
  * the library surface.
  *
  * Usage: sbt "runMain graft.tools.R20Plan <tag> <sfDir> q192_pagerank ..."
  */
object R20Plan {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val d = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r20"))
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"r20plan: $name")
      // warm once (plan/code caches, layout builds)
      fn(spark, d).write.format("noop").mode("overwrite").save()
      val plan = fn(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r20/${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r20plan] $name $tag: best ${runs.min}%.3f s (runs ${runs.map(r => f"$r%.2f").mkString(", ")})")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
