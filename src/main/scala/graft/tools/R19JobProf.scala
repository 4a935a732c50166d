package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** r19: per-JOB wall attribution for a named SparkEntry query — eagerly
  * materialized phases (localCheckpoints, counts, broadcasts) each run
  * their own job, so the job log IS the phase profile. Prints jobId,
  * seconds and the job's call site. Not part of the library surface.
  *
  * Usage: sbt "runMain graft.tools.R19JobProf <sfDir> <query>"
  */
object R19JobProf {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warm run (layout builds, codegen)
    fn(spark, d).write.format("noop").mode("overwrite").save()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time,
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.get(je.jobId)
        if (s != null)
          lines.add(f"[jobprof] job ${je.jobId}%4d ${(je.time - s._1) / 1000.0}%7.3f s  ${s._2}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    lines.forEach(println)
    println(f"[jobprof] TOTAL $name: $total%.3f s over ${lines.size} jobs")
    spark.stop()
  }
}
