package graft.tools
import org.apache.spark.sql.SparkSession

/** Isolated q112 timing at an arbitrary SF dir — the adjudication tool
  * for the r17/r18 sf1 two-strike question: is the NB train+score slow
  * by itself (code/corpus), or only inside a 400 s sweep (contention)? */
object Q112Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q112_nb_classify")
    fn(spark, d).count() // warm
    for (i <- 1 to 5) {
      val t0 = System.nanoTime(); fn(spark, d).count()
      println(f"[q112prof] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
