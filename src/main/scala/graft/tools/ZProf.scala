package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling main for the Z-order layout writer (q98): isolates the
  * quantile-sketch pass from the interleave+range-partition+write pass.
  * Findings recorded in SCALE.md: the ArrayAggregate bucket fold (an
  * interpreted HOF) cost ~11 s of the original 13.2 s sf0.1 write; the
  * native SearchSortedExpr binary search brings the full write to ~1.3 s
  * warm, and relaxing the sketch's relative error 0.001 → 0.01 (layout
  * boundaries need no precision) cuts the quantile pass 3×. */
object ZProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("zprof").getOrCreate()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = graft.catalog.Tables.events(spark, d)
    ev.count() // warm the session
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[zprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val viewed = ev.select(unix_micros(col("ts")).cast("double").as("__q_ts"),
      col("user_id").cast("double").as("__q_u"))
    val probs255 = (1 to 255).map(_.toDouble / 256).toArray
    val probs63 = (1 to 63).map(_.toDouble / 64).toArray
    time("approxQuantile 255 cuts err=0.001")(
      viewed.stat.approxQuantile(Array("__q_ts", "__q_u"), probs255, 0.001))
    time("approxQuantile 255 cuts err=0.01 (what zorderWrite uses)")(
      viewed.stat.approxQuantile(Array("__q_ts", "__q_u"), probs255, 0.01))
    time("approxQuantile 63 cuts err=0.01")(
      viewed.stat.approxQuantile(Array("__q_ts", "__q_u"), probs63, 0.01))
    val dir = java.nio.file.Files.createTempDirectory("zp").toString
    time("zorderWrite bits=8 (cold)")(
      graft.meta.ScaleOps.zorderWrite(ev, Seq("user_id", "ts"), s"$dir/a", 16))
    time("zorderWrite bits=8 (warm)")(
      graft.meta.ScaleOps.zorderWrite(ev, Seq("user_id", "ts"), s"$dir/b", 16))
    spark.stop()
  }
}
