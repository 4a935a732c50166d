package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-growth profiler for scale-ratio attribution (round-10 brief
  * item 2): run named SparkEntry queries against one or more sf dirs and
  * print wall seconds AND result rows, so a super-linear wall ratio can be
  * judged against the query's own output growth (a pairs query whose
  * output grows 50× is allowed >10× wall; a scan query is not). Not part
  * of the library surface.
  *
  * Usage: sbt "runMain graft.tools.QRows dir1,dir2 q43_neardup_pairs ..."
  */
object QRows {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // bounded-buffer native aggregates (TopKPairsAgg: <= 2k (score,id)
      // pairs per group) do not need the conservative 128-entry sort-based
      // fallback built for unbounded collect_list state: past 128 groups per
      // partition the fallback SORTS the whole pair stream, which at sf1 was
      // the q154 capped-mode constant (SCALE.md r15). 64k entries bounds
      // the hash map at tens of MB for every aggregate in this suite
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val base = dirs.map { d =>
        // warm once (plan/code caches), then best-of-3
        fn(spark, d).count()
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = fn(spark, d).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (d, runs.map(_._1).min, runs.head._2)
      }
      base.foreach { case (d, s, n) =>
        println(f"[qrows] $name%-28s $d%-28s $s%7.2f s $n%,12d rows")
      }
      if (base.length == 2 && base(0)._2 > 0 && base(0)._3 > 0) {
        val w = base(1)._2 / base(0)._2
        val o = base(1)._3.toDouble / base(0)._3
        println(f"[qrows] $name%-28s wall ${w}%.1fx vs output ${o}%.1fx")
      }
    }
    spark.stop()
  }
}
