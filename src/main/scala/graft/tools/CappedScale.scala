package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Apples-to-apples scaling attribution for the capped pairwise joins
  * (round-13): the capped mode must cost ≈ the UNCAPPED join at the SAME
  * threshold (verification is the shared price of exactness); its win is
  * the output bound (docs × k) and everything downstream of it. QRows
  * compares q154 (τ=0.8) against q115 (τ=0.9), which confounds the cap
  * with the threshold; this runs both modes at one τ. Not library surface.
  *
  * Usage: sbt "runMain graft.tools.CappedScale dir1,dir2"
  */
object CappedScale {
  def main(args: Array[String]): Unit = {
    val dirs = (if (args.nonEmpty) args(0) else
      "/root/testdata/sf0.1,/tmp/graft-sf1").split(",").toSeq
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
    import graft.catalog.Tables
    import graft.functions.DedupFunctions

    for (d <- dirs) {
      val docs = Tables.documents(spark, d).filter(col("doc_id") % 7 === 0)
      def time(tag: String)(f: => Long): Unit = {
        f // warm
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"[capped] $tag%-24s $d%-28s ${runs.map(_._1).min}%7.2f s ${runs.head._2}%,12d rows")
      }
      time("jaccard_exact_t08")(
        DedupFunctions.jaccardJoinExact(docs, "text", "doc_id", 0.8).count())
      time("jaccard_topk_t08_k2")(
        DedupFunctions.jaccardJoinTopK(docs, "text", "doc_id", 0.8, 2).count())
      time("jaccard_summary_t08")(
        DedupFunctions.jaccardJoinSummary(docs, "text", "doc_id", 0.8).count())
    }
    spark.stop()
  }
}
