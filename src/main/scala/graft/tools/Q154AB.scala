package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for the q154 capped-mode constant: exact vs topK runs
  * ALTERNATE within one process, so ambient drift hits both arms equally
  * and the ratio of medians is trustworthy — the attribution runs that
  * measured each arm in a block were ±12% apart on identical code.
  * Usage: sbt "runMain graft.tools.Q154AB [sfDir] [rounds]" */
object Q154AB {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft-sf1"
    val rounds = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.catalog.Tables.documents(spark, d).filter(col("doc_id") % 7 === 0)
    def exact(): Long =
      graft.functions.DedupFunctions.jaccardJoinExact(docs, "text", "doc_id", 0.8).count()
    def topk(): Long =
      graft.functions.DedupFunctions.jaccardJoinTopK(docs, "text", "doc_id", 0.8, 2).count()
    exact(); topk() // warm both arms
    val (ea, ta) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime(); exact(); val e = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); topk(); val t = (System.nanoTime() - t1) / 1e9
      ea += e; ta += t
      println(f"[q154ab] round $r exact $e%6.2f s  topk $t%6.2f s  ratio ${t / e}%5.2f")
    }
    def med(a: Array[Double]) = { val s = a.sorted; s(s.length / 2) }
    val (me, mt) = (med(ea.result()), med(ta.result()))
    println(f"[q154ab] MEDIAN exact $me%6.2f s  topk $mt%6.2f s  ratio ${mt / me}%5.2f")
    spark.stop()
  }
}
