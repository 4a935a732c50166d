package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.{DedupFunctions => D}

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

    val docs = Tables.documents(spark, d)
    time("scan_only_sig_sh") {
      docs.select(
          graft.expr.NativeFunctions.word_ngrams(col("text"), 3).as("sh"),
          D.minhashSignature(col("text"), 3, 2).as("sig"))
        .agg(count(col("sig"))).head().getLong(0)
    }
    time("scan_only_sig") {
      docs.select(D.minhashSignature(col("text"), 3, 2).as("sig"))
        .agg(count(col("sig"))).head().getLong(0)
    }
    time("q43_full") {
      D.neardupPairsLocal(docs, "text", "doc_id",
        n = 3, bands = 1, rowsPerBand = 2, jaccardThreshold = 0.0).count()
    }
    spark.stop()
  }
}
