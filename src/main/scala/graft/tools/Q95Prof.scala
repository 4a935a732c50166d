package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{DedupFunctions => D}

/** Stage-by-stage profile of q95 (signature-only near-dup) at sf0.1:
  * where the 1.2 s goes. Findings in SCALE.md §q95. */
object Q95Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("q95prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q95] $label%-34s ${best}%.2f s")
    }
    time("scan only")(docs.count())
    time("minhash signatures (8 hashes)")(
      docs.select(D.minhashSignature(col("text"), 3, 8).as("s"))
        .agg(count(col("s"))).head().getLong(0))
    time("sig + band explode")(
      docs.select(col("doc_id"),
          D.minhashSignature(col("text"), 3, 8).as("sig"))
        .select(col("doc_id"), col("sig"),
          posexplode(array((0 until 4).map(b =>
            D.bandKeyFromSignature(col("sig"), b, 2)): _*)).as(Seq("band", "band_key")))
        .count())
    time("full neardupPairsBySignature")(
      D.neardupPairsBySignature(docs, "text", "doc_id").count())
    spark.stop()
  }
}
