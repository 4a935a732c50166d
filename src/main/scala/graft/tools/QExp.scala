package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{DedupFunctions => D}

/** Micro-benchmark harness for comparing query formulations at sf0.1
  * before they land in SparkEntry (not part of the library surface). */
object QExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(s"[exp] $name run$i: ${math.round((System.nanoTime() - t0) / 1e6) / 1000.0} s ($n rows)")
      }

    val docs = graft.catalog.Tables.documents(spark, d)
    val (n, bands, rowsPerBand, thr) = (3, 4, 2, 0.8)

    // the size-guard-free local formulation (silent-drop risk — for
    // timing comparison only)
    def plainGroupbyCount(): Long = {
      val keyed = docs.select(
          col("doc_id").as("id"),
          graft.expr.NativeFunctions.word_ngrams(col("text"), n).as("sh"),
          posexplode(array((0 until bands).map(b =>
            D.bandKeyFromSignature(D.minhashSignature(col("text"), n, bands * rowsPerBand), b, rowsPerBand)): _*))
            .as(Seq("band", "band_key")))
      val buckets = keyed.groupBy(col("band"), col("band_key"))
        .agg(array_sort(collect_list(struct(col("id"), col("sh")))).as("ms"))
        .filter(size(col("ms")) > 1)
      val ms = col("ms")
      buckets.select(explode(flatten(transform(ms, (a, i) =>
          transform(slice(ms, i + lit(2), size(ms)), b => struct(
            a.getField("id").as("id_a"),
            b.getField("id").as("id_b"),
            D.jaccardFromDistinct(a.getField("sh"), b.getField("sh")).as("jaccard")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.jaccard").as("j"))
        .filter(col("j") >= thr).count()
    }

    // a: shipped formulation — bucket-size window over the one exchange
    time("a_current_window") {
      D.neardupPairsLocal(docs, "text", "doc_id", n, bands, rowsPerBand, thr).count()
    }
    // b: no size guard at all
    time("b_plain_groupby") { plainGroupbyCount() }
    // c: cheap signature-only count pre-pass, driver-side branch to b
    time("c_prepass_branch") {
      val sigOnly = docs.select(posexplode(array((0 until bands).map(b =>
          D.bandKeyFromSignature(D.minhashSignature(col("text"), n, bands * rowsPerBand), b, rowsPerBand)): _*))
        .as(Seq("band", "band_key")))
      val nBig = sigOnly.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 10000).count()
      require(nBig == 0)
      plainGroupbyCount()
    }
    spark.stop()
  }
}
