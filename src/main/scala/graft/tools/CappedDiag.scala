package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CappedDiag {
  def main(args: Array[String]): Unit = {
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
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.catalog.Tables.documents(spark, d).filter(col("doc_id") % 7 === 0)
    val pairs = graft.functions.DedupFunctions.jaccardJoinExact(docs, "text", "doc_id", 0.8)
    def t(tag: String)(f: => Long): Unit = {
      f
      val r = (1 to 3).map { _ => val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"[diag] $tag%-28s ${r.map(_._1).min}%6.2f s ${r.head._2}%,10d rows")
    }
    t("exact")(pairs.count())
    t("exact+groupBy.count")(pairs.groupBy(col("id_a")).count().count())
    t("exact+window_rownum")( {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("id_a")).orderBy(col("jaccard").desc, col("id_b"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).count()
    })
    t("exact+topKPerDoc")(graft.functions.SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", "jaccard", 2).count())
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    t("topKPerDoc thr=1M")(graft.functions.SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", "jaccard", 2).count())
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    t("exact+agg_max")(pairs.groupBy(col("id_a")).agg(max(col("jaccard"))).count())
    t("topk_agg_only_no_explode")( {
      val agg = graft.expr.NativeFunctions.topk_pairs(col("jaccard").cast("double"), col("id_b").cast("long"), 2)
      pairs.groupBy(col("id_a")).agg(agg.as("nn")).count()
    })
    // count the jobs/scan reuse: physical plan of topk
    val tk = graft.functions.SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", "jaccard", 2)
    val plan = tk.queryExecution.executedPlan.toString
    println("[diag] ObjectHashAggregate occurrences: " + "ObjectHashAggregate".r.findAllIn(plan).length)
    println("[diag] SortAggregate occurrences: " + "SortAggregate".r.findAllIn(plan).length)
    println("[diag] SortMergeJoin occurrences: " + "SortMergeJoin".r.findAllIn(plan).length)
    println("[diag] ShuffledHashJoin occurrences: " + "ShuffledHashJoin".r.findAllIn(plan).length)
    println("[diag] BroadcastHashJoin occurrences: " + "BroadcastHashJoin".r.findAllIn(plan).length)
    println("[diag] Exchange occurrences (topk): " + "Exchange".r.findAllIn(plan).length)
    tk.count() // adaptive final plan
    println("[diag] Exchange (topk, final AQE): " +
      "Exchange".r.findAllIn(tk.queryExecution.executedPlan.toString).length)
    pairs.count()
    println("[diag] Exchange (exact, final AQE): " +
      "Exchange".r.findAllIn(pairs.queryExecution.executedPlan.toString).length)
    spark.stop()
  }
}
