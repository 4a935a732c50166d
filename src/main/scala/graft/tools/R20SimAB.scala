package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r20 optimization round: interleaved A/B for the set-similarity rework —
  * the OLD (r19) operator shapes, reproduced inline verbatim from git
  * history, alternate with the NEW (r20) library forms inside one process,
  * so ambient drift hits both arms equally and the ratio of medians is
  * trustworthy on a noisy box (the Q154AB/R19SimAB discipline). Pairs:
  *
  *   jaccard — jaccardJoinExact: r19 two-checkpoint shape (setsInt +
  *             windowed prefix) vs r20 single-checkpoint shape (prefix is
  *             a slice of the sorted rank array)
  *   contain — containmentJoinExact: r19 string-shingle window shape vs
  *             r20 rank-array shape
  *
  * Usage: sbt "runMain graft.tools.R20SimAB <sfDir> <pair> [rounds]"
  * Not part of the library surface.
  */
object R20SimAB {
  // ---- OLD (r19) shapes, verbatim from the pre-r20 library code ----

  private def rankByDfTermOld(dfreq: DataFrame): DataFrame = {
    val spark = dfreq.sparkSession
    val rankedRdd = dfreq
      .repartitionByRange(col("df"), col("term"))
      .sortWithinPartitions(col("df"), col("term"))
      .select(col("term"))
      .rdd.zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row(r.getString(0), i + 1L) }
    spark.createDataFrame(rankedRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private def jaccardR19(docs: DataFrame, textCol: String, idCol: String,
                         tau: Double): DataFrame = {
    val sets = docs
      .select(col(idCol).as("id"),
        array_distinct(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("tk"))
      .filter(size(col("tk")) > 0)
    val exploded = sets.select(col("id"), size(col("tk")).as("n"),
      explode(col("tk")).as("term"))
    val dfreq = exploded.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ranked = rankByDfTermOld(dfreq)
    val setsInt = exploded.join(ranked, "term").groupBy(col("id"), col("n"))
      .agg(sort_array(collect_list(col("rank"))).as("tkr"))
      .localCheckpoint(true)
    val withDf = exploded.join(dfreq, "term")
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("term").asc)
    val prefix = withDf
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1)
      .select(col("term"), col("id"), col("n"), col("rn"))
      .localCheckpoint(true)
    val a = prefix.select(col("term"), col("id").as("id_a"),
      col("n").as("n_a"), col("rn").as("rn_a"))
    val b = prefix.select(col("term"), col("id").as("id_b"),
      col("n").as("n_b"), col("rn").as("rn_b"))
    val candidates = a.join(b, "term")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("n_a"), col("n_b")) >=
        lit(tau) * greatest(col("n_a"), col("n_b")) - lit(1e-9))
      .filter(lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil(lit(tau) / (1 + tau) * (col("n_a") + col("n_b")) - lit(1e-9)))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b")).distinct()
    val verify = candidates
      .join(setsInt.select(col("id").as("id_b"), col("tkr").as("tkr_b")), "id_b")
      .join(setsInt.select(col("id").as("id_a"), col("tkr").as("tkr_a")), "id_a")
      .withColumn("inter", graft.expr.NativeFunctions
        .sorted_intersect_count(col("tkr_a"), col("tkr_b")).cast("double"))
      .withColumn("jaccard", col("inter") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
    verify.select(col("id_a"), col("id_b"), col("jaccard"))
  }

  private def containR19(docs: DataFrame, textCol: String, idCol: String,
                         tau: Double, ngram: Int): DataFrame = {
    val sets = docs
      .select(col(idCol).as("id"),
        graft.expr.NativeFunctions.word_ngrams(col(textCol), ngram).as("tk"))
      .filter(size(col("tk")) > 0)
    val exploded = sets.select(col("id"), size(col("tk")).as("n"),
      explode(col("tk")).as("term"))
    val dfreq = exploded.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val withDf = exploded.join(dfreq, "term")
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("term").asc)
    val withRn = withDf.withColumn("rn", row_number().over(wDoc))
    val prefixA = withRn
      .filter(col("rn") <= col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1)
      .select(col("term"), col("id").as("id_a"),
        col("n").as("n_a"), col("rn").as("rn_a"))
    val postingsB = withRn
      .select(col("term"), col("id").as("id_b"),
        col("n").as("n_b"), col("rn").as("rn_b"))
    val candidates = prefixA.join(postingsB, "term")
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("n_b") >= ceil(lit(tau) * col("n_a") - lit(1e-9)))
      .filter(lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil(lit(tau) * col("n_a") - lit(1e-9)))
      .select(col("id_a"), col("id_b"), col("n_a")).distinct()
    val verify = candidates
      .join(sets.select(col("id").as("id_b"), col("tk").as("tk_b")), "id_b")
      .join(sets.select(col("id").as("id_a"), col("tk").as("tk_a")), "id_a")
      .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))).cast("double"))
      .withColumn("containment", col("inter") / col("n_a"))
      .filter(col("containment") >= tau)
    verify.select(col("id_a"), col("id_b"), col("containment"))
  }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val pair = args(1)
    val rounds = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val (oldFn, newFn): (() => Unit, () => Unit) = pair match {
      case "jaccard" =>
        val docs = graft.catalog.Tables.documents(spark, d)
          .filter(col("doc_id") % 7 === 0)
        (() => noop(jaccardR19(docs, "text", "doc_id", 0.8)),
         () => noop(graft.functions.DedupFunctions.jaccardJoinExact(
           docs, "text", "doc_id", 0.8)))
      case "jaccard09" =>
        // the q115 declaration: tau = 0.9 (prefix ~10%)
        val docs = graft.catalog.Tables.documents(spark, d)
          .filter(col("doc_id") % 7 === 0)
        (() => noop(jaccardR19(docs, "text", "doc_id", 0.9)),
         () => noop(graft.functions.DedupFunctions.jaccardJoinExact(
           docs, "text", "doc_id", 0.9)))
      case "contain" =>
        val docs = graft.catalog.Tables.documents(spark, d)
        (() => noop(containR19(docs, "text", "doc_id", 0.8, 3)),
         () => noop(graft.functions.DedupFunctions.containmentJoinExact(
           docs, "text", "doc_id", 0.8, 3)))
      case other => throw new IllegalArgumentException(
        s"pair must be jaccard|jaccard09|contain, got '$other'")
    }
    oldFn(); newFn() // warm both arms
    val (oa, na) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime(); oldFn(); val o = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); newFn(); val nw = (System.nanoTime() - t1) / 1e9
      oa += o; na += nw
      println(f"[simab] $pair round $r old $o%7.2f s  new $nw%7.2f s  speedup ${o / nw}%5.2f")
    }
    def med(a: Array[Double]) = { val s = a.sorted; s(s.length / 2) }
    val (mo, mn) = (med(oa.result()), med(na.result()))
    println(f"[simab] $pair MEDIAN old $mo%7.2f s  new $mn%7.2f s  speedup ${mo / mn}%5.2f")
    spark.stop()
  }
}
