package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Stage-by-stage profile of q115 (jaccardJoinExact) at a given sf dir —
  * times and counts each phase so a super-linear decade step can be
  * attributed to prefix volume, candidate volume, or verify cost. Not part
  * of the library surface. */
object Q115Prof {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val tau = 0.9
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q115] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.catalog.Tables.documents(spark, d)
      .filter(col("doc_id") % 7 === 0)
    val sets = docs
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.tokens(lower(col("text")))).as("tk"))
      .filter(size(col("tk")) > 0)
    println(s"[q115] docs: ${t("sets count")(sets.count())}")
    val exploded = sets.select(col("id"), size(col("tk")).as("n"),
      explode(col("tk")).as("term"))
    val dfreq = exploded.groupBy(col("term")).agg(count(lit(1)).as("df"))
    println(s"[q115] vocab: ${t("dfreq count")(dfreq.count())}")
    val ranked = dfreq.select(col("term"),
      row_number().over(Window.orderBy(col("df").asc, col("term").asc)).as("rank"))
    val withRank = exploded.join(broadcast(ranked), "term")
    val setsInt = withRank.groupBy(col("id"), col("n"))
      .agg(sort_array(collect_list(col("rank"))).as("tkr"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("rank"))
    val prefix = withRank
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1)
      .select(col("rank"), col("id"), col("n"), col("rn"))
    println(s"[q115] prefix rows: ${t("prefix count")(prefix.count())}")
    val a = prefix.select(col("rank"), col("id").as("id_a"),
      col("n").as("n_a"), col("rn").as("rn_a"))
    val b = prefix.select(col("rank"), col("id").as("id_b"),
      col("n").as("n_b"), col("rn").as("rn_b"))
    val rawCand = a.join(b, "rank")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("n_a"), col("n_b")) >=
        lit(tau) * greatest(col("n_a"), col("n_b")) - lit(1e-9))
      .filter(lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil(lit(tau) / (1 + tau) * (col("n_a") + col("n_b")) - lit(1e-9)))
    println(s"[q115] raw candidates: ${t("raw cand count")(rawCand.count())}")
    val candidates = rawCand
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b")).distinct()
    println(s"[q115] distinct candidates: ${t("distinct count")(candidates.count())}")
    val verify = candidates
      .join(setsInt.select(col("id").as("id_a"), col("tkr").as("tkr_a")), "id_a")
      .join(setsInt.select(col("id").as("id_b"), col("tkr").as("tkr_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("tkr_a"), col("tkr_b"))).cast("double"))
      .withColumn("jaccard", col("inter") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
    println(s"[q115] matches: ${t("verify count")(verify.count())}")
    spark.stop()
  }
}
