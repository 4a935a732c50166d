package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage profile of q130 (containmentJoinExact) — counts and
  * times each phase so the wall can be attributed to shingle explode,
  * dictionary attach, candidate volume, or verification. Not part of the
  * library surface. */
object Q130Prof {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val tau = 0.8
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
      println(f"[q130] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.catalog.Tables.documents(spark, d)
    val sets = docs
      .select(col("doc_id").as("id"),
        graft.expr.NativeFunctions.word_ngrams(col("text"), 3).as("tk"))
      .filter(size(col("tk")) > 0)
    println(s"[q130] docs: ${t("sets count")(sets.count())}")
    val exploded = sets.select(col("id"), size(col("tk")).as("n"),
      explode(col("tk")).as("term"))
    println(s"[q130] postings: ${t("exploded count")(exploded.count())}")
    val dfreq = exploded.groupBy(col("term")).agg(count(lit(1)).as("df"))
    println(s"[q130] vocab: ${t("dfreq count")(dfreq.count())}")
    val withDf = exploded.join(dfreq, "term")
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("term").asc)
    val withRn = withDf.withColumn("rn", row_number().over(wDoc))
    val prefixA = withRn
      .filter(col("rn") <= col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1)
      .select(col("term"), col("id").as("id_a"),
        col("n").as("n_a"), col("rn").as("rn_a"))
    println(s"[q130] prefix rows: ${t("prefix count")(prefixA.count())}")
    val postingsB = withRn
      .select(col("term"), col("id").as("id_b"),
        col("n").as("n_b"), col("rn").as("rn_b"))
    val cand = prefixA.join(postingsB, "term")
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("n_b") >= ceil(lit(tau) * col("n_a") - lit(1e-9)))
      .filter(lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
        ceil(lit(tau) * col("n_a") - lit(1e-9)))
      .select(col("id_a"), col("id_b"), col("n_a")).distinct()
    println(s"[q130] candidates: ${t("cand count")(cand.count())}")
    val verify = cand
      .join(sets.select(col("id").as("id_a"), col("tk").as("tk_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("tk").as("tk_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))).cast("double"))
      .withColumn("containment", col("inter") / col("n_a"))
      .filter(col("containment") >= tau)
    println(s"[q130] matches: ${t("verify count")(verify.count())}")
    spark.stop()
  }
}
