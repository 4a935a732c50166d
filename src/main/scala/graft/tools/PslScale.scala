package graft.tools

import graft.functions.UrlFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the full-PSL geometry decision (SCALE.md r17): the literal
  * isin-array form of registeredDomainFromRules vs the per-depth
  * broadcast-join form of registeredDomainJoined, both at curated width
  * (~80 rules) and full-PSL width (~9.4k rules), over a synthetic URL
  * corpus.
  *
  * Three costs per (form, width):
  *   1. plan size — length of the executedPlan string (the literal form
  *      carries every rule in every plan; a composed pipeline re-analyzes
  *      that tree on each action);
  *   2. planning wall — time from DataFrame construction to
  *      executedPlan materialization (analyzer + optimizer + codegen
  *      source emission, no execution);
  *   3. execution wall — count() over N URLs, best of 3.
  *
  * Usage: sbt "runMain graft.tools.PslScale [nUrls]"  (default 2000000)
  */
object PslScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val curated = UrlFunctions.BundledPslRules
    val full = graft.SparkEntry.fullPslRules

    def urls: DataFrame = spark.range(n).select(
      concat(lit("http://"),
        when(pmod(col("id"), lit(4)) === 0,
          concat(lit("a.b.s"), pmod(col("id"), lit(8000)), lit(".t"),
            pmod(pmod(col("id"), lit(8000)), lit(97))))
          .when(pmod(col("id"), lit(4)) === 1,
            concat(lit("x.y.ex"), col("id"), lit(".co.uk")))
          .when(pmod(col("id"), lit(4)) === 2,
            concat(lit("a.ok.w"), pmod(col("id"), lit(400))))
          .otherwise(concat(lit("ex"), col("id"), lit(".com"))),
        lit("/p/"), col("id")).as("url"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def bestOf3(f: => Unit): Double =
      (1 to 3).map(_ => time(f)._2).min

    for ((wname, rules) <- Seq("curated" -> curated, "full" -> full)) {
      // literal form
      val (litDf, litPlanWall) = time {
        val d = urls.select(
          UrlFunctions.registeredDomainFromRules(col("url"), rules).as("rd"))
        d.queryExecution.executedPlan // force analysis+optimization
        d
      }
      val litPlanSize = litDf.queryExecution.executedPlan.toString.length
      val litExec = bestOf3(litDf.agg(count(col("rd"))).collect())
      // joined form
      val (joinDf, joinPlanWall) = time {
        val d = UrlFunctions.registeredDomainJoined(urls, "url", rules, "rd")
          .select(col("rd"))
        d.queryExecution.executedPlan
        d
      }
      val joinPlanSize = joinDf.queryExecution.executedPlan.toString.length
      val joinExec = bestOf3(joinDf.agg(count(col("rd"))).collect())
      println(f"[pslscale] width=$wname%-8s rules=${rules.size}%5d  " +
        f"literal: plan=${litPlanSize}%8d chars, planning=${litPlanWall}%6.2f s, exec=${litExec}%6.2f s  |  " +
        f"joined: plan=${joinPlanSize}%8d chars, planning=${joinPlanWall}%6.2f s, exec=${joinExec}%6.2f s")
    }
    spark.stop()
  }
}
