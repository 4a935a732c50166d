package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribution harness for the r16 q170/q171 riser: which STAGE of the
  * composed crawl pipeline amplifies the URL-expression cost, and which
  * query-compilation PHASE carries it (not part of the library surface). */
object Q170Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, runs: Int = 3)(f: => Long): Unit =
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(s"[exp] $name run$i: ${math.round((System.nanoTime() - t0) / 1e6) / 1000.0} s ($n rows)")
      }
    def phases(name: String)(df: DataFrame): Unit = {
      df.count()
      val p = df.queryExecution.tracker.phases
      println(s"[exp] $name phases: " + p.map { case (k, v) =>
        s"$k=${(v.endTimeMs - v.startTimeMs)}ms" }.mkString(" "))
    }

    val H = graft.functions.HtmlFunctions
    val U = graft.functions.UrlFunctions
    val D = graft.functions.DedupFunctions
    val Smp = graft.functions.SamplingFunctions
    def warcDocs(urlExprs: Boolean) = {
      val base = graft.sources.Warc.readWarc(spark,
        sys.env.getOrElse("WARC_DIR", System.getProperty("java.io.tmpdir") + "/graft-warc-fixture"))
        .filter(col("file").endsWith(".warc.gz") &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
      if (urlExprs)
        base.select(col("record_index").cast("long").as("rid"),
          U.canonicalizeUrl(col("target_uri")).as("keeper_uri"),
          U.registeredDomain(col("target_uri")).as("regdom"),
          H.mainText(col("payload").cast("string")).as("mt"))
          .filter(length(col("mt")) >= 40)
      else
        base.select(col("record_index").cast("long").as("rid"),
          col("target_uri").as("keeper_uri"),
          lower(col("target_uri")).as("regdom"),
          H.mainText(col("payload").cast("string")).as("mt"))
          .filter(length(col("mt")) >= 40)
    }
    def exact(urlExprs: Boolean) =
      warcDocs(urlExprs).groupBy(col("mt"))
        .agg(min(col("rid")).as("rid"),
          min_by(struct(col("keeper_uri"), col("regdom")), col("rid")).as("k"),
          count(lit(1)).as("n_copies"))
        .select(col("mt"), col("k.keeper_uri").as("keeper_uri"),
          col("k.regdom").as("regdom"), col("rid"), col("n_copies"))
    def near(urlExprs: Boolean) =
      D.dedupNear(exact(urlExprs), "mt", "rid", 3, 4, 2, 0.6)
    def full(urlExprs: Boolean): Long = {
      val capped = Smp.capPerGroup(near(urlExprs), col("regdom"), col("keeper_uri"), 2)
        .withColumn("tokens", graft.functions.TextFunctions.tokenCount(col("mt")).cast("long"))
      Smp.shardByTokenBudget(capped, col("rid"), col("tokens"), "crawl", 30L).count()
    }

    time("a_exact_url") { exact(true).count() }
    time("a_exact_plain") { exact(false).count() }
    time("b_pairs_url") { D.neardupPairsLocal(exact(true), "mt", "rid", 3, 4, 2, 0.6).count() }
    time("b_pairs_plain") { D.neardupPairsLocal(exact(false), "mt", "rid", 3, 4, 2, 0.6).count() }
    time("c_near_url") { near(true).count() }
    time("c_near_plain") { near(false).count() }
    time("d_full_url") { full(true) }
    time("d_full_plain") { full(false) }
    phases("exact_url")(exact(true))
    phases("exact_plain")(exact(false))
    phases("pairs_url")(D.neardupPairsLocal(exact(true), "mt", "rid", 3, 4, 2, 0.6))
    phases("pairs_plain")(D.neardupPairsLocal(exact(false), "mt", "rid", 3, 4, 2, 0.6))
    spark.stop()
  }
}
