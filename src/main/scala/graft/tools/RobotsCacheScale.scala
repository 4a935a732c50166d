package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the robots-cache claim: an incremental batch of UNCHANGED
  * robots bodies costs one (host, digest) anti-join, not a re-parse of
  * the world. Builds N synthetic per-host robots bodies (realistic
  * multi-group shapes), then times
  *
  *   parse    — robotsRules + robotsCrawlDelay from scratch (what every
  *              batch pays WITHOUT the cache: per-host line explode +
  *              group windows over every body);
  *   append0  — appendRobotsCache of the identical batch (the cache's
  *              per-batch cost when nothing changed: digest + anti-join,
  *              parses zero);
  *   append1% — appendRobotsCache with 1% of hosts changed (the steady
  *              daily regime: anti-join + parse of the 1%).
  *
  * Then the COMPACTION story (the r18 verdict's gap): `gens` more
  * 1%-changed appends accumulate change generations, the latest-per-host
  * read is timed against the stacked cache, [[graft.functions
  * .RobotsFunctions.compactRobotsCache]] rewrites it to one generation,
  * and the read re-times — flat-vs-generation-count is the claim.
  *
  * Usage: sbt "runMain graft.tools.RobotsCacheScale [nHosts] [padLines] [gens]"
  * (default 200000, 0, 20). padLines appends that many comment lines per
  * body — real robots.txt average ~1–2 KB and cap at 500 KiB, and the
  * parse's cost scales with LINES×WINDOWS while the digest stays a
  * linear byte scan, so the pad shows the gap at realistic sizes. */
object RobotsCacheScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val pad = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val gens = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val padding = (0 until pad).map(i => s"# filler annotation line $i\n").mkString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val R = graft.functions.RobotsFunctions

    def bodies(changedFrac: Double) = spark.range(n).select(
      concat(lit("h"), col("id"), lit(".example")).as("host"),
      concat(
        lit("User-agent: graftbot\nDisallow: /private"), col("id") % 7,
        lit("/\nAllow: /private"), col("id") % 7, lit("/pub/\nCrawl-delay: "),
        (col("id") % 9) + 1,
        lit("\nUser-agent: *\nDisallow: /\n"),
        when(col("id") % 100 < (changedFrac * 100).toInt,
          lit("Disallow: /changed/\n")).otherwise(lit("")),
        lit(padding)).as("body"))

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val b0 = bodies(0).localCheckpoint(true)
    // from-scratch parse cost (the no-cache per-batch price)
    val (tParse, nRules) = time {
      R.robotsRules(b0, "host", "body", "graftbot").count() +
        R.robotsCrawlDelay(b0, "host", "body", "graftbot").count()
    }
    val dir = java.nio.file.Files.createTempDirectory("robots-cache-scale").toString
    val (tInit, _) = time(R.writeRobotsCache(spark, dir, b0, "host", "body", "graftbot"))
    val (tSame, reparsedSame) =
      time(R.appendRobotsCache(spark, dir, b0, "host", "body", "graftbot"))
    require(reparsedSame == 0L, s"unchanged batch reparsed $reparsedSame hosts")
    val b1 = bodies(0.01).localCheckpoint(true)
    val (tDelta, reparsedDelta) =
      time(R.appendRobotsCache(spark, dir, b1, "host", "body", "graftbot"))
    println(f"[robots-cache-scale] n=$n%,d hosts ($nRules%,d rule+delay rows)")
    println(f"[robots-cache-scale] parse-from-scratch: $tParse%.2f s (every batch, no cache)")
    println(f"[robots-cache-scale] cache init (parse + write): $tInit%.2f s (once)")
    println(f"[robots-cache-scale] append unchanged: $tSame%.2f s (parses 0) — ${tParse / tSame}%.1fx cheaper than re-parsing")
    println(f"[robots-cache-scale] append 1%% changed: $tDelta%.2f s (parses $reparsedDelta%,d)")

    // ---- compaction: read cost vs accumulated change generations ------
    val (tReadFresh, rulesFresh) =
      time(R.cachedRules(spark, dir).count())
    // each round flips a DIFFERENT 1% (rotating window over id space), so
    // generations stack the way a daily crawl's do
    for (g <- 1 to gens) {
      val batch = spark.range(n).select(
        concat(lit("h"), col("id"), lit(".example")).as("host"),
        concat(
          lit("User-agent: graftbot\nDisallow: /private"), col("id") % 7,
          lit("/\nAllow: /private"), col("id") % 7, lit("/pub/\nCrawl-delay: "),
          (col("id") % 9) + 1,
          lit("\nUser-agent: *\nDisallow: /\n"),
          when((col("id") + g) % 100 < 1,
            concat(lit("Disallow: /gen"), lit(g), lit("/\n")))
            .otherwise(lit("")),
          lit(padding)).as("body"))
      R.appendRobotsCache(spark, dir, batch, "host", "body", "graftbot")
    }
    val (tReadStacked, rulesStacked) =
      time(R.cachedRules(spark, dir).count())
    val (tCompact, _) = time(R.compactRobotsCache(spark, dir))
    val (tReadCompacted, rulesCompacted) =
      time(R.cachedRules(spark, dir).count())
    require(rulesCompacted == rulesStacked,
      s"compaction changed the served rules: $rulesStacked -> $rulesCompacted")
    val (tAppendAfter, reparsedAfter) =
      time(R.appendRobotsCache(spark, dir,
        bodies(0.01), "host", "body", "graftbot"))
    println(f"[robots-cache-scale] read @2 gens: $tReadFresh%.2f s ($rulesFresh%,d rules); " +
      f"read @${gens + 2} gens: $tReadStacked%.2f s; " +
      f"compact: $tCompact%.2f s; read after: $tReadCompacted%.2f s " +
      f"(${tReadStacked / tReadCompacted}%.1fx)")
    println(f"[robots-cache-scale] append after compact: $tAppendAfter%.2f s (parses $reparsedAfter%,d — digests survive)")
    spark.stop()
  }
}
