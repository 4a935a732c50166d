package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SitemapFunctions]] — urlset/sitemapindex parse semantics. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  test("sitemapUrls: loc required, entities decode, pretty-print trims, priority defaults") {
    val body = Seq(
      "<?xml version=\"1.0\"?><urlset>",
      "<url><loc>http://h/a?x=1&amp;y=2</loc><lastmod>2026-01-05</lastmod><priority>0.9</priority></url>",
      "<url><loc>", "  http://h/spaced", "</loc></url>",
      "<url><loc>http://h/junkprio</loc><priority>high</priority></url>",
      "<url><lastmod>2026-02-02</lastmod></url>",
      "<url><loc>http://h/apos&apos;s</loc></url>",
      "</urlset>").mkString("\n")
    val got = SitemapFunctions.sitemapUrls(Seq(("h", body)).toDF("host", "body"), "body")
      .collect().map(r => (r.getString(1), Option(r.getString(2)), r.getDouble(3))).toSet
    assert(got === Set(
      ("http://h/a?x=1&y=2", Some("2026-01-05"), 0.9),
      ("http://h/spaced", None, 0.5),
      ("http://h/junkprio", None, 0.5),
      ("http://h/apos's", None, 0.5)))
  }

  test("sitemapUrls keeps input columns and drops the body") {
    val df = Seq((7L, "h", "<urlset><url><loc>http://h/x</loc></url></urlset>"))
      .toDF("fetch_id", "host", "body")
    val out = SitemapFunctions.sitemapUrls(df, "body")
    assert(out.columns.toSeq === Seq("fetch_id", "host", "loc", "lastmod", "priority"))
    assert(out.count() === 1L)
  }

  test("sitemapChildren: index files yield child sitemap locations") {
    val body = Seq(
      "<sitemapindex>",
      "<sitemap><loc>http://h/sitemap-a.xml</loc><lastmod>2026-01-01</lastmod></sitemap>",
      "<sitemap><loc>http://h/sitemap-b.xml.gz</loc></sitemap>",
      "<sitemap></sitemap>",
      "</sitemapindex>").mkString("\n")
    val got = SitemapFunctions.sitemapChildren(
        Seq(("h", body)).toDF("host", "body"), "body")
      .select("child_loc").collect().map(_.getString(0)).toSet
    assert(got === Set("http://h/sitemap-a.xml", "http://h/sitemap-b.xml.gz"))
    // a urlset body has no children; an index body has no urls
    assert(SitemapFunctions.sitemapChildren(
      Seq(("h", "<urlset><url><loc>http://h/x</loc></url></urlset>"))
        .toDF("host", "body"), "body").count() === 0L)
    assert(SitemapFunctions.sitemapUrls(
      Seq(("h", body)).toDF("host", "body"), "body").count() === 0L)
  }

  test("discovery composes: parsed urls gate through robots and schedule per host") {
    val robots = Seq(("h", "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 2"))
      .toDF("host", "body")
    val rules = RobotsFunctions.robotsRules(robots, "host", "body", "graftbot")
    val delays = RobotsFunctions.robotsCrawlDelay(robots, "host", "body", "graftbot")
    val sm = Seq(("h", Seq(
      "<urlset>",
      "<url><loc>http://h/ok1</loc></url>",
      "<url><loc>http://h/blocked/x</loc></url>",
      "<url><loc>http://h/ok2</loc></url>",
      "</urlset>").mkString("\n"))).toDF("host", "body")
    val urls = SitemapFunctions.sitemapUrls(sm, "body")
      .withColumnRenamed("loc", "url").drop("host")
    val sched = RobotsFunctions.scheduleFrontier(
        RobotsFunctions.filterByRobots(urls, rules, "url"), delays, "url", 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(sched.keySet === Set("http://h/ok1", "http://h/ok2"))
    assert(sched.values.toSeq.sorted === Seq(0.0, 2.0), "2 s Crawl-delay ladder")
  }
}
