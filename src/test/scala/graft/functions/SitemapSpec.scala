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

  // ---- depth-N discovery operator ----------------------------------

  private def urlset(locs: String*): String =
    ("<urlset>" +: locs.map(l => s"<url><loc>$l</loc></url>") :+ "</urlset>")
      .mkString("\n")
  private def index(children: String*): String =
    ("<sitemapindex>" +: children.map(c => s"<sitemap><loc>$c</loc></sitemap>")
      :+ "</sitemapindex>").mkString("\n")

  test("discoverSitemaps: depth-3 tree = the hand-unrolled walk; orphans and misses stay out") {
    val robots = Seq(
      ("h", "User-agent: *\nDisallow: /x\nSitemap: http://h/root.xml"),
      ("g", "Sitemap: http://g/flat.xml")).toDF("host", "body")
    val bodies = Seq(
      // h: index -> (index, urlset) -> urlset  (depth 3)
      ("http://h/root.xml", index("http://h/mid.xml", "http://h/leaf-a.xml",
        "http://h/missing.xml")), // announced but NO body: a fetch miss
      ("http://h/mid.xml", index("http://h/leaf-b.xml")),
      ("http://h/leaf-a.xml", urlset("http://h/a1", "http://h/a2")),
      ("http://h/leaf-b.xml", urlset("http://h/b1")),
      // orphan: has a body but nobody announces it — never parsed
      ("http://h/orphan.xml", urlset("http://h/orphan-url")),
      // g: flat urlset announced directly (depth 1)
      ("http://g/flat.xml", urlset("http://g/f1"))).toDF("sm_url", "body")
    val got = CrawlFunctions.discoverSitemaps(robots, bodies, maxDepth = 3)
      .select(col("sm_url"), col("depth"), col("loc"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // the hand-unrolled replay (what q201 did at depth 2, one level more)
    val expected = Set(
      ("http://g/flat.xml", 1, "http://g/f1"),
      ("http://h/leaf-a.xml", 2, "http://h/a1"),
      ("http://h/leaf-a.xml", 2, "http://h/a2"),
      ("http://h/leaf-b.xml", 3, "http://h/b1"))
    assert(got === expected)
    // loud depth cap: the same tree at maxDepth=2 leaves leaf-b's BODY
    // unparsed — that must throw, not silently shrink the corpus
    val e = intercept[IllegalArgumentException] {
      CrawlFunctions.discoverSitemaps(robots, bodies, maxDepth = 2)
    }
    assert(e.getMessage.contains("leaf-b"), e.getMessage)
    // ...whereas a tree whose deepest announced children are all fetch
    // misses settles fine at the same budget
    val noLeafB = bodies.filter(col("sm_url") =!= "http://h/leaf-b.xml")
    val shallow = CrawlFunctions.discoverSitemaps(robots, noLeafB, maxDepth = 2)
      .select(col("loc")).collect().map(_.getString(0)).toSet
    assert(shallow === Set("http://g/f1", "http://h/a1", "http://h/a2"))
  }

  test("discoverSitemaps: duplicate addresses — identical re-fetches collapse, differing bodies throw") {
    val robots = Seq(("h", "Sitemap: http://h/s.xml")).toDF("host", "body")
    // the same fetch twice: collapses, parses once
    val dup = Seq(
      ("http://h/s.xml", urlset("http://h/u1")),
      ("http://h/s.xml", urlset("http://h/u1"))).toDF("sm_url", "body")
    val got = CrawlFunctions.discoverSitemaps(robots, dup, maxDepth = 1)
      .select(col("loc")).collect().map(_.getString(0)).toSeq
    assert(got === Seq("http://h/u1"), "identical re-fetches must not fan out")
    // two DIFFERING bodies under one address: loud contract failure
    val conflicting = Seq(
      ("http://h/s.xml", urlset("http://h/u1")),
      ("http://h/s.xml", urlset("http://h/u2"))).toDF("sm_url", "body")
    val e = intercept[IllegalArgumentException] {
      CrawlFunctions.discoverSitemaps(robots, conflicting, maxDepth = 1)
    }
    assert(e.getMessage.contains("s.xml"), e.getMessage)
  }

  test("discoverSitemaps: mutually-referencing indices terminate (cycle guard)") {
    val robots = Seq(("h", "Sitemap: http://h/a.xml")).toDF("host", "body")
    val bodies = Seq(
      ("http://h/a.xml", index("http://h/b.xml") + "\n" + urlset("http://h/ua")),
      ("http://h/b.xml", index("http://h/a.xml") + "\n" + urlset("http://h/ub")))
      .toDF("sm_url", "body")
    val got = CrawlFunctions.discoverSitemaps(robots, bodies, maxDepth = 4)
      .select(col("depth"), col("loc"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got === Set((1, "http://h/ua"), (2, "http://h/ub")),
      "each address parses exactly once; the cycle never refetches")
  }
}
