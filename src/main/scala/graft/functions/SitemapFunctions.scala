package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap protocol (sitemaps.org) parsing — the discovery half of the
  * crawl front door: robots.txt says what MAY be fetched
  * ([[RobotsFunctions]]), sitemaps say what EXISTS and how fresh it is.
  * Relational parse, pure column expressions (block explode + per-tag
  * regexp over RE2-safe lazy patterns), so the DuckDB oracle replays it
  * exactly; scan-shaped — a sitemap file is one row, its URL entries
  * explode in place, nothing shuffles.
  *
  * Scope: `<urlset>` URL entries (loc required; lastmod kept as the W3C
  * datetime string; priority defaulted to 0.5 per spec, junk values
  * treated as absent) and `<sitemapindex>` child references. XML entity
  * escapes in loc (`&amp;` first in escaping order, so LAST in decode
  * order) are decoded; full XML (CDATA, namespaces-with-prefixes) is out
  * of contract — sitemap generators emit the flat canonical form.
  */
object SitemapFunctions {

  /** Decode the five XML predefined entities (amp last). */
  private def xmlUnescape(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Text of the first `<tag>…</tag>` inside a block ('' when absent).
    * Whitespace-trimmed with a regex (SQL `trim` strips spaces only —
    * pretty-printed sitemaps wrap loc values in newline + indent). */
  private def tagText(block: Column, tag: String): Column =
    regexp_replace(regexp_extract(block, s"(?s)<$tag>(.*?)</$tag>", 1),
      "^\\s+|\\s+$", "")

  /** One row per `<url>` entry of a urlset sitemap. Input columns are
    * kept (minus the body); adds (loc, lastmod, priority). Entries with
    * no/empty `<loc>` are dropped — a sitemap row without a URL is noise. */
  def sitemapUrls(df: DataFrame, bodyCol: String): DataFrame = {
    val b = SamplingFunctions.tempCol(df, "__sm_block")
    val withBlocks = df.withColumn(b,
      explode(regexp_extract_all(col(bodyCol), lit("(?s)<url>(.*?)</url>"), lit(1))))
    val loc = xmlUnescape(tagText(col(b), "loc"))
    val lastmod = tagText(col(b), "lastmod")
    val prio = tagText(col(b), "priority")
    withBlocks
      .withColumn("loc", loc)
      .filter(col("loc") =!= "")
      .withColumn("lastmod",
        when(lastmod === "", lit(null).cast("string")).otherwise(lastmod))
      .withColumn("priority",
        when(prio.rlike("^[0-9]+(\\.[0-9]+)?$"), prio.cast("double"))
          .otherwise(lit(0.5)))
      .drop(b, bodyCol)
  }

  /** One row per `<sitemap>` child of a sitemapindex — crawl these next.
    * Adds (child_loc); input columns kept (minus the body). */
  def sitemapChildren(df: DataFrame, bodyCol: String): DataFrame = {
    val b = SamplingFunctions.tempCol(df, "__sm_child")
    df.withColumn(b,
        explode(regexp_extract_all(col(bodyCol), lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))))
      .withColumn("child_loc", xmlUnescape(tagText(col(b), "loc")))
      .filter(col("child_loc") =!= "")
      .drop(b, bodyCol)
  }
}
