package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: expected strings below are PINNED from the
  * independent python replay (scripts/gen_warc_fixture.py prints them) —
  * the Scala expressions and the python spec implementation were written
  * against the same documented rules, never against each other. */
class HtmlFunctionsSpec extends SparkSpec {

  private def run(f: Column => Column, html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(f(col("h")).as("t")).head().getString(0)
  }

  // the fixture pages, byte-identical to gen_warc_fixture.py's literals
  private val pageA =
    """<!DOCTYPE html><html><head><title>Corpus page one</title>
<style type="text/css">body { color: #fff; } .x { display: none }</style>
<script src="app.js"></script>
<script type="text/javascript">var tracker = "do not extract"; if (1 < 2) { go(); }</script>
</head><body>
<!-- navigation chrome -->
<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About the site</a></li></ul></nav>
<div class="main"><h1>Observation networks &amp; data cubes</h1>
<p>Earth observation archives grow by petabytes every year, and the
pipelines that clean them decide what models can learn.</p>
<P>Deduplication, language identification &lt;and&gt; quality scoring run
before any tokenizer sees a byte &mdash; order matters.</P>
</div>
<footer><a href="/terms">Terms</a> &middot; <a href="/privacy">Privacy</a></footer>
</body></html>"""

  private val pageC =
    """<html><body><p>Short.</p>
<p>An unclosed script below keeps its text by design:</p>
<script>var broken = true;
<p>visible because the script never closed</p>
</body></html>"""

  test("htmlToText: closed scripts/styles/comments drop, entities decode") {
    val t = run(HtmlFunctions.htmlToText(_), pageA)
    assert(!t.contains("do not extract") && !t.contains("color"))
    assert(!t.contains("navigation chrome"))
    assert(t.contains("Observation networks & data cubes"))
    assert(t.contains("language identification <and> quality scoring"))
    // undecoded numeric/exotic entities pass through (documented subset)
    assert(t.contains("&mdash;"))
  }

  test("htmlToText: an UNCLOSED script keeps its text (pinned)") {
    assert(run(HtmlFunctions.htmlToText(_), pageC) ==
      "Short. An unclosed script below keeps its text by design: " +
        "var broken = true; visible because the script never closed")
  }

  test("entity decode order: amp last, so &amp;lt; yields literal &lt;") {
    assert(run(HtmlFunctions.htmlToText(_), "<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(run(HtmlFunctions.htmlToText(_), "<p>a &lt; b &nbsp;&quot;c&quot;</p>")
      == "a < b \"c\"")
  }

  test("mainText: density rule keeps prose, drops nav/footer (pinned)") {
    assert(run(c => HtmlFunctions.mainText(c), pageA) ==
      "Observation networks & data cubes\n" +
        "Earth observation archives grow by petabytes every year, and the " +
        "pipelines that clean them decide what models can learn.\n" +
        "Deduplication, language identification <and> quality scoring run " +
        "before any tokenizer sees a byte &mdash; order matters.")
  }

  test("mainText: short blocks and the unclosed-script block drop (pinned)") {
    assert(run(c => HtmlFunctions.mainText(c), pageC) ==
      "An unclosed script below keeps its text by design:\n" +
        "visible because the script never closed")
  }

  test("link density: a long-enough block of links still drops") {
    val linkFarm = "<div>" +
      (1 to 8).map(i => s"""<a href="/$i">partner site number $i</a>""")
        .mkString(" ") + "</div>"
    assert(run(c => HtmlFunctions.mainText(c), linkFarm) == "")
    // same text NOT inside anchors is kept
    val prose = "<div>" +
      (1 to 8).map(i => s"partner site number $i").mkString(" ") + "</div>"
    assert(run(c => HtmlFunctions.mainText(c), prose).nonEmpty)
  }

  test("blockStats: per-block chars and link_chars are consistent") {
    import spark.implicits._
    val rows = Seq(pageA).toDF("h")
      .select(explode(HtmlFunctions.blockStats(col("h"))).as("b"))
      .select(col("b.text"), col("b.chars"), col("b.link_chars"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getString(0).length)
      assert(r.getInt(2) <= r.getInt(1)) // anchor text ⊆ block text
    }
  }
}
