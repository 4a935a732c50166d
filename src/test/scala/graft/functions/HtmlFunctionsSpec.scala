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

  test("native fused extractor ≡ regex-chain specification (bit parity)") {
    import spark.implicits._
    val edge = Seq(
      "", "   ", "plain text no markup",
      "<!-- unclosed comment swallows nothing",
      "<!--a--><!--b-->kept<!---->",
      "<!--->tricky<!----->ok",
      "<scripts>not a script element</scripts>",
      "<script>x</script  >after space-close",
      "<SCRIPT a=b>upper</ScRiPt><style>s</STYLE >",
      "<script>no close tag keeps this text",
      "<script><style>inner</style></script>outer",
      "<style>a</style>mid<style>b</style>",
      "a < b unmatched angle", "trailing open <div",
      "&amp;lt; &amp;amp; &nbsp;&nbsp; &#39;q&apos;",
      "&nbsp", "&unknown; passes through",
      "tab\there\nnewlinevt\ffeed\rcr",
      "<a href=x>link</a> <p>para</p>",
      "<script src=\"a.js\"></script><p>after empty script</p>")
    val rnd = new scala.util.Random(77)
    val frags = Seq("<p>", "</p>", "<div class=x>", "</div>", "<script>",
      "</script>", "<script >", "</script >", "<style>", "</style>",
      "<!--", "-->", "&lt;", "&amp;", "&nbsp;", "&amp;lt;", "word", " ",
      "\n", "<", ">", "<a href=/x>", "</a>", "text with spaces", "<br>")
    val fuzz = (0 until 300).map { _ =>
      (0 until 3 + rnd.nextInt(25)).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString
    }
    val all = (edge ++ fuzz :+ pageA :+ pageC).toDF("h")
    val mismatch = all.select(
        HtmlFunctions.htmlToText(col("h")).as("native"),
        HtmlFunctions.htmlToTextSpec(col("h")).as("spec"),
        HtmlFunctions.stripTags(col("h")).as("nstrip"),
        HtmlFunctions.stripTagsSpec(col("h")).as("sstrip"),
        HtmlFunctions.dropInvisible(col("h")).as("ndrop"),
        HtmlFunctions.dropInvisibleSpec(col("h")).as("sdrop"),
        HtmlFunctions.mainText(col("h")).as("nmain"),
        HtmlFunctions.mainTextSpec(col("h")).as("smain"),
        col("h"))
      .filter(col("native") =!= col("spec") || col("nstrip") =!= col("sstrip")
        || col("ndrop") =!= col("sdrop") || col("nmain") =!= col("smain"))
      .collect()
    assert(mismatch.isEmpty, mismatch.take(3).map(_.mkString(" | ")).mkString("\n"))
  }

  test("native mainText ≡ HOF specification on density-rule-shaped fuzz") {
    import spark.implicits._
    // block-tag-heavy fragments: anchors, near-threshold lengths, nested
    // and unclosed block tags, case variants — the shapes the density
    // rule actually discriminates on
    val rnd = new scala.util.Random(101)
    val words = Seq("data", "cube", "pipeline", "shard", "corpus", "token")
    def sentence(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    val frags = Seq("<p>", "</p>", "<DIV>", "</div>", "<br>", "<li>", "</LI>",
      "<h2 class=t>", "</h2>", "<hr/>", "<table>", "</table>", "<pre>", "</pre>",
      "<a href=/x>", "</a>", "<a>", "</a >", "<abbr>", "<preface>", "<px>",
      "<header>", "</header>", "<nav>", "</nav>", "&amp;", "&lt;", " ")
    val fuzz = (0 until 300).map { _ =>
      (0 until 4 + rnd.nextInt(20)).map(_ =>
        if (rnd.nextBoolean()) frags(rnd.nextInt(frags.length))
        else sentence(1 + rnd.nextInt(10))).mkString(" ")
    }
    val battery = Seq(pageA, pageC,
      "<div><a href=x>" + "link words here " * 10 + "</a></div>",
      "<p>" + "exactly twenty-five ch!" + "</p>", // near the threshold
      "<p>0123456789012345678901234</p>",          // 25 chars exactly
      "<p>012345678901234567890123</p>")           // 24 chars: drops
    val all = (fuzz ++ battery).toDF("h")
    val mismatch = all.select(
        HtmlFunctions.mainText(col("h")).as("n"),
        HtmlFunctions.mainTextSpec(col("h")).as("s"), col("h"))
      .filter(col("n") =!= col("s")).collect()
    assert(mismatch.isEmpty, mismatch.take(3).map(_.mkString(" | ")).mkString("\n"))
    // and at a non-default threshold
    val m2 = all.select(HtmlFunctions.mainText(col("h"), 8).as("n"),
        HtmlFunctions.mainTextSpec(col("h"), 8).as("s"))
      .filter(col("n") =!= col("s")).collect()
    assert(m2.isEmpty)
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

  test("extractLinks: quote styles, missing href, nested tags, commented-out anchors") {
    import spark.implicits._
    val html = Seq(
      "<html><body>" +
      "<a href=\"/dq\">Double <b>bold</b> quoted</a>" +
      "<a href='/sq'>single&amp;quoted</a>" +
      "<a href=/bare>bare</a>" +
      "<a name=anchor-only>no href</a>" +
      "<A HREF=\"/UP\" class=x>upper tag</A>" +
      "<!-- <a href=\"/ghost\">commented out</a> -->" +
      "<script>var s = '<a href=\"/js\">script link</a>';</script>" +
      "</body></html>").toDF("html")
    val got = html.select(explode(HtmlFunctions.extractLinks(col("html"))).as("l"))
      .select(col("l.href"), col("l.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("/dq", "Double bold quoted"),
      ("/sq", "single&quoted"),
      ("/bare", "bare"),
      ("/UP", "upper tag")))
  }

  test("decodeBody: charset param, meta sniff, fallback, replacement, audit column") {
    import spark.implicits._
    def dec(payload: Array[Byte], ct: Option[String]): (String, String) = {
      val df = Seq((payload, ct)).toDF("payload", "ct")
        .select(
          HtmlFunctions.decodeBody(col("payload"), col("ct")).as("txt"),
          HtmlFunctions.bodyCharset(col("payload"), col("ct")).as("cs"))
      val r = df.head(); (r.getString(0), r.getString(1))
    }
    // 1. header charset parameter wins (quoted, mixed case)
    val iso = "café niña".getBytes("ISO-8859-1")
    assert(dec(iso, Some("text/html; charset=\"ISO-8859-1\"")) ===
      (("café niña", "ISO-8859-1")))
    // the same bytes UNDECLARED route through the validity heuristic:
    // 0xE9 alone is malformed UTF-8, so the page decodes as
    // Windows-1252 (which agrees with latin-1 on these bytes) — the
    // audit column shows the heuristic, not the header, decided
    assert(dec(iso, Some("text/html")) === (("café niña", "windows-1252")))
    // 2. Windows-1252 curly quotes live in ISO-8859-1's control gap
    val w = "“quoted” — dash".getBytes("windows-1252")
    assert(dec(w, Some("text/html; charset=windows-1252")) ===
      (("“quoted” — dash", "windows-1252")))
    // 3. meta sniff (http-equiv form) when the header has no parameter;
    //    content-type may be NULL entirely (missing header)
    val sniffed = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head>" +
      "<body>…</body></html>").getBytes("windows-1252")
    assert(dec(sniffed, None)._2 === "windows-1252")
    assert(dec(sniffed, None)._1.contains("…"))
    // 4. unknown charset name falls back to UTF-8, loudly in the audit col
    assert(dec("plain ascii".getBytes("US-ASCII"),
      Some("text/html; charset=klingon-9")) === (("plain ascii", "UTF-8")))
    // 5. malformed bytes under the resolved charset replace, never throw
    val bad = Array[Byte]('o', 'k', ' ', 0xC3.toByte) // truncated UTF-8 pair
    assert(dec(bad, Some("text/html; charset=utf-8"))._1 === "ok �")
    // 6. GBK round-trips through the JVM registry
    val gbk = "数据".getBytes("GBK")
    assert(dec(gbk, Some("text/html; charset=gbk")) === (("数据", "GBK")))
    // 7. null payload stays null (nullSafeEval contract)
    val nulls = Seq((Option.empty[Array[Byte]], Option("text/html")))
      .toDF("payload", "ct")
      .select(HtmlFunctions.decodeBody(col("payload"), col("ct")).as("t"))
    assert(nulls.head().isNullAt(0))
  }

  test("undeclared-page heuristic: valid UTF-8 stays UTF-8, broken UTF-8 goes Windows-1252, declared names bypass it") {
    import spark.implicits._
    def dec(payload: Array[Byte], ct: Option[String]): (String, String) = {
      val r = Seq((payload, ct)).toDF("payload", "ct")
        .select(HtmlFunctions.decodeBody(col("payload"), col("ct")).as("txt"),
          HtmlFunctions.bodyCharset(col("payload"), col("ct")).as("cs"))
        .head()
      (r.getString(0), r.getString(1))
    }
    // undeclared + valid multi-byte UTF-8 → UTF-8 (the heuristic must
    // not misroute genuine UTF-8 pages to cp1252)
    assert(dec("naïve café — 数据".getBytes("UTF-8"), Some("text/html")) ===
      (("naïve café — 数据", "UTF-8")))
    // undeclared pure ASCII validates as UTF-8
    assert(dec("just ascii".getBytes("US-ASCII"), None) ===
      (("just ascii", "UTF-8")))
    // undeclared + cp1252 punctuation in the 0x80–0x9F gap → the
    // WET-extractor default, decoded losslessly instead of U+FFFD soup
    assert(dec("“smart” — dash €".getBytes("windows-1252"), Some("text/html")) ===
      (("“smart” — dash €", "windows-1252")))
    // a DECLARED-but-unknown name still falls back to UTF-8 (replacement
    // chars and all): the heuristic is scoped to the undeclared path,
    // so the q202 bogus-charset record's pinned md5 stays reachable
    val legacy = "café".getBytes("ISO-8859-1")
    val (bogusTxt, bogusCs) = dec(legacy, Some("text/html; charset=klingon-9"))
    assert(bogusCs === "UTF-8" && bogusTxt.contains("�"))
    // the UTF-8 validity scanner itself: RFC 3629 edges
    val V = graft.expr.BodyDecode
    assert(V.isValidUtf8("plain".getBytes("US-ASCII")))
    assert(V.isValidUtf8("数据 naïve".getBytes("UTF-8")))
    assert(V.isValidUtf8("😀".getBytes("UTF-8"))) // 4-byte emoji
    assert(!V.isValidUtf8(Array(0xC0.toByte, 0xAF.toByte))) // overlong '/'
    assert(!V.isValidUtf8(Array(0xE0.toByte, 0x80.toByte, 0x80.toByte))) // overlong NUL
    assert(!V.isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate D800
    assert(!V.isValidUtf8(Array(0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte))) // > U+10FFFF
    assert(!V.isValidUtf8(Array('a'.toByte, 0xC3.toByte))) // truncated pair
    assert(!V.isValidUtf8(Array(0x92.toByte))) // bare cp1252 right-quote
    assert(V.isValidUtf8(Array(0xF0.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte))) // U+10000
  }
}
