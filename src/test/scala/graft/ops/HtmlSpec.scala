package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  // thresholds sized for short spec fixtures
  private val rules = Html.BoilerplateRules(
    minChars = 20, maxLinkDensity = 0.2, minStopwordRatio = 0.1)

  private def main(html: String): String =
    Seq(html).toDF("h").select(Html.htmlMainText(col("h"), rules))
      .as[String].head()

  private def all(html: String): String =
    Seq(html).toDF("h").select(Html.htmlText(col("h"))).as[String].head()

  private def title(html: String): String =
    Seq(html).toDF("h").select(Html.htmlTitle(col("h"))).as[String].head()

  test("htmlTitle: commented-out and script-embedded titles never win over the real one") {
    assert(title("<!-- <title>Old draft</title> -->" +
      "<head><title>Real Title</title></head>") == "Real Title")
    assert(title("<script>document.write('<title>js</title>')</script>" +
      "<head><title>Real</title></head>") == "Real")
    // but the real title INSIDE head still extracts (the drop pattern must
    // not include <head>, unlike the text paths')
    assert(title("<head><title>Kept</title></head><body>x</body>") == "Kept")
    assert(title("<body>no title</body>") == "")
  }

  test("baseHref: quote styles, first wins, no-href base ignored, comments dropped") {
    def base(html: String): Option[String] =
      Seq(html).toDF("h").select(Html.baseHref(col("h")))
        .as[Option[String]].head()
    assert(base("<base href=\"https://a/\">") contains "https://a/")
    assert(base("<base target='_top' href='/x/'>") contains "/x/")
    assert(base("<base href=/bare/>") contains "/bare/")
    // first base wins (the HTML rule); later ones are ignored
    assert(base("<base href='/one/'><base href='/two/'>") contains "/one/")
    // a base with no href contributes nothing; commented-out base ignored
    assert(base("<base target='_blank'>").isEmpty)
    assert(base("<!-- <base href='/evil/'> --><p>x</p>").isEmpty)
    assert(base("no base here").isEmpty)
    // effectiveBase falls back to the fetched URI, resolves relative bases
    val eb = Seq(("http://h.com/a/p.html", "<base href='sub/'>"))
      .toDF("u", "h")
      .select(Html.effectiveBase(col("u"), col("h"))).as[String].head()
    assert(eb == "http://h.com/a/sub/")
  }

  test("content survives; nav, footer, script, style, head, comments go") {
    val html =
      """<!DOCTYPE html><html><head><title>The Page</title>
        |<style>p { color: red; }</style><script src="a.js"></script></head>
        |<body><!-- tracking pixel --><nav><a href="/">Home</a> <a href="/x">More</a></nav>
        |<div><p>the quick brown fox jumps over the lazy dog in a summer field</p>
        |<P CLASS="c">it is a truth universally acknowledged that a reader wants text</P></div>
        |<script>if (1 < 2) { document.write("</p>"); }</script>
        |<footer><a href="/about">About</a> &copy; 2026</footer></body></html>""".stripMargin
    assert(main(html) ==
      "the quick brown fox jumps over the lazy dog in a summer field\n" +
        "it is a truth universally acknowledged that a reader wants text")
    assert(title(html) == "The Page")
    // htmlText keeps the boilerplate blocks but still drops script/style/
    // head content and comments ("color: red", "tracking pixel" absent)
    val t = all(html)
    assert(t.contains("Home More"))
    assert(t.contains("&copy; 2026"))
    assert(!t.contains("color"))
    assert(!t.contains("tracking"))
    assert(!t.contains("document.write"))
  }

  test("entities decode in order; unknown entities pass through") {
    val html = "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y &copy; &amp;lt;</p>"
    // &amp;lt; is the AUTHOR escaping a literal "&lt;" — must decode to
    // &lt;, not double-decode to <
    assert(all(html) == "a & b <tag> \"q\" 's' x y &copy; &lt;")
  }

  test("malformed markup degrades gracefully, never errors") {
    // unclosed tags, stray <, orphan close, unterminated comment
    assert(all("<div><p>one fine sentence here") == "one fine sentence here")
    // the generic tag-strip eats "< sign and 3 >" as one pseudo-tag —
    // regex-level fidelity, pinned so a behavior change is a conscious one
    assert(all("text with a stray < sign and 3 > 2 math") ==
      "text with a stray 2 math")
    assert(all("</div>orphan close</p>") == "orphan close")
    // unterminated comment: the drop pattern needs `-->`, so the opener
    // survives to the tag-strip, which needs `>` — the "<!--" prefix stays
    // as literal text (pinned, mirror-identical)
    assert(all("<!-- never closed <p>hidden</p>") == "<!-- never closed\nhidden")
    assert(all("") == "")
    val r = Seq((1, null: String)).toDF("id", "h")
      .select(Html.htmlMainText(col("h"), rules)).collect()
    assert(r.head.isNullAt(0))
  }

  test("nested blocks segment; uppercase and attribute-laden tags match") {
    val html = "<DIV data-x=\"1\"><UL><LI>it is the first of the points here" +
      "</LI><LI>it is the second of the points here</LI></UL></DIV>"
    assert(main(html) ==
      "it is the first of the points here\nit is the second of the points here")
  }

  test("link density: anchor-heavy blocks drop even when long and stopword-rich") {
    val linky = "<p>" + (1 to 8).map(i =>
      s"""<a href="/$i">the link number $i of the set</a>""").mkString(" ") + "</p>"
    assert(main(linky) == "")
    // same text without anchors is kept
    val plain = "<p>" + (1 to 8).map(i => s"the link number $i of the set").mkString(" ") + "</p>"
    assert(main(plain).nonEmpty)
  }

  test("stopword ratio and length gates") {
    // long but stopword-free (menu-speak) drops
    assert(main("<p>products pricing downloads careers contact imprint privacy terms sitemap</p>") == "")
    // short fragment drops
    assert(main("<p>the of a to</p>") == "")
  }

  test("htmlBlocks surfaces per-block signals with the same verdicts") {
    val html =
      """<nav><a href="/">Home</a> <a href="/x">More</a></nav>
        |<p>it is a long enough sentence with the stopwords it needs to pass</p>""".stripMargin
    val rows = Html.htmlBlocks(
        Seq((7L, html)).toDF("id", "h"), "id", "h", rules)
      .orderBy("block_idx")
      .select("block_idx", "block_text", "kept")
      .as[(Int, String, Boolean)].collect().toSeq
    assert(rows.length == 2)
    assert(rows(0)._2 == "Home More" && !rows(0)._3)
    assert(rows(1)._3)
    // the kept text equals htmlMainText's output
    assert(rows(1)._2 == main(html))
  }

  test("extractLinks: quote styles, unquoted, commented-out, scripts, order") {
    val html =
      """<a href="/one">1</a> <A HREF='/two'>2</A> <a class=x href=/three>3</a>
        |<a href="">empty</a> <a name="anchor-no-href">n</a>
        |<!-- <a href="/commented">c</a> --><script>var s='<a href="/scripted">';</script>
        |<a
        |  href="/multi&#10;line">4</a>""".stripMargin
    val links = Seq(html).toDF("h").select(Html.extractLinks(col("h")))
      .as[Seq[String]].head()
    assert(links == Seq("/one", "/two", "/three", "", "/multi&#10;line"))
    // null html -> null; no links -> empty array
    assert(Seq("<p>no links</p>").toDF("h")
      .select(Html.extractLinks(col("h"))).as[Seq[String]].head() == Seq())
    val r = Seq((1, null: String)).toDF("id", "h")
      .select(Html.extractLinks(col("h"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("title: absent, entity-laden, attribute-laden") {
    assert(title("<html><body><p>x</p></body></html>") == "")
    assert(title("<title lang=\"en\"> A &amp; B </title>") == "A & B")
  }
}
