package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.normalizeUrl(col("url"))).as[String].collect().toSeq

  test("normalizeUrl: case, www, default ports, tracking params, order, fragment") {
    val canonical = "http://site.com/p/1?a=1&b=2"
    assert(norm(
      "http://www.site.com/p/1?b=2&a=1",
      "HTTP://Site.COM:80/p/1?a=1&b=2&utm_source=x",
      "http://site.com/p/1?b=2&a=1&fbclid=zz#frag",
      "http://www.site.Com:80/p/1?a=1&b=2&gclid=g&ref=r"
    ) == Seq.fill(4)(canonical))
  }

  test("normalizeUrl: kept non-default ports, empty path, empty query, https") {
    assert(norm("https://cdn.site.co.uk:8443/x") == Seq("https://cdn.site.co.uk:8443/x"))
    assert(norm("https://site.com:443") == Seq("https://site.com/"))
    assert(norm("http://site.com:8080?z=1#f") == Seq("http://site.com:8080/?z=1"))
    assert(norm("http://site.com?utm_campaign=c") == Seq("http://site.com/"))
  }

  test("normalizeUrl: non-URL strings pass through unchanged; nulls stay null") {
    val junk = Seq("not a url", "ftp-ish:garbage", "", "/relative/path")
    assert(norm(junk: _*) == junk)
    val r = Seq((1L, null: String)).toDF("id", "url")
      .select(Web.normalizeUrl(col("url"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("userinfo is stripped from the authority everywhere") {
    // user:pass@ (often phishing bait in crawl columns) must not leak into
    // the host, the domain, or the canonical URL
    assert(norm("http://user:pw@www.Site.com:80/p?b=2&a=1") ==
      Seq("http://site.com/p?a=1&b=2"))
    assert(norm("https://u@site.co.uk/x") == Seq("https://site.co.uk/x"))
    val hosts = Seq("http://eve@WWW.Bank.com/login").toDF("url")
      .select(Web.urlHost(col("url"))).as[String].collect().toSeq
    assert(hosts == Seq("bank.com"))
  }

  test("urlHost and registrableDomain: suffix table and short hosts") {
    def dom(hosts: String*): Seq[String] = hosts.toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect().toSeq
    assert(dom("cdn.images.site.co.uk") == Seq("site.co.uk"))
    assert(dom("a.b.site.com") == Seq("site.com"))
    assert(dom("site.com") == Seq("site.com"))
    assert(dom("localhost") == Seq("localhost"))
    assert(dom("x.com.au") == Seq("x.com.au")) // exactly eTLD+1 already
    val hosts = Seq("https://WWW.Site.COM:443/a?x=1").toDF("url")
      .select(Web.urlHost(col("url"))).as[String].collect().toSeq
    assert(hosts == Seq("site.com"))
  }

  test("resolveUrl: absolute, scheme-relative, root, query, fragment, relative") {
    val base = "https://www.Site7.com:443/a/b/page.html?k=1#top"
    def res(href: String): String =
      Seq((base, href)).toDF("b", "h")
        .select(Web.resolveUrl(col("b"), col("h"))).as[String].head()
    assert(res("https://ext.org/x") == "https://ext.org/x")
    assert(res("mailto:a@b.c") == "mailto:a@b.c")
    assert(res("//cdn.net/l") == "https://cdn.net/l")
    assert(res("/rooted") == "https://www.site7.com:443/rooted")
    assert(res("?q=2") == "https://www.site7.com:443/a/b/page.html?q=2")
    assert(res("#frag") == "https://www.site7.com:443/a/b/page.html?k=1")
    assert(res("") == "https://www.site7.com:443/a/b/page.html?k=1")
    assert(res("rel/y") == "https://www.site7.com:443/a/b/rel/y")
    assert(res("  spaced  ") == "https://www.site7.com:443/a/b/spaced")
    // base with no path directory: dir is '/'
    val rootBase = Seq(("https://h.com", "x")).toDF("b", "h")
      .select(Web.resolveUrl(col("b"), col("h"))).as[String].head()
    assert(rootBase == "https://h.com/x")
    // a non-URL base refuses (null), as do null inputs
    val junk = Seq(("not a url", "/x")).toDF("b", "h")
      .select(Web.resolveUrl(col("b"), col("h"))).collect()
    assert(junk.head.isNullAt(0))
    val nullHref = Seq((base, null: String)).toDF("b", "h")
      .select(Web.resolveUrl(col("b"), col("h"))).collect()
    assert(nullHref.head.isNullAt(0))
  }

  test("Psl.parse: comments, blanks, trailing junk, case, kinds, bare *") {
    val psl = Web.Psl.parse(Seq(
      "// the list", "", "COM  // inline comment", "co.uk", "*.CK",
      "!www.ck", "*", "  ac.jp\t", "uk"))
    assert(psl.exact == Map(1 -> Seq("com", "uk"), 2 -> Seq("co.uk", "ac.jp")))
    assert(psl.wildcard == Map(1 -> Seq("ck")))
    assert(psl.exception == Map(2 -> Seq("www.ck")))
  }

  private val specPsl = Web.Psl.parse(Seq("com", "uk", "co.uk", "*.ck", "!www.ck"))

  private def pslDom(psl: Web.Psl, hosts: String*): Seq[String] = {
    val df = hosts.toDF("h")
    val viaExpr = df.select(Web.registrableDomainPsl(col("h"), psl))
      .as[String].collect().toSeq
    val viaJoin = Web.withRegistrableDomain(df, "h", "d", psl)
      .select("d").as[String].collect().toSeq
    assert(viaExpr == viaJoin,
      s"expression and join forms diverge: $viaExpr vs $viaJoin")
    viaExpr
  }

  test("PSL semantics: wildcard, exception, longest match, default rule") {
    // wildcard *.ck: any <label>.ck is a public suffix
    assert(pslDom(specPsl, "b.x.ck") == Seq("b.x.ck"))
    assert(pslDom(specPsl, "deep.b.x.ck") == Seq("b.x.ck"))
    assert(pslDom(specPsl, "x.ck") == Seq("x.ck")) // host IS a public suffix
    assert(pslDom(specPsl, "ck") == Seq("ck"))
    // exception !www.ck overrides the wildcard: ps = ck
    assert(pslDom(specPsl, "www.ck") == Seq("www.ck"))
    assert(pslDom(specPsl, "sub.www.ck") == Seq("www.ck"))
    // longest match: co.uk (2 labels) beats uk (1 label)
    assert(pslDom(specPsl, "a.b.co.uk") == Seq("b.co.uk"))
    assert(pslDom(specPsl, "b.co.uk") == Seq("b.co.uk"))
    assert(pslDom(specPsl, "plain.uk") == Seq("plain.uk"))
    // default rule: unknown TLD → last two labels
    assert(pslDom(specPsl, "foo.bar.unknown") == Seq("bar.unknown"))
    assert(pslDom(specPsl, "localhost") == Seq("localhost"))
    assert(pslDom(specPsl, "") == Seq(""))
  }

  test("Psl.Default reproduces the legacy registrableDomain exactly") {
    val hosts = Seq("cdn.images.site.co.uk", "a.b.site.com", "site.com",
      "localhost", "x.com.au", "w.co.za", "deep.er.co.jp", "")
    val legacy = hosts.toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect().toSeq
    assert(pslDom(Web.Psl.Default, hosts: _*) == legacy)
  }

  test("withRegistrableDomain plans broadcast joins only — no shuffle") {
    val df = Seq("a.b.co.uk", "x.ck").toDF("h")
    val plan = Web.withRegistrableDomain(df, "h", "d", specPsl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"PSL lookup must not shuffle:\n$plan")
  }

  test("sitemapUrls: entries, index detection, entity decode, malformed inputs") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://ex.com/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
        |  <!-- <url><loc>https://ex.com/commented-out</loc></url> -->
        |  <url>
        |    <loc>
        |      https://ex.com/b
        |    </loc>
        |  </url>
        |  <url><priority>0.9</priority></url>
        |</urlset>""".stripMargin
    val index =
      "<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc></sitemap>" +
        "<SITEMAP><LOC>https://ex.com/s2.xml</LOC><LASTMOD>2025-12-31</LASTMOD></SITEMAP>" +
        "</sitemapindex>"
    val df = Seq(
      (1L, urlset), (2L, index),
      (3L, "<html><body>soft 404</body></html>"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "xml")
    val rows = Web.sitemapUrls(df, "id", "xml")
      .as[(Long, Int, String, String, Boolean)].collect().sortBy(r => (r._1, r._2))
    // doc 1: comment dropped, loc-less entry dropped, seq renumbers; the
    // entity and the whitespace both normalize
    assert(rows.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "https://ex.com/a?x=1&y=2", "2026-01-01", false),
      (1L, 1, "https://ex.com/b", null, false)))
    // doc 2: child sitemaps tagged is_index, case-insensitive tags
    assert(rows.filter(_._1 == 2L).toSeq == Seq(
      (2L, 0, "https://ex.com/s1.xml", null, true),
      (2L, 1, "https://ex.com/s2.xml", "2025-12-31", true)))
    // HTML and null contribute nothing
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L))
  }

  test("urlPathQuery: path+query for robots matching, scheme-case-proof") {
    val got = Seq(
      "http://h.com/a/b?x=1#frag",
      "HTTPS://Ext.com/private/x", // resolveUrl passes absolute hrefs verbatim
      "http://h.com",
      "ftp+ssh://h/x",
      "not a url")
      .toDF("u").select(Web.urlPathQuery(col("u"))).as[String].collect().toSeq
    assert(got == Seq("/a/b?x=1", "/private/x", "/", "/x", "/"))
  }

  test("urlDedup groups normalization-equivalent spellings, min-id keeper") {
    val df = Seq(
      (10L, "http://www.site.com/p?b=2&a=1"),
      (7L, "http://site.com:80/p?a=1&b=2&utm_medium=m"),
      (3L, "https://other.org/q"),
      (99L, "http://site.com/p?a=1&b=2#z"),
      (5L, "not a url"),
      (6L, "not a url")
    ).toDF("id", "url")
    val got = Web.urlDedup(df, "id", "url")
      .as[(String, Long, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got("http://site.com/p?a=1&b=2") == ((7L, 3L)))
    assert(got("https://other.org/q") == ((3L, 1L)))
    assert(got("not a url") == ((5L, 2L))) // garbage dedups among itself
    assert(got.size == 3)
  }
}
