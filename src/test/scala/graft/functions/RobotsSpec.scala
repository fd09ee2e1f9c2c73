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

  test("kernel: glob matcher corner cases") {
    assert(RobotsTxt.ruleMatches("/a*b$", "/aXXb"))
    assert(!RobotsTxt.ruleMatches("/a*b$", "/aXXbc"))
    assert(RobotsTxt.ruleMatches("/a*b", "/aXXbc")) // prefix without anchor
    assert(RobotsTxt.ruleMatches("/*", "/anything"))
    assert(RobotsTxt.ruleMatches("/a**b", "/ab"))
    assert(!RobotsTxt.ruleMatches("/a", "/b"))
  }
}
