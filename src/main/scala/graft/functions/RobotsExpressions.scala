package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation kernel (RFC 9309 / the Googlebot matcher's
  * documented behavior, context-free core):
  *
  *  - groups = consecutive `User-agent:` lines + the `Allow:`/`Disallow:`
  *    rules that follow (until the next UA line); rules before any UA
  *    line are ignored; `#` comments and unknown fields are ignored;
  *  - group selection: all groups whose UA token equals the crawler's
  *    product token (case-insensitive) — else all `*` groups; a specific
  *    match HIDES the `*` groups entirely (RFC §2.2.1);
  *  - rule match: `*` matches any char sequence, a TRAILING `$` anchors
  *    the match to the path end, otherwise a rule matches any PREFIX of
  *    the path; an empty rule value matches nothing;
  *  - decision: the longest matching rule (pattern length) wins; on a
  *    tie, allow wins; no matching rule → allowed.
  *
  * Deliberately out of scope (documented): percent-encoding
  * normalization of rule/path octets and UA-token *substring* fallbacks
  * some crawlers apply. A crawl pipeline's URL side should already be
  * [[graft.ops.Web.normalizeUrl]]d. `Crawl-delay` IS parsed (group-
  * scoped, last value in a group wins, [[RobotsCrawlDelay]]); `Sitemap`
  * is a GLOBAL directive and lives in [[graft.ops.Web.robotsSitemaps]]
  * as a plain column extraction instead.
  *
  * One robots file serves MANY URL rows after the host join, so parses
  * are memoized per thread (small LRU keyed by the robots text) — the
  * per-row work is one map probe plus the matcher loops.
  */
object RobotsTxt {

  final case class Rule(pattern: String, allow: Boolean)

  /** Parsed rules per agent-token (lowercased), plus the `*` group, plus
    * the group-scoped crawl delays (seconds; absent key = not declared).
    */
  final case class Parsed(
      byAgent: Map[String, Array[Rule]],
      star: Array[Rule],
      delayByAgent: Map[String, Double],
      delayStar: Option[Double])

  def parse(txt: String): Parsed = {
    val byAgent = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Rule]]
    val delays = scala.collection.mutable.HashMap.empty[String, Double]
    var currentAgents: List[String] = Nil
    var lastWasAgent = false
    txt.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            val token = value.toLowerCase
            // consecutive UA lines share one rule group; a UA line after
            // rules starts a NEW group
            currentAgents = if (lastWasAgent) token :: currentAgents else List(token)
            currentAgents.foreach(a => byAgent.getOrElseUpdate(a,
              scala.collection.mutable.ArrayBuffer.empty[Rule]))
            lastWasAgent = true
          case "allow" | "disallow" =>
            lastWasAgent = false
            // empty value matches nothing — drop the rule entirely
            if (value.nonEmpty) {
              val r = Rule(value, field == "allow")
              currentAgents.foreach(a => byAgent(a) += r)
            }
          case "crawl-delay" =>
            lastWasAgent = false
            // group member like allow/disallow; last value in a group
            // wins; an unparsable value is ignored like any unknown line
            try {
              val d = value.toDouble
              if (d >= 0 && !d.isNaN && !d.isInfinite)
                currentAgents.foreach(a => delays(a) = d)
            } catch { case _: NumberFormatException => }
          case _ => lastWasAgent = false
        }
      }
    }
    val m = byAgent.iterator.map { case (k, v) => k -> v.toArray }.toMap
    val dm = delays.toMap
    Parsed(m - "*", m.getOrElse("*", Array.empty), dm - "*", dm.get("*"))
  }

  /** Glob full-match: `*` = any sequence; no other metacharacters. */
  private def fullGlob(pat: String, s: String): Boolean = {
    var p = 0; var i = 0; var star = -1; var mark = 0
    while (i < s.length) {
      if (p < pat.length && pat.charAt(p) == '*') { star = p; mark = i; p += 1 }
      else if (p < pat.length && pat.charAt(p) == s.charAt(i)) { p += 1; i += 1 }
      else if (star >= 0) { p = star + 1; mark += 1; i = mark }
      else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** One rule against one path: trailing `$` anchors, otherwise prefix. */
  def ruleMatches(pattern: String, path: String): Boolean =
    if (pattern.endsWith("$")) fullGlob(pattern.dropRight(1), path)
    else fullGlob(pattern + "*", path)

  def allowed(parsed: Parsed, agent: String, path0: String): Boolean = {
    val rules = parsed.byAgent.getOrElse(agent.toLowerCase, parsed.star)
    val path = if (path0.isEmpty) "/" else path0
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.pattern.length >= bestLen && ruleMatches(r.pattern, path)) {
        if (r.pattern.length > bestLen) {
          bestLen = r.pattern.length
          bestAllow = r.allow
        } else if (r.allow) {
          bestAllow = true // tie: allow wins
        }
      }
      i += 1
    }
    bestAllow
  }

  /** Per-thread parse LRU: the robots column repeats per host after the
    * join, so the same few texts dominate each partition.
    */
  private val cache =
    new ThreadLocal[java.util.LinkedHashMap[String, Parsed]] {
      override def initialValue(): java.util.LinkedHashMap[String, Parsed] =
        new java.util.LinkedHashMap[String, Parsed](32, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Parsed]): Boolean = size() > 32
        }
    }

  /** Entry point for the expression (and generated code). */
  def allowedRaw(robots: UTF8String, agent: String, path: UTF8String): Boolean = {
    allowed(cachedParse(robots), agent, path.toString)
  }

  private def cachedParse(robots: UTF8String): Parsed = {
    val txt = robots.toString
    val c = cache.get()
    var parsed = c.get(txt)
    if (parsed == null) { parsed = parse(txt); c.put(txt, parsed) }
    parsed
  }

  /** Crawl delay for the agent, boxed (null = not declared). Group
    * selection mirrors [[allowed]]: a specific-agent group HIDES the `*`
    * groups entirely, so a specific group WITHOUT a delay yields null,
    * not the `*` delay — the same RFC 9309 §2.2.1 visibility rule the
    * allow/disallow matcher applies.
    */
  def delayRaw(robots: UTF8String, agent: String): java.lang.Double = {
    val parsed = cachedParse(robots)
    val a = agent.toLowerCase
    if (parsed.byAgent.contains(a) || parsed.delayByAgent.contains(a))
      parsed.delayByAgent.get(a).map(java.lang.Double.valueOf).orNull
    else parsed.delayStar.map(java.lang.Double.valueOf).orNull
  }
}

/** `robots_allowed(robots_txt, path)` for a fixed crawler agent token:
  * true when the robots rules permit fetching the path. Null when either
  * input is null (the engine-wide skip-null posture — a crawl pipeline
  * decides its own missing-robots policy with `coalesce`).
  */
case class RobotsAllowed(left: Expression, right: Expression, agent: String)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  override def nullSafeEval(robots: Any, path: Any): Any =
    RobotsTxt.allowedRaw(
      robots.asInstanceOf[UTF8String], agent, path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (r, p) =>
      s"${ev.value} = graft.functions.RobotsTxt.allowedRaw($r, $agentRef, $p);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `robots_crawl_delay(robots_txt)` for a fixed crawler agent token: the
  * group-scoped Crawl-delay in seconds, or null when the selected group
  * declares none (a politeness scheduler coalesces its own default).
  * Null input → null.
  */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override def nullSafeEval(robots: Any): Any = {
    val d = RobotsTxt.delayRaw(robots.asInstanceOf[UTF8String], agent)
    if (d == null) null else d.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, r => s"""
      java.lang.Double graftDelay = graft.functions.RobotsTxt.delayRaw($r, $agentRef);
      if (graftDelay == null) { ${ev.isNull} = true; }
      else { ${ev.value} = graftDelay.doubleValue(); }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
