package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl URL operations — the curation steps that run BEFORE content
  * dedup in a crawl pipeline (CommonCrawl-style corpora dedup by
  * canonical URL first, and per-domain anti-dominance caps key on the
  * registrable domain):
  *
  *  - [[normalizeUrl]]: canonical form for URL-keyed dedup — lowercase
  *    scheme/host, `www.` stripped, default ports dropped, fragment
  *    dropped, tracking params removed, remaining query params sorted,
  *    empty path normalized to `/`;
  *  - [[urlHost]] / [[registrableDomain]]: host and eTLD+1-style domain
  *    extraction (embedded multi-label suffix subset — see the scaladoc);
  *  - [[urlDedup]]: exact dedup by canonical URL (min-id representative).
  *
  * Everything is built from Spark BUILTIN column functions (regexp /
  * array / higher-order) — whole-stage-codegen'd, no UDFs — and each rule
  * is mirrored token-for-token in the DuckDB oracles (uq1/uq2), so the
  * normalization SEMANTICS are hash-gated, not just the plumbing.
  *
  * Scale shape: normalization is a per-row projection (fused into the
  * scan); dedup is one `groupBy(canonical)` with map-side partial
  * aggregation, so a pathologically duplicated URL (the crawl frontier
  * bug shape) partially aggregates before the shuffle instead of hot-
  * keying a reducer.
  */
object Web {

  /** Tracking-parameter names dropped by [[normalizeUrl]]: the de-facto
    * standard strip set (Google/Facebook click ids, UTM campaign tags,
    * bare ref) used by crawl canonicalizers.
    */
  val TrackingParamPattern = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** Multi-label public suffixes recognized by [[registrableDomain]]. A
    * full public-suffix list is thousands of entries and changes monthly;
    * this embedded subset covers the common ccTLD second-level registries
    * and is the EXTENSION POINT — pass a fuller set for production PSL
    * fidelity. Single-label suffixes (com, org, …) need no table: they
    * are the default "last two labels" rule.
    */
  val DefaultMultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([^:/?#]+)://", 1))

  /** Authority with any userinfo (`user:pass@`) stripped: `http://u@h/`
    * must resolve to host `h`, not `u@h` — crawl columns carry such URLs
    * (often phishing bait) and a host/domain keyed on the raw authority
    * would mis-bucket them. Mirrored in the uq oracles.
    */
  private def authorityOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)), "^[^@]*@", "")

  private def portOf(auth: Column): Column =
    regexp_extract(auth, ":([0-9]+)$", 1)

  private def bareHostOf(auth: Column): Column =
    regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")

  /** Normalized host of a URL: lowercase, `www.` and any port stripped.
    * Empty string for a URL with no `scheme://` authority.
    */
  def urlHost(url: Column): Column = bareHostOf(authorityOf(url))

  /** Canonical URL for dedup keys. Rules (each mirrored in the uq1
    * oracle): lowercase scheme + host; strip `www.`; drop the port when
    * it is the scheme default (http:80 / https:443), keep any other;
    * drop the fragment; drop tracking params ([[TrackingParamPattern]]);
    * sort surviving query params bytewise; `''` path → `/`. Non-URL
    * strings (no `scheme://`) pass through unchanged — refuse-don't-
    * guess, like the media codecs: a crawl column always carries some
    * garbage and a "normalizer" that mangles it would destroy the join
    * key for downstream triage.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val auth = authorityOf(url)
    val port = portOf(auth)
    val host = bareHostOf(auth)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val path = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val normPath = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(
      split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val normQuery = array_join(array_sort(params), "&")
    val rebuilt = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      normPath,
      when(normQuery =!= "", concat(lit("?"), normQuery)).otherwise(lit("")))
    when(scheme === "", url).otherwise(rebuilt)
  }

  /** Registrable (eTLD+1-style) domain of a normalized host: the last two
    * labels, or three when the last two form a known multi-label suffix
    * (`suffixes`); hosts with fewer labels pass through. The column feeds
    * [[Corpus]]' per-group dominance caps and domain mixtures.
    */
  def registrableDomain(
      host: Column,
      suffixes: Seq[String] = DefaultMultiLabelSuffixes): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(n <= 2, host)
      .otherwise(when(last2.isin(suffixes: _*), last3).otherwise(last2))
  }

  /** Resolve an href against its page's base URL — the step between
    * [[Html.extractLinks]] and the frontier/link-graph ops. RFC 3986-lite,
    * as builtin expressions (each branch mirrored in the wq3 oracle):
    * absolute URLs (any `scheme:`) pass through; `//host/x` adopts the
    * base scheme; `/x` is origin-relative; `?q` replaces the base query;
    * `#f` and `''` resolve to the base (fragment-stripped); anything else
    * joins the base path's directory. Dot-segment (`../`) normalization
    * is deliberately NOT performed — downstream keys go through
    * [[normalizeUrl]], and a crawl graph keyed on host/domain (the
    * [[Graph]] ops) is insensitive to path dots. Hrefs are trimmed; a
    * base without `scheme://` yields null (refuse-don't-guess).
    */
  def resolveUrl(base: Column, href: Column): Column = {
    val h = trim(href)
    val scheme = schemeOf(base)
    val auth = authorityOf(base)
    val origin = concat(scheme, lit("://"), auth)
    val basePath = regexp_extract(base, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val baseNoFrag = concat(origin, basePath,
      when(regexp_extract(base, "\\?([^#]*)", 1) =!= "",
        concat(lit("?"), regexp_extract(base, "\\?([^#]*)", 1)))
        .otherwise(lit("")))
    // directory of the base path: up to and including the last '/', or
    // '/' when the path has none
    val baseDir = when(basePath.rlike("/"),
      regexp_replace(basePath, "/[^/]*$", "/")).otherwise(lit("/"))
    val resolved =
      when(h === "" || h.startsWith("#"), baseNoFrag)
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(h.startsWith("//"), concat(scheme, lit(":"), h))
        .when(h.startsWith("/"), concat(origin, h))
        .when(h.startsWith("?"), concat(origin, basePath, h))
        .otherwise(concat(origin, baseDir, h))
    when(base.isNull || h.isNull, lit(null).cast("string"))
      .when(scheme === "", lit(null).cast("string"))
      .otherwise(resolved)
  }

  /** A compiled public-suffix list: rule suffixes bucketed by kind and
    * label count, ready for [[registrableDomainPsl]] (chained-expression
    * lookup) and [[withRegistrableDomain]] (broadcast-join lookup). Parse
    * the real list with [[Psl.parse]]; [[Psl.Default]] compiles the
    * embedded [[DefaultMultiLabelSuffixes]] subset and reproduces
    * [[registrableDomain]] exactly.
    *
    * @param exact     label count → plain-rule suffixes ("co.uk" → 2)
    * @param wildcard  BASE label count → wildcard bases ("ck" for `*.ck`):
    *                  a host matching `<label>.<base>` has that whole form
    *                  as its public suffix
    * @param exception label count → exception domains ("www.ck" for
    *                  `!www.ck`): the public suffix is the exception
    *                  MINUS its leftmost label
    */
  final case class Psl(
      exact: Map[Int, Seq[String]],
      wildcard: Map[Int, Seq[String]],
      exception: Map[Int, Seq[String]]) {
    /** Public-suffix sizes (in labels) any rule here can produce, largest
      * first — the priority order of the longest-match scan.
      */
    private[Web] def ruleSizes: Seq[Int] =
      (exact.keys ++ wildcard.keys.map(_ + 1)).toSeq.distinct.sorted.reverse
  }

  object Psl {
    /** Parse the public-suffix-list format (publicsuffix.org/list/): one
      * rule per line, `//` comments and blank lines skipped, rules
      * lowercased, `*.` prefix → wildcard, `!` prefix → exception. The
      * implicit default rule `*` (public suffix = last label) is built
      * into the lookup, so a literal `*` line is ignored. Entries are
      * treated as opaque labels — punycode (`xn--…`) passes through; feed
      * the list's punycode section when hosts are punycoded.
      */
    def parse(lines: IterableOnce[String]): Psl = {
      val exact = scala.collection.mutable.ArrayBuffer.empty[String]
      val wild = scala.collection.mutable.ArrayBuffer.empty[String]
      val exc = scala.collection.mutable.ArrayBuffer.empty[String]
      lines.iterator.foreach { raw =>
        // a rule ends at the first whitespace (the official list carries
        // trailing comments on some lines)
        val line = raw.trim.takeWhile(!_.isWhitespace).toLowerCase
        if (line.nonEmpty && !line.startsWith("//") && line != "*") {
          if (line.startsWith("!")) exc += line.drop(1)
          else if (line.startsWith("*.")) wild += line.drop(2)
          else exact += line
        }
      }
      def byLabels(xs: Seq[String]): Map[Int, Seq[String]] =
        xs.distinct.groupBy(s => s.count(_ == '.') + 1)
      Psl(byLabels(exact.toSeq), byLabels(wild.toSeq), byLabels(exc.toSeq))
    }

    /** The embedded default: [[DefaultMultiLabelSuffixes]] as plain rules
      * (single-label TLDs need no entry — they are the built-in default
      * rule). Behavior-identical to [[registrableDomain]]'s `isin` form.
      */
    val Default: Psl = Psl(
      exact = Map(2 -> DefaultMultiLabelSuffixes),
      wildcard = Map.empty, exception = Map.empty)
  }

  private def hostParts(host: Column): Column = split(host, "\\.")

  /** Last `k` labels of the host joined back with dots — the candidate
    * suffix the rule tables match against. Caller guards `k <= n`.
    */
  private def lastLabels(parts: Column, k: Int): Column =
    array_join(slice(parts, -k, k), ".")

  /** PSL public-suffix label count for a host, as a when-chain over the
    * compiled rule buckets: exceptions first (they override wildcards by
    * definition), then candidate public-suffix sizes longest-first, then
    * the default rule (last label). Pure builtin expressions.
    */
  private def psLabelsExpr(parts: Column, n: Column, psl: Psl): Column = {
    val excCases: Seq[(Column, Column)] =
      psl.exception.toSeq.sortBy(-_._1).map { case (k, ds) =>
        ((n >= k) && lastLabels(parts, k).isin(ds: _*)) -> lit(k - 1)
      }
    val ruleCases: Seq[(Column, Column)] = psl.ruleSizes.map { s =>
      val conds = Seq(
        psl.exact.get(s).map(e => lastLabels(parts, s).isin(e: _*)),
        psl.wildcard.get(s - 1).map(w => lastLabels(parts, s - 1).isin(w: _*))
      ).flatten
      ((n >= s) && conds.reduce(_ || _)) -> lit(s)
    }
    (excCases ++ ruleCases)
      .foldLeft(Option.empty[Column]) {
        case (None, (c, v)) => Some(when(c, v))
        case (Some(acc), (c, v)) => Some(acc.when(c, v))
      }
      .map(_.otherwise(lit(1))).getOrElse(lit(1))
  }

  private def domainFromPs(host: Column, parts: Column, n: Column, ps: Column): Column =
    when(n <= ps, host)
      .otherwise(array_join(slice(parts, (ps + 1) * -1, ps + 1), "."))

  /** Registrable domain under a full PSL (wildcards `*.ck`, exceptions
    * `!www.ck`, longest-match) as ONE builtin expression — the drop-in
    * upgrade of [[registrableDomain]] when rule-set fidelity matters.
    * Chained `isin` lookups: right for the embedded default and for
    * modest custom lists (≤ a few hundred rules). For the REAL ~10k-rule
    * list the expression tree (and its per-row set probes) outgrows
    * codegen — use [[withRegistrableDomain]], which compiles the same
    * semantics to broadcast hash joins.
    */
  def registrableDomainPsl(host: Column, psl: Psl = Psl.Default): Column = {
    val parts = hostParts(host)
    val n = size(parts)
    domainFromPs(host, parts, n, psLabelsExpr(parts, n, psl))
  }

  /** [[registrableDomainPsl]] compiled to BROADCAST HASH JOINS — the
    * 100 TB form for the full official list: one tiny broadcast rule
    * table per (label-count) bucket, each left-joined on the host's
    * last-k-labels candidate (map-side only, NO shuffle), then the same
    * exception-first longest-match when-chain over the matched flags.
    * Appends `outCol`; `_psl*` working columns are dropped.
    */
  def withRegistrableDomain(
      df: DataFrame, hostCol: String, outCol: String,
      psl: Psl = Psl.Default): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = hostParts(col(hostCol))
    val n = size(parts)
    val ks = (psl.exact.keys ++ psl.wildcard.keys ++ psl.exception.keys)
      .toSeq.distinct.sorted
    val joined = ks.foldLeft(df) { (cur, k) =>
      val rules = (
        psl.exact.getOrElse(k, Nil).map((_, false, true, false)) ++
          psl.wildcard.getOrElse(k, Nil).map((_, false, false, true)) ++
          psl.exception.getOrElse(k, Nil).map((_, true, false, false)))
        .groupBy(_._1).map { case (s, rs) =>
          (s, rs.exists(_._2), rs.exists(_._3), rs.exists(_._4))
        }.toSeq
      val rt = broadcast(
        rules.toDF(s"_psl_sfx$k", s"_psl_exc$k", s"_psl_exa$k", s"_psl_wld$k"))
      cur.withColumn(s"_psl_sfx$k", when(n >= k, lastLabels(parts, k)))
        .join(rt, Seq(s"_psl_sfx$k"), "left")
    }
    def flag(name: String): Column = coalesce(col(name), lit(false))
    val excCases = psl.exception.keys.toSeq.sorted.reverse
      .map(k => flag(s"_psl_exc$k") -> lit(k - 1))
    val ruleCases = psl.ruleSizes.map { s =>
      val conds = Seq(
        if (psl.exact.contains(s)) Some(flag(s"_psl_exa$s")) else None,
        if (psl.wildcard.contains(s - 1)) Some(flag(s"_psl_wld${s - 1}"))
        else None).flatten
      conds.reduce(_ || _) -> lit(s)
    }
    val ps = (excCases ++ ruleCases)
      .foldLeft(Option.empty[Column]) {
        case (None, (c, v)) => Some(when(c, v))
        case (Some(acc), (c, v)) => Some(acc.when(c, v))
      }
      .map(_.otherwise(lit(1))).getOrElse(lit(1))
    joined
      .withColumn(outCol, domainFromPs(col(hostCol), parts, n, ps))
      .drop(ks.flatMap(k => Seq(s"_psl_sfx$k", s"_psl_exc$k", s"_psl_exa$k",
        s"_psl_wld$k")): _*)
  }

  /** Exact URL-keyed dedup: one row per DISTINCT canonical URL with the
    * min-id representative and the duplicate count — the URL-first pass a
    * crawl pipeline runs before any content dedup. Non-null garbage URLs
    * (values that do not normalize to a `scheme://` form) keep their raw
    * string as the key, so they dedup among themselves instead of
    * vanishing; NULL urls normalize to null and are EXCLUDED from the
    * output (spec-pinned) — a pipeline that needs null-row accounting
    * should count them upstream, since a shared null key would otherwise
    * collapse unrelated rows into one fake duplicate group. One shuffle,
    * map-side partial agg (hot URLs combine before the exchange).
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("canonical_url"))
      .where(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(
        min(col(idCol)).as("keeper_id"),
        count(lit(1)).cast("bigint").as("n_dups"))

  /** Path + query of a URL (`/a/b?x=1` for `http://h/a/b?x=1#f`), the
    * robots-matching input per RFC 9309 (which matches on path and query,
    * never the fragment); an empty path reads as `/`. Shared by the cq7
    * discovery pipeline and its scale arm so the rule can't drift between
    * the gate and the bench.
    */
  def urlPathQuery(url: Column): Column =
    coalesce(
      // RFC 3986 scheme charset, case-insensitive: resolveUrl passes
      // absolute hrefs through verbatim, so an uppercase-scheme URL must
      // still yield its real path — a '/' fallback here would let a
      // robots-disallowed URL through the filter
      nullif(
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1),
        lit("")),
      lit("/"))

  /** `Sitemap:` directives of a robots.txt, in file order, as
    * `array<string>` — the discovery pointer that feeds
    * [[sitemapUrls]] (fetch robots → collect these → fetch + parse each).
    * Per the sitemaps.org protocol the directive is GLOBAL (not scoped to
    * a User-agent group, unlike allow/disallow — which is why this is a
    * plain column extraction rather than part of the
    * `robots_allowed` group-selection expression) and the key is
    * case-insensitive; values are absolute URLs, passed through trimmed.
    * Empty array when none; null for null input.
    */
  def robotsSitemaps(robotsTxt: Column): Column =
    regexp_extract_all(robotsTxt,
      lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)"), lit(1))

  /** The five XML character entities — the only escaping the sitemap
    * protocol allows inside `<loc>` (sitemaps.org: data values "must be
    * entity-escaped"), decoded after extraction.
    */
  private[graft] val XmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&amp;" -> "&")

  private def decodeXmlEntities(c: Column): Column =
    XmlEntities.foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** Sitemap-protocol entries of one XML document (sitemaps.org profile:
    * `<urlset>` of `<url>` entries, or a `<sitemapindex>` of `<sitemap>`
    * entries) as `array<struct<loc, lastmod, is_index>>` in document
    * order. `loc` is trimmed and XML-entity-decoded (the protocol requires
    * `&`→`&amp;` escaping in URLs); `lastmod` is the raw W3C datetime
    * string or null when absent; `is_index = true` rows are CHILD SITEMAP
    * references (feed them back to the fetcher), `false` rows are page
    * URLs (feed them to the frontier / [[normalizeUrl]]). Entries with no
    * `<loc>` drop. Tolerant, regex-profile parsing — same posture as the
    * big crawlers' sitemap readers and [[Html]]: XML comments are dropped
    * first, tag case is ignored, and anything that is not a recognizable
    * entry contributes nothing (an HTML error page yields an empty
    * array). Builtin-function codegen throughout — no UDFs, no XML
    * library — and mirrored rule for rule in the uq5 DuckDB oracle.
    */
  def sitemapEntries(xml: Column): Column = {
    val cleaned = regexp_replace(xml, "(?s)<!--.*?-->", " ")
    // full <url>/<sitemap> elements in document order (group 0 — RE2-safe
    // close-tag alternation instead of a backreference, so the DuckDB
    // mirror is the same regex); <sitemap\b does not match <sitemapindex
    val elems = regexp_extract_all(
      cleaned,
      lit("(?is)<(?:url|sitemap)\\b[^>]*>.*?</(?:url|sitemap)\\s*>"),
      lit(0))
    // NB Spark's trim() strips only spaces — sitemap generators pretty-
    // print locs onto their own lines, so trim ALL whitespace by regex
    def wsTrim(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")
    filter(
      transform(elems, e => {
        val loc = wsTrim(decodeXmlEntities(
          regexp_extract(e, "(?is)<loc\\b[^>]*>(.*?)</loc\\s*>", 1)))
        val lastmod = wsTrim(
          regexp_extract(e, "(?is)<lastmod\\b[^>]*>(.*?)</lastmod\\s*>", 1))
        struct(
          loc.as("loc"),
          nullif(lastmod, lit("")).as("lastmod"),
          lower(e).startsWith("<sitemap").as("is_index"))
      }),
      s => s.getField("loc") =!= "")
  }

  /** Exploded sitemap surface: one row per entry —
    * `(idCol, seq, loc, lastmod, is_index)`, `seq` = 0-based document
    * order. Documents with no recognizable entries (fetch errors, HTML)
    * contribute no rows; null XML is skipped. The crawl-discovery join
    * point: `is_index` rows go back to the fetch queue, the rest meet
    * [[urlDedup]] / `robots_allowed` on the way to the frontier.
    */
  def sitemapUrls(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    df.select(col(idCol), posexplode(sitemapEntries(col(xmlCol))).as(Seq("seq", "_e")))
      .select(
        col(idCol), col("seq"),
        col("_e.loc").as("loc"),
        col("_e.lastmod").as("lastmod"),
        col("_e.is_index").as("is_index"))
}
