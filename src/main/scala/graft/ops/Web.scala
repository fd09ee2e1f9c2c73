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
}
