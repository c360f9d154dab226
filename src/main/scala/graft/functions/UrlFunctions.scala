package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines — the dedup key and
  * per-site grouping key every crawl-derived dataset needs before any
  * exact/near dedup runs (the same page is crawled as `HTTP://Site.com/a`,
  * `http://site.com:80/a?utm_source=feed`, `http://site.com/a#top`, …).
  * Pure `Column` expression chains over Spark's codegen'd built-ins
  * (regexp_extract / split / filter / array_sort) — no UDF, stays inside
  * whole-stage codegen, trivially map-only at any corpus size.
  *
  * Grammar handled (the RFC 3986 absolute-URL subset web crawls emit):
  * `scheme://host[:port][/path][?query][#fragment]`. Inputs that do not
  * match (no scheme, relative refs) normalize to NULL — fail-null, never
  * fail-wrong, so malformed rows are countable and quarantinable
  * downstream (the S2 permissive-ingest discipline).
  */
object UrlFunctions {

  /** Capture groups: 1 scheme, 2 host, 3 :port, 4 path, 5 ?query, 6 #frag. */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Click-tracking parameters stripped during normalization: the
    * `utm_*` family (Urchin/Google Analytics) plus the common per-network
    * click ids. Kept deliberately small and documented — normalization
    * must be stable across pipeline versions or dedup keys shift.
    */
  private val TrackingExact = Seq("fbclid", "gclid", "msclkid", "igshid", "ref")

  private def part(u: Column, group: Int): Column =
    regexp_extract(u, UrlRe, group)

  /** The five URL capture groups extracted ONCE into a struct. Composing
    * `normalizeUrl`/`urlHost` as one Column repeats
    * `regexp_extract(u, UrlRe, k)` at every use site (Catalyst inlines
    * shared subtrees), which blew the generated projection past the JVM
    * 64 KB method limit and dropped the whole stage out of whole-stage
    * codegen. Materializing this struct in its own narrow `select` first
    * (see [[withUrlColumns]]) keeps each regex evaluated once —
    * `CollapseProject` refuses to inline non-cheap producer expressions
    * referenced more than once, so the two Projects survive and fuse into
    * a single codegen stage.
    */
  def urlParts(u: Column): Column = struct(
    part(u, 1).as("scheme_raw"),
    part(u, 2).as("host_raw"),
    part(u, 3).as("port_raw"),
    part(u, 4).as("path_raw"),
    part(u, 5).as("query_raw"))

  /** Tracking-param removal as ONE regex pass over the raw query string:
    * a param is dropped when its name is `utm_*` or an exact member of
    * [[TrackingExact]] (a name PREFIX like `refx` survives — the `(?=&|$)`
    * lookahead plus the optional `=value` arm reproduce the exact/`name=`
    * match rule). Regex instead of `filter(split(...), lambda)` because
    * higher-order-function lambdas are CodegenFallback in Spark — one HOF
    * in the projection drops the entire stage out of whole-stage codegen.
    */
  private val TrackingRe =
    "(?:^|&)(?:utm_[^=&]*|" + TrackingExact.mkString("|") + ")(?:=[^&]*)?(?=&|$)"

  /** Canonical URL from a materialized [[urlParts]] struct column. Built
    * exclusively from codegen'd expressions (regexp/split/sort_array) —
    * no HOF lambdas — so the projection stays inside whole-stage codegen.
    */
  def normalizeFromParts(p: Column): Column = {
    val scheme = lower(p.getField("scheme_raw"))
    val host = regexp_replace(lower(p.getField("host_raw")), "\\.$", "")
    val port = p.getField("port_raw")
    val isDefaultPort = (scheme === "http" && port === ":80") ||
      (scheme === "https" && port === ":443")
    val portN = when(port === "" || isDefaultPort, lit("")).otherwise(port)
    val rawPath = p.getField("path_raw")
    val pathN = when(rawPath === "/", rawPath)
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    // strip '?', drop tracking params, collapse the separators they leave
    // behind (leading/trailing/doubled '&' — also removes empty params)
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(p.getField("query_raw"), "^\\?", ""),
          TrackingRe, ""),
        "&&+", "&"),
      "^&+|&+$", "")
    val queryN = when(cleaned === "", lit(""))
      .otherwise(concat(lit("?"), array_join(sort_array(split(cleaned, "&")), "&")))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portN, pathN, queryN))
  }

  /** Lowercased host (trailing dot dropped) from a [[urlParts]] struct. */
  def hostFromParts(p: Column): Column = {
    val host = regexp_replace(lower(p.getField("host_raw")), "\\.$", "")
    when(p.getField("scheme_raw") === "", lit(null).cast("string"))
      .otherwise(host)
  }

  /** Canonical form: scheme/host lowercased, trailing host dot dropped,
    * default ports (`http:80`, `https:443`) dropped, trailing path
    * slashes dropped (root `/` kept), tracking params removed, remaining
    * query params sorted bytewise, fragment dropped. Path and query
    * VALUES keep their case (paths are case-sensitive per RFC 3986).
    * Non-matching input → NULL.
    *
    * Single-Column convenience form — fine for one output column, but
    * composing it with [[urlHost]]/[[registrableDomain]] in one projection
    * duplicates the regex work; batch pipelines should use
    * [[withUrlColumns]], which shares the extraction.
    */
  def normalizeUrl(u: Column): Column = normalizeFromParts(urlParts(u))

  /** Lowercased host (trailing dot dropped); NULL for non-matching input. */
  def urlHost(u: Column): Column = hostFromParts(urlParts(u))

  /** Adds canonical-URL, host, and registrable-domain columns in three
    * stacked narrow Projects (parts struct → norm/host → domain-from-host)
    * so each regex group is extracted once and every derivation reads an
    * attribute, not a repeated subtree. All three Projects fuse into one
    * whole-stage-codegen span — map-only, no exchange, at any corpus size.
    */
  def withUrlColumns(df: DataFrame, urlCol: String, normCol: String = "norm_url",
      hostCol: String = "host", domainCol: String = "domain"): DataFrame = {
    val clash = Seq(normCol, hostCol, domainCol).filter(df.columns.contains)
    require(clash.isEmpty,
      s"output column(s) already present in input: ${clash.mkString(", ")} — " +
        "pass different normCol/hostCol/domainCol names")
    // collision-free temp name: a fixed literal would shadow (and the
    // later col() reference would be ambiguous against) an input column
    val tmpName = Iterator.from(0).map(i => s"_url_parts$i")
      .find(n => !df.columns.contains(n)).get
    val base = df.columns.map(col).toSeq
    val p = col(tmpName)
    df.select(base :+ urlParts(col(urlCol)).as(tmpName): _*)
      .select(base ++ Seq(normalizeFromParts(p).as(normCol),
        hostFromParts(p).as(hostCol)): _*)
      .select(base ++ Seq(col(normCol), col(hostCol),
        registrableDomain(col(hostCol)).as(domainCol)): _*)
  }

  /** Registrable domain (the per-site grouping key) from a lowercased
    * host, by heuristic: the last two labels, or three when the
    * second-level label is a generic suffix (`co`, `com`, `net`, `org`,
    * `gov`, `ac`, `edu`) under a two-character ccTLD — covering the
    * `co.uk` / `com.au` / `ac.jp` family without shipping the full
    * public-suffix list (which updates monthly and belongs in a
    * broadcast table, not code — callers with the list should join it
    * instead). Hosts with a single label (e.g. `localhost`) and IPv4
    * literals pass through unchanged.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = get(labels, n - 1)
    val second = get(labels, n - 2)
    val ipv4 = host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    val genericSld =
      second.isin("co", "com", "net", "org", "gov", "ac", "edu")
    val take = when(n >= 3 && length(tld) === 2 && genericSld, lit(3))
      .otherwise(least(n, lit(2)))
    when(host.isNull, lit(null).cast("string"))
      .when(ipv4 || n <= 1, host)
      .otherwise(array_join(slice(labels, n - take + 1, take), "."))
  }
}
