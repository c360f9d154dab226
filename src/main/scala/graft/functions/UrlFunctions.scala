package graft.functions

import org.apache.spark.sql.Column
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

  /** Canonical form: scheme/host lowercased, trailing host dot dropped,
    * default ports (`http:80`, `https:443`) dropped, trailing path
    * slashes dropped (root `/` kept), tracking params removed, remaining
    * query params sorted bytewise, fragment dropped. Path and query
    * VALUES keep their case (paths are case-sensitive per RFC 3986).
    * Non-matching input → NULL.
    */
  def normalizeUrl(u: Column): Column = {
    val scheme = lower(part(u, 1))
    val host = regexp_replace(lower(part(u, 2)), "\\.$", "")
    val port = part(u, 3)
    val isDefaultPort = (scheme === "http" && port === ":80") ||
      (scheme === "https" && port === ":443")
    val portN = when(port === "" || isDefaultPort, lit("")).otherwise(port)
    val rawPath = part(u, 4)
    val pathN = when(rawPath === "/", rawPath)
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val params = filter(split(regexp_replace(part(u, 5), "^\\?", ""), "&"),
      p => !(p === "" || p.startsWith("utm_") ||
        TrackingExact.map(t => p === t || p.startsWith(t + "=")).reduce(_ || _)))
    val queryN = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(params), "&")))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portN, pathN, queryN))
  }

  /** Lowercased host (trailing dot dropped); NULL for non-matching input. */
  def urlHost(u: Column): Column = {
    val host = regexp_replace(lower(part(u, 2)), "\\.$", "")
    when(part(u, 1) === "", lit(null).cast("string")).otherwise(host)
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
