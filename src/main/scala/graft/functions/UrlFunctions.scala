package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction for crawl curation —
  * the normalization pass that makes URL-level dedup and per-domain
  * operators ([[graft.operators.CorpusMix.capPerGroup]], domain mixing)
  * meaningful on raw crawl metadata, where the same page appears as
  * `HTTP://Example.com:80/a?utm_source=x#top` and `http://example.com/a`.
  *
  * Canonical form (the common-crawl-style subset every rule of which is
  * order-insensitive for a URL that is already canonical — the function is
  * idempotent):
  *   1. fragment dropped;
  *   2. scheme and authority lowercased (path/query case preserved);
  *   3. default ports stripped (`:80` for http, `:443` for https);
  *   4. tracking parameters removed (`utm_*`, `gclid`, `fbclid`), the `?`
  *      dropped when nothing survives;
  *   5. a single `/` immediately before the query or at the end dropped.
  *
  * Everything is a chain of RE2-safe `regexp_replace`/`regexp_extract`
  * expressions — codegen'd, no UDF, narrow, and replayable verbatim by the
  * DuckDB oracle (no lookarounds; Spark `$n` vs DuckDB `\n` replacement
  * syntax is the only dialect difference).
  *
  * Registered domain: last two host labels, or last three when the host
  * ends in a pinned set of common two-level public suffixes (`co.uk`,
  * `com.au`, ...). A full Public Suffix List is data, not code — swap
  * [[TwoLevelSuffixes]] for a PSL-derived broadcast set in production; the
  * heuristic covers the common cases and is deliberately small enough to
  * inline into a codegen'd expression.
  */
object UrlFunctions {

  /** Pinned two-level public suffixes (PSL's most common entries). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "com.au", "net.au",
    "com.br", "co.in", "com.cn", "co.kr", "co.za", "com.mx", "com.ar",
    "com.tr", "co.id")

  private val TrackingParams = "(?:utm_[A-Za-z0-9_]*|gclid|fbclid)"

  /** The canonical URL (rules in the object scaladoc). Null-safe: null in,
    * null out; a string with no `scheme://` prefix passes through rules
    * 1/4/5 only (nothing to lowercase or de-port).
    */
  def canonicalizeUrl(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*", "")
    // 2. lowercase scheme://authority (everything before the first /?# past
    //    the scheme); path and query keep their case
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(prefix),
      noFrag.substr(length(prefix) + 1, lit(Int.MaxValue)))
    // 3. default ports (host already lowercased)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    // 4. tracking params: non-first, then first-with-successor, then lone
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, s"&$TrackingParams=[^&]*", ""),
        s"\\?$TrackingParams=[^&]*&", "?"),
      s"\\?$TrackingParams=[^&]*$$", "")
    // 5. single slash before the query (anchored to the FIRST '?' — the
    //    real query boundary, not a literal '?' inside a query value) or
    //    at the end
    regexp_replace(regexp_replace(noTrack, "^([^?]*)/\\?", "$1?"), "/$", "")
  }

  /** Lowercased host of the URL (authority minus userinfo and port). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)", 1))

  /** Registered domain of the URL's host (see object scaladoc); null when
    * the URL has no `scheme://host` shape.
    */
  def registeredDomain(url: Column): Column = {
    val host = urlHost(url)
    val parts = split(host, "\\.")
    val n = size(parts)
    // when() evaluates branches lazily, so single-label hosts (localhost)
    // never hit the out-of-bounds element_at(-2)
    val lastTwo = when(n >= 2,
      concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(host)
    val take = when(lastTwo.isin(TwoLevelSuffixes: _*) && n > 2, lit(3))
      .otherwise(lit(2))
    when(host === "" || host.isNull, lit(null).cast("string"))
      .otherwise(when(n <= take, host)
        .otherwise(concat_ws(".", slice(parts, n - take + 1, take))))
  }
}
