package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL handling for crawl corpora (beyond-reference, SURVEY.md §2.4):
  * host extraction and per-domain rollups — the keys for domain
  * blocklists, per-domain caps ([[Splits.capPerGroup]]) and per-domain
  * quality reports ([[Profile.corpusProfile]]).
  *
  * Pure narrow `regexp_extract` (codegen'd, zero shuffle); the pattern
  * stays in the Java∩RE2 subset so the p56 gate replays it in DuckDB.
  * This is syntactic host parsing — scheme, userinfo, port and path are
  * stripped; no public-suffix-list lookup (that table is a join the
  * caller owns). Bracketed IPv6 authorities (`http://[::1]/`) are not
  * parsed (the host class stops at ':'); crawl corpora key on registered
  * domains, where this never occurs — a caller who needs IPv6 literals
  * owns that regex.
  */
object Urls {

  /** `https://user@www.Ex.com:8080/p?q#f` → `www.ex.com` (lower-cased
    * host; empty string when nothing host-like is present — null only
    * for null input, so the column stays groupBy-safe). */
  def extractHost(url: Column): Column =
    lower(regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Host with one leading `www.` label dropped: the standard
    * domain-grouping normalization (`www.ex.com` and `ex.com` are the
    * same publisher). */
  def normalizedDomain(url: Column): Column =
    regexp_replace(extractHost(url), "^www\\.", "")

  /** One row per normalized domain with doc count — the blocklist /
    * cap-sizing report. One map-side-combinable shuffle on the domain. */
  def domainCounts(df: DataFrame, urlCol: String): DataFrame =
    df.select(normalizedDomain(col(s"`$urlCol`")).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))

  /** Absolute-URL splitter: group 1 scheme, 2 userinfo, 3 host, 4 port,
    * 5 path, 6 query (fragment must already be stripped). Java∩RE2. */
  private val UrlPat =
    "^([A-Za-z][A-Za-z0-9+.-]*)://(?:([^/@?#]*)@)?([^/:?#]*)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?"

  /** Query parameters dropped by [[canonicalizeUrl]]: the cross-site
    * tracking set (utm_* campaign tags, Google/Facebook/Microsoft click
    * ids, Mailchimp/Instagram share ids) — parameters that vary per
    * click without changing the fetched content, the #1 source of
    * spurious URL-level duplicates in crawl frontiers. */
  private val TrackingPat =
    "^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid)(=.*)?$"

  /** Crawl-frontier URL canonicalization — the syntactic normal form
    * under which two URLs fetch the same resource: lowercase scheme and
    * host (RFC 3986 §6.2.2.1), strip the fragment (never sent to the
    * server), strip default ports (http:80, https:443), normalize an
    * empty path to "/", drop tracking query parameters
    * ([[TrackingPat]]) and empty params, and sort the surviving params
    * byte-lexicographically (order is almost never semantic; sorting
    * merges permuted duplicates). Userinfo, non-default ports, path
    * text and param VALUES are preserved verbatim — this is the safe
    * subset, not an aggressive rewriter (no dot-segment or percent
    * normalization, no www-stripping — compose with
    * [[normalizedDomain]] for domain keys).
    *
    * Non-absolute inputs (no scheme://) pass through trimmed; NULL stays
    * NULL. Pure codegen'd string surgery in the Java∩RE2 subset — zero
    * shuffle, and the p106 DuckDB oracle replays every rule. */
  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#[\\s\\S]*", "")
    def g(i: Int) = regexp_extract(u, UrlPat, i)
    val scheme = lower(g(1))
    val auth = g(2)
    val host = lower(g(3))
    val port = g(4)
    val path = g(5)
    val query = g(6)
    val keptQ = array_join(array_sort(filter(split(query, "&"),
      x => x =!= "" && !x.rlike(TrackingPat))), "&")
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    when(scheme === "", trim(url))
      .otherwise(concat(scheme, lit("://"),
        when(auth === "", lit("")).otherwise(concat(auth, lit("@"))),
        host, portPart,
        when(path === "", lit("/")).otherwise(path),
        when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ))))
  }

  /** One row per canonical URL with doc count — the frontier-dedup
    * report ("how many crawled variants collapse onto each resource").
    * One map-side-combinable shuffle on the canonical string. */
  def canonicalCounts(df: DataFrame, urlCol: String): DataFrame =
    df.select(canonicalizeUrl(col(s"`$urlCol`")).as("canonical_url"))
      .groupBy(col("canonical_url")).agg(count(lit(1)).as("n_docs"))
}
