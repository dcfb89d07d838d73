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
}
