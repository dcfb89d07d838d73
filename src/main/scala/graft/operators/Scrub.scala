package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora (beyond-reference, SURVEY.md §2.4):
  * regex redaction of emails, IPv4 addresses and long digit runs — the
  * standard public pre-training hygiene pass (e.g. the C4/ROOTS-style
  * cleanups). Purely narrow, codegen'd `regexp_replace` chains: zero
  * shuffle, zero state, safe to push to 100 TB of scans unchanged.
  *
  * Patterns stay inside the regex subset Java and RE2 agree on
  * (character classes, bounded repetition, non-capturing groups, `\b`),
  * so results are engine-portable — the p23 gate replays them in DuckDB.
  */
object Scrub {

  /** (pattern, replacement) pairs applied in order. Order matters: emails
    * go first so their digits are not partially eaten by the digit-run
    * rule; IPs before digit runs for the same reason. */
  val defaultRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{9,}\\b" -> "<NUM>")

  /** Apply `rules` left-to-right to one column (global replacement). */
  def redact(c: Column, rules: Seq[(String, String)] = defaultRules): Column =
    rules.foldLeft(c) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }

  /** Redact `textCol` in place; `flagCol`, when set, records whether any
    * rule fired (cheap downstream filter for "docs that contained PII"). */
  def redactColumn(
      df: DataFrame,
      textCol: String,
      rules: Seq[(String, String)] = defaultRules,
      flagCol: Option[String] = None): DataFrame = {
    val c = col(s"`$textCol`")
    val red = redact(c, rules)
    flagCol match {
      case Some(f) =>
        // a rule "fired" iff the redacted text differs; computed against
        // the ORIGINAL column in the same projection, before overwrite.
        // NULL text compares to null — coalesce to false so the row
        // stays visible to BOTH sides of a flag-based split.
        df.withColumn(f, coalesce(red =!= c, lit(false)))
          .withColumn(textCol, red)
      case None => df.withColumn(textCol, red)
    }
  }
}
