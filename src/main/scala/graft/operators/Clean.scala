package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup stripping + whitespace normalization for web-crawled corpora
  * (beyond-reference, SURVEY.md §2.4): the C4/CCNet-style "make HTML into
  * prose" cleanup that precedes every quality/dedup signal. Like [[Scrub]]
  * it is a purely narrow, codegen'd `regexp_replace` chain — zero shuffle,
  * zero state, so the pass costs exactly one scan at any corpus size and
  * pipelines into the same projection as language-ID/quality scoring.
  *
  * Patterns stay inside the regex subset Java and RE2 agree on (character
  * classes, alternation, non-greedy `.*?` with `(?s)`/`(?i)` flags), so
  * the p49 gate can replay them in DuckDB. `\s` is avoided on purpose:
  * Java's `\s` includes vertical tab, RE2's does not — the explicit class
  * `[ \t\n\r\f]` is used instead so both engines normalize identically.
  */
object Clean {

  /** Entity → literal decode map applied after tag removal. `&amp;` is
    * decoded LAST so `&amp;lt;` becomes `&lt;` (one decode pass, the
    * standard non-recursive rule) rather than `<`. */
  val entityRules: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Strip markup from one column:
    * 1. drop `<script>`/`<style>` blocks INCLUDING their payload (their
    *    text is code, not prose — keeping it poisons quality signals);
    * 2. replace every remaining tag/comment with a single space (space,
    *    not empty: `a<br>b` must not fuse into `ab`);
    * 3. decode the frozen entity set;
    * 4. collapse whitespace runs and trim.
    */
  def stripMarkup(c: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    // [A-Za-z!?] start: element tags AND <!DOCTYPE>/<?xml?> declarations —
    // real crawled pages open with those, and a letter-only class would
    // leak them into the "clean prose" output (comments are already gone,
    // so the '!' arm can no longer eat a '<!--')
    val noTags = regexp_replace(noComments, "</?[A-Za-z!?][^>]*>", " ")
    val decoded = entityRules.foldLeft(noTags) { case (acc, (ent, lit_)) =>
      regexp_replace(acc, ent, lit_)
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }

  /** Anchor-text extraction: the concatenated inner text of every
    * `<a …>…</a>` element, markup-stripped. Basis for the link-density
    * boilerplate signal (jusText/trafilatura heuristic: nav-heavy blocks
    * are mostly link text). Non-greedy per-anchor match, so nested
    * non-anchor tags inside an anchor are kept (and then stripped). */
  def anchorText(c: Column): Column =
    stripMarkup(array_join(
      regexp_extract_all(c, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "))

  /** Link density = anchor-text chars / clean-text chars, null-safe and
    * 0 for an empty page. ≥ ~0.5 marks navigation boilerplate. */
  def linkDensity(c: Column): Column =
    when(c.isNull, lit(null).cast("double"))
      .otherwise(length(anchorText(c)).cast("double") /
        greatest(length(stripMarkup(c)).cast("double"), lit(1.0)))

  /** Collapse CONSECUTIVE duplicate lines inside one document — the echo
    * pattern crawlers produce (repeated nav rows, pagination artifacts).
    * Corpus-level duplicate-LINE removal is [[LineDedup]]; this is the
    * intra-document pass, and it is a pure narrow HOF chain: keep line i
    * iff i == 0 or line i differs from line i-1, then re-join. Blank-line
    * runs collapse too (a blank equals the previous blank). */
  def collapseRepeatedLines(c: Column): Column = {
    val lines = split(c, "\\n")
    // element_at is 1-based, so element_at(lines, i) IS the previous line
    // for 0-based index i; the when() guards the i == 0 probe (If only
    // evaluates the taken branch — no ANSI zero-index error).
    val kept = filter(lines, (l, i) =>
      when(i === lit(0), lit(true)).otherwise(l =!= element_at(lines, i)))
    array_join(kept, "\n")
  }

  /** Clean `textCol` in place; `keptRatioCol`, when set, records
    * length(clean)/length(raw) — the standard "was this page mostly
    * markup" crawl-quality signal (0 for an all-markup page, ~1 for
    * prose; null-safe: null text stays null with ratio null). */
  def cleanColumn(
      df: DataFrame,
      textCol: String,
      keptRatioCol: Option[String] = None): DataFrame = {
    val raw = col(s"`$textCol`")
    val cleaned = stripMarkup(raw)
    keptRatioCol match {
      case Some(r) =>
        // ratio against the RAW column in the same projection, before the
        // overwrite; guard length 0 so an empty page yields 0.0, not null.
        df.withColumn(r,
            when(raw.isNull, lit(null).cast("double"))
              .otherwise(length(cleaned).cast("double") /
                greatest(length(raw).cast("double"), lit(1.0))))
          .withColumn(textCol, cleaned)
      case None => df.withColumn(textCol, cleaned)
    }
  }
}
