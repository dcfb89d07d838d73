package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher document-quality rule set (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", Appendix A1.1) — the published filter
  * battery every large pre-training corpus applies before dedup. The
  * REPETITION subset (duplicate line/paragraph/n-gram fractions) lives in
  * [[Repetition]] (p22); this operator is the complementary QUALITY
  * subset: length, word-shape, symbol, bullet/ellipsis and stopword
  * rules.
  *
  * 100 TB shape: one narrow, fully codegen'd projection — no shuffle, no
  * explode. Every threshold is evaluated in INTEGER arithmetic
  * (`sum_chars >= 3 * n_words` instead of `sum_chars / n_words >= 3.0`),
  * so there is no float boundary to disagree on: the p53 gate compares
  * exact booleans and counters against DuckDB.
  *
  * Word chars are counted as `length(text with all whitespace removed)` —
  * one codegen'd regexp_replace instead of a per-token HOF sum (the p03
  * HOF trap).
  */
object Gopher {

  /** The 8 Gopher stopwords: a doc not containing ≥ `minStopwordHits` of
    * these is likely not running prose. */
  val stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val bulletPrefixes: Seq[String] = Seq("-", "*", "•")

  /** Append per-rule booleans + the conjunction `keep`. Ranges follow the
    * paper: word count in [minWords, maxWords]; mean word length in
    * [3, 10]; (# '#' + # '…'-as-'...') / words ≤ 0.1; ≤ 90% of lines
    * bullet-started; ≤ 30% of lines ellipsis-ended; ≥ 80% of words
    * contain an alphabetic char; ≥ 2 distinct stopwords present. Null
    * text is treated as empty (fails the word-count rule). */
  def qualityRules(
      df: DataFrame,
      textCol: String,
      minWords: Long = 50,
      maxWords: Long = 100000,
      minStopwordHits: Int = 2): DataFrame = {
    val text = coalesce(col(s"`$textCol`"), lit(""))
    val toks = filter(split(text, "[ \\t\\n\\r\\f]+"), t => t =!= "")
    val nWords = size(toks).cast("long")
    // total word chars = all non-whitespace chars (exactly the chars the
    // tokenization keeps, since tokens are the non-whitespace runs)
    val sumChars = length(regexp_replace(text, "[ \\t\\n\\r\\f]+", "")).cast("long")
    def occurrences(needle: String, width: Int): Column =
      ((length(text) - length(replace(text, lit(needle), lit("")))) / width).cast("long")
    // both ellipsis forms: ASCII "..." and the single-char U+2026 that
    // word processors/CMSes emit — the Gopher rule covers both
    val nSymbols = occurrences("#", 1) + occurrences("...", 3) + occurrences("…", 1)
    val lines = filter(split(text, "\\n"), l => trim(l) =!= "")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      bulletPrefixes.map(p => trim(l).startsWith(p)).reduce(_ || _))).cast("long")
    val nEllipsisEnd = size(filter(lines, l =>
      trim(l).endsWith("...") || trim(l).endsWith("…"))).cast("long")
    val nAlphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(
      array_distinct(transform(toks, t => lower(t))),
      t => t.isInCollection(stopwords))).cast("long")

    df.withColumn("n_words", nWords)
      .withColumn("ok_word_count", nWords >= minWords && nWords <= maxWords)
      // integer-exact mean-word-length bounds: 3 <= sum/n <= 10
      .withColumn("ok_mean_word_len",
        nWords > 0 && sumChars >= lit(3L) * nWords && sumChars <= lit(10L) * nWords)
      // symbol-to-word ratio <= 0.1  <=>  10 * symbols <= words
      .withColumn("ok_symbol_ratio", nWords > 0 && lit(10L) * nSymbols <= nWords)
      // bullet-started lines <= 0.9  <=>  10 * bullets <= 9 * lines
      .withColumn("ok_bullet_lines",
        nLines === 0 || lit(10L) * nBullet <= lit(9L) * nLines)
      // ellipsis-ended lines <= 0.3  <=>  10 * ell <= 3 * lines
      .withColumn("ok_ellipsis_lines",
        nLines === 0 || lit(10L) * nEllipsisEnd <= lit(3L) * nLines)
      // >= 80% words with an alphabetic char  <=>  5 * alpha >= 4 * words
      .withColumn("ok_alpha_words",
        nWords > 0 && lit(5L) * nAlphaWords >= lit(4L) * nWords)
      .withColumn("ok_stopwords", nStop >= minStopwordHits)
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_word_len") &&
        col("ok_symbol_ratio") && col("ok_bullet_lines") &&
        col("ok_ellipsis_lines") && col("ok_alpha_words") && col("ok_stopwords"))
  }
}
