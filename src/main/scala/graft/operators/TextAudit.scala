package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus text-audit operators — beyond-reference per SURVEY.md §2.4
  * (the reference's only text machinery is pandas string accessors on
  * fetched frames, /root/reference/magictables/magictable.py); these are
  * the per-document hygiene passes a pretraining pipeline runs before
  * tokenization: sentence segmentation (chunking / span alignment),
  * readability scoring (Flesch 1948 / Kincaid 1975 — the classic
  * easy-vs-technical text signal used for curriculum and quality
  * stratification), and encoding hygiene (mojibake replacement chars,
  * C0 control bytes, non-ASCII density — the "was this decoded right"
  * triage before any content filter).
  *
  * All three are narrow per-row projections (regex count + integer
  * arithmetic + at most one IEEE division per reported ratio) — they
  * stay inside whole-stage codegen, shuffle nothing, and scale linearly
  * with the corpus. Every regex is written in the Java∩RE2 subset (the
  * toksLowerSql convention) so the DuckDB oracles run the same pattern.
  */
object TextAudit {

  /** Sentence pattern: a run of non-terminators followed by a terminator
    * run, or a trailing unterminated run. No lookbehind (RE2 has none);
    * the Java-vs-RE2 `$`-before-final-newline divergence is absorbed by
    * the whitespace trim applied to every segment. */
  private val SentencePat = "[^.!?]*[.!?]+|[^.!?]+$"

  /** Split each document into trimmed, non-empty sentence segments:
    * (idCol, sent_idx long — 0-based over KEPT segments, sentence,
    * n_chars long). Documents with no segments (NULL/empty/whitespace
    * text) emit no rows — chunking consumers want the segment stream,
    * not placeholder rows (pair with a left join from the corpus to
    * recover empty docs).
    *
    * 100 TB shape: one codegen'd projection + explode per document — no
    * shuffle at all; segment indexes are array positions, never window
    * ranks. */
  def sentenceSegments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val segs = regexp_extract_all(
      coalesce(col(s"`$textCol`"), lit("")), lit(SentencePat), lit(0))
    val kept = filter(
      transform(segs, x => regexp_replace(x, "^\\s+|\\s+$", "")),
      x => x =!= "")
    df.select(id, posexplode(kept).as(Seq("sent_idx", "sentence")))
      .select(id, col("sent_idx").cast("long").as("sent_idx"), col("sentence"),
        length(col("sentence")).cast("long").as("n_chars"))
  }

  /** Flesch reading ease + Flesch-Kincaid grade per document:
    * (idCol, n_words, n_sentences, n_syllables longs, flesch double,
    * fk_grade double — both NULL when the doc has no words).
    *
    * Counts are the cheap published approximations: words = whitespace
    * tokens, sentences = terminator runs `[.!?]+` (clamped to >= 1 in
    * the formulas — an unterminated doc is one sentence), syllables =
    * lowercase vowel-group runs `[aeiouy]+` (whitespace breaks groups,
    * so the whole-text count equals the per-word sum). The formulas are
    * fixed IEEE expression trees over exact integer counts — identical
    * operation order in the DuckDB oracle, so bit-identical results. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val txt = coalesce(col(s"`$textCol`"), lit(""))
    val words = size(regexp_extract_all(txt, lit("[^\\s]+"), lit(0))).cast("long")
    val sents = size(regexp_extract_all(txt, lit("[.!?]+"), lit(0))).cast("long")
    val sylls = size(regexp_extract_all(lower(txt), lit("[aeiouy]+"), lit(0))).cast("long")
    val base = df.select(id, words.as("n_words"), sents.as("n_sentences"),
      sylls.as("n_syllables"))
    val w = col("n_words").cast("double")
    val s = greatest(col("n_sentences"), lit(1L)).cast("double")
    val y = col("n_syllables").cast("double")
    base
      .withColumn("flesch", when(col("n_words") > 0L,
        lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w)))
      .withColumn("fk_grade", when(col("n_words") > 0L,
        lit(0.39) * (w / s) + lit(11.8) * (y / w) - lit(15.59)))
  }

  /** Encoding-hygiene audit per document: (idCol, n_chars,
    * n_replacement — U+FFFD count, the mojibake tripwire, n_control —
    * C0 controls excluding \t\n\r plus DEL, n_non_ascii longs,
    * has_replacement boolean, control_ratio, non_ascii_ratio doubles —
    * ratios NULL on empty text). NULL text audits as empty (0 chars). */
  def encodingAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val txt = coalesce(col(s"`$textCol`"), lit(""))
    val n = length(txt).cast("long")
    val repl = (length(txt) - length(replace(txt, lit("\uFFFD"), lit(""))))
      .cast("long")
    val ctrl = size(regexp_extract_all(txt,
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"), lit(0))).cast("long")
    val nonAscii = size(regexp_extract_all(txt, lit("[^\\x00-\\x7F]"), lit(0)))
      .cast("long")
    df.select(id, n.as("n_chars"), repl.as("n_replacement"),
        ctrl.as("n_control"), nonAscii.as("n_non_ascii"))
      .withColumn("has_replacement", col("n_replacement") > 0L)
      .withColumn("control_ratio", when(col("n_chars") > 0L,
        col("n_control").cast("double") / col("n_chars").cast("double")))
      .withColumn("non_ascii_ratio", when(col("n_chars") > 0L,
        col("n_non_ascii").cast("double") / col("n_chars").cast("double")))
  }

  /** Unicode NFC normalization audit per document: (idCol, text_nfc —
    * the canonically composed text, n_chars_raw, n_chars_nfc longs,
    * changed boolean — composition shortened the text). Run BEFORE any
    * hash-keyed operator: byte-different, render-identical encodings
    * ("é" composed vs e + combining acute) otherwise split fingerprints,
    * shingles, and vocabulary counts. NULL text stays NULL (changed
    * false). Backed by the codegen'd
    * [[org.apache.spark.sql.graft.NfcNormalize]] expression — one
    * static call inside WholeStageCodegen, no shuffle. */
  def nfcAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val txt = col(s"`$textCol`")
    df.select(id, txt.as("__raw"),
        org.apache.spark.sql.graft.NfcNormalize.nfc(txt).as("text_nfc"))
      .withColumn("n_chars_raw", length(col("__raw")).cast("long"))
      .withColumn("n_chars_nfc", length(col("text_nfc")).cast("long"))
      .withColumn("changed",
        coalesce(col("text_nfc") =!= col("__raw"), lit(false)))
      .select(id, col("text_nfc"), col("n_chars_raw"), col("n_chars_nfc"),
        col("changed"))
  }

  /** Per-document code-switch audit: segment with [[sentenceSegments]],
    * language-ID each sentence with the stopword-vote heuristic
    * ([[graft.functions.TextFunctions.langId]]), and report how mixed
    * the document is — the signal that separates genuinely
    * multilingual documents (translations, quote-heavy pages,
    * boilerplate in a second language) from monolingual ones, which a
    * DOC-level language ID silently averages away. Output, one row per
    * doc with ≥ 1 sentence: (idCol, n_sentences, n_langs longs —
    * distinct sentence-level codes, 'und' counts as its own class,
    * major_lang — the plurality code (ties break to the
    * lexicographically smallest, matching langId's own tie rule),
    * n_major long, switch_frac double — 1 − n_major/n_sentences, 0.0
    * for monolingual docs).
    *
    * 100 TB shape: the segment explode is a narrow codegen'd
    * projection; one hash shuffle to (doc, lang) counts, then the
    * per-doc window and rollup reuse that partitioning. Sentence-level
    * stopword votes are noisier than doc-level (short sentences →
    * 'und'); treat switch_frac as a ranking signal, not a classifier. */
  /** Script classes for [[scriptProfile]]: name → character-class body
    * (BMP-only explicit codepoint ranges, so Java and RE2 read the
    * SAME pattern and UTF-16 length == codepoint length — no \\p{...}
    * script properties, whose namespaces differ between engines).
    * Ordered: the profile's argmax tie-breaks by this ascending name
    * order. "cjk" pools Kana + Han (incl. extension A) + Hangul. */
  private def range(lo: Int, hi: Int): String = s"${lo.toChar}-${hi.toChar}"
  val scriptClasses: Seq[(String, String)] = Seq(
    "arabic" -> (range(0x0600, 0x06FF) + range(0x0750, 0x077F)),
    "cjk" -> (range(0x3040, 0x30FF) + range(0x3400, 0x4DBF) +
      range(0x4E00, 0x9FFF) + range(0xAC00, 0xD7AF)),
    "cyrillic" -> range(0x0400, 0x04FF),
    "devanagari" -> range(0x0900, 0x097F),
    "greek" -> range(0x0370, 0x03FF),
    "hebrew" -> range(0x0590, 0x05FF),
    "latin" -> ("A-Za-z" + range(0x00C0, 0x00D6) + range(0x00D8, 0x00F6) +
      range(0x00F8, 0x00FF) + range(0x0100, 0x024F)))

  /** Per-document Unicode script distribution — the multilingual-corpus
    * triage that language ID alone misses (a "russian" feed full of
    * Latin mojibake, CJK spam inside an English crawl, mixed-script
    * spoofing): counts per script class, the dominant script, and its
    * share. Output: (idCol, n_letters long — total across classes,
    * n_<class> long per [[scriptClasses]] entry, main_script string —
    * argmax class, ties to the ascending-name first, 'none' when no
    * letter matches any class, main_frac double — share of n_letters,
    * NULL when n_letters = 0). Digits, punctuation and whitespace are
    * not letters and count nowhere.
    *
    * Counts are the alphaChars recipe — length(s) −
    * length(regexp_replace(s, '[class]', '')) — over BMP-only explicit
    * ranges, identical in Java and RE2 and equal in UTF-16 and
    * codepoint units. A narrow codegen'd projection: no shuffle, no
    * state, linear scan. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val txt = coalesce(col(s"`$textCol`"), lit(""))
    val counted = scriptClasses.foldLeft(df.select(id, txt.as("__t"))) {
      case (d, (name, cls)) =>
        d.withColumn(s"n_$name",
          (length(col("__t")) -
            length(regexp_replace(col("__t"), s"[$cls]", ""))).cast("long"))
    }
    val total = scriptClasses.map { case (n, _) => col(s"n_$n") }
      .reduce(_ + _)
    val best = scriptClasses.reverse.foldLeft(lit("none"): Column) {
      case (other, (name, _)) =>
        // ascending-name-first tie-break: earlier classes test first
        // with >=, so an equal later count cannot displace them
        when(col(s"n_$name") > 0L && scriptClasses
          .filter(_._1 != name)
          .map(o => col(s"n_$name") >= col(s"n_${o._1}"))
          .reduce(_ && _), lit(name)).otherwise(other)
    }
    counted
      .withColumn("n_letters", total)
      .withColumn("main_script", best)
      .withColumn("main_frac", when(col("n_letters") > 0L,
        scriptClasses.map { case (n, _) =>
          when(col("main_script") === n, col(s"n_$n")) }
          .reduce(coalesce(_, _)).cast("double") /
          col("n_letters").cast("double")))
      .drop("__t")
  }

  def codeSwitch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(s"`$idCol`")
    val sents = sentenceSegments(df, idCol, textCol)
      .select(id, graft.functions.TextFunctions.langId(col("sentence")).as("__l"))
    val counts = sents.groupBy(id, col("__l")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(id)
    counts
      .withColumn("__max", max(col("__c")).over(w))
      .withColumn("__maj", min(when(col("__c") === col("__max"), col("__l"))).over(w))
      .groupBy(id)
      .agg(sum(col("__c")).as("n_sentences"),
        count(lit(1)).as("n_langs"),
        max(col("__maj")).as("major_lang"),
        max(col("__max")).as("n_major"))
      .select(id, col("n_sentences"), col("n_langs"), col("major_lang"),
        col("n_major"),
        (lit(1.0) - col("n_major").cast("double") /
          col("n_sentences").cast("double")).as("switch_frac"))
  }

  /** Invisible-character classes for [[invisibleAudit]] — raw BMP chars
    * shared verbatim with the oracle (the scriptClasses rule). `control`
    * starts at U+0001: a NUL inside a SQL literal would truncate the
    * oracle's pattern. Tab/LF/CR are legitimate text and count nowhere. */
  val invisibleClasses: Seq[(String, String)] = Seq(
    "zero_width" -> "\u200B\u200C\u200D\u2060\uFEFF",
    "bidi" -> ("\u200E\u200F" + range(0x202A, 0x202E) + range(0x2066, 0x2069)),
    "replacement" -> "\uFFFD",
    "control" -> (range(0x01, 0x08) + "\u000B\u000C" + range(0x0E, 0x1F) + "\u007F"))

  /** Invisible / bidirectional-control character audit — the text-level
    * security screen a training pipeline runs before trusting crawled
    * code or prose: zero-width characters hide payloads inside visually
    * clean tokens, unterminated bidi controls reorder what reviewers SEE
    * vs what models READ (the "Trojan Source" attack, Boucher & Anderson
    * 2021), U+FFFD marks mojibake from a bad transcode, and stray C0/C1
    * controls mark binary bleed-through. Output per doc: (idCol,
    * n_zero_width, n_bidi, n_replacement, n_control, n_suspicious longs,
    * is_clean boolean). Counts are the scriptProfile recipe — length
    * minus length after class removal, codegen'd regexes, zero shuffles.
    * NULL text counts as clean-empty. */
  def invisibleAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val txt = coalesce(col(s"`$textCol`"), lit(""))
    val counted = invisibleClasses.foldLeft(df.select(id, txt.as("__t"))) {
      case (d, (name, cls)) =>
        d.withColumn(s"n_$name",
          (length(col("__t")) -
            length(regexp_replace(col("__t"), s"[$cls]", ""))).cast("long"))
    }
    val total = invisibleClasses.map { case (n, _) => col(s"n_$n") }.reduce(_ + _)
    counted
      .withColumn("n_suspicious", total)
      .withColumn("is_clean", col("n_suspicious") === 0L)
      .drop("__t")
  }
}
