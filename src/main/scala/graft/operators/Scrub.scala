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

  /** k-anonymity audit (Sweeney 2002): group rows by the
    * quasi-identifier combination and report how much of the dataset
    * sits in equivalence classes smaller than `k` — the re-identification
    * exposure a governance review asks about BEFORE a dataset ships
    * (the redaction pass above removes direct identifiers; this audits
    * the quasi ones it cannot). One row: (n_rows, n_classes,
    * min_class_size, n_classes_below_k, n_rows_below_k longs,
    * share_below_k double — ONE division of exact integers; all-zero /
    * NULL-safe on empty input with NULL share). NULL quasi values form
    * their own class (both engines group NULLs together) — the honest
    * reading: "unknown" is itself a bucket an attacker can condition
    * on.
    *
    * 100 TB shape: ONE map-side-combinable aggregation to the
    * class-cardinality frame, one scalar rollup — no window, no
    * join. */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityProfile: quasiCols must be non-empty")
    require(k >= 2L, s"kAnonymityProfile: k must be >= 2, got $k")
    val classes = df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__c"))
    classes.agg(
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__c")).as("min_class_size"),
        coalesce(sum(when(col("__c") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_classes_below_k"),
        coalesce(sum(when(col("__c") < k, col("__c")).otherwise(0L)), lit(0L))
          .as("n_rows_below_k"))
      .select(col("n_rows"), col("n_classes"), col("min_class_size"),
        col("n_classes_below_k"), col("n_rows_below_k"),
        when(col("n_rows") > 0L,
          col("n_rows_below_k").cast("double") / col("n_rows").cast("double"))
          .as("share_below_k"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): within each
    * quasi-identifier class, how many DISTINCT sensitive values exist —
    * a k-anonymous class whose sensitive attribute is constant still
    * leaks it (the homogeneity attack k-anonymity misses). One row:
    * (n_rows, n_classes, min_distinct_sensitive, n_classes_below_l,
    * n_rows_below_l longs, share_below_l double). Rows with a NULL
    * sensitive value count toward class sizes but add no diversity
    * (COUNT DISTINCT ignores NULLs on both engines); NULL quasi values
    * form their own class, the [[kAnonymityProfile]] rule.
    *
    * 100 TB shape: one aggregation to (class, distinct-count) — the
    * COUNT DISTINCT is per-class (map-side partials on
    * class-cardinality keys, never a global expansion) — one scalar
    * rollup. */
  def lDiversityProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityProfile: quasiCols must be non-empty")
    require(l >= 2L, s"lDiversityProfile: l must be >= 2, got $l")
    val classes = df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__c"),
        countDistinct(col(s"`$sensitiveCol`")).as("__d"))
    classes.agg(
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__d")).as("min_distinct_sensitive"),
        coalesce(sum(when(col("__d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_classes_below_l"),
        coalesce(sum(when(col("__d") < l, col("__c")).otherwise(0L)), lit(0L))
          .as("n_rows_below_l"))
      .select(col("n_rows"), col("n_classes"),
        col("min_distinct_sensitive"),
        col("n_classes_below_l"), col("n_rows_below_l"),
        when(col("n_rows") > 0L,
          col("n_rows_below_l").cast("double") / col("n_rows").cast("double"))
          .as("share_below_l"))
  }

  /** Multi-pattern blocklist counting — the badwords/keyword screen over
    * a corpus: per document, the total number of substring occurrences
    * of ANY pattern (overlapping included) and how many DISTINCT
    * patterns appear, in ONE text pass via the Aho-Corasick automaton
    * ([[org.apache.spark.sql.graft.MultiPatternCount]]). The one-pass
    * property is the point at scale: a 10k-entry blocklist via
    * per-pattern regexes is 10k corpus scans; the automaton is one.
    * `caseInsensitive` (default) lowercases both sides (Locale.ROOT —
    * the termStream rule). Output: (idCol, n_hits long, n_patterns
    * int); NULL text counts as zero hits; NULL ids drop.
    *
    * 100 TB shape: a pure narrow pass — the automaton rides the
    * serialized expression (a recipe, not data), no shuffle, no join. */
  def blocklistHits(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], caseInsensitive: Boolean = true): DataFrame = {
    val pats0 =
      if (caseInsensitive) patterns.map(_.toLowerCase(java.util.Locale.ROOT))
      else patterns
    require(pats0.distinct.size == pats0.size,
      s"patterns collide after case folding: ${pats0.diff(pats0.distinct).distinct}")
    val id = col(s"`$idCol`")
    val t0 = col(s"`$textCol`")
    val txt = if (caseInsensitive) lower(t0) else t0
    df.filter(id.isNotNull)
      .select(id,
        org.apache.spark.sql.graft.MultiPatternCount.of(txt, pats0).as("__m"))
      .select(id,
        coalesce(col("__m.n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("__m.n_patterns"), lit(0)).as("n_patterns"))
  }

  /** Luhn-validated payment-card candidates (ISO/IEC 7812 mod-10): the
    * checksum pass that cuts the card-number FALSE-POSITIVE rate of a
    * bare digit-run regex — an order id or timestamp matches a 16-digit
    * pattern, but only ~10% of random runs pass Luhn, and every real
    * card number does. One exploded row per candidate:
    * (idCol, digits string — separators stripped, n_digits int,
    * luhn_valid boolean). Candidates are the leftmost GREEDY
    * non-overlapping digit runs (single space/dash separators allowed)
    * whose stripped length lands in [minDigits, maxDigits] — greedy
    * non-overlapping extraction is identical in Java regex and RE2, so
    * the relation is engine-portable (a 22-digit run yields one
    * maxDigits-length candidate and a too-short remainder, in both).
    * Docs with no candidates are absent (inner semantics — the
    * [[redactColumn]] flag covers presence screening).
    *
    * Exactness: the checksum is pure integer arithmetic over the digit
    * string — double every second digit from the RIGHT, subtract 9 past
    * 9, sum mod 10 — no floats anywhere.
    *
    * 100 TB shape: a per-row regex extract + explode + a bounded
    * (≤ maxDigits) higher-order fold per candidate — pure projection,
    * zero shuffle, zero state. */
  def luhnCardCandidates(df: DataFrame, idCol: String, textCol: String,
      minDigits: Int = 13, maxDigits: Int = 19): DataFrame = {
    require(minDigits >= 2 && minDigits <= maxDigits,
      s"need 2 <= minDigits <= maxDigits, got [$minDigits, $maxDigits]")
    val id = col(s"`$idCol`")
    val pattern = s"(?:\\d[ -]?){${minDigits - 1},${maxDigits - 1}}\\d"
    val cands = df.filter(id.isNotNull && col(s"`$textCol`").isNotNull)
      .select(id,
        explode(regexp_extract_all(col(s"`$textCol`"), lit(pattern), lit(0)))
          .as("__c"))
      .withColumn("digits", regexp_replace(col("__c"), "[ -]", ""))
      .withColumn("n_digits", length(col("digits")))
      // the separator-tolerant pattern can admit a run whose stripped
      // length falls under minDigits only when min == max edge-cases the
      // bound anyway; keep the explicit guard so the contract is loud
      .filter(col("n_digits") >= minDigits && col("n_digits") <= maxDigits)
    // Luhn: 1-based position i, distance from the right = n - i;
    // even distance keeps the digit, odd doubles it (minus 9 past 9)
    val contrib = transform(sequence(lit(1), col("n_digits")), i => {
      val d = col("digits").substr(i, lit(1)).cast("int")
      val dbl = d * 2
      when((col("n_digits") - i) % 2 === 0, d)
        .otherwise(when(dbl > 9, dbl - 9).otherwise(dbl))
    })
    cands
      .withColumn("luhn_valid",
        aggregate(contrib, lit(0), (a, b) => a + b) % 10 === 0)
      .select(id, col("digits"), col("n_digits"), col("luhn_valid"))
  }
}
