package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM training-data pipelines (beyond the
  * reference's surface — mandated by BASELINE.json's north star; the
  * reference's closest artifact is the dead embedding helper at
  * /root/reference/magictables/utils.py:179-242).
  *
  * Everything here is a pure Catalyst expression tree over built-ins —
  * codegen-friendly, no UDFs, no shuffles — so it composes into any scan,
  * stays inside WholeStageCodegen, and scales linearly with the data.
  *
  * Hashing is md5-based on purpose: md5 hex is bit-identical across Spark
  * and ANSI SQL engines (DuckDB oracle), unlike xxhash64/murmur which are
  * engine-specific. Where a numeric hash is needed, the first 15 hex chars
  * (60 bits) are converted — still portable.
  */
object TextFunctions {

  /** Whitespace tokens, empties removed (leading/trailing space safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** THE exploded-token-stream tokenization contract (lowercase,
    * whitespace split, null text as empty, empty tokens dropped) shared
    * by Search (BM25, more-like-this), Vocab and the DuckDB oracles'
    * `toksLowerSql` fragment — one definition so none can drift. Emits
    * `keepCols :+ __term`. */
  def termStream(df: org.apache.spark.sql.DataFrame, keepCols: Seq[Column],
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(keepCols :+
        explode(split(lower(coalesce(col(s"`$textCol`"), lit(""))), "\\s+")).as("__term"): _*)
      .filter(col("__term") =!= "")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs and single non-space symbols
    * each count as one token — a cheap, deterministic stand-in for a real
    * BPE vocabulary that tracks it within a few percent on English text.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles: ["a b c", "b c d", ...]. Empty if < n tokens.
    * (Guarded: sequence(1, 0) would yield a DESCENDING [1,0] range.) */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Deterministic 60-bit hash of a string, identical in Spark and DuckDB:
    * integer value of the first 15 hex chars of md5. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Canonical document fingerprint: md5 of the whitespace-normalized,
    * lowercased text (rolling-hash-free exact fingerprint). Implemented as
    * pure regex (collapse runs, strip edges) — value-identical to
    * md5(concat_ws(" ", tokens(lower(text)))) but fully codegen'd instead
    * of an interpreted array lambda. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+", " "))

  /** Winnowing-style robust fingerprint: the k lexicographically smallest
    * md5 hex digests of the document's n-gram shingles, concatenated. Two
    * documents differing by a few tokens still collide on most mins. */
  def winnowFingerprint(text: Column, n: Int, k: Int): Column =
    concat_ws("|", slice(array_sort(transform(shingles(lower(text), n), s => md5(s))), 1, k))

  // ---------------------------------------------------------------- language ID

  /** Tiny deterministic stopword lists per language (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "un", "por", "con", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est", "pour"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich", "des", "auf", "ist"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人", "都", "一", "他"))

  /** Stopword hit count for one language (token occurrences, not types). */
  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(stopwords(lang))))

  /** N-gram-heuristic language ID: the language with the most stopword hits;
    * "und" (undetermined) when no list scores > 0. Ties break by language
    * code ascending (deterministic). */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // array_max on (hits, lang) structs: max hits, then max lang — to get
    // the TIE-BREAK-ASCENDING winner compare on (hits, reversed-rank).
    val best = langs.zipWithIndex.map { case (l, i) =>
      struct(stopwordHits(text, l).as("hits"), lit(-i).as("rank"), lit(l).as("lang"))
    }
    val winner = array_max(array(best: _*))
    when(winner.getField("hits") > 0, winner.getField("lang")).otherwise(lit("und"))
  }

  // ---------------------------------------------------------------- quality

  /** Alphabetic-character count. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))

  /** Punctuation-character count. */
  def punctChars(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", ""))

  /** Mean token length in characters (0.0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  // ------------------------------------------------------------ doc stats
  // (DataFrame-level: one codegen'd token-stream aggregation instead of
  //  per-row interpreted lambdas — the fast path for whole-corpus scoring)

  /** Per-document token statistics via an exploded token stream: n_tok,
    * mean token length, and per-language stopword hit counts (columns
    * h_<lang>), all in ONE map-side-combinable aggregation over ONE scan.
    *
    * carryCols are extra per-document columns (must be functionally
    * dependent on idCol — e.g. doc-level char counts computed in a select
    * before the call) that ride through as additional grouping keys, so a
    * caller needs no second scan + join to get doc-level attributes next
    * to the token stats.
    *
    * Zero-token documents keep a row WITHOUT a join-back: split of non-null
    * text always returns at least one element (an empty string for blank
    * text) and NULL text is coalesced to "" first — so the explode emits a
    * placeholder row per doc and every aggregate guards on `__tok != ""`.
    * Value-identical to the Column-level helpers above. */
  def tokenStats(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val toks = df.select(
      (col(idCol) +: carryCols.map(col)) :+
        explode(split(lower(coalesce(col(textCol), lit(""))), "\\s+")).as("__tok"): _*)
    val isTok = col("__tok") =!= ""
    val langAggs = stopwords.keys.toSeq.sorted.map { l =>
      sum(when(isTok && col("__tok").isInCollection(stopwords(l)), 1L).otherwise(0L)).as(s"h_$l")
    }
    val aggs = Seq(
      sum(when(isTok, 1L).otherwise(0L)).as("n_tok"),
      sum(when(isTok, length(col("__tok")).cast("long")).otherwise(0L)).as("__sum_tok_len")) ++
      langAggs
    toks.groupBy(col(idCol) +: carryCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_tok_len",
        when(col("n_tok") === 0, lit(0.0))
          .otherwise(col("__sum_tok_len").cast("double") / col("n_tok")))
      .drop("__sum_tok_len")
  }

  /** Per-document Shannon entropy (nats) over non-whitespace characters —
    * the gibberish/encoded-blob detector: random base64 or hex blobs score
    * near the uniform-alphabet ceiling, natural language sits well below,
    * single-character spam near 0. H = ln(n) − (Σ c·ln(c))/n over the
    * per-character counts c (algebraically −Σ (c/n)ln(c/n), in the form
    * whose only non-exact terms are the two ln's).
    *
    * One explode + one (id, char) groupBy + one id rollup — map-side
    * combinable, O(chars) shuffle of single characters. Each ln rounds
    * through DECIMAL(25,12) to `lnRoundDp` (the p26 contract), products
    * accumulate through DECIMAL(25,9), so the DuckDB oracle hash-matches.
    * Characters are BMP code points (a surrogate pair counts as two).
    * Docs with no non-whitespace characters are absent (inner semantics).
    */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      lnRoundDp: Int = 9): org.apache.spark.sql.DataFrame = {
    require(lnRoundDp >= 1 && lnRoundDp <= 12,
      s"lnRoundDp must be in [1,12], got $lnRoundDp")
    def lnR(c: Column) =
      round(log(c).cast("decimal(25,12)"), lnRoundDp).cast("double")
    val chars = df.select(col(s"`$idCol`"),
        explode(split(regexp_replace(coalesce(col(s"`$textCol`"), lit("")), "\\s", ""), ""))
          .as("__ch"))
      .filter(col("__ch") =!= "")
    chars.groupBy(col(s"`$idCol`"), col("__ch"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(s"`$idCol`"))
      .agg(sum(col("__c")).as("n_chars_sig"),
        sum((col("__c").cast("double") * lnR(col("__c"))).cast("decimal(25,9)"))
          .as("__clnc"))
      .select(col(s"`$idCol`"), col("n_chars_sig"),
        (lnR(col("n_chars_sig")) -
          col("__clnc").cast("double") / col("n_chars_sig").cast("double"))
          .as("char_entropy"))
  }

  /** DEFLATE compression ratio of the text's UTF-8 bytes — compressed
    * size / raw size via the native
    * [[org.apache.spark.sql.graft.DeflateSize]] expression. The
    * "too compressible" quality filter (RefinedWeb-family pipelines):
    * templated or machine-generated text lands well below natural
    * prose (~0.4–0.7 at BEST_SPEED for English), and unlike
    * [[charEntropy]] the ratio also catches LONG-RANGE repetition.
    * NULL for NULL text; empty text ratios as NULL (0/0 has no
    * meaning). A ranking/threshold signal: exact counts are pinned to
    * the deployment's zlib build (the DeflateSize scaladoc), so gate
    * it by threshold, never by golden value. */
  def compressionRatio(text: Column): Column = {
    val raw = octet_length(text).cast("double")
    when(raw > 0.0,
      org.apache.spark.sql.graft.DeflateSize.deflateSize(text).cast("double") / raw)
  }

  /** Language argmax over tokenStats hit columns (same tie-break-ascending
    * semantics as [[langId]]). */
  def langPredFromStats: Column = {
    val langs = stopwords.keys.toSeq.sorted
    val top = greatest(langs.map(l => col(s"h_$l")): _*)
    langs.foldLeft(when(top === 0, lit("und"))) { (acc, l) =>
      acc.when(col(s"h_$l") === top, lit(l))
    }
  }

  /** Composite quality score in [0,1]: weights length (saturating at 200
    * tokens), alphabetic ratio, and English-stopword ratio; penalizes
    * punctuation overload. All-double math in a fixed evaluation order so
    * Spark and the oracle agree bitwise. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val lenScore = least(nTok / lit(200.0), lit(1.0))
    val alphaRatio = when(nChar === 0, lit(0.0)).otherwise(alphaChars(text).cast("double") / nChar)
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(stopwordHits(text, "en").cast("double") / nTok)
    val punctRatio = when(nChar === 0, lit(0.0)).otherwise(punctChars(text).cast("double") / nChar)
    lenScore * lit(0.4) + alphaRatio * lit(0.3) + stopRatio * lit(0.2) +
      (lit(1.0) - least(punctRatio * lit(5.0), lit(1.0))) * lit(0.1)
  }
}
