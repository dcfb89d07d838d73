package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition quality signals for pre-training curation (beyond-reference,
  * SURVEY.md §2.4) — the public "repetitious text" filters popularized by
  * the Gopher/MassiveText rules: machine-generated and boilerplate pages
  * repeat themselves, so per-document duplicate-line and top-n-gram mass
  * are strong, cheap quality features.
  *
  * Per document:
  *  - `n_lines`           non-empty (trimmed) line count
  *  - `dup_line_frac`     fraction of lines that are repeats of an earlier
  *                        line (1 - distinct/total)
  *  - `dup_line_char_frac` fraction of line characters living in lines
  *                        that occur more than once
  *  - `top_bigram`        most frequent word 2-gram (lowercased; count
  *                        ties break to the lexicographically smallest, so
  *                        the result is deterministic)
  *  - `top_bigram_n`      its occurrence count (0 when < 2 tokens)
  *  - `top_bigram_char_frac` characters covered by its occurrences over
  *                        the raw text length
  *
  * Scale shape: both signal families are explode → groupBy(doc, unit) →
  * groupBy(doc) chains — two shuffles each, all keyed by doc id, partial
  * aggregation collapses map-side, nothing is quadratic and no per-doc
  * state leaves the reducers. Bigrams ride [[Dedup.shingleRows]]'s
  * codegen'd posexplode+lead stream (NOT an exploded higher-order-function
  * result, which measures ~25x slower). Fractions are plain IEEE double
  * divisions of exact counts — no rounding step, so the values are
  * bit-identical across engines.
  */
object Repetition {

  def signals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val text = col(s"`$textCol`")

    val lines = df
      .select(id.as("__id"), explode(split(text, "\n")).as("__raw"))
      .select(col("__id"), trim(col("__raw")).as("__line"))
      .filter(col("__line") =!= "")
    val lineCounts = lines
      .groupBy(col("__id"), col("__line"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__len", length(col("__line")))
    val lineAgg = lineCounts
      .groupBy(col("__id"))
      .agg(
        sum(col("__c")).as("n_lines"),
        count(lit(1)).as("__n_distinct"),
        sum(when(col("__c") > 1, col("__c") * col("__len")).otherwise(0L)).as("__dup_chars"),
        sum(col("__c") * col("__len")).as("__tot_chars"))
      .withColumn("dup_line_frac",
        (col("n_lines") - col("__n_distinct")).cast("double") / col("n_lines"))
      .withColumn("dup_line_char_frac",
        when(col("__tot_chars") === 0, lit(0.0))
          .otherwise(col("__dup_chars").cast("double") / col("__tot_chars")))
      .select("__id", "n_lines", "dup_line_frac", "dup_line_char_frac")

    val bigramCounts = Dedup.shingleRows(df, idCol, textCol, 2)
      .groupBy(id.as("__id"), col("shingle"))
      .agg(count(lit(1)).as("__c"))
    val byCountThenGram = Window.partitionBy(col("__id"))
      .orderBy(col("__c").desc, col("shingle").asc)
    val topBigram = bigramCounts
      .withColumn("__rn", row_number().over(byCountThenGram))
      .filter(col("__rn") === 1)
      .select(col("__id"),
        col("shingle").as("top_bigram"),
        col("__c").as("top_bigram_n"))

    df.select(id.as("__id"), length(text).as("__n_text_chars"))
      .join(lineAgg, Seq("__id"), "left")
      .join(topBigram, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac"),
        col("top_bigram"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        when(col("top_bigram_n").isNull || col("__n_text_chars") === 0, lit(0.0))
          .otherwise(col("top_bigram_n") * length(col("top_bigram"))
            .cast("double") / col("__n_text_chars"))
          .as("top_bigram_char_frac"))
  }
}
