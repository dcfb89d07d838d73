package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (beyond-reference, SURVEY.md §2.4): flag and
  * drop training documents that share word-n-gram shingles with an
  * evaluation/benchmark set — the standard public leakage control
  * (GPT-3/PaLM-style 13-gram overlap checks).
  *
  * 100 TB shape: the benchmark side is small by definition (eval sets are
  * thousands of rows), so its DISTINCT shingle set broadcasts and the
  * whole check is one broadcast join over the corpus shingle stream — the
  * corpus is scanned once, nothing corpus-sized shuffles. The shingle
  * stream rides [[Dedup.shingleRows]]'s codegen'd posexplode+lead
  * pipeline (one shuffle keyed by doc for the lead window). If a
  * degenerate "benchmark" is actually huge, AQE falls back to a shuffle
  * join rather than OOMing a forced broadcast — no hint is used.
  */
object Decontaminate {

  /** Per-document overlap report: (idCol, n_hits) where n_hits counts the
    * DISTINCT benchmark shingles the document contains. Documents with no
    * overlap are absent (inner-join semantics — the common case at scale,
    * where almost nothing overlaps). */
  def overlapReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      shingleN: Int = 13): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    // each bench row needs its OWN shingling identity: shingleRows windows
    // by (id, token position), so a shared id would lace tokens of
    // different bench rows into phantom cross-row shingles
    val benchShingles = Dedup
      .shingleRows(
        bench.select(monotonically_increasing_id().as("__b"), col(s"`$benchTextCol`")),
        "__b", benchTextCol, shingleN)
      .select(col("shingle")).distinct()
    Dedup.shingleRows(docs, idCol, textCol, shingleN)
      .select(col(s"`$idCol`"), col("shingle")).distinct()
      .join(benchShingles, "shingle")
      .groupBy(col(s"`$idCol`"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Drop every document overlapping the benchmark by at least `minHits`
    * distinct shingles; everything else passes through untouched. */
  def removeContaminated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      shingleN: Int = 13,
      minHits: Long = 1L): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val flagged = overlapReport(docs, idCol, textCol, bench, benchTextCol, shingleN)
      .filter(col("n_hits") >= minHits)
      .select(col(s"`$idCol`"))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
