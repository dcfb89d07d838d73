package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level duplicate-LINE removal (beyond-reference, SURVEY.md
  * §2.4) — the CCNet/RefinedWeb boilerplate pass: a line (nav bar, cookie
  * banner, license header) that recurs across ≥ `minDocs` DISTINCT
  * documents is boilerplate and is struck from every document, preserving
  * the order of the surviving lines. This is the segment-granular
  * complement of doc-level dedup: no document pair need be similar for
  * the corpus to carry gigabytes of repeated lines.
  *
  * 100 TB shape, stage by stage:
  *  - split/posexplode is narrow (CPU only);
  *  - the recurrence count shuffles (line-hash, doc id) pairs — 60-bit
  *    md5 hashes, never line text — then counts distinct docs per hash
  *    with a map-side-combinable distinct+count;
  *  - the boilerplate set (hashes with count ≥ minDocs) joins back onto
  *    the exploded stream as a LEFT ANTI keyed by the same hash — no
  *    driver materialization, no broadcast assumption: boilerplate at
  *    web scale is itself huge;
  *  - reassembly groups by doc id: collect_list of (pos, line) structs,
  *    array_sort, concat — the [[Centroids]] reassembly pattern, bounded
  *    by lines-per-doc.
  *
  * Blank/whitespace-only lines are never treated as boilerplate (they
  * trivially recur everywhere; striking them would collapse every
  * paragraph break corpus-wide). A doc whose every line is boilerplate
  * survives with empty text (the row is kept — dropping it silently
  * would make the operator also a filter; compose with a length filter
  * when that is wanted). Output:
  * the input columns with `textCol` rewritten, plus n_lines_kept /
  * n_lines_removed (ints). */
object LineDedup {

  def removeDuplicateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
      delim: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (1 would strike every line), got $minDocs")
    require(delim.nonEmpty, "delim must be non-empty")
    (Seq("n_lines_kept", "n_lines_removed") intersect df.columns).foreach(c =>
      throw new IllegalArgumentException(s"output column '$c' already exists in the input"))
    (Seq("__ld_pos", "__ld_line", "__ld_h", "__ld_docs", "__ld_text", "__ld_total")
        intersect df.columns).foreach(c =>
      throw new IllegalArgumentException(s"column name '$c' is reserved by removeDuplicateLines"))
    val id = col(s"`$idCol`")
    val others = df.columns.filterNot(c => c == idCol || c == textCol)
    // literal (non-regex) delimiter split, so "\n" or "||" both behave
    // null text reads as empty (one "" line) rather than silently
    // dropping the doc from the exploded stream
    val lines = df.select(id, col(s"`$textCol`"),
        posexplode(split(coalesce(col(s"`$textCol`"), lit("")),
          java.util.regex.Pattern.quote(delim)))
          .as(Seq("__ld_pos", "__ld_line")))
      .withColumn("__ld_h", graft.functions.TextFunctions.md5Hash60(col("__ld_line")))
    // lines recurring in >= minDocs distinct docs; (hash, doc) distinct
    // happens inside the aggregate, map-side combined. Blank/whitespace
    // lines are EXEMPT: "" trivially recurs everywhere, and striking it
    // would silently collapse every paragraph break corpus-wide — exactly
    // the structure the order-preserving rebuild promises to keep.
    val boilerplate = lines
      .filter(trim(col("__ld_line")) =!= "")
      .select(col("__ld_h"), id)
      .distinct()
      .groupBy(col("__ld_h"))
      .agg(count(lit(1)).as("__ld_docs"))
      .filter(col("__ld_docs") >= minDocs)
      .select(col("__ld_h"))
    val kept = lines.join(boilerplate, Seq("__ld_h"), "left_anti")
    val rebuilt = kept.groupBy(id)
      .agg(
        concat_ws(delim, transform(
          array_sort(collect_list(struct(col("__ld_pos"), col("__ld_line")))),
          x => x.getField("__ld_line"))).as("__ld_text"),
        count(lit(1)).cast("int").as("n_lines_kept"))
    // left join: docs whose every line was struck keep an empty text
    val total = df.withColumn("__ld_total",
      size(split(coalesce(col(s"`$textCol`"), lit("")),
        java.util.regex.Pattern.quote(delim))))
    total.join(rebuilt, Seq(idCol), "left")
      .select(
        (Seq(id) ++ others.map(c => col(s"`$c`")) :+
          coalesce(col("__ld_text"), lit("")).as(textCol) :+
          coalesce(col("n_lines_kept"), lit(0)).as("n_lines_kept") :+
          (col("__ld_total") - coalesce(col("n_lines_kept"), lit(0)))
            .cast("int").as("n_lines_removed")): _*)
  }
}
