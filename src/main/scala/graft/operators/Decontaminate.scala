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
    // broadcast-join the RAW corpus shingle stream first, dedup only the
    // few survivors: a corpus-wide distinct() before the join would
    // shuffle every shingle string — the exact corpus-sized shuffle the
    // scaladoc promises away. n_hits counts distinct bench shingles
    // either way.
    Dedup.shingleRows(docs, idCol, textCol, shingleN)
      .select(col(s"`$idCol`"), col("shingle"))
      .join(benchShingles, "shingle")
      .distinct()
      .groupBy(col(s"`$idCol`"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Embedding-space decontamination: per training row, how many
    * benchmark vectors lie within cosine >= `threshold` of its embedding,
    * and the closest one — catches paraphrased leakage that n-gram
    * overlap misses. Rows with no hit are absent (inner semantics, like
    * [[overlapReport]]).
    *
    * 100 TB shape: the benchmark embedding set broadcasts (eval sets are
    * small by definition) and the corpus is scanned ONCE with a
    * codegen'd per-pair dot — no shuffle of corpus vectors at all; the
    * only aggregation groups the few surviving hits by doc. For a
    * benchmark too big to broadcast, bucket both sides first with
    * [[Dedup.nearDupPairsEmbeddingLsh]]'s sign-bucket scheme instead. */
  def semanticOverlapReport(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      bench: DataFrame,
      benchVecCol: String,
      threshold: Double): DataFrame = {
    require(threshold > -1 && threshold <= 1, s"threshold must be in (-1, 1], got $threshold")
    import graft.functions.FloatArrayDot
    // degenerate vectors would make the cosine NaN (0/0 on zero norms, or
    // NaN propagated from a NaN component), and Spark orders NaN ABOVE
    // every double — so `NaN >= threshold` AND `NaN > 0` are both true.
    // Guard with !isnan explicitly; a bare `> 0` check would pass NaN.
    val b = bench.select(col(s"`$benchVecCol`").as("__bv"))
      .withColumn("__bn", sqrt(FloatArrayDot.normSq(col("__bv"))))
      .filter(col("__bn") > 0 && !isnan(col("__bn")))
    train.select(col(s"`$idCol`"), col(s"`$vecCol`").as("__tv"))
      .withColumn("__tn", sqrt(FloatArrayDot.normSq(col("__tv"))))
      .filter(col("__tn") > 0 && !isnan(col("__tn")))
      .crossJoin(broadcast(b))
      .withColumn("__cos", FloatArrayDot.dot(col("__tv"), col("__bv"))
        / (col("__tn") * col("__bn")))
      // Inf-component vectors slip past the norm guard (Inf/Inf = NaN here)
      .filter(col("__cos") >= threshold && !isnan(col("__cos")))
      .groupBy(col(s"`$idCol`"))
      .agg(count(lit(1)).as("n_hits"), max(col("__cos")).as("max_cosine"))
  }

  /** Drop every training row within cosine >= `threshold` of any
    * benchmark embedding; everything else passes through untouched. */
  def removeSemanticContaminated(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      bench: DataFrame,
      benchVecCol: String,
      threshold: Double): DataFrame = {
    val flagged = semanticOverlapReport(train, idCol, vecCol, bench, benchVecCol, threshold)
      .select(col(s"`$idCol`"))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Bloom-filter decontamination — the biggest-benchmark scale path.
    *
    * [[removeContaminated]] ships the benchmark's distinct shingle STRINGS
    * to every executor as a broadcast-join hash relation; fine for eval
    * sets, but a huge held-out suite (tens of millions of shingles) blows
    * the broadcast budget long before it stops fitting in a bloom filter
    * (~19 bits per item at fpp 1e-4 vs hundreds of bytes per hash-relation
    * entry). This variant collects the benchmark's distinct 60-bit shingle
    * hashes once (driver-side, bounded by `maxBenchShingles` — the collect
    * is LIMIT-guarded so a runaway benchmark fails fast instead of OOMing
    * the driver), packs them into Spark's own `BloomFilterMightContain`
    * machinery (codegen'd, shipped as one binary literal), and drops every
    * document with a probing shingle. One corpus scan, no join at all; the
    * only shuffle carries the (rare) flagged doc ids.
    *
    * Semantics vs the exact path: false positives over-drop at rate ≤
    * ~`fpp` per shingle (conservative — never under-drops; every exactly
    * contaminated doc is gone), so use the exact variant when the gate
    * must be surgical and this one when the benchmark is huge. */
  def bloomDecontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      shingleN: Int = 13,
      fpp: Double = 1e-4,
      maxBenchShingles: Int = 50000000): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    require(maxBenchShingles >= 1, s"maxBenchShingles must be >= 1, got $maxBenchShingles")
    import graft.functions.TextFunctions.md5Hash60
    val hashes = Dedup
      .shingleRows(
        bench.select(monotonically_increasing_id().as("__b"), col(s"`$benchTextCol`")),
        "__b", benchTextCol, shingleN)
      .select(md5Hash60(col("shingle")).as("h")).distinct()
      .limit(maxBenchShingles + 1)
      .collect().map(_.getLong(0))
    require(hashes.length <= maxBenchShingles,
      s"benchmark has more than $maxBenchShingles distinct shingles; " +
        "raise maxBenchShingles (driver memory permitting) or pre-shard the benchmark")
    val filterBytes =
      org.apache.spark.sql.graft.BloomSketch.build(hashes, hashes.length.toLong, fpp)
    val flagged = Dedup.shingleRows(docs, idCol, textCol, shingleN)
      .filter(org.apache.spark.sql.graft.BloomSketch
        .mightContainLong(filterBytes, md5Hash60(col("shingle"))))
      .select(col(s"`$idCol`")).distinct()
    docs.join(flagged, Seq(idCol), "left_anti")
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

  /** Per-document LONGEST contaminated token span against the benchmark —
    * the severity layer [[overlapReport]] lacks: 20 scattered shingle
    * hits are noise, 20 CONSECUTIVE ones are a verbatim benchmark
    * passage (the signal leak-audits act on, per Brown et al. 2020's
    * 13-gram span rule). Matched shingle START positions per doc are
    * grouped into maximal consecutive runs by the islands-and-gaps
    * identity (pos − rank is constant within a run); a run of r
    * consecutive shingleN-gram starts covers r + shingleN − 1 tokens.
    * Output per overlapping doc (inner semantics, like overlapReport):
    * (idCol, n_hits — matched gram starts, NOT distinct grams, n_runs,
    * max_run, max_span_tokens longs). Tokenization is the repo
    * whitespace+lowercase contract.
    *
    * 100 TB shape: the positioned gram stream is per-doc windowed
    * (partitioned by doc — parallel across docs, the shingleRows
    * contract), hashes to 60-bit before the join, and only HITS — the
    * rare case at scale — reach the islands window and the two bounded
    * aggregations. The benchmark side is a distinct hash set sized for
    * a broadcast (eval sets are small by definition). */
  def contaminationSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      shingleN: Int = 13): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    import graft.functions.TextFunctions.md5Hash60
    import org.apache.spark.sql.expressions.Window
    val id = col(s"`$idCol`")
    val benchGrams = Dedup
      .shingleRows(
        bench.select(monotonically_increasing_id().as("__b"), col(s"`$benchTextCol`")),
        "__b", benchTextCol, shingleN)
      .select(md5Hash60(col("shingle")).as("__gh")).distinct()
    val toks = docs
      .select(id, posexplode(split(lower(col(s"`$textCol`")), "\\s+"))
        .as(Seq("__pos", "__tok")))
      .filter(col("__tok") =!= "")
    val w = Window.partitionBy(id).orderBy(col("__pos"))
    val leads = (1 until shingleN).map(i => lead(col("__tok"), i).over(w).as(s"__t$i"))
    val grams = toks
      .select(id +: col("__tok") +: (row_number().over(w) - 1).cast("long").as("__ix") +: leads: _*)
      .filter(if (shingleN == 1) lit(true) else col(s"__t${shingleN - 1}").isNotNull)
      .select(id, col("__ix"),
        md5Hash60(concat_ws(" ",
          col("__tok") +: (1 until shingleN).map(i => col(s"__t$i")): _*)).as("__gh"))
    val hits = grams.join(benchGrams, Seq("__gh"), "left_semi")
    val wi = Window.partitionBy(id).orderBy(col("__ix"))
    val runs = hits
      .withColumn("__grp", col("__ix") - row_number().over(wi))
      .groupBy(id, col("__grp")).agg(count(lit(1)).as("__run"))
    runs.groupBy(id).agg(
      sum(col("__run")).as("n_hits"),
      count(lit(1)).as("n_runs"),
      max(col("__run")).as("max_run"),
      (max(col("__run")) + lit(shingleN - 1).cast("long")).as("max_span_tokens"))
  }
}
