package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranking-metric evaluation for corpus filters (beyond-reference per
  * SURVEY.md §2.4): a quality/domain classifier is only trustworthy if
  * its score actually separates the classes, and the metric every
  * filtering pipeline reports is AUC — here the exact Mann–Whitney
  * formulation with the standard midrank tie correction
  * (AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻)).
  *
  * Exactness and engine portability: ranks are never materialized per
  * row — scores aggregate per DISTINCT value, the tie block's doubled
  * midrank 2·r̄ = 2·cumBefore + t + 1 is an integer, and
  * AUC = (Σ⁺2r̄ − n⁺(n⁺+1)) / (2·n⁺·n⁻) is ONE division of two exact
  * integers — bit-identical in any engine, no FP accumulation anywhere.
  *
  * 100 TB shape: one (group, score) count aggregation (map-side
  * combinable — raw rows collapse before any sort), one per-group
  * window over the DISTINCT-score frame (a single range exchange +
  * sort of distinct values, not rows), one final aggregation. The
  * integer sums hold exactly to ~2·10⁹ rows per group (2n² < 2⁶³);
  * past that, swap the three sums to DECIMAL(38,0) — same plan, exact
  * to 10³⁸ — at the cost of the decimal→double cast's 1-ulp
  * cross-engine caveat on the final division. */
object Eval {

  /** Per-group AUC of `scoreCol` against boolean `labelCol` (true =
    * positive). Rows with a NULL score or label are dropped — an
    * unlabeled row must not silently count as a negative. Output:
    * (groupCol, n_pos long, n_neg long, auc double — NULL when either
    * class is empty, where AUC is undefined). */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = col(s"`$groupCol`")
    val s = col(s"`$scoreCol`")
    val lbl = col(s"`$labelCol`")
    val perScore = df
      .filter(s.isNotNull && lbl.isNotNull)
      .groupBy(g, s.as("__s"))
      .agg(count(lit(1)).as("__t"),
        sum(when(lbl, 1L).otherwise(0L)).as("__p"))
    val w = Window.partitionBy(g).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("__cb", coalesce(sum(col("__t")).over(w), lit(0L)))
      .groupBy(g)
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__t") - col("__p")).as("n_neg"),
        sum(col("__p") * (col("__cb") * 2L + col("__t") + 1L)).as("__r2"))
      .withColumn("auc",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          (col("__r2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
            (col("n_pos") * col("n_neg") * 2L).cast("double")))
      .select(g, col("n_pos"), col("n_neg"), col("auc"))
  }

  /** Recall/precision of an approximate PAIR set against an exact
    * reference pair set — the blocking-quality audit for any candidate
    * generator (MinHash-LSH vs the exact prefix join, SimHash blocking
    * vs brute force): [[graft.operators.Similarity.recallAtK]]'s dedup
    * counterpart. Pairs match UNORDERED (each side canonicalizes to
    * (min, max) and dedups), so emit order never matters. One row:
    * (n_approx, n_exact, n_hit long, recall, precision double — NULL
    * where the denominator set is empty). Exact integer counts, one
    * IEEE division each.
    *
    * 100 TB shape: two distinct-pair aggregations + one equi-join on
    * the canonical pair key; three 1-row aggregates cross-join at the
    * end. Nothing besides pair ids ever shuffles. */
  def pairRecall(approx: DataFrame, exact: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    def canon(df: DataFrame): DataFrame = df.select(
        least(col(s"`$aCol`"), col(s"`$bCol`")).as("__pa"),
        greatest(col(s"`$aCol`"), col(s"`$bCol`")).as("__pb"))
      .filter(col("__pa").isNotNull && col("__pb").isNotNull)
      .distinct()
    val ap = canon(approx)
    val ex = canon(exact)
    ap.agg(count(lit(1)).as("n_approx"))
      .crossJoin(ex.agg(count(lit(1)).as("n_exact")))
      .crossJoin(ap.join(ex, Seq("__pa", "__pb")).agg(count(lit(1)).as("n_hit")))
      .select(col("n_approx"), col("n_exact"), col("n_hit"),
        when(col("n_exact") > 0L,
          col("n_hit").cast("double") / col("n_exact").cast("double")).as("recall"),
        when(col("n_approx") > 0L,
          col("n_hit").cast("double") / col("n_approx").cast("double")).as("precision"))
  }

  /** Cohen's kappa inter-annotator agreement (Cohen 1960) over two
    * categorical label columns — the labeled-data QA gate run before any
    * human- or model-annotated corpus is trusted: raw agreement p_o
    * corrected for the agreement p_e two independent annotators with
    * these marginals would reach by chance. One row: (n, n_agree long,
    * po, pe, kappa double — (p_o − p_e)/(1 − p_e), NULL when n = 0 or
    * p_e = 1, i.e. both raters constant). Rows where either label is
    * NULL drop (unlabeled, not a disagreement).
    *
    * Exactness: agreement and the marginal cross products Σ n_a·n_b are
    * exact integers (DECIMAL(38,0)-accumulated); p_o, p_e, kappa are a
    * fixed IEEE tree over them.
    *
    * 100 TB shape: one pass for totals, two marginal aggregations over
    * label cardinality, one category-keyed equi-join of the (tiny)
    * marginal frames; the staged base feeds all three. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String,
      stager: Stager = Stager.LocalCheckpoint): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = stager.stage(
      df.filter(col(s"`$aCol`").isNotNull && col(s"`$bCol`").isNotNull)
        .select(col(s"`$aCol`").cast("string").as("__a"),
          col(s"`$bCol`").cast("string").as("__b")),
      s"kappa_base_${java.util.UUID.randomUUID().toString.take(8)}")
    val tot = base.agg(count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("n_agree"))
    val ma = base.groupBy(col("__a")).agg(count(lit(1)).as("__na"))
    val mb = base.groupBy(col("__b")).agg(count(lit(1)).as("__nb"))
    val cross = ma.join(mb, ma("__a") === mb("__b"))
      .agg(coalesce(sum((col("__na") * col("__nb")).cast(dec38)),
        lit(0).cast(dec38)).as("__pesum"))
    tot.crossJoin(cross)
      .withColumn("po", when(col("n") > 0L,
        col("n_agree").cast("double") / col("n").cast("double")))
      .withColumn("pe", when(col("n") > 0L, col("__pesum").cast("double") /
        (col("n").cast("double") * col("n").cast("double"))))
      .withColumn("kappa", when(col("pe") < 1.0,
        (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
      .select(col("n"), col("n_agree"), col("po"), col("pe"), col("kappa"))
  }

  /** Reliability-diagram calibration bins for a [0,1] score against a
    * boolean label — the "does prob 0.8 mean 80%?" audit run on every
    * quality/toxicity classifier before its threshold gates a corpus
    * (Niculescu-Mizil & Caruana 2005 popularized the diagnostic). Rows
    * with NULL score or label drop; out-of-range scores clamp into the
    * edge bins. Output, one row per OBSERVED bin (empty bins are
    * absent): (bin long — floor(score·nBins) clamped to nBins−1,
    * bin_lo double — bin/nBins, n, n_pos long, mean_score double —
    * DECIMAL(25,9)-accumulated, frac_pos double). A well-calibrated
    * score has mean_score ≈ frac_pos per row.
    *
    * 100 TB shape: one map-side-combinable aggregation over ≤ nBins
    * groups; nothing else shuffles. */
  def calibrationCurve(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val dec = org.apache.spark.sql.types.DecimalType(25, 9)
    val s = col(s"`$scoreCol`").cast("double")
    val l = col(s"`$labelCol`")
    df.filter(s.isNotNull && l.isNotNull)
      .select(greatest(least(floor(s * nBins).cast("long"),
          lit(nBins.toLong - 1L)), lit(0L)).as("bin"),
        s.as("__s"), l.cast("boolean").as("__l"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"),
        (sum(col("__s").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("mean_score"))
      .select(col("bin"),
        (col("bin").cast("double") / lit(nBins.toDouble)).as("bin_lo"),
        col("n"), col("n_pos"), col("mean_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos"))
  }

  /** Krippendorff's alpha for nominal labels (Krippendorff, "Content
    * Analysis", 2004) — the inter-annotator agreement statistic that,
    * unlike [[cohenKappa]], handles ANY number of raters per item and
    * missing ratings, which is what real labeling campaigns produce.
    * Input is LONG format: one row per rating (itemCol, labelCol) —
    * the rater identity is irrelevant to the statistic. Items with
    * fewer than 2 ratings are unpairable and drop (the standard
    * treatment); rows with NULL item or label drop. One row:
    * (n_items, n_ratings, n_labels longs — over pairable items only,
    * d_o double — Σ_i (m_i² − Σ_c n_ic²)/(m_i − 1), the within-item
    * disagreement, d_e double — (N² − Σ_c n_c²)/(N − 1), the expected
    * disagreement, alpha double — 1 − d_o/d_e, NULL when d_e = 0,
    * i.e. every rating is one label).
    *
    * Exactness: all pair counts (m_i² − Σn_ic², N² − Σn_c²) are exact
    * DECIMAL(38,0) integers; each item's term takes ONE IEEE division
    * and quantizes to DECIMAL(25,9) for an order-independent sum;
    * d_e and alpha are a fixed IEEE tree over the exact totals.
    *
    * 100 TB shape: one hash shuffle to (item, label) counts (map-side
    * combinable), one item rollup, one label rollup — frames shrink at
    * every step; nothing row-sized shuffles twice. */
  def krippendorffAlpha(df: DataFrame, itemCol: String, labelCol: String,
      stager: Stager = Stager.LocalCheckpoint): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec25_9 = org.apache.spark.sql.types.DecimalType(25, 9)
    val item = col(s"`$itemCol`")
    val label = col(s"`$labelCol`")
    // staged: the (item, label) count frame feeds the item terms AND the
    // label marginals — unstaged, the corpus shuffle re-runs per consumer
    val counts = stager.stage(
      df.filter(item.isNotNull && label.isNotNull)
        .groupBy(item.as("__i"), label.cast("string").as("__c"))
        .agg(count(lit(1)).as("__n")),
      s"kripp_counts_${java.util.UUID.randomUUID().toString.take(8)}")
    val items = counts.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum((col("__n") * col("__n")).cast(dec38)).as("__ss"))
      .filter(col("__m") >= 2L)
    val dO = items.agg(
      count(lit(1)).as("n_items"),
      // m is a per-item RATER count — m*m rides plain longs (the p113
      // na*nb pattern); only the corpus-sized n_ratings² below needs
      // decimal-first arithmetic
      sum(((((col("__m") * col("__m")).cast(dec38) - col("__ss")).cast("double")) /
        (col("__m") - 1L).cast("double")).cast(dec25_9)).as("__do"))
    // label marginals over PAIRABLE items only
    val pairable = counts.join(items.select(col("__i")), Seq("__i"))
    val labels = pairable.groupBy(col("__c")).agg(sum(col("__n")).as("__nc"))
    val dE = labels.agg(
      coalesce(sum(col("__nc")), lit(0L)).as("n_ratings"),
      count(lit(1)).as("n_labels"),
      coalesce(sum((col("__nc").cast(dec38) * col("__nc"))),
        lit(0).cast(dec38)).as("__ncss"))
    dO.crossJoin(dE)
      .withColumn("d_o", col("__do").cast("double"))
      .withColumn("d_e", when(col("n_ratings") > 1L,
        (col("n_ratings").cast(dec38) * col("n_ratings") - col("__ncss"))
          .cast("double") / (col("n_ratings") - 1L).cast("double")))
      .select(col("n_items"), col("n_ratings"), col("n_labels"),
        col("d_o"), col("d_e"),
        when(col("d_e") > 0.0,
          lit(1.0) - col("d_o") / col("d_e")).as("alpha"))
  }
}
