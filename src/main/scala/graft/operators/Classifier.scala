package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hash-feature linear text classifier (the fastText architecture,
  * Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification") — beyond-reference per SURVEY.md §2.4: the standard
  * cheap quality/domain classifier every large-scale pretraining
  * pipeline runs over its corpus (e.g. the GPT-3 / CCNet-style
  * "looks-like-reference-text" filters), structured exactly like a
  * trained model but with engine-portable DETERMINISTIC weights so the
  * whole pipeline is oracle-able: bucket = shared 60-bit md5 of the
  * gram mod nBuckets, weight_b = md5(seed:b)/2^59 − 1 ∈ [−1, 1) (an
  * exact power-of-two scaling — no FP rounding), logit = Σ c_b·w_b / n
  * (count-weighted mean feature weight), prob = σ(logit). Swapping in
  * real trained weights is a one-frame substitution (`weights`).
  *
  * 100 TB shape: one gram explode → a codegen'd per-occurrence weight
  * PROJECTION (the weight vector is nBuckets doubles, derived on the
  * driver or caller-supplied, folded into the plan as an array literal
  * — no weight-table join at all) → ONE per-doc aggregation whose
  * map-side combine collapses every partition to one (count, decimal
  * sum) row per doc BEFORE the shuffle. Two earlier shapes measured
  * worse at sf0.1: grouping by (doc, bucket) then joining a weight
  * frame shuffled nearly every gram occurrence (~400 grams over 4096
  * buckets per doc combine almost nothing — 6.0 s median), and folding
  * the gram array with an `aggregate` HOF avoided the shuffle but fell
  * out of whole-stage codegen (higher-order lambdas evaluate
  * interpreted — 19 s). This shape measures ~5.6 s median / 4.6 s min;
  * the residual cost is the per-occurrence md5 itself — the price of
  * the engine-portable hash contract, linear and embarrassingly
  * parallel. Per-occurrence weights cast to DECIMAL(25,9) and summed —
  * order-independent, so the DuckDB oracle's per-occurrence SUM
  * matches exactly; exp/sigmoid round through the 9-dp decimal
  * contract.
  *
  * Docs with zero features (null/empty text) keep their row:
  * n_features = 0, logit/prob NULL (unknown, not 0.5 — a pipeline must
  * decide explicitly what to do with unscorable docs).
  */
object Classifier {

  private val Dec = DecimalType(25, 9)

  private def round9(c: Column): Column =
    round(c.cast(DecimalType(25, 12)), 9).cast("double")

  /** The deterministic default weights as a driver-side vector:
    * w_b = md5Hash60("w:seed:b")/2^59 − 1 ∈ [−1, 1) (both steps exact
    * in binary64; the md5 is the same digest Spark and DuckDB compute).
    * nBuckets doubles — bounded, never a dataset. */
  def weightVector(nBuckets: Int, seed: String): IndexedSeq[Double] =
    (0 until nBuckets).map { b =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$seed:$b".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
      h.toDouble / 576460752303423488.0 - 1.0
    }

  /** [[weightVector]] as a (bucket, w) frame — the shape a TRAINED
    * weight table would arrive in, and what the DuckDB oracle rebuilds;
    * ClassifierSpec asserts it matches the vector bit-for-bit. */
  def weightTable(spark: org.apache.spark.sql.SparkSession, nBuckets: Int,
      seed: String): DataFrame =
    spark.range(nBuckets).select(
      col("id").as("__bucket"),
      (graft.functions.TextFunctions.md5Hash60(
        concat(lit(s"w:$seed:"), col("id").cast("string")))
        .cast("double") / lit(576460752303423488.0) - lit(1.0)).as("__w"))

  /** Score every document: (idCol, n_features long, logit double,
    * prob double). `useBigrams` adds word-bigram features to the unigram
    * bag (the fastText default); pass `weights` to score under a trained
    * vector instead of the deterministic default.
    *
    * PRECONDITION: `idCol` must be unique in `docs`. The gram explode
    * aggregates BY ID, so duplicate ids would pool all copies' grams into
    * one score, and the output emits ONE row per distinct id (the final
    * re-join restores zero-feature docs from the distinct id set, not
    * from the input's row multiplicity). */
  def hashClassifierScore(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4096, seed: String = "clf",
      useBigrams: Boolean = true,
      weights: Option[Seq[Double]] = None): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    weights.foreach(w => require(w.size == nBuckets,
      s"weights size ${w.size} != nBuckets $nBuckets"))
    val id = col(s"`$idCol`")
    // lowercased features (the fastText preprocessing default); the
    // oracle reuses the shared toksLowerSql tokenization verbatim
    val text = lower(coalesce(col(s"`$textCol`"), lit("")))
    import graft.functions.TextFunctions.{tokens, shingles, md5Hash60}
    val wArr = typedlit(weights.map(_.toIndexedSeq)
      .getOrElse(weightVector(nBuckets, seed)))
    val grams =
      if (useBigrams) concat(tokens(text), shingles(text, 2)) else tokens(text)
    val wOf = (g: Column) => element_at(wArr,
      (pmod(md5Hash60(concat(lit(s"$seed:"), g)), lit(nBuckets.toLong)) + 1L)
        .cast("int"))
    val scored = docs
      .select(id, explode(grams).as("__g"))
      .filter(col("__g") =!= "")
      .select(id, wOf(col("__g")).cast(Dec).as("__w9"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_features"), sum(col("__w9")).as("__dot"))
      .withColumn("logit",
        round9(col("__dot").cast("double") / col("n_features").cast("double")))
      .withColumn("prob",
        round9(lit(1.0) / (lit(1.0) + round9(exp(-col("logit"))))))
      .select(id, col("n_features"), col("logit"), col("prob"))
    docs.select(id).distinct()
      .join(scored, Seq(idCol), "left")
      .withColumn("n_features", coalesce(col("n_features"), lit(0L)))
  }
}
