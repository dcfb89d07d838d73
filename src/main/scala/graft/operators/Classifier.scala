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
  * 100 TB shape: one token/bigram explode → one (id, bucket) count
  * aggregation (map-side combinable) → broadcast join against the
  * nBuckets-row weight table → one per-doc sum. No shuffle carries
  * text; the weight table is O(nBuckets) and built from `range`, never
  * collected. All arithmetic is codegen'd Catalyst (products through
  * DECIMAL(25,9), the p26 contract, so sums are order-independent);
  * exp/sigmoid round through the 9-dp decimal contract.
  *
  * Docs with zero features (null/empty text) keep their row:
  * n_features = 0, logit/prob NULL (unknown, not 0.5 — a pipeline must
  * decide explicitly what to do with unscorable docs).
  */
object Classifier {

  private val Dec = DecimalType(25, 9)

  private def round9(c: Column): Column =
    round(c.cast(DecimalType(25, 12)), 9).cast("double")

  /** The deterministic weight table: (bucket long, w double), w ∈ [−1, 1).
    * md5Hash60/2^59 − 1 — both steps exact in binary64. */
  def weightTable(spark: org.apache.spark.sql.SparkSession, nBuckets: Int,
      seed: String): DataFrame =
    spark.range(nBuckets).select(
      col("id").as("__bucket"),
      (graft.functions.TextFunctions.md5Hash60(
        concat(lit(s"w:$seed:"), col("id").cast("string")))
        .cast("double") / lit(576460752303423488.0) - lit(1.0)).as("__w"))

  /** Score every document: (idCol, n_features long, logit double,
    * prob double). `useBigrams` adds word-bigram features to the unigram
    * bag (the fastText default). */
  def hashClassifierScore(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4096, seed: String = "clf",
      useBigrams: Boolean = true): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val id = col(s"`$idCol`")
    // lowercased features (the fastText preprocessing default); the
    // oracle reuses the shared toksLowerSql tokenization verbatim
    val text = lower(col(s"`$textCol`"))
    import graft.functions.TextFunctions.{tokens, shingles, md5Hash60}
    // one scan, one explode: unigram and bigram arrays concatenate before
    // the fan-out (a union of two explodes re-reads text twice)
    val gramsArr =
      if (useBigrams) concat(tokens(text), shingles(text, 2)) else tokens(text)
    val grams = docs.select(id, explode(gramsArr).as("__g"))
    val counts = grams
      .filter(col("__g") =!= "")
      .groupBy(id, pmod(md5Hash60(concat(lit(s"$seed:"), col("__g"))),
        lit(nBuckets.toLong)).as("__bucket"))
      .agg(count(lit(1)).as("__c"))
    val scored = counts
      .join(broadcast(weightTable(docs.sparkSession, nBuckets, seed)), Seq("__bucket"))
      .groupBy(id)
      .agg(
        sum(col("__c")).as("n_features"),
        sum((col("__c").cast("double") * col("__w")).cast(Dec)).as("__dot"))
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
