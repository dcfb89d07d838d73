package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (beyond-reference, SURVEY.md §2.4): dataset
  * versioning for training corpora — given two snapshots keyed by a
  * unique document id, classify every key as `added` / `removed` /
  * `changed` / `unchanged`. This is the audit step before shipping a
  * refreshed crawl: "what did the new pipeline run actually change?"
  *
  * 100 TB shape: each side is reduced to (key, md5-of-content) in a
  * narrow projection BEFORE the full-outer join, so the shuffle carries a
  * 32-char hash per row — never document text. The join shuffles on the
  * key; AQE's skew handling applies as usual. Content equality is
  * md5-over-canonical-JSON (`to_json(struct(cols))`), the same canonical
  * form `Source.identity` uses — field order is the struct order and JSON
  * escaping prevents value forging, so hash equality ⟺ value equality
  * modulo md5 collisions.
  *
  * Contract: `keyCol` must be unique within each snapshot (a duplicated
  * key would fan out in the full-outer join); corpus doc-ids satisfy this
  * by construction.
  */
object Diff {

  /** Per-key status frame: (keyCol, status). */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def sig(df: DataFrame, as: String) = df.select(col(s"`$keyCol`"),
      md5(to_json(struct(compareCols.map(c => col(s"`$c`")): _*))).as(as))
    // using-join on the key: Spark coalesces the key column for us
    sig(oldDf, "__sig_old").join(sig(newDf, "__sig_new"), Seq(keyCol), "full_outer")
      .select(col(s"`$keyCol`"),
        when(col("__sig_old").isNull, lit("added"))
          .when(col("__sig_new").isNull, lit("removed"))
          .when(col("__sig_old") === col("__sig_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Roll the per-key statuses up to one row per status with counts —
    * the 4-row summary a release gate actually inspects. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame =
    corpusDiff(oldDf, newDf, keyCol, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}
