package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group embedding centroids (beyond-reference, SURVEY.md §2.4) — the
  * aggregation behind IVF training, cluster summaries and per-label
  * prototype vectors.
  *
  * Shape: posexplode the vector (map-side, CPU only), partial-aggregate
  * per (group, position) — Spark's partial agg collapses each task's
  * contribution to at most |groups| × dim rows BEFORE the exchange — then
  * reassemble the dim-length array per group. At 100 TB the shuffle
  * carries only dim-sized partial sums per (task, group), never vectors;
  * total reducer input is O(tasks × groups × dim), independent of row
  * count. The final collect_list is bounded by dim.
  *
  * Sums go through the engine-portable DECIMAL(25,6) accumulator (values
  * cast float→double→decimal), so results are addition-order-free. The
  * output carries BOTH the rounded means (`centroid`) and the exact
  * decimal sums (`centroid_sum`, DECIMAL(38,6)): sums + n_vecs are the
  * MERGEABLE form — shard-level partial centroids combine by adding sums
  * and counts, which a mean cannot do — and, being exact, they are what
  * the p19 gate hash-compares against the DuckDB oracle (a divided mean
  * can land on a round-half tie where the engines' double rounding
  * legitimately differs by 1 ulp; the sums cannot).
  *
  * Consumers: the p19 gate query (per-label centroids of `embeddings`) and
  * [[Similarity.ivfCentroidsRefined]], which uses this aggregation as the
  * distributed mean-update step of spherical k-means refinement.
  *
  * Vectors must share one dimensionality per group (ragged input would
  * average positions over differing counts; n_vecs reports the max count).
  */
object Centroids {

  def groupCentroids(
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      roundTo: Int = 9): DataFrame = {
    val g = col(s"`$groupCol`")
    val perPos = df
      .select(g, posexplode(col(s"`$vecCol`")).as(Seq("__c_pos", "__c_val")))
      .groupBy(g, col("__c_pos"))
      .agg(
        sum(col("__c_val").cast("double").cast(DecimalType(25, 6)))
          .cast(DecimalType(38, 6)).as("__c_s"),
        count(lit(1)).as("__c_n"))
      .withColumn("__c_m",
        round(col("__c_s").cast("double") / col("__c_n"), roundTo))
    perPos
      .groupBy(g)
      .agg(
        max(col("__c_n")).as("n_vecs"),
        transform(
          array_sort(collect_list(struct(col("__c_pos"), col("__c_m")))),
          x => x.getField("__c_m")).as("centroid"),
        transform(
          array_sort(collect_list(struct(col("__c_pos"), col("__c_s")))),
          x => x.getField("__c_s")).as("centroid_sum"))
  }
}
