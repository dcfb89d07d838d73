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

  /** Simplified (centroid-based) silhouette score per cluster — the
    * cluster-quality audit for an embedding clustering (IVF cells,
    * SemDeDup groups, topic labels): for each vector, a = Euclidean
    * distance to its OWN cluster centroid, b = distance to the NEAREST
    * other centroid, s = (b − a)/max(a, b) (Rousseeuw 1987's silhouette
    * with the O(n·k) centroid simplification — the form that scales;
    * the classic all-pairs silhouette is O(n²) and dies first).
    * Output, one row per cluster: (labelCol, n_vecs long, mean_intra,
    * mean_inter, mean_silhouette doubles — mean_silhouette NULL when
    * only one cluster exists, 0.0-convention for a==b==0 coincident
    * points). Rows with NULL label or vector drop.
    *
    * Exactness: centroids are [[groupCentroids]]' decimal-exact sums
    * divided ONCE, unrounded — the quotient of an exactly-cast decimal
    * by a count is correctly rounded identically in any IEEE engine,
    * whereas a round(x, 9) post-pass is implementation-defined at the
    * boundary (measured: 1-ulp engine skew at sf0.001) —; every
    * squared-difference term
    * quantizes to DECIMAL(25,12) and sums order-independently (no
    * reliance on either engine's list-fold order); the min over other
    * centroids compares exact decimals; sqrt is IEEE-correctly-rounded;
    * reported means are DECIMAL(25,9)-accumulated quotients.
    *
    * 100 TB shape: vectors explode once to (id, pos) terms, join the
    * broadcast (label, pos) centroid frame, and partial-aggregate to
    * (id, cluster) distances map-side — the shuffle carries
    * rows × k distance rows, never vector bodies; k (cluster count) is
    * bounded by the broadcast. */
  def silhouette(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    val dec12 = DecimalType(25, 12)
    val dec9 = DecimalType(25, 9)
    val g = col(s"`$labelCol`")
    val base = df.filter(g.isNotNull && col(s"`$vecCol`").isNotNull)
    val cpos = groupCentroids(base, labelCol, vecCol)
      .select(g.as("__cl"), col("n_vecs"),
        posexplode(col("centroid_sum")).as(Seq("__p", "__cs")))
      .withColumn("__c", col("__cs").cast("double") / col("n_vecs"))
      .select(col("__cl"), col("__p").cast("long").as("__p"), col("__c"))
    val vpos = base.select(col(s"`$idCol`").as("__id"), g.as("__l"),
        posexplode(col(s"`$vecCol`")).as(Seq("__p", "__x")))
      .withColumn("__p", col("__p").cast("long"))
      .withColumn("__x", col("__x").cast("double"))
    val d2 = vpos.join(broadcast(cpos), Seq("__p"))
      .groupBy(col("__id"), col("__l"), col("__cl"))
      .agg(sum(((col("__x") - col("__c")) * (col("__x") - col("__c")))
        .cast(dec12)).as("__d2"))
    val perVec = d2.groupBy(col("__id"), col("__l"))
      .agg(max(when(col("__cl") === col("__l"), col("__d2"))).as("__a2"),
        min(when(col("__cl") =!= col("__l"), col("__d2"))).as("__b2"))
      .withColumn("__a", sqrt(col("__a2").cast("double")))
      .withColumn("__b", sqrt(col("__b2").cast("double")))
      .withColumn("__s", when(col("__a2").isNotNull && col("__b2").isNotNull,
        when(greatest(col("__a"), col("__b")) > 0.0,
          (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(lit(0.0))))
    perVec.groupBy(col("__l"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("__a").cast(dec9)).cast("double") /
          count(col("__a")).cast("double")).as("mean_intra"),
        when(count(col("__s")) > 0L,
          sum(col("__b").cast(dec9)).cast("double") /
            count(col("__b")).cast("double")).as("mean_inter"),
        when(count(col("__s")) > 0L,
          sum(col("__s").cast(dec9)).cast("double") /
            count(col("__s")).cast("double")).as("mean_silhouette"))
      .select(col("__l").as(labelCol), col("n_vecs"), col("mean_intra"),
        col("mean_inter"), col("mean_silhouette"))
  }

  /** Pairwise cosine similarity between group centroids — the
    * "which sources/labels are semantically close" matrix that guides
    * mixture weighting and dedup-across-sources triage. Works on
    * [[groupCentroids]]' EXACT decimal per-dimension sums: cos(mean_a,
    * mean_b) = cos(sum_a, sum_b) because the 1/n scalings cancel, so no
    * division touches the vectors at all. Output per unordered label
    * pair (label_a < label_b): (label_a, label_b, n_a, n_b longs,
    * cosine double — 9-dp rounded; NULL when either centroid is
    * all-zero).
    *
    * Exactness: each cross/self term is a product of two
    * correctly-rounded doubles (one IEEE op), quantized to
    * DECIMAL(25,12) and summed order-free; the final cosine is
    * dot / (sqrt(na2)·sqrt(nb2)) — an identical three-op IEEE tree in
    * the oracle.
    *
    * 100 TB shape: vectors collapse to the |labels|·dim centroid-sum
    * frame in [[groupCentroids]]' one aggregation; the pair join is an
    * equi-join ON THE DIMENSION INDEX of that tiny frame (fan-out
    * |labels|² per dimension — grid-sized, never data-sized). */
  def centroidSimilarityMatrix(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val dec12 = DecimalType(25, 12)
    val cents = groupCentroids(df, labelCol, vecCol)
      .select(col(s"`$labelCol`").as("__l"), col("n_vecs"),
        posexplode(col("centroid_sum")).as(Seq("__pos", "__s")))
      .select(col("__l"), col("n_vecs"), col("__pos"),
        col("__s").cast("double").as("__sd"))
    val a = cents.select(col("__l").as("label_a"), col("n_vecs").as("n_a"),
      col("__pos"), col("__sd").as("__sa"))
    val b = cents.select(col("__l").as("label_b"), col("n_vecs").as("n_b"),
      col("__pos"), col("__sd").as("__sb"))
    a.join(b, Seq("__pos")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum((col("__sa") * col("__sb")).cast(dec12)).as("__dot"),
        sum((col("__sa") * col("__sa")).cast(dec12)).as("__na2"),
        sum((col("__sb") * col("__sb")).cast(dec12)).as("__nb2"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        when(col("__na2") > 0 && col("__nb2") > 0,
          round(col("__dot").cast("double") /
            (sqrt(col("__na2").cast("double")) *
              sqrt(col("__nb2").cast("double"))), 9)).as("cosine"))
  }
}
