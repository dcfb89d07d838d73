package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range/interval join (beyond-reference, SURVEY.md §2.4).
  *
  * Spark plans a bare `p >= lo AND p < hi` join as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) work that only
  * survives when one side is tiny. This operator turns it into a shuffle
  * EQUI-join: quantize the number line into bins of `binWidth`, tag each
  * point with its bin, replicate each interval once per bin it overlaps
  * (`ceil(width / binWidth) + 1` copies), hash-join on the bin, then apply
  * the exact range predicate as a residual filter.
  *
  * 100 TB economics: shuffle volume is |points| + |intervals| × binsPer
  * Interval, work per reducer is (points in bin) × (intervals touching
  * bin) — local, not global, products. Choose `binWidth` near the p95
  * interval width so binsPerInterval stays 1–2. Dense value regions make
  * hot bins; AQE's skew-join split handles them (equi-join!), or pass
  * `saltBuckets > 1` to spread each hot bin over that many reducers via
  * [[Scale.saltedJoin]] (interval side replicates once per salt — cheap,
  * intervals are the small side). A runtime guard fails fast if one
  * interval would fan out past `maxBinsPerInterval` (a mis-chosen
  * binWidth at TB scale should die in seconds, not OOM an hour in).
  */
object RangeJoin {

  private val BinCol = "__rj_bin"

  /** Inner-join `points` to every interval [lo, hi) — hi exclusive,
    * matching the half-open convention of time windows — that contains
    * `points(pointCol)`. Null points/bounds and empty intervals
    * (hi <= lo) drop out, as an inner range join implies. Output columns:
    * all of `points` then all of `intervals` (names must not collide).
    */
  def binnedIntervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      maxBinsPerInterval: Int = 4096,
      saltBuckets: Int = 1): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0, s"maxBinsPerInterval must be positive")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    (points.columns ++ intervals.columns).foreach(c =>
      require(c != BinCol && c != "__salt",
        s"column names '$BinCol'/'__salt' are reserved by binnedIntervalJoin"))
    val dupes = points.columns.intersect(intervals.columns)
    require(dupes.isEmpty,
      s"binnedIntervalJoin: both sides define ${dupes.mkString(", ")} — rename before joining")

    val p = col(s"`$pointCol`")
    val lo = col(s"`$loCol`")
    val hi = col(s"`$hiCol`")
    val loBin = floor(lo / binWidth).cast("long")
    // hi is exclusive but a non-aligned hi still reaches into bin
    // floor(hi/w); the residual filter discards the overshoot
    val hiBin = floor(hi / binWidth).cast("long")

    val taggedPoints = points.withColumn(BinCol, floor(p / binWidth).cast("long"))
    val taggedIntervals = intervals
      .filter(hi > lo)
      .withColumn(BinCol, explode(
        when(hiBin - loBin < maxBinsPerInterval, sequence(loBin, hiBin))
          .otherwise(raise_error(concat(
            lit(s"binnedIntervalJoin: interval ["), lo.cast("string"), lit(", "),
            hi.cast("string"),
            lit(s") spans more than $maxBinsPerInterval bins of width $binWidth — " +
              "raise binWidth or maxBinsPerInterval"))))))

    // a point lies in exactly one bin, so each (point, interval) pair meets
    // at most once — no post-join dedup needed
    val joined =
      if (saltBuckets == 1) taggedPoints.join(taggedIntervals, BinCol)
      else Scale.saltedJoin(taggedPoints, taggedIntervals, Seq(BinCol),
        how = "inner", saltBuckets = saltBuckets)
    joined
      .filter(p >= lo && p < hi)
      .drop(BinCol)
  }
}
