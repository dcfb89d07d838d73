package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sums over a global ordering — the cumulative scan
  * behind CDF/rank machinery ([[Profile.ksStatistic]],
  * [[Drift.mannWhitneyU]], [[Profile.keySkew]]'s histogram quantiles)
  * WITHOUT `Window.orderBy(...)`'s single-reducer collapse: Spark moves
  * every row of an unpartitioned ordered window to one task, which is
  * fine for a Zipf-bounded histogram but a wall for a frame with
  * millions of distinct values.
  *
  * Same recipe as [[Dedup.sortedNeighborhoodPairs]]'s contiguous global
  * rank: range-exchange on the order key, per-partition running sums,
  * then add a broadcast per-partition offset table whose own running-sum
  * window orders numPartitions rows — never data.
  *
  * Contract: `orderCol` values must be DISTINCT and non-null (every
  * caller here feeds a per-distinct-value count frame, so this is free).
  * With ties the per-partition sum at a tied row would depend on the
  * nondeterministic intra-tie order; with distinct keys the result is
  * exact and reproducible regardless of where the sampled range
  * boundaries land.
  */
object PrefixSum {

  /** Add one INCLUSIVE running-sum column `cum_<c>` (long) per entry of
    * `sumCols`, over ascending `orderCol`. The range-partitioned input
    * is staged (the offset table and the per-partition sums MUST see
    * the same nondeterministic range split — re-evaluating the exchange
    * per consumer could desynchronize them, the
    * [[Dedup.sortedNeighborhoodPairs]] `snm_ranked` rationale);
    * downstream consumers therefore also read the stage, not the
    * original plan. */
  def withRunningSums(df: DataFrame, orderCol: String, sumCols: Seq[String],
      stager: Stager = Stager.LocalCheckpoint): DataFrame = {
    require(sumCols.nonEmpty, "withRunningSums: sumCols must be non-empty")
    val ord = col(s"`$orderCol`")
    val parted = stager.stage(
      df.repartitionByRange(ord).withColumn("__psid", spark_partition_id()),
      s"prefix_sum_${java.util.UUID.randomUUID().toString.take(8)}")
    val wp = Window.partitionBy(col("__psid")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = sumCols.foldLeft(parted) { (d, c) =>
      d.withColumn(s"cum_$c", sum(col(s"`$c`")).over(wp))
    }
    val wo = Window.orderBy(col("__psid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sumCols.foldLeft(
      parted.groupBy(col("__psid"))
        .agg(sum(col(s"`${sumCols.head}`")).as(s"__t_${sumCols.head}"),
          sumCols.tail.map(c => sum(col(s"`$c`")).as(s"__t_$c")): _*)) {
      (d, c) =>
        d.withColumn(s"__o_$c",
          coalesce(sum(col(s"__t_$c")).over(wo), lit(0L)))
    }.select(col("__psid") +: sumCols.map(c => col(s"__o_$c")): _*)
    sumCols.foldLeft(local.join(broadcast(offsets), Seq("__psid"))) {
      (d, c) =>
        d.withColumn(s"cum_$c", col(s"cum_$c") + col(s"__o_$c"))
          .drop(s"__o_$c")
    }.drop("__psid")
  }
}
