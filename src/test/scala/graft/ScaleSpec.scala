package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedAggregate equals plain aggregation on a skewed key") {
    // 10k rows of one hot key + a long tail
    val df = spark.range(10000).select(lit("hot").as("k"), col("id").cast("double").as("v"))
      .union(spark.range(100).select(concat(lit("t"), col("id")).as("k"),
        col("id").cast("double").as("v")))
    val salted = Scale.saltedAggregate(df, Seq("k"),
      Seq(("v", Scale.SumAgg), ("v", Scale.CountAgg)), saltBuckets = 16)
    val plain = df.groupBy("k").agg(sum("v").as("exp_sum"), count("v").as("exp_count"))
    val j = salted.join(plain, "k")
    assert(j.filter(abs(col("sum_v") - col("exp_sum")) > 1e-6
      || col("count_v") =!= col("exp_count")).count() === 0)
    assert(j.count() === 101)
    // every (hot-key sum) identical
    val hot = salted.filter($"k" === "hot").head()
    assert(hot.getDouble(1) === (0L until 10000L).map(_.toDouble).sum)
    assert(hot.getLong(2) === 10000L)
  }

  test("saltedJoin equals plain join, including duplicates and left rows") {
    val big = spark.range(5000).select(
      (col("id") % 3).cast("long").as("k"), col("id").as("payload"))
    val right = Seq((0L, "a"), (1L, "b"), (1L, "b2")).toDF("k", "tag")
    val plain = big.join(right, Seq("k"), "left")
    val salted = Scale.saltedJoin(big, right, Seq("k"), "left", saltBuckets = 4)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("binnedIntervalJoin with salting equals the naive predicate join on a dense region") {
    // dense hot region: 8k points piled into one bin, plus a scattered tail
    val points = spark.range(8000)
      .select((lit(5.0) + col("id") / 1e6).as("p"), col("id").as("pid"))
      .union(spark.range(500).select((col("id") / 10.0).as("p"), (col("id") + 100000).as("pid")))
    val intervals = spark.range(200).select(
      (col("id") / 5.0).as("lo"), (col("id") / 5.0 + 2.5).as("hi"), col("id").as("iid"))
    val naive = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" < $"hi")
    val salted = graft.operators.RangeJoin.binnedIntervalJoin(
      points, "p", intervals, "lo", "hi", binWidth = 2.0, saltBuckets = 4)
    assert(salted.count() === naive.count())
    assert(salted.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(salted).count() === 0)
    // the salted plan joins on (bin, salt) — the hot bin's rows spread over
    // 4 reducer keys instead of 1
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"expected salted join keys in plan:\n$plan")
  }

  test("bucketed tables join without a shuffle") {
    val spark2 = spark
    import spark2.implicits._
    val left = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("a"))
    val right = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("b"))
    Scale.registerBucketed(left, "bucketed_left", Seq("k"), 8)
    Scale.registerBucketed(right, "bucketed_right", Seq("k"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bucketed_left").join(spark.table("bucketed_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
