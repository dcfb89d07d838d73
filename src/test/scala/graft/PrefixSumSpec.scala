package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpecBase {
  import spark.implicits._

  test("withRunningSums equals the single-reducer window on distinct keys") {
    val df = (1 to 500).map(i => (i.toLong * 3L, (i % 7).toLong, (i % 11).toLong))
      .toDF("k", "x", "y")
      .repartition(13) // scatter before the range exchange
    val got = PrefixSum.withRunningSums(df, "k", Seq("x", "y"))
      .select("k", "cum_x", "cum_y").as[(Long, Long, Long)].collect()
      .map { case (k, x, y) => k -> ((x, y)) }.toMap
    var (cx, cy) = (0L, 0L)
    (1 to 500).foreach { i =>
      cx += (i % 7).toLong; cy += (i % 11).toLong
      val (gx, gy) = got(i.toLong * 3L)
      assert(gx === cx && gy === cy, s"at key ${i * 3}")
    }
  }

  test("withRunningSums stitches offsets correctly across MANY range partitions") {
    // AQE coalesces a 10k-row shuffle to one partition (the right call at
    // this size) — disable coalescing so the multi-partition offset
    // stitching actually runs, the way it would on a corpus-sized frame
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val df = (1 to 10000).map(i => (i.toLong, 1L)).toDF("k", "x")
      val parts = df.repartitionByRange(col("k")).rdd.getNumPartitions
      assert(parts > 1, "range exchange must fan out with coalescing off")
      val out = PrefixSum.withRunningSums(df, "k", Seq("x"))
      assert(out.filter(col("cum_x") === col("k")).count() === 10000L,
        "cum of all-ones over ascending keys is the rank itself")
    } finally spark.conf.set(key, old)
  }

  test("withRunningSums handles an empty frame and a single row") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "x")
    assert(PrefixSum.withRunningSums(empty, "k", Seq("x")).count() === 0L)
    val one = Seq((5L, 42L)).toDF("k", "x")
    val r = PrefixSum.withRunningSums(one, "k", Seq("x")).head()
    assert(r.getAs[Long]("cum_x") === 42L)
  }
}
