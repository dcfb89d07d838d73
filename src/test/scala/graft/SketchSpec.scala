package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("below k the sketch is exact; duplicates never change it") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "y"), ("b", "z")).toDF("g", "key")
    val est = Sketch.distinctEstimate(df, "key", "g", k = 8)
      .select("g", "n_minima", "est_distinct").as[(String, Long, Double)]
      .collect().map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(est("a") === ((2L, 2.0)))
    assert(est("b") === ((1L, 1.0)))
  }

  test("null keys carry no identity and never short the sketch") {
    // a null key's null hash would win a bottom-k slot (NULLS FIRST) but
    // be dropped by collect_list, faking the exact branch at k-1
    val base = spark.range(100).select(lit("g").as("g"), concat(lit("k"), $"id").as("key"))
    val withNull = base.unionAll(Seq(("g", null.asInstanceOf[String])).toDF("g", "key"))
    val a = Sketch.kmvSketch(base, "key", "g", k = 16).select("minima").head().getSeq[Long](0)
    val b = Sketch.kmvSketch(withNull, "key", "g", k = 16).select("minima").head().getSeq[Long](0)
    assert(a === b && a.length === 16)
  }

  test("at k the estimator lands near the true cardinality") {
    val df = spark.range(1000).select(lit("g").as("g"), concat(lit("k"), $"id").as("key"))
      .unionAll(spark.range(100).select(lit("g").as("g"), concat(lit("k"), $"id").as("key")))
    val Seq((n, e)) = Sketch.distinctEstimate(df, "key", "g", k = 64)
      .select("n_minima", "est_distinct").as[(Long, Double)].collect().toSeq
    assert(n === 64L)
    // deterministic hash -> deterministic estimate; KMV stderr ~ 1/sqrt(k-1)
    // = 12.7%, leave 3 sigma
    assert(math.abs(e - 1000.0) / 1000.0 < 0.38, s"estimate $e")
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = spark.range(500).select((($"id" % 3).cast("string")).as("g"),
      concat(lit("k"), $"id").as("key"))
    val b = spark.range(300, 900).select((($"id" % 3).cast("string")).as("g"),
      concat(lit("k"), $"id").as("key"))
    val merged = Sketch.kmvMerge(
      Sketch.kmvSketch(a, "key", "g", 32), Sketch.kmvSketch(b, "key", "g", 32), "g", 32)
    val whole = Sketch.kmvSketch(a.unionAll(b), "key", "g", 32)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }

  test("sharded sketch is shard-count invariant and equals the unsharded sketch") {
    // giant-group shape: one group holds most of the distinct keys
    val df = spark.range(2000).select(
      when($"id" % 10 === 0, "small").otherwise("big").as("g"),
      concat(lit("k"), $"id").as("key"))
    val plain = Sketch.kmvSketch(df, "key", "g", k = 32).orderBy("g")
      .as[(String, Seq[Long])].collect().toSeq
    for (shards <- Seq(1, 4, 17)) {
      val sharded = Sketch.kmvSketchSharded(df, "key", "g", k = 32, shards = shards)
        .orderBy("g").as[(String, Seq[Long])].collect().toSeq
      assert(sharded === plain, s"shards=$shards")
    }
  }

  test("guard rails") {
    val df = Seq(("a", "x")).toDF("g", "key")
    intercept[IllegalArgumentException] { Sketch.kmvSketch(df, "key", "g", 1) }
    intercept[IllegalArgumentException] { Sketch.kmvSketchSharded(df, "key", "g", 1, 4) }
    intercept[IllegalArgumentException] { Sketch.kmvSketchSharded(df, "key", "g", 8, 0) }
  }
}
