package graft

import graft.operators.Sink
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = spark.range(200).select(
    $"id".as("doc_id"),
    when($"id" % 10 < 8, "train").otherwise("val").as("split"),
    concat(lit("l"), $"id" % 2).as("lang"),
    concat(lit("text "), $"id").as("text"))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_sink").toString + "/corpus"

  test("writeCorpus: one file per partition combo, hive layout, lossless round-trip") {
    val path = tmp()
    Sink.writeCorpus(corpus, path, Seq("split", "lang"), sortCols = Seq("doc_id"))
    val root = new java.io.File(path)
    val leafDirs = root.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.isDirectory)
    assert(leafDirs.map(_.getName).toSet === Set("lang=l0", "lang=l1"))
    assert(root.listFiles().filter(_.isDirectory).map(_.getName).toSet
      === Set("split=train", "split=val"))
    // exactly ONE parquet file per (split, lang) combo — no per-task fan-out
    leafDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1, d.toString)
    }
    val back = spark.read.parquet(path)
    assert(back.count() === 200)
    assert(back.select("doc_id").exceptAll(corpus.select("doc_id")).count() === 0)
  }

  test("writeCorpus: maxRecordsPerFile re-splits a combo; shards spread a hot combo") {
    val path = tmp()
    Sink.writeCorpus(corpus, path, Seq("split"), maxRecordsPerFile = 50L)
    val train = new java.io.File(path, "split=train")
    // 160 train rows / 50 per file -> 4 files
    assert(train.listFiles().count(_.getName.endsWith(".parquet")) === 4)

    val path2 = tmp()
    // at 200 rows AQE's partition coalescing would merge the shard
    // splits back into one task (correct at this scale!); disable it to
    // observe the mechanism a hot combo relies on at real volume
    val prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      Sink.writeCorpus(corpus, path2, Seq("split"), shards = 3)
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    val train2 = new java.io.File(path2, "split=train")
    val nf = train2.listFiles().count(_.getName.endsWith(".parquet"))
    assert(nf >= 2 && nf <= 3, s"expected 2-3 shard files, got $nf")
    assert(spark.read.parquet(path2).count() === 200)
  }

  test("writeCorpus shards despite map-typed columns (hash skips unhashable types)") {
    val withMap = corpus.withColumn("props",
      map(lit("k"), concat(lit("v"), $"doc_id")))
    val path = tmp()
    Sink.writeCorpus(withMap, path, Seq("split"), shards = 2)
    val back = spark.read.parquet(path)
    assert(back.count() === 200)
    assert(back.schema.fieldNames.contains("props"))
  }

  test("writeCorpus guard rails") {
    intercept[IllegalArgumentException] {
      Sink.writeCorpus(corpus, tmp(), Nil)
    }
    intercept[IllegalArgumentException] {
      Sink.writeCorpus(corpus, tmp(), Seq("split"), maxRecordsPerFile = 0L)
    }
  }

  test("withZOrder: interleaved buckets order a grid by locality, not by one axis") {
    import org.apache.spark.sql.functions._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y)).toDF("x", "y")
    val z = Sink.withZOrder(grid, Seq("x", "y"), bits = 4)
    // corners: (0,0) lowest, (15,15) highest; helper stats never leak out
    val rows = z.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(z.columns.toSeq === Seq("x", "y", "__z"))
    assert(rows((0, 0)) === 0L)
    assert(rows((15, 15)) === 255L)
    // one step in either dimension moves the z-value less than a far jump
    assert(rows((1, 0)) < rows((8, 8)) && rows((0, 1)) < rows((8, 8)))
  }

  test("writeZOrdered: per-file bounding boxes are small boxes, not full-range stripes") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val pts = (1 to 8000).map(_ => (rnd.nextInt(1000), rnd.nextInt(1000)))
      .toDF("x", "y")
    def meanBoxArea(dir: String): Double = {
      val per = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(((max($"x") - min($"x")).cast("double") / 1000.0 *
          ((max($"y") - min($"y")).cast("double") / 1000.0)).as("area"))
      per.agg(avg($"area")).head().getDouble(0)
    }
    val zdir = tmp()
    Sink.writeZOrdered(pts, zdir, Seq("x", "y"), bits = 10, numFiles = 16)
    val hdir = tmp()
    pts.repartition(16).write.parquet(hdir)
    val (zArea, hArea) = (meanBoxArea(zdir), meanBoxArea(hdir))
    // hash layout: every file spans ~the whole plane; z-order: each file
    // covers a contiguous z-range ~1/16 of the curve -> a small box
    assert(hArea > 0.7, s"hash layout should span the plane, got $hArea")
    assert(zArea < hArea / 3, s"z-order $zArea vs hash $hArea")
    // lossless: same multiset of rows
    assert(spark.read.parquet(zdir).exceptAll(pts).count() === 0)
    assert(pts.exceptAll(spark.read.parquet(zdir)).count() === 0)
  }

  test("writeBucketed: a join on the bucket key between co-bucketed tables plans NO shuffle") {
    val orders = testdata("sf0.001", "orders")
    val customer = testdata("sf0.001", "customer")
    Sink.writeBucketed(orders, "bk_orders", Seq("o_custkey"), 8,
      sortCols = Seq("o_custkey"))
    Sink.writeBucketed(customer, "bk_customer", Seq("c_custkey"), 8,
      sortCols = Seq("c_custkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force the shuffle-join path so the assert is about BUCKETING,
      // not about the broadcast fallback hiding the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_orders")
        .join(spark.table("bk_customer"),
          col("o_custkey") === col("c_custkey"))
      joined.collect() // finalize the (adaptive) plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // the same join from raw parquet DOES shuffle — the baseline that
      // proves the bucketing metadata is what removed the exchanges
      val raw = orders.join(customer, col("o_custkey") === col("c_custkey"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
      // and the bucketed read is lossless
      assert(spark.table("bk_orders").count() === orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_customer")
    }
  }
}
