package graft

import graft.sources.FileFetcher
import org.apache.spark.sql.functions._

/** DataSource V2 "graft-api" format: schema inference, executor-side fetch,
  * flatten semantics, partitioning, and column pruning. */
class ApiDataSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixturesDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_fx").toString
    FileFetcher.writeFixture(dir, "http://api/items/1",
      """{"batch":1,"items":[{"id":1,"name":"a"},{"id":2,"name":"b"}]}""")
    FileFetcher.writeFixture(dir, "http://api/items/2",
      """{"batch":2,"items":[{"id":3,"name":"c"}]}""")
    dir
  }

  test("format(graft-api) loads, infers schema, flattens with C2 semantics") {
    val df = spark.read.format("graft-api")
      .option("urls", "http://api/items/1,http://api/items/2")
      .option("fixtures", fixturesDir)
      .load()
    assert(df.columns.toSet === Set("batch", "items.id", "items.name"))
    assert(df.count() === 3) // 2 + 1 item rows, batch scalar replicated
    assert(df.filter(col("batch") === 1).count() === 2)
  }

  test("column pruning reaches the reader (pruned schema only)") {
    val df = spark.read.format("graft-api")
      .option("urls", "http://api/items/1,http://api/items/2")
      .option("fixtures", fixturesDir)
      .load()
      .select(col("`items.id`"))
    assert(df.as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // physical ReadSchema carries only the pruned column
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("items.name"), s"pruning missed:\n$plan")
  }

  test("failed URLs contribute no rows; partitioning splits URL batches") {
    val df = spark.read.format("graft-api")
      .option("urls", "http://api/items/1,http://api/missing")
      .option("fixtures", fixturesDir)
      .option("urlsPerPartition", "1")
      .load()
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 2)
  }

  test("runtime type drift past the sampled schema nulls the cell, not the scan") {
    // schema sampled from URL 1 types id as BIGINT; URL 3 returns a string
    // there — permissive contract: the cell nulls, every row survives
    val dir = fixturesDir
    FileFetcher.writeFixture(dir, "http://api/items/3",
      """{"batch":3,"items":[{"id":"n/a","name":"d"}]}""")
    val df = spark.read.format("graft-api")
      .option("urls", "http://api/items/1,http://api/items/3")
      .option("schemaSampleUrls", "1")
      .option("fixtures", dir)
      .load()
    assert(df.count() === 3)
    assert(df.filter(col("`items.id`").isNull).select(col("`items.name`"))
      .as[String].collect().toSeq === Seq("d"))
  }
}
