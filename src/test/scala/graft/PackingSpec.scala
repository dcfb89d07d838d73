package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  test("contiguous packing: bin is the budget multiple the running count crossed") {
    val df = Seq(
      (1L, 40L), (2L, 40L), (3L, 40L), // cum-before 0,40,80 -> bins 0,0,0 (budget 100)... 80<100
      (4L, 50L),                       // cum-before 120 -> bin 1
      (5L, 250L),                      // cum-before 170 -> bin 1, oversize
      (6L, 10L)                        // cum-before 420 -> bin 4
    ).toDF("doc_id", "n_tokens")
    val got = Packing.assignBins(df, "doc_id", "n_tokens", 100L, allowGlobal = true)
      .orderBy("doc_id").select("doc_id", "bin", "oversize")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, false), (2L, 0L, false), (3L, 0L, false),
      (4L, 1L, false), (5L, 1L, true), (6L, 4L, false)))
  }

  test("groups pack independently (bin numbering restarts per group)") {
    val df = Seq(
      ("en", 1L, 120L), ("en", 2L, 120L),
      ("fr", 1L, 120L), ("fr", 2L, 120L)).toDF("lang", "doc_id", "n_tokens")
    val got = Packing.assignBins(df, "doc_id", "n_tokens", 100L, groupCol = Some("lang"))
      .orderBy("lang", "doc_id").select("lang", "bin")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("en", 0L), ("en", 1L), ("fr", 0L), ("fr", 1L)))
  }

  test("guard rails: bad budget, global without opt-in, colliding output column") {
    val df = Seq((1L, 10L)).toDF("doc_id", "n_tokens")
    intercept[IllegalArgumentException] {
      Packing.assignBins(df, "doc_id", "n_tokens", 0L, allowGlobal = true)
    }
    intercept[IllegalArgumentException] {
      Packing.assignBins(df, "doc_id", "n_tokens", 100L) // no group, no opt-in
    }
    val clash = df.withColumn("bin", lit(1))
    intercept[IllegalArgumentException] {
      Packing.assignBins(clash, "doc_id", "n_tokens", 100L, allowGlobal = true)
    }
  }

  test("bins are non-decreasing in pack order on real documents") {
    val docs = testdata("sf0.001", "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val out = Packing.assignBins(docs, "doc_id", "n_tokens", 500L, groupCol = Some("lang"))
    val bad = out
      .withColumn("__prev", lag(col("bin"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("doc_id")))
      .filter(col("__prev").isNotNull && col("bin") < col("__prev"))
      .count()
    assert(bad === 0L, "bins must be non-decreasing in pack order")
    assert(out.count() === docs.count())
  }
}
