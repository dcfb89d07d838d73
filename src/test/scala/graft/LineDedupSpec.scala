package graft

import graft.operators.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "COOKIE BANNER\nreal content one\nFOOTER"),
    (2L, "COOKIE BANNER\nreal content two\nFOOTER"),
    (3L, "COOKIE BANNER\nunique text here"),
    (4L, "all original\nnothing shared")).toDF("doc_id", "text")

  test("lines recurring in >= minDocs docs are struck everywhere, order preserved") {
    val out = LineDedup.removeDuplicateLines(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_lines_kept", "n_lines_removed")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(out === Seq(
      (1L, "real content one", 1, 2),
      (2L, "real content two", 1, 2),
      (3L, "unique text here", 1, 1),
      (4L, "all original\nnothing shared", 2, 0)))
  }

  test("within-doc repeats do not count as recurrence; cross-doc threshold is distinct docs") {
    val d = Seq(
      (1L, "dup\ndup\ndup\nmine"), // 'dup' repeats only within doc 1
      (2L, "other stuff")).toDF("doc_id", "text")
    val out = LineDedup.removeDuplicateLines(d, "doc_id", "text", minDocs = 2)
      .filter($"doc_id" === 1L).select("text").as[String].head()
    assert(out === "dup\ndup\ndup\nmine")
  }

  test("blank lines are never boilerplate: paragraph breaks survive corpus-wide recurrence") {
    val d = Seq(
      (1L, "para one\n\npara two"),
      (2L, "intro\n\noutro"),
      (3L, "alpha\n\nbeta")).toDF("doc_id", "text") // "" recurs in all 3 docs
    val out = LineDedup.removeDuplicateLines(d, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").select("text", "n_lines_removed")
      .as[(String, Int)].collect().toSeq
    assert(out === Seq(("para one\n\npara two", 0), ("intro\n\noutro", 0), ("alpha\n\nbeta", 0)))
  }

  test("a doc whose every line is boilerplate survives with empty text") {
    val d = Seq(
      (1L, "FOOTER"), (2L, "FOOTER"), (3L, "FOOTER\nkeep me")).toDF("doc_id", "text")
    val out = LineDedup.removeDuplicateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("text", "n_lines_kept", "n_lines_removed")
      .as[(String, Int, Int)].collect().toSeq
    assert(out === Seq(("", 0, 1), ("", 0, 1), ("keep me", 1, 1)))
  }

  test("non-text columns pass through; custom delimiter; null text reads as empty") {
    val d = Seq(
      (1L, "a||b", "en"), (2L, "a||c", "de"), (3L, null.asInstanceOf[String], "fr"))
      .toDF("doc_id", "text", "lang")
    val out = LineDedup.removeDuplicateLines(d, "doc_id", "text", minDocs = 2, delim = "||")
      .orderBy("doc_id").select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect().toSeq
    assert(out === Seq((1L, "en", "b"), (2L, "de", "c"), (3L, "fr", "")))
  }

  test("guard rails") {
    intercept[IllegalArgumentException] {
      LineDedup.removeDuplicateLines(docs, "doc_id", "text", minDocs = 1)
    }
    intercept[IllegalArgumentException] {
      LineDedup.removeDuplicateLines(docs.withColumn("n_lines_kept", lit(1)),
        "doc_id", "text", 2)
    }
  }
}
