package graft

import graft.operators.Diff
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpecBase {
  import spark.implicits._

  private val oldV = Seq(
    (1L, "alpha", "web"),
    (2L, "beta", "web"),
    (3L, "gamma", "books"),
    (4L, null.asInstanceOf[String], "web")).toDF("doc_id", "text", "source")

  private val newV = Seq(
    (1L, "alpha", "web"),          // unchanged
    (2L, "beta EDITED", "web"),    // changed
    (4L, null.asInstanceOf[String], "web"), // unchanged (null == null content)
    (5L, "delta", "web"))          // added; 3 removed
    .toDF("doc_id", "text", "source")

  test("statuses: added / removed / changed / unchanged, nulls compare equal") {
    val out = Diff.corpusDiff(oldV, newV, "doc_id", Seq("text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out === Seq(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("a null turning into a value (and vice versa) is 'changed', not 'unchanged'") {
    val n2 = Seq((4L, "now present")).toDF("doc_id", "text")
    val o2 = Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Diff.corpusDiff(o2, n2, "doc_id", Seq("text"))
      .as[(Long, String)].head() === (4L -> "changed"))
    assert(Diff.corpusDiff(n2, o2, "doc_id", Seq("text"))
      .as[(Long, String)].head() === (4L -> "changed"))
  }

  test("multi-column compare: a change in ANY compared column flags the doc") {
    val out = Diff.corpusDiff(oldV, newV.withColumn("source", lit("books")),
        "doc_id", Seq("text", "source"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out.toMap.apply(1L) === "changed") // text same, source moved
  }

  test("diffSummary counts per status") {
    val out = Diff.diffSummary(oldV, newV, "doc_id", Seq("text"))
      .as[(String, Long)].collect().toMap
    assert(out === Map("unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("the join shuffles signatures, not text: text appears in no Exchange input") {
    val plan = Diff.corpusDiff(oldV, newV, "doc_id", Seq("text"))
      .queryExecution.executedPlan
    // every exchange's child output must be (key, sig) — no raw text column
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    exchanges.foreach { e =>
      val outNames = e.child.output.map(_.name)
      assert(!outNames.contains("text"), outNames.mkString(","))
    }
  }
}
