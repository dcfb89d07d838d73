package graft

import graft.functions.NlCompiler
import org.apache.spark.sql.functions._

/** The deterministic NL grammar (SURVEY.md C3): the operation classes
  * observed in the reference's LLM-generated code (example.ipynb). */
class NlCompilerSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    (1, "a", 10.0, "2024-01-03"),
    (2, "a", 30.0, "2024-01-01"),
    (3, "b", 20.0, "2024-01-02"),
    (4, "b", 40.0, "not-a-date")
  ).toDF("id", "grp", "score", "when_str")

  test("top-k with sort desc and projection") {
    val c = NlCompiler.compile("top 2 by score desc showing id and score", df.columns.toSeq)
    val out = c.apply(df).collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(out === Seq((4, 40.0), (2, 30.0)))
  }

  test("unique-by keeps first row after sort (pandas keep='first' contract)") {
    val c = NlCompiler.compile("unique by grp by score desc showing id", df.columns.toSeq)
    assert(c.apply(df).as[Int].collect().toSet === Set(2, 4))
  }

  test("where filter with numeric comparison") {
    val c = NlCompiler.compile("where score > 25 showing id", df.columns.toSeq)
    assert(c.apply(df).as[Int].collect().toSet === Set(2, 4))
  }

  test("date parse nulls on failure (pandas errors='coerce' analogue)") {
    val c = NlCompiler.compile("parse when_str as date", df.columns.toSeq)
    val out = c.apply(df)
    assert(out.schema("when_str").dataType.typeName === "timestamp")
    assert(out.filter(col("when_str").isNull).count() === 1)
  }

  test("column resolution is case-insensitive") {
    val c = NlCompiler.compile("top 1 by SCORE desc showing ID", df.columns.toSeq)
    assert(c.apply(df).columns.toSeq === Seq("id"))
  }

  test("filter literals keep their case (review regression)") {
    val d = Seq((1, "R"), (2, "r"), (3, "N")).toDF("id", "flag")
    val c = NlCompiler.compile("where flag = R showing id", d.columns.toSeq)
    assert(c.apply(d).as[Int].collect().toSeq === Seq(1))
  }

  test("date-like filter values are strings, not a toDouble crash (review regression)") {
    val d = Seq((1, "2024-01-01"), (2, "2024-06-01")).toDF("id", "day")
    val c = NlCompiler.compile("where day >= 2024-03-01 showing id", d.columns.toSeq)
    assert(c.apply(d).as[Int].collect().toSeq === Seq(2))
  }

  test("compiled plan is cached-description stable") {
    val c1 = NlCompiler.compile("top 2 by score desc", df.columns.toSeq)
    val c2 = NlCompiler.compile("top 2 by score desc", df.columns.toSeq)
    assert(c1.describe === c2.describe)
  }
}
