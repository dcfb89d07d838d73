package graft

import graft.operators.Scrub
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpecBase {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(Tuple1(s)).toDF("text").select(Scrub.redact(col("text"))).head().getString(0)

  test("emails, IPs and long digit runs are redacted; short numbers survive") {
    assert(redactOne("mail a.b+c@ex-ample.org now") === "mail <EMAIL> now")
    assert(redactOne("from 192.168.001.1 port 80") === "from <IP> port 80")
    assert(redactOne("card 4111111111111111 pin 1234") === "card <NUM> pin 1234")
    assert(redactOne("v1.2.3 and 12.5 stay") === "v1.2.3 and 12.5 stay")
  }

  test("rule order: an email's digits are not half-eaten by later rules") {
    assert(redactOne("ask 123456789@example.com") === "ask <EMAIL>")
  }

  test("redactColumn overwrites in place and flags rows that changed") {
    val df = Seq((1L, "clean text"), (2L, "hit me@x.io")).toDF("doc_id", "text")
    val out = Scrub.redactColumn(df, "text", flagCol = Some("had_pii"))
      .orderBy("doc_id").as[(Long, String, Boolean)].collect().toSeq
    assert(out === Seq((1L, "clean text", false), (2L, "hit <EMAIL>", true)))
  }

  test("null text flags false, not null — the row stays visible to both split sides") {
    val df = Seq((1L, "a@b.io"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Scrub.redactColumn(df, "text", flagCol = Some("had_pii"))
    assert(out.filter($"had_pii").count() + out.filter(!$"had_pii").count() === 2)
    assert(out.filter($"doc_id" === 2).select("had_pii").as[Boolean].head() === false)
  }

  test("redaction is a pure narrow projection — no Exchange in the plan") {
    val docs = testdata("sf0.001", "documents")
    val plan = Scrub.redactColumn(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
