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

  test("kAnonymityProfile: hand case; NULL quasi values form their own class") {
    val df = Seq(Some("x"), Some("x"), Some("x"), Some("y"), None, None)
      .toDF("q")
    val r = Scrub.kAnonymityProfile(df, Seq("q"), k = 3L).head()
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("n_classes") === 3L)
    assert(r.getAs[Long]("min_class_size") === 1L)
    assert(r.getAs[Long]("n_classes_below_k") === 2L) // y(1) + null(2)
    assert(r.getAs[Long]("n_rows_below_k") === 3L)
    assert(r.getAs[Double]("share_below_k") === 0.5)
    // empty input keeps the 1-row contract with NULL share
    val e = Scrub.kAnonymityProfile(
      Seq.empty[Option[String]].toDF("q"), Seq("q"), k = 3L).head()
    assert(e.getAs[Long]("n_rows") === 0L)
    assert(e.isNullAt(e.fieldIndex("share_below_k")))
  }

  test("lDiversityProfile: homogeneous classes flagged; NULL sensitive adds no diversity") {
    val df = Seq(
      ("x", Some(1L)), ("x", Some(1L)), ("x", Some(2L)), // d=2
      ("y", Some(5L)),                                   // d=1 -> below l=2
      ("z", Some(1L)), ("z", Some(2L)), ("z", Some(3L)), // d=3
      ("w", None), ("w", None), ("w", Some(7L))          // d=1 -> below
    ).toDF("q", "s")
    val r = Scrub.lDiversityProfile(df, Seq("q"), "s", l = 2L).head()
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("n_classes") === 4L)
    assert(r.getAs[Long]("min_distinct_sensitive") === 1L)
    assert(r.getAs[Long]("n_classes_below_l") === 2L) // y, w
    assert(r.getAs[Long]("n_rows_below_l") === 4L)
    assert(r.getAs[Double]("share_below_l") === 0.4)
  }

  test("blocklistHits: AC counts overlaps and suffix-chain hits in one pass") {
    import graft.operators.Scrub
    val docs = Seq(
      (1L, "The cat and THE hat"),    // case-folded: "the" x2, "he" x2, "and" x1
      (2L, "aaa"),                     // overlapping "aa" twice
      (3L, "lorem ipsum dolor"),       // the multi-word pattern
      (4L, null.asInstanceOf[String]), // NULL text -> zero hits
      (5L, "xyz"))                     // nothing
      .toDF("id", "text")
    val out = Scrub.blocklistHits(docs, "id", "text",
        Seq("the", "he", "and", "aa", "lorem ipsum"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // "the cat and the hat": "the" at 0 and 12 (each also ends "he"),
    // "and" at 8; note "and" contains no "he"/"the"
    assert(out(1L) === ((5L, 3)))
    // "aaa": "aa" at 0 and 1 - overlapping occurrences both count
    assert(out(2L) === ((2L, 1)))
    assert(out(3L) === ((1L, 1)))
    assert(out(4L) === ((0L, 0)))
    assert(out(5L) === ((0L, 0)))
    // guard: case-folding collisions are rejected, not silently merged
    intercept[IllegalArgumentException] {
      Scrub.blocklistHits(docs, "id", "text", Seq("The", "the"))
    }
  }

  test("luhnCardCandidates: checksum, separators, length bounds, greedy extraction") {
    val df = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),     // Visa test number: valid
      (2L, "ref 4111-1111-1111-1112"),         // checksum off by one: invalid
      (3L, "short 123456789012 run"),          // 12 digits: below minDigits
      (4L, "long 1234567890123456789012 run"), // 22 digits: greedy 19, leftover 3 too short
      (5L, "amex 378282246310005 ok"),         // 15-digit Amex test number: valid
      (6L, "no digits at all")
    ).toDF("doc_id", "text")
    val got = Scrub.luhnCardCandidates(df, "doc_id", "text")
      .select("doc_id", "digits", "n_digits", "luhn_valid")
      .as[(Long, String, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "4111111111111111", 16, true),
      (2L, "4111111111111112", 16, false),
      // hand-run Luhn over the 19-digit greedy cut sums to 94: invalid
      (4L, "1234567890123456789", 19, false),
      (5L, "378282246310005", 15, true)))
  }
}
