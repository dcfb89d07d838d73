package graft

import graft.operators.Chat
import org.apache.spark.sql.functions._

/** Chat-transcript structure operators (operators/Chat.scala); end-to-end
  * values are oracle-gated by p250/p251 — this spec pins the parsing and
  * audit contracts on hand-built transcripts. */
class ChatSpec extends SparkSpecBase {
  import spark.implicits._

  test("parseChatTurns: role tags, case/space tolerance, unparsed lines, dense index") {
    val df = Seq(
      (1L, "system: be concise\nuser: hi\n\nAssistant : hello there"),
      (2L, "user: question\nraw continuation\nassistant:")
    ).toDF("doc_id", "text")
    val got = Chat.parseChatTurns(df, "doc_id", "text")
      .select("doc_id", "turn_idx", "role", "content", "n_chars")
      .as[(Long, Int, Option[String], String, Int)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      // the empty line between turns drops; turn_idx stays dense
      (1L, 0, Some("system"), "be concise", 10),
      (1L, 1, Some("user"), "hi", 2),
      (1L, 2, Some("assistant"), "hello there", 11),
      (2L, 0, Some("user"), "question", 8),
      (2L, 1, None, "raw continuation", 16),
      (2L, 2, Some("assistant"), "", 0)))
  }

  test("chatAudit: the strict alternation contract, violation by violation") {
    val df = Seq(
      (0L, "system: s\nuser: a\nassistant: b"),        // clean with system lead
      (1L, "user: a\nassistant: b\nuser: c\nassistant: d"), // clean, no system
      (2L, "user: a\nuser: b\nassistant: c"),          // repeated role
      (3L, "assistant: a\nuser: b"),                   // starts with assistant
      (4L, "user: a\nuntagged\nassistant: b"),         // unparsed line
      (5L, "user: a\nsystem: late\nassistant: b"),     // system mid-transcript
      (6L, "system: s\nassistant: b"),                 // system then assistant
      (7L, "user: a\nassistant: b\nuser: c")           // ok but ends on user
    ).toDF("doc_id", "text")
    val got = Chat.chatAudit(df, "doc_id", "text")
      .select("doc_id", "alternation_ok", "ends_with_assistant", "n_unparsed")
      .as[(Long, Boolean, Boolean, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, true, true, 0)))
    assert(got(1L) === ((1L, true, true, 0)))
    assert(got(2L) === ((2L, false, true, 0)))
    assert(got(3L) === ((3L, false, false, 0)))
    assert(got(4L) === ((4L, false, true, 1)))
    assert(got(5L) === ((5L, false, true, 0)))
    assert(got(6L) === ((6L, false, true, 0)))
    assert(got(7L) === ((7L, true, false, 0)))
  }

  test("chatTokenStats: prompt/response split, unparsed kept separate, ratio") {
    val df = Seq(
      (1L, "system: be very concise\nuser: two words\nassistant: one two three"),
      (2L, "user: a b\nuntagged words here\nassistant:"),
      (3L, "raw only")
    ).toDF("doc_id", "text")
    val got = Chat.chatTokenStats(df, "doc_id", "text")
      .select("doc_id", "prompt_tokens", "response_tokens", "unparsed_tokens",
        "response_ratio")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 5L, 3L, 0L, Some(0.375))))
    assert(got(2L) === ((2L, 2L, 0L, 3L, Some(0.0))))
    assert(got(3L) === ((3L, 0L, 0L, 2L, None)))
  }

  test("renderTemplate: order-pinned special-token rendering, unparsed visible") {
    val df = Seq(
      (1L, "system: s\nuser: hi\nassistant: yo"),
      (2L, "user: q\nraw\nassistant: a")
    ).toDF("doc_id", "text")
    val got = Chat.renderTemplate(df, "doc_id", "text")
      .select("doc_id", "rendered", "n_rendered_turns")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L,
      "<|system|>s<|end|><|user|>hi<|end|><|assistant|>yo<|end|>", 3)))
    assert(got(2L) === ((2L,
      "<|user|>q<|end|><|unparsed|>raw<|end|><|assistant|>a<|end|>", 3)))
  }

  test("preferencePairAudit: lengths, ratio, identical/empty flags") {
    val df = Seq(
      (1L, "one two three", "one two"),
      (2L, " same text ", "same text"), // identical after trim
      (3L, "a b", ""),                  // rejected empty -> ratio NULL
      (4L, null.asInstanceOf[String], "x y z")
    ).toDF("id", "chosen", "rejected")
    val got = Chat.preferencePairAudit(df, "id", "chosen", "rejected")
      .select("id", "chosen_tokens", "rejected_tokens", "identical",
        "chosen_empty", "rejected_empty", "len_ratio")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 2L, false, false, false, Some(1.5))))
    assert(got(2L) === ((2L, 2L, 2L, true, false, false, Some(1.0))))
    assert(got(3L) === ((3L, 2L, 0L, false, false, true, None)))
    assert(got(4L) === ((4L, 0L, 3L, false, true, false, Some(0.0))))
  }

  test("preferenceLengthBias: the corpus length-bias roll-up") {
    val df = Seq(
      (1L, "one two three", "one two"),
      (2L, " same text ", "same text"),
      (3L, "a b", ""),
      (4L, null.asInstanceOf[String], "x y z")
    ).toDF("id", "chosen", "rejected")
    val r = Chat.preferenceLengthBias(df, "id", "chosen", "rejected").head()
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Long]("n_identical") === 1L)
    assert(r.getAs[Long]("n_chosen_longer") === 2L)  // ids 1 and 3
    assert(r.getAs[Long]("n_rejected_longer") === 1L) // id 4
    assert(r.getAs[Long]("n_ties") === 0L)
    assert(r.getAs[Double]("frac_chosen_longer") === 0.666666667)
    // defined ratios {1.5, 1.0, 0.0} -> mean 0.833333333
    assert(r.getAs[Double]("mean_len_ratio") === 0.833333333)
  }

  test("chatAudit: counts, roles, empties; a transcript with no role turns") {
    val df = Seq(
      (1L, "system: s\nuser: hello\nassistant:"),
      (2L, "just some prose\nwith two lines")
    ).toDF("doc_id", "text")
    val got = Chat.chatAudit(df, "doc_id", "text")
      .select("doc_id", "n_turns", "n_user", "n_assistant", "n_system",
        "n_unparsed", "n_empty", "first_role", "last_role", "alternation_ok")
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = got(1L)
    assert((a.getInt(1), a.getInt(2), a.getInt(3), a.getInt(4)) === ((3, 1, 1, 1)))
    assert(a.getInt(6) === 1) // the empty assistant turn
    assert((a.getString(7), a.getString(8)) === (("system", "assistant")))
    assert(a.getBoolean(9))
    val b = got(2L)
    assert((b.getInt(1), b.getInt(5)) === ((2, 2)))
    assert(b.isNullAt(7) && b.isNullAt(8))
    assert(!b.getBoolean(9)) // zero role turns is not a valid transcript
  }
}
