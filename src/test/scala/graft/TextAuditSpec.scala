package graft

import graft.operators.TextAudit
import org.apache.spark.sql.functions._

class TextAuditSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------- sentenceSegments

  test("sentenceSegments: terminator runs split, trailing fragment kept, trim applied") {
    val df = Seq((1L, "Hello world. Second one!  Third?Unterminated tail")).toDF("id", "text")
    val got = TextAudit.sentenceSegments(df, "id", "text")
      .as[(Long, Long, String, Long)].collect().toList
    assert(got === List(
      (1L, 0L, "Hello world.", 12L),
      (1L, 1L, "Second one!", 11L),
      (1L, 2L, "Third?", 6L),
      (1L, 3L, "Unterminated tail", 17L)))
  }

  test("sentenceSegments: ellipses stay one segment; empty/null/whitespace docs emit nothing") {
    val df = Seq((1L, "Wait... what?"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "   \n\t "), (5L, "...")).toDF("id", "text")
    val got = TextAudit.sentenceSegments(df, "id", "text")
      .as[(Long, Long, String, Long)].collect().toList.sortBy(r => (r._1, r._2))
    assert(got === List(
      (1L, 0L, "Wait...", 7L),
      (1L, 1L, "what?", 5L),
      (5L, 0L, "...", 3L)))
  }

  test("sentenceSegments: segments reassemble the non-whitespace text (no char lost)") {
    val docs = testdata("sf0.001", "documents")
    val joined = TextAudit.sentenceSegments(docs, "doc_id", "text")
      .groupBy("doc_id")
      .agg(concat_ws("", collect_list(regexp_replace(col("sentence"), "\\s+", ""))).as("rebuilt"))
      .join(docs.select(col("doc_id"),
        regexp_replace(coalesce(col("text"), lit("")), "\\s+", "").as("orig")), Seq("doc_id"))
    assert(joined.filter(col("rebuilt") =!= col("orig")).count() === 0L)
  }

  // ------------------------------------------------------------ readability

  test("readability: counts and formula match a hand computation") {
    // 4 words, 2 sentence runs, syllable groups: "the"=1 "cat"=1 "sat"=1 "down"=1
    val df = Seq((1L, "The cat sat. Down!")).toDF("id", "text")
    val r = TextAudit.readability(df, "id", "text").head()
    assert(r.getLong(1) === 4L)   // words
    assert(r.getLong(2) === 2L)   // sentences
    assert(r.getLong(3) === 4L)   // syllables: e, a, a, ow
    val wps = 4.0 / 2.0; val spw = 4.0 / 4.0
    assert(r.getDouble(4) === 206.835 - 1.015 * wps - 84.6 * spw)
    assert(r.getDouble(5) === 0.39 * wps + 11.8 * spw - 15.59)
  }

  test("readability: unterminated text counts one sentence; empty text yields NULL scores") {
    val df = Seq((1L, "no terminator here"), (2L, "")).toDF("id", "text")
    val rows = TextAudit.readability(df, "id", "text").orderBy("id").collect()
    assert(rows(0).getLong(2) === 0L)      // raw terminator-run count
    assert(!rows(0).isNullAt(4))           // clamped to 1 inside the formula
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(4) && rows(1).isNullAt(5))
  }

  test("readability: simple text scores easier (higher flesch) than polysyllabic text") {
    val df = Seq((1L, "The cat sat on the mat. It was fat."),
      (2L, "Institutional heterogeneity necessitates organizational differentiation strategies.")).toDF("id", "text")
    val m = TextAudit.readability(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(m(1L) > m(2L))
  }

  // ---------------------------------------------------------- encodingAudit

  test("encodingAudit: replacement chars, control chars, non-ascii counted; tab/newline exempt") {
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "bad � decode �"),
      (3L, "ctl\u0001here\u0002and\u007f but \t\n\r fine"),
      (4L, "café naïve 中文"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val m = TextAudit.encodingAudit(df, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(m(1L) === ((0L, 0L, 0L, false)))
    assert(m(2L) === ((2L, 0L, 2L, true)))  // U+FFFD is itself non-ascii
    assert(m(3L) === ((0L, 3L, 0L, false)))
    assert(m(4L) === ((0L, 0L, 4L, false))) // é ï 中 文
    assert(m(5L) === ((0L, 0L, 0L, false)))
  }

  // --------------------------------------------------------------- nfcAudit

  test("nfcAudit: decomposed sequences compose, composed text passes through, null stays null") {
    val df = Seq(
      (1L, "cafe\u0301"),          // cafe + combining acute -> café
      (2L, "café"),                // already composed
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val rows = TextAudit.nfcAudit(df, "id", "text").orderBy("id").collect()
    assert(rows(0).getString(1) === "café" && rows(0).getLong(2) === 5L &&
      rows(0).getLong(3) === 4L && rows(0).getBoolean(4))
    assert(rows(1).getString(1) === "café" && !rows(1).getBoolean(4))
    assert(rows(2).getString(1) === "plain ascii" && !rows(2).getBoolean(4))
    assert(rows(3).isNullAt(1) && !rows(3).getBoolean(4))
  }

  test("nfcAudit: normalization changes hash-keyed identity — the reason to run it first") {
    import graft.functions.TextFunctions
    val df = Seq((1L, "résumé"), (2L, "re\u0301sume\u0301")).toDF("id", "text")
    val rawFps = df.select(TextFunctions.fingerprint(col("text")))
      .collect().map(_.getString(0)).distinct
    assert(rawFps.length === 2, "un-normalized variants fingerprint apart")
    val nfcFps = TextAudit.nfcAudit(df, "id", "text")
      .select(TextFunctions.fingerprint(col("text_nfc")))
      .collect().map(_.getString(0)).distinct
    assert(nfcFps.length === 1, "NFC merges them")
  }

  test("encodingAudit: ratios are count/len and NULL on empty") {
    val df = Seq((1L, "a\u0001b\u0002"), (2L, "")).toDF("id", "text")
    val rows = TextAudit.encodingAudit(df, "id", "text").orderBy("id").collect()
    assert(rows(0).getDouble(6) === 0.5)
    assert(rows(1).isNullAt(6) && rows(1).isNullAt(7))
  }

  test("scriptProfile: per-script counts, dominant script, and share") {
    val df = Seq(
      (1L, "hello world"),                       // pure latin
      (2L, "привет мир hello"),                  // cyrillic 9 > latin 5
      (3L, "日本語のテキスト 123 !"),               // cjk only (digits don't count)
      (4L, "مرحبا"),                             // arabic
      (5L, "12345 !!!"),                         // no letters at all
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAudit.scriptProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("main_script") === "latin")
    assert(out(1L).getAs[Long]("n_latin") === 10L)
    assert(out(1L).getAs[Double]("main_frac") === 1.0)
    assert(out(2L).getAs[String]("main_script") === "cyrillic")
    assert(out(2L).getAs[Long]("n_cyrillic") === 9L)
    assert(out(2L).getAs[Long]("n_latin") === 5L)
    assert(out(2L).getAs[Double]("main_frac") === 9.0 / 14.0)
    assert(out(3L).getAs[String]("main_script") === "cjk")
    assert(out(3L).getAs[Long]("n_cjk") === 8L)
    assert(out(3L).getAs[Long]("n_letters") === 8L)
    assert(out(4L).getAs[String]("main_script") === "arabic")
    assert(out(5L).getAs[String]("main_script") === "none")
    assert(out(5L).isNullAt(out(5L).fieldIndex("main_frac")))
    assert(out(6L).getAs[Long]("n_letters") === 0L, "null text is empty")
  }

  test("scriptProfile: equal counts tie-break to the ascending class name") {
    val df = Seq((1L, "abcабв")).toDF("doc_id", "text") // 3 latin, 3 cyrillic
    val r = TextAudit.scriptProfile(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_latin") === 3L && r.getAs[Long]("n_cyrillic") === 3L)
    assert(r.getAs[String]("main_script") === "cyrillic",
      "cyrillic < latin in class-name order")
  }

  test("codeSwitch: monolingual, mixed, und, and empty docs") {
    val df = Seq(
      (1L, "the cat is on the mat. the dog is in the house."),
      (2L, "the cat is good. der hund ist die katze. le chat est le chien."),
      (3L, "xyzzy plugh."),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAudit.codeSwitch(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L), "no-sentence docs emit no row")
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_sentences") === 2L)
    assert(d1.getAs[Long]("n_langs") === 1L)
    assert(d1.getAs[String]("major_lang") === "en")
    assert(d1.getAs[Double]("switch_frac") === 0.0)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_sentences") === 3L)
    assert(d2.getAs[Long]("n_langs") === 3L)
    // three-way tie at 1 sentence each: plurality breaks to the
    // lexicographically smallest code, langId's own tie rule
    assert(d2.getAs[String]("major_lang") === "de")
    assert(math.abs(d2.getAs[Double]("switch_frac") - 2.0 / 3.0) < 1e-12)
    assert(out(3L).getAs[String]("major_lang") === "und")
  }

  test("invisibleAudit counts each class; clean and NULL docs report clean") {
    val df = Seq(
      (1L, Some("pa\u200Byl\u200Doad")),          // 2 zero-width
      (2L, Some("a\u202Ecba\u202C \u2066x\u2069")), // 4 bidi controls
      (3L, Some("bad\uFFFD\uFFFDtext")),           // 2 replacement chars
      (4L, Some("ctl\u0007x\u001B\u007F")),        // 3 raw controls
      (5L, Some("perfectly clean text, tabs\tand\nnewlines are fine")),
      (6L, None)).toDF("doc_id", "text")
    val out = TextAudit.invisibleAudit(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_zero_width") === 2L)
    assert(out(2L).getAs[Long]("n_bidi") === 4L)
    assert(out(3L).getAs[Long]("n_replacement") === 2L)
    assert(out(4L).getAs[Long]("n_control") === 3L)
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(!out(i).getAs[Boolean]("is_clean")))
    Seq(5L, 6L).foreach { i =>
      assert(out(i).getAs[Long]("n_suspicious") === 0L)
      assert(out(i).getAs[Boolean]("is_clean"))
    }
  }
}
