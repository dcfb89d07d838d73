package graft
// (charEntropy cases at the bottom of this suite)

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokens drop empties from leading/trailing/multiple whitespace") {
    val out = one("  a \t b\nc  ").select(tokens(col("text"))).as[Seq[String]].head()
    assert(out === Seq("a", "b", "c"))
  }

  test("shingles: n-grams in order; fewer than n tokens -> empty") {
    assert(one("a b c d").select(shingles(col("text"), 3)).as[Seq[String]].head() ===
      Seq("a b c", "b c d"))
    assert(one("a b").select(shingles(col("text"), 3)).as[Seq[String]].head() === Seq.empty)
  }

  test("subwordCount counts alnum runs + single symbols") {
    assert(one("ab, cd!").select(subwordCount(col("text"))).as[Int].head() === 4)
  }

  test("fingerprint == md5 of whitespace-normalized lowercase text") {
    // regex formulation must equal the concat_ws(tokens(...)) definition
    val tricky = "  Hello\t WORLD \n x  "
    val viaTokens = one(tricky)
      .select(md5(concat_ws(" ", tokens(lower(col("text")))))).as[String].head()
    val viaRegex = one(tricky).select(fingerprint(col("text"))).as[String].head()
    assert(viaRegex === viaTokens)
  }

  test("langId votes stopwords; und when nothing matches") {
    assert(one("the cat sat on the mat and it is fine")
      .select(langId(col("text"))).as[String].head() === "en")
    assert(one("zzz qqq www").select(langId(col("text"))).as[String].head() === "und")
  }

  test("tokenStats matches the Column-level helpers on real documents") {
    val docs = testdata("sf0.001", "documents").limit(50)
    val stream = tokenStats(docs, "doc_id", "text")
      .withColumn("lang_pred", langPredFromStats)
      .select("doc_id", "n_tok", "mean_tok_len", "lang_pred")
    val columns = docs.select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      meanTokenLen(col("text")).as("mean_tok_len"),
      langId(col("text")).as("lang_pred"))
    assert(stream.exceptAll(columns).count() === 0)
    assert(columns.exceptAll(stream).count() === 0)
  }

  test("tokenStats keeps zero-token docs and carries doc-level columns in one scan") {
    // d4's NULL text must keep its row too (split(null) explodes to zero
    // rows without the coalesce — review regression)
    val docs = Seq(("d1", Some("the cat"), 7), ("d2", Some("   "), 3),
        ("d3", Some(""), 0), ("d4", None, 0))
      .toDF("doc_id", "text", "n_char")
    val stats = tokenStats(docs, "doc_id", "text", carryCols = Seq("n_char"))
    val rows = stats.select("doc_id", "n_char", "n_tok").as[(String, Int, Long)]
      .collect().map { case (id, nc, nt) => id -> ((nc, nt)) }.toMap
    assert(rows === Map("d1" -> ((7, 2L)), "d2" -> ((3, 0L)), "d3" -> ((0, 0L)),
      "d4" -> ((0, 0L))))
    // one scan, no join: the whole point of carryCols
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert("LocalTableScan".r.findAllIn(plan).size === 1)
  }

  test("winnowFingerprint is stable under small edits sharing min shingles") {
    val a = one("alpha beta gamma delta epsilon zeta eta theta")
      .select(winnowFingerprint(col("text"), 3, 2)).as[String].head()
    val b = one("alpha beta gamma delta epsilon zeta eta iota")
      .select(winnowFingerprint(col("text"), 3, 2)).as[String].head()
    assert(a.nonEmpty && b.nonEmpty)
  }

  test("charEntropy: hand-checked value, uniform > natural > constant, whitespace ignored") {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq(
      (1L, "aab"),              // counts a:2 b:1 -> ln3 - (2 ln2)/3
      (2L, "abcdefgh"),         // uniform over 8 chars -> ln 8
      (3L, "aaaa aaaa"),        // constant (whitespace stripped) -> 0
      (4L, "   "),              // nothing significant -> absent
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    val expected1 = r9(math.log(3)) - (2.0 * r9(math.log(2))) / 3.0
    assert(math.abs(got(1L)._2 - expected1) < 1e-12)
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(2L)._2 - r9(math.log(8))) < 1e-12)
    assert(got(3L)._2 === 0.0 && got(3L)._1 === 8L)
    assert(got(2L)._2 > got(1L)._2 && got(1L)._2 > got(3L)._2)
    intercept[IllegalArgumentException] {
      charEntropy(docs, "doc_id", "text", lnRoundDp = 0)
    }
  }

  test("compressionRatio ranks repetitive text below prose; deterministic; SQL fn") {
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "musicians rehearse an entirely different arrangement downtown."
    val template = ("name=value;" * 40) + ("<tr><td>row</td></tr>" * 30)
    val df = Seq(
      (1L, prose), (2L, template), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .withColumn("r", compressionRatio($"text"))
    val got = df.select($"id", $"r").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).get > 0.5, s"prose should compress poorly: ${got(1L)}")
    assert(got(2L).get < 0.2, s"templated text should crush: ${got(2L)}")
    assert(got(3L) === None && got(4L) === None)
    val again = df.select($"id", $"r").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(again === got, "pure function of the bytes")
    // SQL surface
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = Seq(Tuple1(template)).toDF("t")
      .selectExpr("graft_deflate_size(t) AS n").as[Long].head()
    assert(viaSql > 0L && viaSql < template.length)
  }
}
