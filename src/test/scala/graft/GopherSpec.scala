package graft

import graft.operators.Gopher
import org.apache.spark.sql.functions._

class GopherSpec extends SparkSpecBase {
  import spark.implicits._

  private def rules(text: String, minWords: Long = 5) =
    Gopher.qualityRules(Seq(Tuple1(text)).toDF("text"), "text", minWords = minWords)
      .select("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords", "keep")
      .head()

  private val prose =
    "the cat and the dog have found that every morning walk " +
    "begins with some patience to reach the garden gate"

  test("running prose passes every rule") {
    val r = rules(prose)
    (0 until 8).foreach(i => assert(r.getBoolean(i), s"rule $i failed"))
  }

  test("word-count bounds") {
    assert(!rules("too few words here").getBoolean(0))
    assert(!rules(prose, minWords = 1000).getBoolean(0))
  }

  test("mean word length: single-char words fail low, sesquipedalian fails high") {
    assert(!rules("a b c d e f g h i j").getBoolean(1))
    assert(!rules("extraordinarily incomprehensible pneumonoultramicroscopic " +
      "antidisestablishmentarian floccinaucinihilipilification honorificabilitudinity")
      .getBoolean(1))
    assert(rules(prose).getBoolean(1))
  }

  test("symbol ratio: hash- and ellipsis-riddled text fails (both ellipsis forms)") {
    assert(!rules("the # be # to # of # and # that # have # with # more #").getBoolean(2))
    assert(!rules("the... be... to... of... and... that... have... with... so...").getBoolean(2))
    // single-char U+2026 — what word processors emit — counts too
    assert(!rules("the… be… to… of… and… that… have… with… so…").getBoolean(2))
  }

  test("bullet and ellipsis line fractions") {
    val bullets = (1 to 10).map(i => s"- item $i with the and that of").mkString("\n")
    assert(!rules(bullets).getBoolean(3))
    val ells = (1 to 10).map(i => s"the line $i that trails off...").mkString("\n")
    assert(!rules(ells).getBoolean(4))
    val ellsU = (1 to 10).map(i => s"the line $i that trails off…").mkString("\n")
    assert(!rules(ellsU).getBoolean(4))
    // 1 bullet line in 10 is fine
    val mixed = ("- one bullet" +: (1 to 9).map(i => s"the plain line $i of prose")).mkString("\n")
    assert(rules(mixed).getBoolean(3))
  }

  test("alpha-word fraction: number soup fails") {
    assert(!rules("the 12 34 56 78 90 11 22 33 44 55 66 77 88 99 00").getBoolean(5))
  }

  test("stopword rule: technical token streams without stopwords fail") {
    val r = rules("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    assert(!r.getBoolean(6) && !r.getBoolean(7))
  }

  test("null text is treated as empty and dropped, not NPE'd") {
    val r = Gopher.qualityRules(
      Seq(Tuple1(null.asInstanceOf[String])).toDF("text"), "text")
      .select("n_words", "keep").head()
    assert(r.getLong(0) === 0L && !r.getBoolean(1))
  }

  test("the rule battery is a pure narrow projection — no Exchange") {
    val plan = Gopher.qualityRules(testdata("sf0.001", "documents"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
