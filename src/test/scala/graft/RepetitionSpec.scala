package graft

import graft.operators.Repetition
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Repetition.signals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Option[String], Long, Double)]
      .collect().toSeq

  test("duplicate-line signals on a repetitive document") {
    // 4 non-empty lines: "spam" x3 (4 chars each) + "real content" (12)
    val Seq((_, nLines, dupFrac, dupCharFrac, _, _, _)) =
      run(Seq((1L, "spam\nspam\n\n  spam  \nreal content")))
    assert(nLines === 4L)
    assert(dupFrac === 0.5) // 4 lines, 2 distinct -> (4-2)/4
    assert(dupCharFrac === 12.0 / 24.0) // spam chars 12 of 24 line chars
  }

  test("clean document has zero duplication and a deterministic top bigram") {
    val Seq((_, nLines, dupFrac, dupCharFrac, top, topN, topFrac)) =
      run(Seq((1L, "the cat sat on the mat")))
    assert(nLines === 1L && dupFrac === 0.0 && dupCharFrac === 0.0)
    // all 5 bigrams occur once; tie breaks to lexicographically smallest
    assert(top === Some("cat sat") && topN === 1L)
    assert(topFrac === 7.0 / 22.0)
  }

  test("repeated bigram dominates and its char mass is counted per occurrence") {
    val Seq((_, _, _, _, top, topN, topFrac)) =
      run(Seq((1L, "buy now buy now buy now")))
    // "buy now" x3, "now buy" x2 -> count wins before lexicographic order
    assert(top === Some("buy now") && topN === 3L)
    assert(topFrac === 3 * 7.0 / 23.0)
  }

  test("degenerate docs: empty text, whitespace, single token") {
    val got = run(Seq((1L, ""), (2L, "   \n  \n"), (3L, "word")))
    assert(got === Seq(
      (1L, 0L, 0.0, 0.0, None, 0L, 0.0),
      (2L, 0L, 0.0, 0.0, None, 0L, 0.0),
      (3L, 1L, 0.0, 0.0, None, 0L, 0.0)))
  }

  test("signals cover every input row exactly once on real documents") {
    val docs = testdata("sf0.001", "documents")
    val out = Repetition.signals(docs, "doc_id", "text")
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    val bad = out.filter(
      col("dup_line_frac") < 0 || col("dup_line_frac") > 1 ||
        col("dup_line_char_frac") < 0 || col("dup_line_char_frac") > 1 ||
        col("top_bigram_char_frac") < 0 || col("top_bigram_char_frac") > 1).count()
    assert(bad === 0L, "all fractions must stay in [0,1]")
  }
}
