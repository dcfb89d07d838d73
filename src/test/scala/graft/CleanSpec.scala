package graft

import graft.operators.Clean
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpecBase {
  import spark.implicits._

  private def cleanOne(s: String): String =
    Seq(Tuple1(s)).toDF("text").select(Clean.stripMarkup(col("text"))).head().getString(0)

  test("tags become single spaces; runs collapse; result is trimmed") {
    assert(cleanOne("<p>a</p><p>b</p>") === "a b")
    assert(cleanOne("  <div  class='x'>hi <br/> there</div>  ") === "hi there")
    assert(cleanOne("a<b>b</b>c") === "a b c")
  }

  test("script and style payloads are removed entirely, not just their tags") {
    assert(cleanOne("x <script>var a = '<p>not prose</p>';</script> y") === "x y")
    assert(cleanOne("x <STYLE type=\"text/css\">.a{..}</style> y") === "x y")
    assert(cleanOne("x <!-- hidden <b>note</b> --> y") === "x y")
  }

  test("entities decode exactly once, &amp; last") {
    assert(cleanOne("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b") === "a <tag> \"q\" 's' b")
    assert(cleanOne("fish &amp; chips") === "fish & chips")
    // one-pass rule: &amp;lt; -> &lt; (NOT <)
    assert(cleanOne("x &amp;lt; y") === "x &lt; y")
    assert(cleanOne("a&nbsp;&nbsp;b") === "a b")
  }

  test("DOCTYPE and XML declarations are stripped like tags (real pages start with them)") {
    assert(cleanOne("<!DOCTYPE html><html><body>hi</body></html>") === "hi")
    assert(cleanOne("<?xml version=\"1.0\" encoding=\"UTF-8\"?><p>x</p>") === "x")
    assert(cleanOne("<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0//EN\">body") === "body")
  }

  test("non-markup angle brackets survive (comparisons, lone '<')") {
    assert(cleanOne("if a < b and b > 1") === "if a < b and b > 1")
    assert(cleanOne("5<6 but <em>em</em>") === "5<6 but em")
  }

  test("cleanColumn kept-ratio: markup-heavy pages score low, prose ~1, null stays null") {
    val df = Seq(
      (1L, "plain prose with no markup at all"),
      (2L, "<div><script>var x;</script><b>hi</b></div>"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Clean.cleanColumn(df, "text", keptRatioCol = Some("kept"))
      .orderBy("doc_id")
      .select($"doc_id", $"text", $"kept").collect()
    assert(out(0).getString(1) === "plain prose with no markup at all")
    assert(out(0).getDouble(2) === 1.0)
    assert(out(1).getString(1) === "hi")
    assert(out(1).getDouble(2) < 0.1)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("empty and all-markup pages yield empty text and ratio 0, not null/NaN") {
    val df = Seq((1L, ""), (2L, "<br/><hr/>")).toDF("doc_id", "text")
    val out = Clean.cleanColumn(df, "text", keptRatioCol = Some("kept"))
      .orderBy("doc_id").select($"text", $"kept").as[(String, Double)].collect()
    assert(out.toSeq === Seq(("", 0.0), ("", 0.0)))
  }

  private def collapseOne(s: String): String =
    Seq(Tuple1(s)).toDF("text")
      .select(Clean.collapseRepeatedLines(col("text"))).head().getString(0)

  test("collapseRepeatedLines: consecutive dups fold, non-adjacent repeats survive") {
    assert(collapseOne("a\na\na\nb") === "a\nb")
    assert(collapseOne("a\nb\na") === "a\nb\na") // non-adjacent: kept
    assert(collapseOne("nav\nbody one\nbody two\nnav") === "nav\nbody one\nbody two\nnav")
    assert(collapseOne("single") === "single")
    assert(collapseOne("x\n\n\ny") === "x\n\ny") // blank runs collapse to one blank
  }

  test("anchorText and linkDensity: nav-heavy pages score high, prose low") {
    val navHeavy = "<nav><a href='/'>Home</a> <a href='/a'>About <b>us</b></a></nav> hi"
    val prose = "<p>plain long prose with <a href='/x'>one link</a> in the middle of it</p>"
    val df = Seq((1L, navHeavy), (2L, prose), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        Clean.anchorText(col("text")).as("a"),
        Clean.linkDensity(col("text")).as("ld"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "Home About us")
    assert(out(0).getDouble(2) > 0.5)
    assert(out(1).getString(1) === "one link")
    assert(out(1).getDouble(2) < 0.2)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // null text stays null
  }

  test("cleaning is a pure narrow projection — no Exchange in the plan") {
    val docs = testdata("sf0.001", "documents")
    val plan = Clean.cleanColumn(docs, "text", keptRatioCol = Some("kept"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
