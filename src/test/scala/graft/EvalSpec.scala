package graft

import graft.operators.Eval
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpecBase {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Option[Double] =
    Eval.aucByGroup(rows.map { case (s, l) => ("g", s, l) }.toDF("g", "s", "l"),
        "g", "s", "l")
      .select("auc").as[Option[Double]].head()

  test("hand-computed AUC with ties matches the midrank formula") {
    // scores: pos {3, 2}, neg {2, 1}. Pairs: (3>2), (3>1), (2=2 -> 1/2),
    // (2>1) => AUC = 3.5/4 = 0.875
    assert(auc(Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false)))
      === Some(0.875))
  }

  test("perfect separation, reversal, and coin-flip") {
    val perfect = Seq((5.0, true), (4.0, true), (1.0, false), (0.0, false))
    assert(auc(perfect) === Some(1.0))
    assert(auc(perfect.map { case (s, l) => (-s, l) }) === Some(0.0))
    // all scores tied: every pair is a half-win
    assert(auc(Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false)))
      === Some(0.5))
  }

  test("degenerate single-class groups yield NULL; null rows are dropped") {
    val df = Seq(
      ("ga", Some(1.0), Some(true)), ("ga", Some(2.0), Some(true)),
      ("gb", Some(1.0), Some(true)), ("gb", Some(2.0), Some(false)),
      ("gb", None, Some(true)), ("gb", Some(9.0), None))
      .toDF("g", "s", "l")
    val got = Eval.aucByGroup(df, "g", "s", "l")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(got("ga") === ((2L, 0L, None)))
    assert(got("gb") === ((1L, 1L, Some(0.0)))) // the one pos scores BELOW the one neg
  }

  test("pairRecall: unordered matching, duplicates collapse, empty sides go NULL") {
    val approx = Seq((2L, 1L), (1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val exact = Seq((1L, 2L), (4L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Eval.pairRecall(approx, exact)
      .as[(Long, Long, Long, Option[Double], Option[Double])].head()
    // approx dedups to {12, 34, 56}; exact {12, 34, 78}; hits {12, 34}
    assert(r === ((3L, 3L, 2L, Some(2.0 / 3.0), Some(2.0 / 3.0))))
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val e = Eval.pairRecall(empty, exact)
      .as[(Long, Long, Long, Option[Double], Option[Double])].head()
    assert(e === ((0L, 3L, 0L, Some(0.0), None)),
      "empty approx: recall 0, precision undefined")
  }

  test("antisymmetry: negating a tie-free score flips AUC around 0.5") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i => (rnd.nextDouble(), rnd.nextBoolean()))
    val a = auc(rows).get
    val b = auc(rows.map { case (s, l) => (-s, l) }).get
    assert(math.abs((a + b) - 1.0) < 1e-15)
  }

  // ------------------------------------------------------------- cohenKappa

  test("cohenKappa: hand-computed 2x2 fixture; perfect and chance-level agreement") {
    // classic fixture: a=yes/no rater counts: both-yes 20, both-no 15,
    // a-yes-b-no 5, a-no-b-yes 10 -> po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(5)(("y", "n")) ++ Seq.fill(10)(("n", "y"))
    val r = graft.operators.Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getLong(0) === 50L && r.getLong(1) === 35L)
    assert(r.getDouble(2) === 0.7 && r.getDouble(3) === 0.5)
    assert(math.abs(r.getDouble(4) - 0.4) < 1e-15)
    // identical raters: kappa 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(graft.operators.Eval.cohenKappa(perfect, "a", "b").head().getDouble(4) === 1.0)
  }

  test("cohenKappa: both-constant raters have pe=1 and NULL kappa; null labels drop") {
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val rc = graft.operators.Eval.cohenKappa(const, "a", "b").head()
    assert(rc.getDouble(3) === 1.0 && rc.isNullAt(4))
    val withNulls = Seq(
      (Some("x"), Some("x")), (None: Option[String], Some("y")),
      (Some("y"), None: Option[String])).toDF("a", "b")
    val rn = graft.operators.Eval.cohenKappa(withNulls, "a", "b").head()
    assert(rn.getLong(0) === 1L && rn.getLong(1) === 1L)
  }

  // ------------------------------------------------------- calibrationCurve

  test("calibrationCurve: hand fixture — bins, means, and positive rates") {
    val df = Seq(
      (0.05, false), (0.15, true), (0.15, false), (0.95, true), (1.0, true))
      .toDF("score", "label")
    val rows = Eval.calibrationCurve(df, "score", "label", nBins = 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getLong(0)).toList === List(0L, 1L, 9L),
      "score 1.0 clamps into the top bin")
    val b1 = rows(1)
    assert(b1.getLong(2) === 2L && b1.getLong(3) === 1L)
    assert(b1.getDouble(4) === 0.15 && b1.getDouble(5) === 0.5)
    val b9 = rows(2)
    assert(b9.getLong(2) === 2L && b9.getDouble(4) === 0.975 && b9.getDouble(5) === 1.0)
    assert(rows(0).getDouble(1) === 0.0 && b9.getDouble(1) === 0.9)
  }

  test("calibrationCurve: nulls drop, out-of-range clamps, a perfectly calibrated score lines up") {
    val base = Seq((Some(-0.2), Some(false)), (Some(1.7), Some(true)),
      (None: Option[Double], Some(true)), (Some(0.5), None: Option[Boolean]))
      .toDF("score", "label")
    val rows = Eval.calibrationCurve(base, "score", "label").orderBy("bin").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toList === List((0L, 1L), (9L, 1L)))
    // calibrated synthetic: in bin b, frac_pos == the bin's score
    val rnd = new scala.util.Random(11)
    val cal = (0 until 2000).map { _ =>
      val s = (rnd.nextInt(10) * 2 + 1) / 20.0 // bin midpoints .05,.15,...
      (s, rnd.nextDouble() < s)
    }.toDF("score", "label")
    val curve = Eval.calibrationCurve(cal, "score", "label").collect()
    curve.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 0.12,
        s"bin ${r.getLong(0)}: mean ${r.getDouble(4)} vs frac ${r.getDouble(5)}")
    }
  }

  test("krippendorffAlpha: hand-computed mixed-m fixture with a dropped singleton") {
    // A: x,x (term 0) | B: x,y (term 2) | C: x,x,y (term (9-5)/2 = 2)
    // D: single rating -> unpairable, drops entirely
    val ratings = Seq(
      ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"),
      ("C", "x"), ("C", "x"), ("C", "y"),
      ("D", "x")).toDF("item", "label")
    val r = Eval.krippendorffAlpha(ratings, "item", "label").head()
    assert(r.getAs[Long]("n_items") === 3L)
    assert(r.getAs[Long]("n_ratings") === 7L) // D's rating is not pairable
    assert(r.getAs[Long]("n_labels") === 2L)
    assert(r.getAs[Double]("d_o") === 4.0)
    // d_e = (49 - (25 + 4)) / 6 = 20/6; alpha = 1 - 4/(20/6) = -0.2
    assert(math.abs(r.getAs[Double]("d_e") - 20.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha") - (-0.2)) < 1e-12)
  }

  test("krippendorffAlpha: perfect agreement scores 1; one-label data is undefined") {
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("item", "label")
    val p = Eval.krippendorffAlpha(perfect, "item", "label").head()
    assert(p.getAs[Double]("d_o") === 0.0)
    assert(p.getAs[Double]("alpha") === 1.0)
    val oneLabel = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
      .toDF("item", "label")
    val o = Eval.krippendorffAlpha(oneLabel, "item", "label").head()
    assert(o.getAs[Double]("d_e") === 0.0)
    assert(o.isNullAt(o.fieldIndex("alpha")))
  }

  test("krippendorffAlpha: NULL ratings are missing data, not a label") {
    val withNulls = Seq(
      ("A", Some("x")), ("A", Some("x")), ("A", None),
      ("B", Some("x")), ("B", Some("y"))).toDF("item", "label")
    val r = Eval.krippendorffAlpha(withNulls, "item", "label").head()
    assert(r.getAs[Long]("n_ratings") === 4L)
    assert(r.getAs[Long]("n_items") === 2L)
  }
}
