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

  // --- average precision ------------------------------------------------------

  test("avgPrecisionByGroup: perfect ranking scores 1.0") {
    val df = Seq(("g", 10L, true, 1L), ("g", 9L, true, 2L), ("g", 1L, false, 3L))
      .toDF("grp", "score", "label", "id")
    val r = Eval.avgPrecisionByGroup(df, "grp", "score", "label", "id").head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Double]("avg_precision") === 1.0)
  }

  test("avgPrecisionByGroup: hand-computed interleaved ranking") {
    // ranking: pos, neg, pos -> AP = (P@1 + P@3)/2 = (1 + 2/3)/2 = 5/6
    val df = Seq(("g", 10L, true, 1L), ("g", 9L, false, 2L), ("g", 8L, true, 3L))
      .toDF("grp", "score", "label", "id")
    val ap = Eval.avgPrecisionByGroup(df, "grp", "score", "label", "id")
      .head().getAs[Double]("avg_precision")
    assert(math.abs(ap - 5.0 / 6.0) < 1e-8)
  }

  test("avgPrecisionByGroup: ties break by tieCol, making AP total-order-exact") {
    // equal scores: id ASC puts the negative first -> ranking neg, pos
    // AP = P@2 = 1/2
    val df = Seq(("g", 5L, false, 1L), ("g", 5L, true, 2L))
      .toDF("grp", "score", "label", "id")
    val ap = Eval.avgPrecisionByGroup(df, "grp", "score", "label", "id")
      .head().getAs[Double]("avg_precision")
    assert(ap === 0.5)
  }

  test("avgPrecisionByGroup: group without positives yields NULL; NULLs drop") {
    val df = Seq(
      ("a", Some(3L), Some(false), 1L), ("a", Some(2L), Some(false), 2L),
      ("b", Some(9L), Some(true), 3L), ("b", None, Some(true), 4L),
      ("b", Some(1L), None, 5L))
      .toDF("grp", "score", "label", "id")
    val rows = Eval.avgPrecisionByGroup(df, "grp", "score", "label", "id")
      .orderBy(col("grp")).collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("avg_precision")))
    assert(rows(1).getAs[Long]("n") === 1L) // null score + null label dropped
    assert(rows(1).getAs[Double]("avg_precision") === 1.0)
  }

  // --- expected calibration error ---------------------------------------------

  test("expectedCalibrationError: perfectly calibrated bin scores zero") {
    val df = Seq((0.25, true), (0.25, false), (0.25, false), (0.25, false))
      .toDF("score", "label")
    val r = Eval.expectedCalibrationError(df, "score", "label").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_bins_used") === 1L)
    assert(r.getAs[Double]("ece") === 0.0)
    assert(r.getAs[Double]("mce") === 0.0)
  }

  test("expectedCalibrationError: hand-computed two-bin miscalibration") {
    // bin0: conf 0.05, acc 1.0 (gap .95, n=2); bin9: conf 0.95, acc 0 (gap .95)
    val df = Seq((0.05, true), (0.05, true), (0.95, false))
      .toDF("score", "label")
    val r = Eval.expectedCalibrationError(df, "score", "label").head()
    assert(math.abs(r.getAs[Double]("ece") - 0.95) < 1e-9)
    assert(math.abs(r.getAs[Double]("mce") - 0.95) < 1e-12)
  }

  test("expectedCalibrationError: score 1.0 clamps into the top bin") {
    val df = Seq((1.0, true), (0.95, true)).toDF("score", "label")
    val r = Eval.expectedCalibrationError(df, "score", "label").head()
    assert(r.getAs[Long]("n_bins_used") === 1L)
  }

  test("expectedCalibrationError: empty input reports NULL scores") {
    val df = Seq.empty[(Double, Boolean)].toDF("score", "label")
    val r = Eval.expectedCalibrationError(df, "score", "label").head()
    assert(r.getAs[Long]("n_bins_used") === 0L)
    assert(r.isNullAt(r.fieldIndex("ece")))
    assert(r.isNullAt(r.fieldIndex("mce")))
  }

  // --- split-conformal calibration ---------------------------------------------

  test("conformalCalibration: textbook nearest-rank threshold and coverage") {
    // n_cal = 9, alpha = 0.1: rank = ceil(10 * 0.9) = 9 -> qhat = max = 90
    val cal = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L).toDF("s")
    val test = Seq(5L, 85L, 95L).toDF("s")
    val r = Eval.conformalCalibration(cal, test, "s", alphaPermille = 100L).head()
    assert(r.getAs[Long]("n_cal") === 9L)
    assert(r.getAs[Long]("rank") === 9L)
    assert(r.getAs[Long]("qhat") === 90L)
    assert(r.getAs[Long]("n_covered") === 2L)
    assert(math.abs(r.getAs[Double]("coverage") - 2.0 / 3.0) < 1e-15)
  }

  test("conformalCalibration: rank clamps to n_cal on tiny samples") {
    // n_cal = 2: ceil(3*0.9) = 3 > 2 -> clamp to 2 -> qhat = 7
    val cal = Seq(3L, 7L).toDF("s")
    val test = Seq(6L, 8L).toDF("s")
    val r = Eval.conformalCalibration(cal, test, "s").head()
    assert(r.getAs[Long]("rank") === 2L)
    assert(r.getAs[Long]("qhat") === 7L)
    assert(r.getAs[Long]("n_covered") === 1L)
  }

  test("conformalCalibration: duplicate calibration scores pick the right rank value") {
    // sorted: 1,1,1,5 -> rank ceil(5*0.9)=5 clamp 4 -> qhat 5;
    // alpha=0.5: rank ceil(5*0.5)=3 -> qhat = 1
    val cal = Seq(1L, 1L, 1L, 5L).toDF("s")
    val test = Seq(1L).toDF("s")
    val r1 = Eval.conformalCalibration(cal, test, "s", alphaPermille = 500L).head()
    assert(r1.getAs[Long]("rank") === 3L)
    assert(r1.getAs[Long]("qhat") === 1L)
  }

  test("conformalCalibration: empty calibration yields NULL qhat and coverage") {
    val cal = Seq.empty[Long].toDF("s")
    val test = Seq(1L, 2L).toDF("s")
    val r = Eval.conformalCalibration(cal, test, "s").head()
    assert(r.getAs[Long]("n_cal") === 0L)
    assert(r.isNullAt(r.fieldIndex("qhat")))
    assert(r.getAs[Long]("n_covered") === 0L)
    assert(r.isNullAt(r.fieldIndex("coverage")))
  }

  // --- Fleiss' kappa -------------------------------------------------------------

  test("fleissKappa: Fleiss 1971 textbook values on a hand-built panel") {
    // 4 items x 3 raters. Item counts per category:
    // i1: a=3        -> sum n^2 = 9
    // i2: a=2, b=1   -> 4 + 1 = 5
    // i3: b=3        -> 9
    // i4: a=1, b=2   -> 1 + 4 = 5
    // P_bar = (28 - 12) / (4*3*2) = 16/24 = 2/3
    // c_a = 6, c_b = 6 -> Pe = (36+36)/144 = 0.5 -> kappa = (2/3-0.5)/0.5 = 1/3
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "b")).toDF("item", "label")
    val r = Eval.fleissKappa(rows, "item", "label").head()
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("m") === 3L)
    assert(r.getAs[Long]("n_categories") === 2L)
    assert(math.abs(r.getAs[Double]("po") - 2.0 / 3.0) < 1e-15)
    assert(r.getAs[Double]("pe") === 0.5)
    assert(math.abs(r.getAs[Double]("kappa") - 1.0 / 3.0) < 1e-15)
  }

  test("fleissKappa: perfect agreement scores 1 with multiple categories") {
    val rows = Seq(
      (1L, "x"), (1L, "x"), (2L, "y"), (2L, "y")).toDF("item", "label")
    val r = Eval.fleissKappa(rows, "item", "label").head()
    assert(r.getAs[Double]("po") === 1.0)
    assert(r.getAs[Double]("kappa") === 1.0)
  }

  test("fleissKappa: ragged panels report NULL instead of a silent average") {
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"), (2L, "y"), (2L, "y")).toDF("item", "label")
    val r = Eval.fleissKappa(rows, "item", "label").head()
    assert(r.getAs[Long]("n_items") === 2L)
    assert(r.isNullAt(r.fieldIndex("m")))
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("fleissKappa: single category means pe = 1 and NULL kappa") {
    val rows = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("item", "label")
    val r = Eval.fleissKappa(rows, "item", "label").head()
    assert(r.getAs[Double]("pe") === 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  // --- isotonic calibration -------------------------------------------------------

  test("isotonicCalibration: monotone inputs pass through unpooled") {
    // bin0 rate 0.0, bin5 rate 0.5, bin9 rate 1.0 — already isotonic
    val df = Seq(
      (0.05, false), (0.05, false),
      (0.55, true), (0.55, false),
      (0.95, true), (0.95, true)).toDF("score", "label")
    val rows = Eval.isotonicCalibration(df, "score", "label")
      .orderBy(col("bin")).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("fitted") === r.getAs[Double]("rate"))
    }
  }

  test("isotonicCalibration: a violating pair pools to the weighted mean") {
    // bin0: 1 pos of 1 (rate 1.0); bin9: 1 pos of 3 (rate 1/3) — violation
    // pooled fit = 2 pos / 4 = 0.5 on both bins
    val df = Seq(
      (0.05, true),
      (0.95, true), (0.95, false), (0.95, false)).toDF("score", "label")
    val rows = Eval.isotonicCalibration(df, "score", "label")
      .orderBy(col("bin")).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("rate") === 1.0)
    assert(rows(0).getAs[Double]("fitted") === 0.5)
    assert(rows(1).getAs[Double]("fitted") === 0.5)
  }

  test("isotonicCalibration: fitted values are monotone on a zigzag") {
    val df = Seq(
      (0.05, false), (0.05, true),              // 0.5
      (0.15, false), (0.15, false),             // 0.0
      (0.25, true), (0.25, true),               // 1.0
      (0.35, false), (0.35, true)).toDF("score", "label") // 0.5
    val fitted = Eval.isotonicCalibration(df, "score", "label")
      .orderBy(col("bin")).collect().map(_.getAs[Double]("fitted"))
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b },
      fitted.mkString(","))
  }

  test("ndcgByGroup: perfect ranking scores 1.0; no-positives group is NULL") {
    val df = Seq(
      // g1: positives ranked on top -> dcg == idcg -> ndcg 1.0
      ("g1", 3.0, true, 1L), ("g1", 2.0, true, 2L), ("g1", 1.0, false, 3L),
      // g2: no positives -> dcg/idcg/ndcg NULL
      ("g2", 3.0, false, 1L), ("g2", 2.0, false, 2L))
      .toDF("g", "s", "l", "tb")
    val rows = Eval.ndcgByGroup(df, "g", "s", "l", "tb", k = 3)
      .orderBy("g").collect()
    assert(rows(0).getAs[Double]("ndcg") === 1.0)
    assert(rows(0).getAs[Long]("n_pos") === 2L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("dcg")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("idcg")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("ndcg")))
  }

  test("ndcgByGroup: hand-computed discounts; worse ranking scores below 1") {
    // positives at ranks 1 and 3 of 3, k=3:
    // dcg  = 1 + ln(2)/ln(4), idcg = 1 + ln(2)/ln(3)
    val df = Seq(
      ("g", 3.0, true, 1L), ("g", 2.0, false, 2L), ("g", 1.0, true, 3L))
      .toDF("g", "s", "l", "tb")
    val r = Eval.ndcgByGroup(df, "g", "s", "l", "tb", k = 3).head()
    val dcg = 1.0 + math.log(2) / math.log(4)
    val idcg = 1.0 + math.log(2) / math.log(3)
    assert(math.abs(r.getAs[Double]("dcg") - dcg) < 1e-6)
    assert(math.abs(r.getAs[Double]("idcg") - idcg) < 1e-6)
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-6)
    assert(r.getAs[Double]("ndcg") < 1.0)
  }

  test("ndcgByGroup: k cuts the dcg window but idcg still caps at n_pos") {
    // k=1 with positives at ranks 2,3: dcg counts nothing, ndcg = 0
    val df = Seq(
      ("g", 3.0, false, 1L), ("g", 2.0, true, 2L), ("g", 1.0, true, 3L))
      .toDF("g", "s", "l", "tb")
    val r = Eval.ndcgByGroup(df, "g", "s", "l", "tb", k = 1).head()
    assert(r.getAs[Double]("dcg") === 0.0)
    assert(r.getAs[Double]("idcg") === 1.0) // rank-1 discount only
    assert(r.getAs[Double]("ndcg") === 0.0)
  }

  test("brierLogLoss: hand-computed on perfect and mixed predictions") {
    // perfect 0/1 predictions: brier 0 (unclamped), logloss = -ln(1-eps)
    // per row = 0.000001 after the 9-dp ln contract
    val perfect = Seq((1.0, true), (0.0, false)).toDF("p", "l")
    val r1 = Eval.brierLogLoss(perfect, "p", "l").head()
    assert(r1.getAs[Long]("n") === 2L && r1.getAs[Long]("n_pos") === 1L)
    assert(r1.getAs[Double]("brier") === 0.0)
    assert(r1.getAs[Double]("logloss") === 0.000001)
    // one row p=0.5 true: brier 0.25, logloss = -ln9(0.5)
    val mixed = Seq((0.5, true)).toDF("p", "l")
    val r2 = Eval.brierLogLoss(mixed, "p", "l").head()
    assert(r2.getAs[Double]("brier") === 0.25)
    assert(math.abs(r2.getAs[Double]("logloss") - math.log(2)) < 1e-8)
  }

  test("brierLogLoss: empty input reports n=0 with NULL scores") {
    val empty = Seq.empty[(Double, Boolean)].toDF("p", "l")
    val r = Eval.brierLogLoss(empty, "p", "l").head()
    assert(r.getAs[Long]("n") === 0L)
    assert(r.isNullAt(r.fieldIndex("brier")))
    assert(r.isNullAt(r.fieldIndex("logloss")))
  }

  test("bhFdrSelect: hand-computed step-up cut") {
    // alpha=0.25, m=4, thresholds k*0.0625: ranks 1,2 reject, 3,4 survive
    val df = Seq(("g", 1L, 0.01), ("g", 2L, 0.02), ("g", 3L, 0.2),
      ("g", 4L, 0.9)).toDF("grp", "id", "p")
    val rows = Eval.bhFdrSelect(df, "grp", "id", "p", alpha = 0.25)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Boolean]("rejected")).toSeq ===
      Seq(true, true, false, false))
    assert(rows.map(_.getAs[Long]("m")).toSet === Set(4L))
  }

  test("bhFdrSelect: step-up rescues earlier ranks; no-candidate group rejects nothing") {
    // p=[0.01,0.09,0.12,0.9] alpha=0.2: thresholds 0.05,0.10,0.15,0.20 —
    // rank 3 (0.12 <= 0.15) passes, so ranks 1..3 ALL reject even though
    // rank 2's own p (0.09) is below its threshold and rank 4 is not
    val df = Seq(("a", 1L, 0.01), ("a", 2L, 0.09), ("a", 3L, 0.12),
      ("a", 4L, 0.9), ("b", 5L, 0.8), ("b", 6L, 0.9)).toDF("grp", "id", "p")
    val out = Eval.bhFdrSelect(df, "grp", "id", "p", alpha = 0.2)
    val a = out.filter(col("grp") === "a").orderBy("rank")
      .collect().map(_.getAs[Boolean]("rejected")).toSeq
    assert(a === Seq(true, true, true, false))
    assert(out.filter(col("grp") === "b" && col("rejected")).count() === 0L)
  }

  test("bhFdrSelect: out-of-range p-values drop and shrink m") {
    val df = Seq(("g", 1L, 0.01), ("g", 2L, -0.5), ("g", 3L, 1.5))
      .toDF("grp", "id", "p")
    val rows = Eval.bhFdrSelect(df, "grp", "id", "p", alpha = 0.1).collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("m") === 1L)
  }

  test("prCurveByGroup: hand-computed curve; no-positives group reports NULL recall") {
    val df = Seq(("g", 3L, true), ("g", 2L, false), ("g", 1L, true),
      ("h", 5L, false)).toDF("grp", "s", "l")
    val rows = Eval.prCurveByGroup(df, "grp", "s", "l")
      .orderBy("grp", "threshold").collect()
    val g = rows.filter(_.getAs[String]("grp") == "g")
      .map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("n_predicted"),
        r.getAs[Long]("tp"), r.getAs[Double]("precision"),
        r.getAs[Double]("recall"), r.getAs[Double]("f1"))).toSeq
    assert(g === Seq(
      (1L, 3L, 2L, 2.0 / 3.0, 1.0, 2.0 * (2.0 / 3.0) * 1.0 / (2.0 / 3.0 + 1.0)),
      (2L, 2L, 1L, 0.5, 0.5, 2.0 * 0.5 * 0.5 / (0.5 + 0.5)),
      (3L, 1L, 1L, 1.0, 0.5, 2.0 * 1.0 * 0.5 / (1.0 + 0.5))))
    val h = rows.find(_.getAs[String]("grp") == "h").get
    assert(h.isNullAt(h.fieldIndex("recall")) && h.isNullAt(h.fieldIndex("f1")))
    assert(h.getAs[Double]("precision") === 0.0)
  }

  test("confusionAtThreshold: hand-computed cells, balanced accuracy and MCC") {
    // t=0.5: tp=2 (0.9,0.5 true), fn=1 (0.4 true), fp=1 (0.7 false),
    // tn=2 (0.3,0.1 false)
    val df = Seq((0.9, true), (0.5, true), (0.4, true),
      (0.7, false), (0.3, false), (0.1, false)).toDF("p", "l")
    val r = Eval.confusionAtThreshold(df, "p", "l", 0.5).head()
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("tn"), r.getAs[Long]("fn")) === ((2L, 1L, 2L, 1L)))
    assert(r.getAs[Double]("accuracy") === 4.0 / 6.0)
    assert(r.getAs[Double]("balanced_accuracy") ===
      (2.0 / 3.0 + 2.0 / 3.0) / 2.0)
    val mcc = (2.0 * 2.0 - 1.0 * 1.0) / math.sqrt(3.0 * 3.0 * 3.0 * 3.0)
    assert(math.abs(r.getAs[Double]("mcc") - mcc) < 1e-15)
  }

  test("confusionAtThreshold: single-class input reports NULL balanced accuracy and MCC") {
    val df = Seq((0.9, true), (0.2, true)).toDF("p", "l")
    val r = Eval.confusionAtThreshold(df, "p", "l", 0.5).head()
    assert(r.isNullAt(r.fieldIndex("balanced_accuracy")))
    assert(r.isNullAt(r.fieldIndex("mcc")))
    assert(r.getAs[Double]("accuracy") === 0.5)
  }

  test("gainsTable: top bucket captures the positive mass; ties never split") {
    val df = Seq((4.0, true), (3.0, true), (2.0, false), (1.0, false))
      .toDF("s", "l")
    val rows = Eval.gainsTable(df, "s", "l", nBuckets = 2)
      .orderBy("bucket").collect()
    assert(rows.map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n"),
      r.getAs[Long]("n_pos"))).toSeq === Seq((1, 2L, 2L), (2, 2L, 2L - 2L + 0L)))
    assert(rows(0).getAs[Double]("gain") === 1.0)
    assert(rows(0).getAs[Double]("lift") === 2.0)
    assert(rows(1).getAs[Double]("gain") === 1.0)
    assert(rows(1).getAs[Double]("lift") === 1.0)
    // all-tied scores collapse into ONE (the last) bucket — value-atomic
    val tied = Seq.fill(5)((7.0, true)).toDF("s", "l")
    val t = Eval.gainsTable(tied, "s", "l", nBuckets = 2).collect()
    assert(t.length === 1 && t(0).getAs[Int]("bucket") === 2 &&
      t(0).getAs[Long]("n") === 5L)
  }

  test("rocCurve: hand-computed points; degenerate single-class NULLs the absent rate") {
    val df = Seq((4.0, true), (3.0, false), (2.0, true)).toDF("s", "l")
    val rows = Eval.rocCurve(df, "s", "l").orderBy(col("threshold").desc)
      .collect().map(r => (r.getAs[Double]("threshold"),
        r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Double]("tpr"), r.getAs[Double]("fpr"))).toSeq
    assert(rows === Seq(
      (4.0, 1L, 0L, 0.5, 0.0),
      (3.0, 1L, 1L, 0.5, 1.0),
      (2.0, 2L, 1L, 1.0, 1.0)))
    val onlyPos = Seq((1.0, true)).toDF("s", "l")
    val r = Eval.rocCurve(onlyPos, "s", "l").head()
    assert(r.getAs[Double]("tpr") === 1.0)
    assert(r.isNullAt(r.fieldIndex("fpr")))
  }

  test("mrrByGroup: reciprocal rank of the first hit; no-positive group is NULL") {
    val df = Seq(
      ("g1", 9.0, false, 1L), ("g1", 8.0, true, 2L), ("g1", 7.0, true, 3L),
      ("g2", 5.0, false, 4L)).toDF("g", "s", "l", "id")
    val rows = Eval.mrrByGroup(df, "g", "s", "l", "id").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(rows("g1").getAs[Long]("first_pos_rank") === 2L)
    assert(rows("g1").getAs[Double]("rr") === 0.5)
    assert(rows("g2").isNullAt(rows("g2").fieldIndex("rr")))
  }

  test("aucCiByGroup: hand-computed DeLong SE; auc agrees with aucByGroup; guards") {
    import graft.operators.Eval
    // pos {3,1}, neg {2,0}: placements pos = {1, .5} -> auc .75,
    // v10 = v01 = .125 -> se = sqrt(.125/2 + .125/2) = sqrt(.125)
    val df = Seq(("g", 3.0, true), ("g", 1.0, true),
      ("g", 2.0, false), ("g", 0.0, false)).toDF("g", "s", "l")
    val r = Eval.aucCiByGroup(df, "g", "s", "l").head()
    assert(r.getAs[Double]("auc") === 0.75)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(0.125)) < 1e-9)
    assert(r.getAs[Double]("ci_hi") === 1.0, "ci clamps to [0,1]")
    assert(r.getAs[Double]("ci_lo") > 0.0 && r.getAs[Double]("ci_lo") < 0.75)
    // the point estimate matches aucByGroup (midrank tie convention)
    val big = (1 to 60).map { i =>
      ("h", (i * 2654435761L % 97).toDouble + (if (i % 3 == 0) 20.0 else 0.0),
        i % 3 == 0)
    }.toDF("g", "s", "l")
    val a1 = Eval.aucCiByGroup(big, "g", "s", "l").head().getAs[Double]("auc")
    val a2 = Eval.aucByGroup(big, "g", "s", "l").head().getAs[Double]("auc")
    assert(math.abs(a1 - a2) < 1e-9, s"$a1 vs $a2")
    // a single-row class: auc defined, se/ci NULL
    val tiny = Seq(("t", 2.0, true), ("t", 1.0, false), ("t", 0.0, false))
      .toDF("g", "s", "l")
    val rt = Eval.aucCiByGroup(tiny, "g", "s", "l").head()
    assert(rt.getAs[Double]("auc") === 1.0)
    assert(rt.isNullAt(rt.fieldIndex("se")))
  }

  test("wilsonIntervalByGroup: boundary counts stay in [0,1]; interval brackets the rate") {
    import graft.operators.Eval
    val z = 1.959963985
    val df = (Seq.tabulate(10)(i => ("all", true)) ++
      Seq.tabulate(10)(i => ("none", false)) ++
      Seq.tabulate(100)(i => ("mix", i < 20))).toDF("g", "l")
    val got = Eval.wilsonIntervalByGroup(df, "g", "l")
      .collect().map(r => r.getString(0) -> r).toMap
    // k = n: hi pins to 1, lo = 1/(1 + z^2/n) (the Wilson closed form)
    val all = got("all")
    assert(all.getAs[Double]("rate") === 1.0)
    assert(math.abs(all.getAs[Double]("ci_hi") - 1.0) < 1e-12)
    assert(math.abs(all.getAs[Double]("ci_lo") -
      1.0 / (1.0 + z * z / 10.0)) < 1e-9)
    // k = 0 mirrors
    val none = got("none")
    assert(none.getAs[Double]("rate") === 0.0)
    assert(math.abs(none.getAs[Double]("ci_lo")) < 1e-12)
    assert(math.abs(none.getAs[Double]("ci_hi") -
      (z * z / 10.0) / (1.0 + z * z / 10.0)) < 1e-9)
    // interior: the interval brackets the rate and stays in [0, 1]
    val mix = got("mix")
    assert(mix.getAs[Long]("n") === 100L && mix.getAs[Long]("n_pos") === 20L)
    assert(mix.getAs[Double]("ci_lo") > 0.12 &&
      mix.getAs[Double]("ci_lo") < 0.2)
    assert(mix.getAs[Double]("ci_hi") > 0.2 &&
      mix.getAs[Double]("ci_hi") < 0.3)
  }

  test("brierDecompositionByGroup: hand case; BRIER = REL - RES + UNC") {
    import graft.operators.Eval
    // bins: f=.8 (T,T,F), f=.2 (F,F) -> ybar=.4
    // REL = (3*(.8-2/3)^2 + 2*.04)/5; RES = (3*(2/3-.4)^2 + 2*.16)/5
    // UNC = .24; BRIER = .8/5 = .16
    val df = Seq(("g", 0.8, true), ("g", 0.8, true), ("g", 0.8, false),
      ("g", 0.2, false), ("g", 0.2, false)).toDF("g", "f", "y")
    val r = Eval.brierDecompositionByGroup(df, "g", "f", "y").head()
    assert(r.getAs[Long]("n") === 5L && r.getAs[Long]("n_forecasts") === 2L)
    assert(r.getAs[Double]("base_rate") === 0.4)
    assert(math.abs(r.getAs[Double]("reliability") - 0.4 / 15.0) < 1e-8)
    assert(math.abs(r.getAs[Double]("resolution") - 1.6 / 15.0) < 1e-8)
    assert(r.getAs[Double]("uncertainty") === 0.24)
    assert(math.abs(r.getAs[Double]("brier") - 0.16) < 1e-8)
    val identity = r.getAs[Double]("reliability") -
      r.getAs[Double]("resolution") + r.getAs[Double]("uncertainty")
    assert(math.abs(identity - r.getAs[Double]("brier")) < 1e-9,
      "Murphy identity must hold to quantization residue")
  }

  test("multiclassReport: union classes, never-predicted and hallucinated classes stay loud") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),   // a: 3 true, 2 tp
      ("b", "a"), ("b", "b"),               // b: 2 true, 1 tp
      ("c", "a"),                           // c never predicted
      ("a", "z")                            // z never a true label
    ).toDF("l", "p")
    val got = Eval.multiclassReport(df, "l", "p")
      .select("class", "n_true", "n_pred", "tp", "precision", "recall", "f1")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 4L, 4L, 2L, Some(0.5), Some(0.5), Some(0.5))))
    assert(got("b") === (("b", 2L, 2L, 1L, Some(0.5), Some(0.5), Some(0.5))))
    assert(got("c") === (("c", 1L, 0L, 0L, None, Some(0.0), None)),
      "a never-predicted class keeps its recall row")
    assert(got("z") === (("z", 0L, 1L, 0L, Some(0.0), None, None)),
      "an hallucinated class keeps its precision row")
    assert(got.size === 4)
  }

  test("weightedKappa: perfect agreement 1, quadratic beats linear on far misses, numeric ordering") {
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L), (1L, 1L)).toDF("a", "b")
    val p = Eval.weightedKappa(perfect, "a", "b").head()
    assert(p.getAs[Double]("kappa_w") === 1.0)
    assert(p.getAs[Double]("do_w") === 0.0)
    // hand case: ratings 0..2; one near miss (0 vs 1), one far miss (0 vs 2)
    // cells: (0,0):2 (0,1):1 (0,2):1 (1,1):1 (2,2):1
    // quadratic num = 0+1+4+0+0 = 5; marginals a: 0->4,1->1,2->1; b: 0->2,1->2,2->2
    // den = sum (i-j)^2 na nb = (0,1):1*4*2 + (0,2):4*4*2 + (1,0):1*1*2 +
    //       (1,2):1*1*2 + (2,0):4*1*2 + (2,1):1*1*2 = 8+32+2+2+8+2 = 54
    // kappa = 1 - 6*5/54 = 1 - 30/54
    val df = Seq((0L, 0L), (0L, 0L), (0L, 1L), (0L, 2L), (1L, 1L), (2L, 2L))
      .toDF("a", "b")
    val q = Eval.weightedKappa(df, "a", "b").head()
    assert(q.getAs[Long]("n") === 6L)
    assert(q.getAs[Long]("n_categories") === 3L)
    assert(q.getAs[Double]("kappa_w") === 1.0 - 6.0 * 5.0 / 54.0)
    assert(q.getAs[Double]("do_w") === 5.0 / (6.0 * 4.0))
    // linear weights punish the far miss less severely relative to chance
    val l = Eval.weightedKappa(df, "a", "b", quadratic = false).head()
    // linear num = 0+1+2 = 3; den = 1*4*2 + 2*4*2 + 1*1*2 + 1*1*2 + 2*1*2 + 1*1*2 = 8+16+2+2+4+2 = 34
    assert(l.getAs[Double]("kappa_w") === 1.0 - 6.0 * 3.0 / 34.0)
    // ordinal values sort numerically: 2 < 10 (lexically "10" < "2")
    val num = Seq((2L, 2L), (10L, 10L), (2L, 10L)).toDF("a", "b")
    val r = Eval.weightedKappa(num, "a", "b").head()
    assert(r.getAs[Long]("n_categories") === 2L)
    // a single category: chance disagreement 0 -> NULL kappa, never NaN
    val one = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    assert(Eval.weightedKappa(one, "a", "b").head().isNullAt(
      Eval.weightedKappa(one, "a", "b").head().fieldIndex("kappa_w")))
  }

  test("multiclassSummary: accuracy, zero-division-0 macros, support-weighted f1") {
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "a"), ("b", "b"),
      ("c", "a"),
      ("a", "z")).toDF("l", "p")
    val r = Eval.multiclassSummary(df, "l", "p").head()
    // classes a/b/c/z: tp 2/1/0/0; n 7
    assert(r.getAs[Long]("n") === 7L)
    assert(r.getAs[Long]("n_classes") === 4L)
    assert(r.getAs[Double]("accuracy") === 3.0 / 7.0)
    // precisions: a 0.5, b 0.5, c NULL->0, z 0 -> macro = 1.0/4
    assert(r.getAs[Double]("macro_precision") === 0.25)
    // recalls: a 0.5, b 0.5, c 0, z NULL->0 -> 0.25
    assert(r.getAs[Double]("macro_recall") === 0.25)
    // f1: a 0.5, b 0.5, others 0 -> 0.25
    assert(r.getAs[Double]("macro_f1") === 0.25)
    // weighted: (0.5*4 + 0.5*2 + 0 + 0)/7
    assert(r.getAs[Double]("weighted_f1") === (r9(0.5) * 4 + r9(0.5) * 2) / 7.0)
  }

  test("rankBiasedOverlap: identical lists score 1, disjoint 0, depth weighting top-heavy") {
    val a = (1 to 10).map(r => (1L, r.toLong + 100L, r)).toDF("query_id", "neighbor_id", "rank")
    val idSelf = Eval.rankBiasedOverlap(a, a, k = 10, p = 0.9)
      .select("n_common", "rbo").as[(Long, Double)].head()
    assert(idSelf._1 === 10L)
    assert(math.abs(idSelf._2 - 1.0) < 5e-9, s"identical lists: ${idSelf._2}")
    val b = (1 to 10).map(r => (1L, r.toLong + 500L, r)).toDF("query_id", "neighbor_id", "rank")
    val disj = Eval.rankBiasedOverlap(a, b, k = 10, p = 0.9)
      .select("n_common", "rbo").as[(Long, Double)].head()
    assert(disj === ((0L, 0.0)))
    // agreement only at rank 1 beats agreement only at rank 10
    def swapOne(pos: Int) = (1 to 10).map(r =>
      (1L, if (r == pos) r.toLong + 100L else r.toLong + 500L, r))
      .toDF("query_id", "neighbor_id", "rank")
    val top = Eval.rankBiasedOverlap(a, swapOne(1), k = 10, p = 0.9)
      .select("rbo").as[Double].head()
    val bottom = Eval.rankBiasedOverlap(a, swapOne(10), k = 10, p = 0.9)
      .select("rbo").as[Double].head()
    assert(top > bottom && bottom > 0.0, s"$top vs $bottom")
    // queries present only in one frame still report (rbo 0)
    val onlyA = (1 to 3).map(r => (9L, r.toLong, r)).toDF("query_id", "neighbor_id", "rank")
    val rows = Eval.rankBiasedOverlap(a.unionByName(onlyA), b, k = 10, p = 0.9)
      .select("query_id", "rbo").as[(Long, Double)].collect().toMap
    assert(rows(9L) === 0.0)
  }

  test("fairnessAudit: hand-computed rates and gaps; absent reference is loud NULLs") {
    val df = Seq(
      ("a", true, true), ("a", true, false), ("a", false, true), ("a", false, false),
      ("b", true, true), ("b", true, true), ("b", false, false),
      ("b", false, false), ("b", false, true), ("b", true, false),
      ("c", false, false), ("c", false, false)).toDF("g", "l", "p")
    val got = Eval.fairnessAudit(df, "g", "l", "p", "a")
      .select("g", "n", "n_pos", "base_rate", "sel_rate", "tpr", "fpr",
        "dp_gap", "di_ratio", "tpr_gap", "fpr_gap")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 4L, 2L, 0.5, 0.5, Some(0.5), Some(0.5),
      Some(0.0), Some(1.0), Some(0.0), Some(0.0))))
    assert(got("b") === (("b", 6L, 3L, 0.5, 0.5, Some(2.0 / 3.0), Some(1.0 / 3.0),
      Some(0.0), Some(1.0), Some(2.0 / 3.0 - 0.5), Some(1.0 / 3.0 - 0.5))))
    // c has no positives -> tpr NULL, and so is its gap
    assert(got("c") === (("c", 2L, 0L, 0.0, 0.0, None, Some(0.0),
      Some(-0.5), Some(0.0), None, Some(-0.5))))
    // absent reference: every group still reported, gaps NULL
    val noref = Eval.fairnessAudit(df, "g", "l", "p", "zz")
      .select("g", "dp_gap", "di_ratio", "tpr_gap", "fpr_gap")
      .as[(String, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(noref.length === 3)
    assert(noref.forall(r => r._2.isEmpty && r._3.isEmpty && r._4.isEmpty && r._5.isEmpty))
  }

  test("bleuPairs: clipping stops repetition, BP penalizes short candidates, zero p_n zeroes") {
    import graft.operators.Eval
    val df = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"), // identical
      (2L, "the the the the", "the cat"),   // clipped unigrams: min(4, 1)=1
      (3L, "the cat", "the cat sat on the mat"), // short candidate: BP < 1
      (4L, "completely different words here", "the cat sat on the mat"),
      (5L, "", "the cat"))
      .toDF("id", "cand", "ref")
    val out = Eval.bleuPairs(df, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    // identical pair: all precisions 1, bp 1, bleu exactly 1
    assert(out(1L).getAs[Double]("p1") === 1.0)
    assert(out(1L).getAs[Double]("p4") === 1.0)
    assert(out(1L).getAs[Double]("bp") === 1.0)
    assert(out(1L).getAs[Double]("bleu") === 1.0)
    // "the the the the" vs "the cat": p1 = min(4 occurrences, 1 in ref)/4
    assert(out(2L).getAs[Double]("p1") === 0.25)
    // "the the" bigram never appears in ref -> p2 = 0 -> bleu 0
    assert(out(2L).getAs[Double]("p2") === 0.0)
    assert(out(2L).getAs[Double]("bleu") === 0.0)
    // short candidate: cand_len 2 < ref_len 6 -> bp = exp(1 - 3) quantized
    val bp3 = BigDecimal(math.exp(-2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(3L).getAs[Double]("bp") - bp3) < 1e-12)
    // cand has only 1 bigram ("the cat") which IS in ref -> p2 = 1; but
    // only 2 tokens -> no 3-grams -> p3 NULL -> bleu 0 (unsmoothed)
    assert(out(3L).getAs[Double]("p2") === 1.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("p3")))
    assert(out(3L).getAs[Double]("bleu") === 0.0)
    // disjoint: p1 = 0 -> bleu 0
    assert(out(4L).getAs[Double]("p1") === 0.0)
    assert(out(4L).getAs[Double]("bleu") === 0.0)
    // empty candidate: bp and bleu NULL
    assert(out(5L).isNullAt(out(5L).fieldIndex("bp")))
    assert(out(5L).isNullAt(out(5L).fieldIndex("bleu")))
    assert(out(5L).getAs[Int]("cand_len") === 0)
  }

  test("rougeNPairs: clipped P/R/F on hand pairs") {
    import graft.operators.Eval
    val df = Seq(
      (1L, "the cat sat", "the cat sat"),
      (2L, "the the cat", "the cat mat x"),  // clip: "the"x2 clipped to 1, "cat" 1
      (3L, "", "the cat"))
      .toDF("id", "cand", "ref")
    val out = Eval.rougeNPairs(df, "id", "cand", "ref", maxN = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("rouge1_f") === 1.0)
    assert(out(1L).getAs[Double]("rouge2_f") === 1.0)
    // pair 2 unigrams: clip = min(2,1)["the"] + min(1,1)["cat"] = 2;
    // p = 2/3, r = 2/4
    assert(out(2L).getAs[Double]("rouge1_p") === 2.0 / 3.0)
    assert(out(2L).getAs[Double]("rouge1_r") === 0.5)
    val p = 2.0 / 3.0; val r = 0.5
    assert(math.abs(out(2L).getAs[Double]("rouge1_f") - 2 * p * r / (p + r)) < 1e-15)
    // pair 2 bigrams: cand {"the the", "the cat"}, ref has "the cat" -> clip 1
    assert(out(2L).getAs[Double]("rouge2_p") === 0.5)
    // empty candidate: precision NULL -> f NULL; recall 0
    assert(out(3L).isNullAt(out(3L).fieldIndex("rouge1_p")))
    assert(out(3L).getAs[Double]("rouge1_r") === 0.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("rouge1_f")))
  }

  test("rougeLPairs equals a driver-side LCS on real docs; truncation caps") {
    import graft.operators.Eval
    // hand case first: LCS("a b c d", "a x b d") = {a, b, d} = 3
    val hand = Eval.rougeLPairs(
        Seq((1L, "a b c d", "a x b d")).toDF("id", "cand", "ref"),
        "id", "cand", "ref")
      .select("lcs_len", "rouge_l_p", "rouge_l_r", "rouge_l_f")
      .as[(Int, Double, Double, Double)].head()
    assert(hand === ((3, 0.75, 0.75, 0.75)))
    // truncation: maxTokens = 2 sees only "a b" vs "a x" -> LCS 1
    val trunc = Eval.rougeLPairs(
        Seq((1L, "a b c d", "a x b d")).toDF("id", "cand", "ref"),
        "id", "cand", "ref", maxTokens = 2)
      .select("cand_len", "ref_len", "lcs_len").as[(Int, Int, Int)].head()
    assert(trunc === ((2, 2, 1)))
    // driver differential over real near-dup-bearing pairs
    val d = testdata("sf0.001", "documents").limit(200)
    val cand = d.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text".as("cand"))
    val refs = d.select(($"doc_id" + 1).as("doc_id"), $"text".as("ref"))
    val pairs = cand.join(refs, Seq("doc_id"))
    val got = Eval.rougeLPairs(pairs, "doc_id", "cand", "ref")
      .select("doc_id", "lcs_len").as[(Long, Int)].collect().toMap
    def lcsRef(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.fill(b.length + 1)(0)
      var prevDiag = 0
      for (i <- a.indices) {
        prevDiag = 0
        for (j <- b.indices) {
          val tmp = dp(j + 1)
          dp(j + 1) =
            if (a(i) == b(j)) prevDiag + 1
            else math.max(dp(j + 1), dp(j))
          prevDiag = tmp
        }
      }
      dp(b.length)
    }
    val raw = pairs.select("doc_id", "cand", "ref")
      .as[(Long, String, String)].collect()
    assert(raw.nonEmpty)
    raw.foreach { case (id, c, r) =>
      def tk(s: String) = Option(s).getOrElse("")
        .toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).take(512).toSeq
      assert(got(id) === lcsRef(tk(c), tk(r)), s"pair $id")
    }
  }

  test("kendallTauB: hand pairs with ties; intersection-only alignment") {
    import graft.operators.Eval
    // ranking a: 1,2,2,4 (tie)  ranking b: reversed order
    val a = Seq(("q", 10L, 1L), ("q", 11L, 2L), ("q", 12L, 2L), ("q", 13L, 4L),
      ("q", 99L, 5L)) // 99 absent from b: must not count
      .toDF("query", "item", "rank")
    val b = Seq(("q", 10L, 4L), ("q", 11L, 3L), ("q", 12L, 2L), ("q", 13L, 1L))
      .toDF("query", "item", "rank")
    val out = Eval.kendallTauB(a, b, "query", "item", "rank")
      .select("query", "n", "n_conc", "n_disc", "tau_b")
      .as[(String, Long, Long, Long, Option[Double])].collect().head
    // common items 10..13: pairs (6): all reversed except the (11,12)
    // tie in a; C = 0, D = 5, t1 = 1, t2 = 0, n0 = 6
    assert(out._2 === 4L && out._3 === 0L && out._4 === 5L)
    val expected = BigDecimal(-5.0 / math.sqrt(5.0 * 6.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._5.contains(expected))
    // constant ranking: every pair is a tie in b -> tau NULL
    val const = b.withColumn("rank", org.apache.spark.sql.functions.lit(1L))
    val nul = Eval.kendallTauB(a, const, "query", "item", "rank")
      .select("tau_b").collect().head
    assert(nul.isNullAt(0))
  }
}
