package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Fellegi–Sunter EM linkage (operators/Linkage.scala); end-to-end
  * values are oracle-gated by p242 — this spec covers the learning
  * behavior and the operator API. */
class LinkageSpec extends SparkSpecBase {
  import spark.implicits._

  test("EM separates a planted match/non-match mixture; weights order sanely") {
    // planted truth: 200 matching pairs agree on both fields almost
    // always; 800 non-matching pairs agree almost never — the classic
    // two-component mixture EM must pull apart without labels
    val rows =
      Seq.fill(190)((true, true)) ++ Seq.fill(10)((true, false)) ++ // matches
      Seq.fill(40)((true, false)) ++ Seq.fill(760)((false, false)) // non-matches
    val pairs = rows.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "a1", "a2")
    val out = Linkage.fellegiSunter(pairs, Seq("a1", "a2"), emIters = 30)
    assert(out.count() === 1000)
    val byPat = out.select("a1", "a2", "match_weight", "posterior")
      .distinct()
      .as[(Boolean, Boolean, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // full agreement must outweigh and out-posterior partial, partial
    // beats none — monotone in agreement under a separated fit
    val full = byPat((true, true))
    val part = byPat((true, false))
    val none = byPat((false, false))
    assert(full._1 > part._1 && part._1 > none._1, s"$full $part $none")
    assert(full._2 > part._2 && part._2 > none._2)
    assert(full._2 > 0.9, s"agree-everywhere pairs should be near-certain: $full")
    assert(none._2 < 0.1, s"agree-nowhere pairs should be near-zero: $none")
  }

  test("NULL agreement rows drop; reserved output names are rejected") {
    val pairs = Seq(
      (1L, Option(true), Option(true)),
      (2L, Option(true), Option.empty[Boolean]),
      (3L, Option(false), Option(false)))
      .toDF("id", "a1", "a2")
    val out = Linkage.fellegiSunter(pairs, Seq("a1", "a2"), emIters = 3)
    assert(out.select("id").as[Long].collect().toSet === Set(1L, 3L))
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(
        pairs.withColumnRenamed("a2", "match_weight"),
        Seq("a1", "match_weight"))
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(pairs, Seq.empty)
    }
  }

  test("broadcast-join posterior apply is value-identical to the CASE chain " +
      "and survives wide pattern tables (ScaleProbe k=12 stack-overflow regression)") {
    // 7 agreement fields from deterministic hash bits -> 128 observed
    // patterns: above the 64-pattern default (so production input this
    // wide takes the join path) yet still within the when-chain's stack
    // budget, so BOTH paths can run on identical input for the parity
    // check. (k = 10 -> ~1024 patterns already overflows the chain —
    // re-confirmed while writing this test; that is the join path's job.)
    val k = 7
    val base = spark.range(0L, 2000L).select(
      (col("id") +: (0 until k).map(i =>
        (xxhash64(col("id"), lit(i)).bitwiseAND(lit(1L)) === 0L).as(s"f$i"))): _*)
    val cols = (0 until k).map(i => s"f$i")
    val viaCase = Linkage.fellegiSunter(base, cols,
      caseApplyMaxPatterns = Int.MaxValue)
    val viaJoin = Linkage.fellegiSunter(base, cols, caseApplyMaxPatterns = 0)
    assert(viaCase.columns.toSeq === viaJoin.columns.toSeq)
    val a = viaCase.select("id", "match_weight", "posterior")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val b = viaJoin.select("id", "match_weight", "posterior")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(a.length === 2000 && a.toSeq === b.toSeq)
  }

  test("degenerate single-pattern input stays clamped and finite") {
    val pairs = Seq.tabulate(50)(i => (i.toLong, true, true))
      .toDF("id", "a1", "a2")
    val out = Linkage.fellegiSunter(pairs, Seq("a1", "a2"), emIters = 10)
      .select("match_weight", "posterior")
      .as[(Double, Double)].collect()
    assert(out.length === 50)
    out.foreach { case (w, p) =>
      assert(java.lang.Double.isFinite(w), s"weight must stay finite: $w")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
