package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Semantics + guard rails of the binned interval join: half-open bounds,
  * null/empty-interval handling, the fan-out raise_error path, the
  * reserved/colliding column checks, and the equi-join plan shape (the
  * whole point of the operator is NOT being a BroadcastNestedLoopJoin).
  */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def points = Seq(0.0, 1.0, 5.0, 9.99, 10.0, 25.0)
    .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
  private def intervals = Seq(
    (100L, 0.0, 10.0),   // catches 0, 1, 5, 9.99 — not 10.0 (hi exclusive)
    (101L, 9.99, 9.991), // catches only 9.99
    (102L, 30.0, 40.0),  // catches nothing
    (103L, 5.0, 5.0),    // empty (hi == lo) — drops out
    (104L, 7.0, 3.0)     // inverted — drops out
  ).toDF("iid", "lo", "hi")

  private def join(binWidth: Double, maxBins: Int = 4096) =
    RangeJoin.binnedIntervalJoin(points, "p", intervals, "lo", "hi", binWidth, maxBins)

  test("matches the exact half-open semantics, each pair exactly once") {
    val expected = Set(
      (0L, 100L), (1L, 100L), (2L, 100L), (3L, 100L), // p in [0,10)
      (3L, 101L)) // 9.99 in [9.99, 9.991)
    for (w <- Seq(0.5, 3.0, 100.0)) { // result must not depend on binWidth
      val got = join(w).select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length === got.distinct.length, s"duplicate pairs at binWidth=$w")
      assert(got.toSet === expected, s"binWidth=$w")
    }
  }

  test("null points and null bounds drop out (inner-join semantics)") {
    val p = Seq((1L, Some(5.0)), (2L, None)).toDF("pid", "p")
    val iv = Seq((10L, Some(0.0), Some(10.0)), (11L, None, Some(10.0)),
      (12L, Some(0.0), None)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(p, "p", iv, "lo", "hi", 1.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("fan-out guard fails fast when an interval spans too many bins") {
    // raise_error surfaces as SparkRuntimeException locally, wrapped in
    // SparkException on a cluster — assert on the message, not the shape
    val e = intercept[Exception] {
      join(binWidth = 0.001, maxBins = 16).count() // [0,10) -> 10000 bins
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("spans more than")), e.toString)
  }

  test("guard rails: bad binWidth, reserved bin column, colliding columns") {
    intercept[IllegalArgumentException] { join(binWidth = 0.0) }
    intercept[IllegalArgumentException] { join(binWidth = 1.0, maxBins = 0) }
    val reserved = points.withColumnRenamed("pid", "__rj_bin")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedIntervalJoin(reserved, "p", intervals, "lo", "hi", 1.0)
    }
    val colliding = intervals.withColumnRenamed("iid", "pid")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedIntervalJoin(points, "p", colliding, "lo", "hi", 1.0)
    }
  }

  test("plans as an equi-join, not BroadcastNestedLoopJoin") {
    val plan = join(1.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }
}
