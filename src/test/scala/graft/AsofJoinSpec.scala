package graft

import graft.operators.AsofJoin
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("backward asof: latest right row at or before each left timestamp") {
    val left = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (2L, ts(10))
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts(5), "a"), (1L, ts(10), "b"), (1L, ts(30), "c"), (3L, ts(0), "z")
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").select("k", "asof_v").as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(
      (1L, None),       // t=0: nothing at or before
      (1L, Some("b")),  // t=10: exact match wins over t=5
      (1L, Some("b")),  // t=20: latest <= 20 is t=10
      (2L, None)))      // no right rows for key 2
  }

  test("multiple value columns and duplicate left timestamps") {
    val left = Seq((1L, ts(10)), (1L, ts(10))).toDF("k", "t")
    val right = Seq((1L, ts(1), 5.0, "x")).toDF("k", "rt", "price", "tag")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("price", "tag"))
    assert(out.count() === 2)
    assert(out.select("asof_price").as[Double].collect().toSeq === Seq(5.0, 5.0))
  }

  test("matched-row semantics: NULL value in the most recent right row is " +
    "returned as NULL, not forward-filled from an older row") {
    val left = Seq((1L, ts(20)), (1L, ts(40))).toDF("k", "t")
    val right = Seq(
      (1L, ts(0), Option(1.0), Option("old")),
      (1L, ts(10), Option.empty[Double], Option("mid")), // price NULL here
      (1L, ts(30), Option(3.0), Option.empty[String])    // tag NULL here
    ).toDF("k", "rt", "price", "tag")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("price", "tag"))
      .orderBy("t").select("asof_price", "asof_tag")
      .as[(Option[Double], Option[String])].collect().toSeq
    // t=20 matches the rt=10 row: its price is NULL (must NOT pick up 1.0
    // from rt=0); t=40 matches rt=30: its tag is NULL (must NOT pick "mid").
    assert(out === Seq((None, Some("mid")), (Some(3.0), None)))
  }

  test("null right timestamps never match (DuckDB l.ts >= r.ts semantics)") {
    // a null-ts right row would sort FIRST (nulls-first asc) and back-fill
    // every pre-first-event left row if not filtered — review regression
    val left = Seq((1L, ts(5))).toDF("k", "t")
    val right = Seq(
      (1L, Option.empty[java.sql.Timestamp], Option(99.0)),
      (1L, Option(ts(10)), Option(1.0))
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("asof_v").as[Option[Double]].collect().toSeq
    assert(out === Seq(None)) // t=5 precedes every REAL right ts -> no match
  }

  test("output-name collision (asof_<v>) is rejected; same bare name is fine") {
    val left = Seq((1L, ts(0), "x")).toDF("k", "t", "asof_v")
    val right = Seq((1L, ts(0), "w")).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
    // a left column with the same BARE name as a value column is legal:
    // the output lands under asof_<v>, which does not collide
    val left2 = Seq((1L, ts(5), "keep")).toDF("k", "t", "v")
    val out = AsofJoin(left2, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.columns.toSet === Set("k", "t", "v", "asof_v"))
  }
}
