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

  test("tolerance discards matches farther than the bound (every strategy)") {
    val left = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(60))).toDF("k", "t")
    val right = Seq((1L, ts(8), "a"), (1L, ts(12), "b")).toDF("k", "rt", "v")
    def run(strategy: String, tol: Option[Double]) =
      AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy, tol)
        .orderBy("t").select("asof_v").as[Option[String]].collect().toSeq
    // timestamps cast to epoch seconds: tolerance is in seconds.
    // t=10 sits 120s after rt=8 and 120s before rt=12; t=60 is 2880s after
    // rt=12; t=0 is 480s before rt=8.
    assert(run("backward", Some(3600.0)) === Seq(None, Some("a"), Some("b")))
    assert(run("backward", Some(150.0)) === Seq(None, Some("a"), None))
    assert(run("forward", Some(150.0)) === Seq(None, Some("b"), None))
    assert(run("forward", Some(500.0)) === Seq(Some("a"), Some("b"), None))
    // nearest tie (120s both ways) keeps backward; t=60's nearest is 2880s out
    assert(run("nearest", Some(150.0)) === Seq(None, Some("a"), None))
    // without tolerance t=60 still matches backward
    assert(run("backward", None) === Seq(None, Some("a"), Some("b")))
    intercept[IllegalArgumentException] {
      run("backward", Some(0.0))
    }
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

  test("forward asof: earliest right row at or after each left timestamp") {
    val left = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (1L, ts(40)), (2L, ts(10))
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts(5), "a"), (1L, ts(10), "b"), (1L, ts(30), "c"), (3L, ts(0), "z")
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "forward")
      .orderBy("k", "t").select("k", "asof_v").as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(
      (1L, Some("a")),  // t=0: earliest >= 0 is t=5
      (1L, Some("b")),  // t=10: exact match taken
      (1L, Some("c")),  // t=20: earliest >= 20 is t=30
      (1L, None),       // t=40: nothing at or after
      (2L, None)))      // no right rows for key 2
  }

  test("nearest asof: closer of backward/forward wins; tie keeps backward") {
    val left = Seq(
      (1L, ts(6)),   // 1 from rt=5, 4 from rt=10 -> backward "a"
      (1L, ts(9)),   // 4 from rt=5, 1 from rt=10 -> forward "b"
      (1L, ts(20)),  // 10 from rt=10, 10 from rt=30 -> TIE -> backward "b"
      (1L, ts(50)),  // only backward exists -> "c"
      (1L, ts(2)),   // only forward exists at k=1? no: rt=5 is forward of 2 -> "a"
      (2L, ts(10))   // no right rows for key 2
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts(5), "a"), (1L, ts(10), "b"), (1L, ts(30), "c")
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "nearest")
      .orderBy("k", "t").select("k", "asof_v").as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(
      (1L, Some("a")),  // t=2: nothing before, forward a
      (1L, Some("a")),  // t=6
      (1L, Some("b")),  // t=9
      (1L, Some("b")),  // t=20 tie -> backward
      (1L, Some("c")),  // t=50
      (2L, None)))
  }

  test("nearest asof: long order columns past 2^53 compare in long arithmetic") {
    // t0 = 2^53 + 1 is NOT double-representable (rounds down to 2^53):
    // under double distances the backward candidate (2 away) looks 1 away
    // and the forward candidate (1 away) looks 2 away — double picks the
    // FARTHER row. Long arithmetic must pick forward.
    val t0 = 9007199254740993L // 2^53 + 1
    val left = Seq((1L, t0)).toDF("k", "t")
    val right = Seq(
      (1L, t0 - 2L, "backward_far"),
      (1L, t0 + 1L, "forward_near")
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "nearest")
      .select("asof_v").as[String].collect().toSeq
    assert(out === Seq("forward_near"))
  }

  test("tolerance past 2^53 compares in long arithmetic too, not double") {
    // dist = 2^53 + 1; tolerance 2^53. A double comparison would round
    // the long dist to 2^53 and KEEP the out-of-tolerance match.
    val t0 = 9007199254740993L // 2^53 + 1
    val left = Seq((1L, t0)).toDF("k", "t")
    val right = Seq((1L, 0L, "too_far")).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
      strategy = "backward", tolerance = Some(9007199254740992.0 /* 2^53 */))
      .select("asof_v").as[String].collect().toSeq
    assert(out === Seq(null))
  }

  test("nearest asof: mixed integral/fractional order columns compare as double") {
    // left Long, right Double: a long cast of the right side would truncate
    // 10.6 -> 10 and 9.5 -> 9, flipping which candidate is nearer to t=10.
    // The double fallback must keep the true distances (0.5 vs 0.6).
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq(
      (1L, 9.5, "backward_near"),  // true distance 0.5; long-truncated 1
      (1L, 10.6, "forward_far")    // true distance 0.6; long-truncated 0
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "nearest")
      .select("asof_v").as[String].collect().toSeq
    assert(out === Seq("backward_near"))
  }

  test("forward: null left timestamp matches nothing (desc nulls-first scan)") {
    val left = Seq(
      (1L, Option.empty[Timestamp]), (1L, Option(ts(0)))
    ).toDF("k", "t")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "forward")
      .orderBy(org.apache.spark.sql.functions.col("t").asc_nulls_first)
      .select("asof_v").as[Option[Double]].collect().toSeq
    // the null-ts row must NOT pick up the smallest right timestamp
    assert(out === Seq(None, Some(1.0)))
  }

  test("nearest + tolerance work on TIMESTAMP_NTZ order columns (round-7 " +
    "bench regression: Spark 4 forbids TIMESTAMP_NTZ -> DOUBLE casts)") {
    // LocalDateTime encodes as TimestampNTZType — the type the events
    // parquet yields, and the one q35_asof_nearest crashed on before the
    // axis normalization through unix_micros
    def ntz(m: Int) = java.time.LocalDateTime.of(2023, 11, 14, 22, 0).plusMinutes(m)
    val left = Seq(
      (1L, ntz(6)),   // 60s from rt=5, 240s from rt=10 -> backward "a"
      (1L, ntz(9)),   // -> forward "b"
      (1L, ntz(20))   // 600s tie both ways -> backward "b"
    ).toDF("k", "t")
    assert(left.schema("t").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val right = Seq(
      (1L, ntz(5), "a"), (1L, ntz(10), "b"), (1L, ntz(30), "c")
    ).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "nearest")
      .orderBy("t").select("asof_v").as[String].collect().toSeq
    assert(out === Seq("a", "b", "b"))
    // tolerance stays in SECONDS on the micros axis: 100s keeps only the
    // 60s match
    val tol = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
      strategy = "nearest", tolerance = Some(100.0))
      .orderBy("t").select("asof_v").as[Option[String]].collect().toSeq
    assert(tol === Seq(Some("a"), Some("b"), None))
  }

  test("nearest works on DATE order columns (whole-day axis)") {
    def d(n: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))
    val left = Seq((1L, d(6)), (1L, d(9))).toDF("k", "t")
    val right = Seq((1L, d(5), "a"), (1L, d(10), "b")).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "nearest")
      .orderBy("t").select("asof_v").as[String].collect().toSeq
    assert(out === Seq("a", "b"))
    // tolerance unit for dates is DAYS
    val tol = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
      strategy = "backward", tolerance = Some(1.0))
      .orderBy("t").select("asof_v").as[Option[String]].collect().toSeq
    assert(tol === Seq(Some("a"), None))
  }

  test("mixed DATE/TIMESTAMP order columns measure on one micros axis " +
    "(tolerance in seconds)") {
    def d(n: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))
    // absolute UTC epoch (Timestamp.valueOf(LocalDateTime) would interpret
    // the wall time in the JVM default zone and skew the distances)
    def t(n: Int, h: Int) = new java.sql.Timestamp(
      (java.time.LocalDate.of(2024, 1, 1).plusDays(n).toEpochDay * 24L + h) * 3600000L)
    // left is DATE (midnight UTC), right is TIMESTAMP with intraday times
    val left = Seq((1L, d(2)), (1L, d(5))).toDF("k", "t")
    val right = Seq((1L, t(1, 22), "a"), (1L, t(4, 1), "b")).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "backward")
      .orderBy("t").select("asof_v").as[String].collect().toSeq
    assert(out === Seq("a", "b")) // day-2 midnight sees day-1 22:00 behind it
    // nearest from day 5 midnight: "b" (day-4 01:00) is 23h behind; no
    // forward candidate
    val near = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "nearest")
      .orderBy("t").select("asof_v").as[String].collect().toSeq
    assert(near === Seq("a", "b"))
    // tolerance unit on a mixed axis is SECONDS: 2h admits day-1 22:00
    // from day-2 midnight, 1h does not
    val tol2h = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
      strategy = "backward", tolerance = Some(2 * 3600.0))
      .orderBy("t").select("asof_v").as[Option[String]].collect().toSeq
    assert(tol2h === Seq(Some("a"), None))
    val tol1h = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
      strategy = "backward", tolerance = Some(3600.0))
      .orderBy("t").select("asof_v").as[Option[String]].collect().toSeq
    assert(tol1h === Seq(None, None))
  }

  test("cross-family order-column axes (time vs numeric) are rejected") {
    val left = Seq((1L, ts(0))).toDF("k", "t")
    val right = Seq((1L, 5L, "w")).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
  }

  test("unknown strategy is rejected") {
    val left = Seq((1L, ts(0))).toDF("k", "t")
    val right = Seq((1L, ts(0), "w")).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strategy = "sideways")
    }
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
