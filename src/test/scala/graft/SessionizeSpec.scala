package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def events = Seq(
    (1L, 10L, ts(0)), (2L, 10L, ts(5)), (3L, 10L, ts(40)), // 35-min silence -> new session
    (4L, 10L, ts(41)),
    (5L, 20L, ts(0)), (6L, 20L, ts(90)), // 90 min -> new session
    (7L, 30L, ts(0))).toDF("event_id", "user_id", "ts")

  test("gap splits sessions per user; first event is session 0; exact gap stays in-session") {
    val out = Sessionize.assignSessions(events, "user_id", "ts", "event_id",
      gapSeconds = 1800)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 1L, 7L -> 0L))
    // a silence of EXACTLY the gap does not break (strict >)
    val edge = Seq((1L, 1L, ts(0)), (2L, 1L, ts(30))).toDF("event_id", "user_id", "ts")
    assert(Sessionize.assignSessions(edge, "user_id", "ts", "event_id", 1800)
      .agg(max("session_seq")).as[Long].head() === 0L)
  }

  test("sessionStats collapses to start/end/count/duration") {
    val s = Sessionize.sessionStats(
      Sessionize.assignSessions(events, "user_id", "ts", "event_id", 1800),
      "user_id", "ts")
    val row = s.filter($"user_id" === 10L && $"session_seq" === 1L)
      .select("n_events", "duration_s").as[(Long, Long)].head()
    assert(row === ((2L, 60L)))
    assert(s.count() === 5) // (10,0) (10,1) (20,0) (20,1) (30,0)
  }

  test("one Window operator and one exchange serve both window functions") {
    val out = Sessionize.assignSessions(events, "user_id", "ts", "event_id", 1800)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.sliding("Window".length).count(_ == "Window") >= 1)
    // both the lag and the running sum share (partitionBy user, orderBy ts, id):
    // exactly ONE exchange in the whole plan
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("guard rails") {
    intercept[IllegalArgumentException] {
      Sessionize.assignSessions(events, "user_id", "ts", "event_id", 0)
    }
    intercept[IllegalArgumentException] {
      Sessionize.assignSessions(events.withColumn("session_seq", lit(1)),
        "user_id", "ts", "event_id", 10)
    }
  }

  test("funnelStages: greedy ordered subsequence; order matters; absent steps are stage 0") {
    val events = Seq(
      // u1 completes the funnel, interleaved with noise
      (1L, ts(0), 10L, "view"), (1L, ts(1), 11L, "error"),
      (1L, ts(2), 12L, "click"), (1L, ts(3), 13L, "purchase"),
      // u2 clicks BEFORE viewing: only the view counts (stage 1) —
      // the later click at ts(4) does advance it to 2 though
      (2L, ts(0), 20L, "click"), (2L, ts(1), 21L, "view"),
      (2L, ts(4), 22L, "click"),
      // u3: purchase first, then view — purchase out of order, stage 1
      (3L, ts(0), 30L, "purchase"), (3L, ts(1), 31L, "view"),
      // u4: only noise events
      (4L, ts(0), 40L, "error"),
      // u5: view and click at the SAME ts — event_id breaks the tie in
      // favor of the view (smaller id), so the click still advances
      (5L, ts(0), 50L, "view"), (5L, ts(0), 51L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.funnelStages(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 2))
  }

  test("retentionCohorts: first-week cohorts and offset counts") {
    def wts(day: Int) = new Timestamp(1704067200000L + day * 86400000L) // 2024-01-01 Mon
    val events = Seq(
      // u1 active week 0 and week 2; u2 active week 0 only;
      // u3 first seen week 1, active weeks 1 and 2
      (1L, wts(0)), (1L, wts(1)), (1L, wts(15)),
      (2L, wts(2)),
      (3L, wts(8)), (3L, wts(14)))
      .toDF("user_id", "ts")
    val got = Sessionize.retentionCohorts(events, "user_id", "ts")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L), // u1, u2 in the week-0 cohort
      ("2024-01-01", 2, 1L), // u1 returns in week 2
      ("2024-01-08", 0, 1L), // u3's cohort
      ("2024-01-08", 1, 1L))) // u3 returns the next week
  }

  // -------------------------------------------------------- rollingDistinct

  test("rollingDistinct: trailing window unions distinct actors; same-day repeats count once") {
    val df = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 1L), // u1 twice day 1
      ("2024-01-01 12:00:00", 2L),
      ("2024-01-03 09:00:00", 3L),
      ("2024-01-10 09:00:00", 1L)) // beyond day-3's 7-day window
      .toDF("ts_s", "user").withColumn("ts", to_timestamp(col("ts_s")))
    val got = Sessionize.rollingDistinct(df, "ts", "user")
      .orderBy("day").as[(String, Long, Long, Double)].collect().toList
    assert(got === List(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-03", 1L, 3L, 1.0 / 3.0), // u1,u2 from day 1 still in window
      ("2024-01-10", 1L, 1L, 1.0)))      // day 3 fell out (window = day..day+6 cover)
  }

  test("transitionMatrix: per-user consecutive steps; probabilities condition on from_type") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "A", 1L),
      (1L, "2024-01-01 10:01:00", "B", 2L),
      (1L, "2024-01-01 10:02:00", "A", 3L),
      (1L, "2024-01-01 10:03:00", "C", 4L),
      (2L, "2024-01-01 09:00:00", "B", 5L),
      (2L, "2024-01-01 09:05:00", "A", 6L),
      (3L, "2024-01-01 08:00:00", "Z", 7L)) // single-event user: no pair
      .toDF("user", "ts_s", "etype", "eid")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Sessionize.transitionMatrix(df, "user", "ts", "etype", "eid")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      ("A", "B") -> ((1L, 0.5)), ("A", "C") -> ((1L, 0.5)),
      ("B", "A") -> ((2L, 1.0))))
  }

  test("transitionMatrix: user boundaries never pair; same-ts ties order by id") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "X", 1L),
      (2L, "2024-01-01 10:00:01", "Y", 2L), // different user right after: no X->Y
      (3L, "2024-01-01 12:00:00", "P", 3L),
      (3L, "2024-01-01 12:00:00", "Q", 4L)) // tie: id order P(3) then Q(4)
      .toDF("user", "ts_s", "etype", "eid")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Sessionize.transitionMatrix(df, "user", "ts", "etype", "eid")
      .as[(String, String, Long, Double)].collect().toList
    assert(got === List(("P", "Q", 1L, 1.0)))
  }

  test("rollingDistinct: windowDays=1 collapses to DAU; null ts/actor rows drop") {
    val df = Seq(
      (Some("2024-01-01 10:00:00"), Some(1L)),
      (Some("2024-01-01 11:00:00"), Some(2L)),
      (None: Option[String], Some(9L)),
      (Some("2024-01-01 12:00:00"), None: Option[Long]))
      .toDF("ts_s", "user").withColumn("ts", to_timestamp(col("ts_s")))
    val got = Sessionize.rollingDistinct(df, "ts", "user", windowDays = 1)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got === List(("2024-01-01", 2L, 2L, 1.0)))
  }

  test("gapStats: exact microsecond gaps with nearest-rank order statistics") {
    val df = Seq(
      // user 1: ts at 0s, 1s, 3s, 10s -> gaps 1e6, 2e6, 7e6 micros
      (1L, 1L, "2024-01-01 00:00:00"), (1L, 2L, "2024-01-01 00:00:01"),
      (1L, 3L, "2024-01-01 00:00:03"), (1L, 4L, "2024-01-01 00:00:10"),
      // user 2: a single event -> no gaps, no row
      (2L, 5L, "2024-01-01 00:00:00"),
      // user 3: null ts drops -> single real event -> no row
      (3L, 6L, "2024-01-01 00:00:00"), (3L, 7L, null.asInstanceOf[String]))
      .toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Sessionize.gapStats(df, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L))
    val u1 = out(1L)
    assert(u1.getAs[Long]("n_gaps") === 3L)
    assert(u1.getAs[Long]("gap_min") === 1000000L)
    // ranks over sorted gaps [1e6, 2e6, 7e6]: p50 -> rank 2, p95 -> rank 3
    assert(u1.getAs[Long]("gap_p50") === 2000000L)
    assert(u1.getAs[Long]("gap_p95") === 7000000L)
    assert(u1.getAs[Long]("gap_max") === 7000000L)
  }

  test("funnelLatency: chained first-events time the transitions; non-converters drop") {
    val df = Seq(
      // u1 completes both: view@0, click@10min, purchase@30min
      (1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "click"),
      (1L, ts(30), 3L, "purchase"),
      // u2 clicks BEFORE viewing: that click can't convert; a later one does
      (2L, ts(5), 4L, "click"), (2L, ts(6), 5L, "view"), (2L, ts(8), 6L, "click"),
      // u3 views only
      (3L, ts(0), 7L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sessionize.funnelLatency(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[String]("transition") -> r).toMap
    val vc = out("view->click")
    assert(vc.getAs[Long]("n_converted") === 2L)
    // u1: 10 min; u2: 2 min -> sorted [2min, 10min]: p50 = rank 1
    assert(vc.getAs[Long]("lat_min_us") === 2L * 60000000L)
    assert(vc.getAs[Long]("lat_p50_us") === 2L * 60000000L)
    assert(vc.getAs[Long]("lat_max_us") === 10L * 60000000L)
    val cp = out("click->purchase")
    assert(cp.getAs[Long]("n_converted") === 1L)
    assert(cp.getAs[Long]("lat_p50_us") === 20L * 60000000L)
  }

  test("funnelLatency: same-microsecond followers never count as after") {
    val df = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(0), 2L, "click"), // simultaneous
      (2L, ts(0), 3L, "view"), (2L, ts(1), 4L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sessionize.funnelLatency(df, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click"))
    assert(out.count() === 1L)
    assert(out.head().getAs[Long]("n_converted") === 1L)
  }

  test("burstiness: a metronome scores 0, a burst scores high, sparse actors drop") {
    def h(hour: Int, off: Int) =
      new Timestamp(1700000000000L + hour * 3600000L + off * 1000L)
    val metronome = (0 until 4).flatMap(hh => Seq((1L, h(hh, 0)), (1L, h(hh, 10))))
    val bursty = Seq((2L, h(0, 0))) ++ (0 until 9).map(i => (2L, h(3, i))) // 1 + 9
    val sparse = Seq((3L, h(0, 0)))
    val df = (metronome ++ bursty ++ sparse).toDF("user_id", "ts")
    val out = Sessionize.burstiness(df, "user_id", "ts")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_hours") === 4L)
    assert(out(1L).getAs[Double]("dispersion") === 0.0) // constant 2/hour
    // u2: counts [1, 9]: mean 5, var = (2*82 - 100)/2 = 32, F = 6.4
    assert(out(2L).getAs[Double]("mean_per_hour") === 5.0)
    assert(out(2L).getAs[Double]("dispersion") === 6.4)
    assert(!out.contains(3L), "single-hour actors have no variance to report")
  }

  test("funnelLatency: exact percentiles survive a giant transition spread over partitions") {
    // 5000 converted users in ONE transition — the keyed PrefixSum rank
    // must stitch across range partitions (a Window.partitionBy(transition)
    // would serialize them all into one reducer); coalescing off so the
    // multi-partition path actually runs at test size
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val n = 5000
      val rows = (1 to n).flatMap { i =>
        val base = i.toLong * 10000000000L
        Seq((s"u$i", base, i.toLong * 2L, "view"),
          (s"u$i", base + i.toLong * 1000000L, i.toLong * 2L + 1L, "click"))
      }
      val df = rows.toDF("user_id", "tm", "event_id", "event_type")
        .withColumn("ts", expr("timestamp_micros(tm)"))
      val out = Sessionize.funnelLatency(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click")).head()
      assert(out.getAs[Long]("n_converted") === n.toLong)
      assert(out.getAs[Long]("lat_min_us") === 1000000L)
      assert(out.getAs[Long]("lat_max_us") === n.toLong * 1000000L)
      // nearest-rank: rank (n*p + 999999) div 1e6 of the sorted latencies
      assert(out.getAs[Long]("lat_p50_us") === 2500L * 1000000L)
      assert(out.getAs[Long]("lat_p90_us") === 4500L * 1000000L)
    } finally spark.conf.set(key, old)
  }

  test("kaplanMeier: hand-computed survival with censoring") {
    // durations/events: (1,T),(2,T),(2,F),(3,T),(4,F)
    // t=1: r=5 d=1 S=0.8; t=2: r=4 d=1 S=0.6; t=3: r=2 d=1 S=0.3
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, false),
      ("g", 3L, true), ("g", 4L, false)).toDF("g", "d", "e")
    val rows = Sessionize.kaplanMeier(df, "g", "d", "e")
      .orderBy("t").collect()
    assert(rows.map(_.getAs[Long]("t")).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_risk")).toSeq === Seq(5L, 4L, 2L))
    val s = rows.map(_.getAs[Double]("survival"))
    assert(math.abs(s(0) - 0.8) < 1e-6 && math.abs(s(1) - 0.6) < 1e-6 &&
      math.abs(s(2) - 0.3) < 1e-6, s.mkString(","))
  }

  test("kaplanMeier: everyone dying at once reports survival exactly 0, not -inf") {
    val df = Seq(("g", 1L, true), ("g", 1L, true)).toDF("g", "d", "e")
    val r = Sessionize.kaplanMeier(df, "g", "d", "e").head()
    assert(r.getAs[Long]("n_risk") === 2L && r.getAs[Long]("n_events") === 2L)
    assert(r.getAs[Double]("survival") === 0.0)
    // and survival STAYS 0 after the wipe-out even if later rows exist
    val df2 = Seq(("g", 1L, true), ("g", 1L, true), ("g", 2L, true))
      .toDF("g", "d", "e")
    // impossible input (risk set empty then someone dies later) is the
    // caller's bug, but the zero-counter must still clamp, never NaN
    val rows2 = Sessionize.kaplanMeier(df2.limit(2), "g", "d", "e").collect()
    assert(rows2.forall(_.getAs[Double]("survival") === 0.0))
  }

  test("kaplanMeier: groups are independent; censored-only groups emit no rows") {
    val df = Seq(("a", 1L, true), ("b", 1L, false), ("b", 2L, false))
      .toDF("g", "d", "e")
    val rows = Sessionize.kaplanMeier(df, "g", "d", "e").collect()
    assert(rows.length === 1 && rows(0).getAs[String]("g") === "a")
  }

  test("topPaths: counts first-k journeys, ties break by path") {
    def ev(u: String, i: Long, ty: String) = (u, i * 1000000L, i, ty)
    val df = (Seq(ev("u1", 1, "a"), ev("u1", 2, "b"), ev("u1", 3, "c"),
      ev("u2", 1, "a"), ev("u2", 2, "b"),
      ev("u3", 1, "b"))).toDF("u", "tm", "eid", "ty")
      .withColumn("ts", expr("timestamp_micros(tm)"))
    val rows = Sessionize.topPaths(df, "u", "ts", "eid", "ty",
      pathLen = 2, topK = 10).collect()
    val got = rows.map(r => (r.getAs[String]("path"),
      r.getAs[Int]("n_steps"), r.getAs[Long]("n_users"))).toSeq
    assert(got === Seq(("a>b", 2, 2L), ("b", 1, 1L)))
  }

  test("topPaths: topK cuts by (n_users desc, path asc)") {
    def ev(u: String, i: Long, ty: String) = (u, i * 1000000L, i, ty)
    val df = Seq(ev("u1", 1, "a"), ev("u2", 1, "b"), ev("u3", 1, "c"))
      .toDF("u", "tm", "eid", "ty")
      .withColumn("ts", expr("timestamp_micros(tm)"))
    val rows = Sessionize.topPaths(df, "u", "ts", "eid", "ty", 3, 2)
      .collect().map(_.getAs[String]("path")).toSeq
    assert(rows === Seq("a", "b")) // all count 1, path asc wins
  }

  test("gapExponentialFit: hand-computed KS against the fitted exponential") {
    // one user, gaps [1s, 1s, 1s]: lambda = 3/3e6 = 1e-6 per us;
    // F_exp(1e6) = 1 - exp9(-1) = 0.632120559; F_emp jumps 0 -> 1
    // so ks = 0.632120559 exactly under the exp9 contract
    val df = (0 to 3).map(i => ("u", i.toLong * 1000000L, i.toLong, "t"))
      .toDF("u", "tm", "eid", "ty")
      .withColumn("ts", expr("timestamp_micros(tm)"))
    val r = Sessionize.gapExponentialFit(df, "u", "ts", "eid", "ty").head()
    assert(r.getAs[Long]("n_gaps") === 3L)
    assert(r.getAs[Double]("mean_gap_us") === 1000000.0)
    assert(r.getAs[Double]("ks_stat") === 0.632120559)
  }

  test("gapExponentialFit: a perfect exponential-ish spread scores lower than a metronome") {
    def mk(ty: String, gaps: Seq[Long]) = {
      var t = 0L
      ("u", 0L, 0L, ty) +: gaps.zipWithIndex.map { case (g, i) =>
        t += g; ("u", t, i.toLong + 1L, ty) }
    }
    // metronome: all gaps equal; spread: exponential-like mix
    val rows = (mk("metro", Seq.fill(20)(1000000L)) ++
      mk("spread", Seq(100000L, 300000L, 700000L, 1500000L, 3000000L,
        200000L, 500000L, 1000000L, 2500000L, 400000L,
        800000L, 1200000L, 600000L, 900000L, 1800000L,
        250000L, 350000L, 2000000L, 450000L, 1400000L)))
      .toDF("u", "tm", "eid", "ty")
      .withColumn("ts", expr("timestamp_micros(tm)"))
    val out = Sessionize.gapExponentialFit(rows, "u", "ts", "eid", "ty")
      .collect().map(r => r.getAs[String]("ty") -> r.getAs[Double]("ks_stat"))
      .toMap
    assert(out("spread") < out("metro"),
      s"spread ${out("spread")} should fit exponential better than metronome ${out("metro")}")
  }

  test("gapExponentialFit: types under minGaps or with zero total gap drop") {
    val df = Seq(("u", 0L, 0L, "once"), ("u", 5L, 1L, "once"),
      ("v", 0L, 2L, "zero"), ("v", 0L, 3L, "zero"), ("v", 0L, 4L, "zero"))
      .toDF("u", "tm", "eid", "ty")
      .withColumn("ts", expr("timestamp_micros(tm)"))
    // "once" has 1 gap (< minGaps=2); "zero" has 2 gaps but total 0
    assert(Sessionize.gapExponentialFit(df, "u", "ts", "eid", "ty").count() === 0L)
  }

  test("seasonality: epoch arithmetic grid — Jan 1 1970 is Thursday hour 0") {
    val df = Seq(
      ("a", 0L),                    // Thu (dow 4) hour 0
      ("a", 3600000000L),           // Thu hour 1
      ("a", 3600000000L),           // Thu hour 1 again -> peak
      ("b", 86400000000L * 3L))     // Sun (dow (3+4)%7=0) hour 0
      .toDF("ty", "tm").withColumn("ts", expr("timestamp_micros(tm)"))
    val rows = Sessionize.seasonality(df, "ts", "ty")
      .orderBy("ty", "dow", "hour").collect()
    val a0 = rows(0); val a1 = rows(1); val b = rows(2)
    assert(a0.getAs[Int]("dow") === 4 && a0.getAs[Int]("hour") === 0 &&
      a0.getAs[Long]("n_events") === 1L && !a0.getAs[Boolean]("is_peak"))
    assert(a1.getAs[Int]("hour") === 1 && a1.getAs[Long]("n_events") === 2L &&
      a1.getAs[Boolean]("is_peak") && a1.getAs[Double]("share") === 2.0 / 3.0)
    assert(b.getAs[Int]("dow") === 0 && b.getAs[Boolean]("is_peak"))
  }

  test("funnelConversionWindows: window cuts, rank chaining, and rates") {
    // u1: view@0, click@30min (within 1h), purchase@3h after click (not)
    // u2: view@0 only; u3: view@0, click@2h (converted, not within)
    def ev(u: String, tm: Long, id: Long, ty: String) = (u, tm, id, ty)
    val h = 3600000000L
    val df = Seq(
      ev("u1", 0L, 1L, "view"), ev("u1", h / 2, 2L, "click"),
      ev("u1", h / 2 + 3L * h, 3L, "purchase"),
      ev("u2", 0L, 4L, "view"),
      ev("u3", 0L, 5L, "view"), ev("u3", 2L * h, 6L, "click"))
      .toDF("u", "tm", "eid", "ty")
      .withColumn("ts", expr("timestamp_micros(tm)"))
    val rows = Sessionize.funnelConversionWindows(df, "u", "ts", "eid", "ty",
      Seq("view", "click", "purchase"), windowSeconds = 3600L)
      .orderBy("transition").collect()
      .map(r => r.getAs[String]("transition") -> r).toMap
    val vc = rows("view->click")
    assert(vc.getAs[Long]("n_source") === 3L)
    assert(vc.getAs[Long]("n_converted") === 2L)
    assert(vc.getAs[Long]("n_within") === 1L)
    assert(vc.getAs[Double]("cvr") === 2.0 / 3.0)
    assert(vc.getAs[Double]("cvr_within") === 1.0 / 3.0)
    val cp = rows("click->purchase")
    assert(cp.getAs[Long]("n_source") === 2L) // u1, u3 hold stage click
    assert(cp.getAs[Long]("n_converted") === 1L)
    assert(cp.getAs[Long]("n_within") === 0L) // purchase 3h after click
    assert(cp.getAs[Double]("cvr_within") === 0.0)
  }

}
