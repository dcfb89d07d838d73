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
}
