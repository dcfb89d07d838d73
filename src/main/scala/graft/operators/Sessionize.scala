package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (beyond-reference,
  * SURVEY.md §2.4) — the standard analytics assignment: a user's events
  * belong to one session until a silence longer than `gapSeconds`, then a
  * new session starts. Batch twin of the streaming session windows in
  * [[graft.streaming.Streams]].
  *
  * Mechanics: one window keyed by user ordered by (ts, event id) marks a
  * break wherever ts − lag(ts) > gap, and a running sum of the break
  * flags within the same window numbers the sessions 0,1,2,… per user.
  * Ordering ties on ts are broken by the event id column, so the
  * assignment is total and deterministic.
  *
  * 100 TB shape: ONE shuffle (the per-user window); both window functions
  * share the identical (partition, order) spec so Catalyst evaluates them
  * in a single Window operator, and [[sessionStats]]' per-session
  * aggregate map-side-combines before its exchange. A single user's
  * events serialize into one reducer — the unavoidable semantics of
  * per-user ordering — so the operator's scale unit is events-per-user,
  * not corpus size. */
object Sessionize {

  /** Add `sessionCol` (long, 0-based per user) to the event frame.
    * `tsCol` must be a timestamp; gap comparison is on whole seconds of
    * difference (unix_timestamp), strict: a gap of EXACTLY gapSeconds
    * stays in-session. */
  def assignSessions(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      gapSeconds: Long,
      sessionCol: String = "session_seq"): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    require(!df.columns.contains(sessionCol),
      s"output column '$sessionCol' already exists in the input")
    (Seq("__sess_brk") intersect df.columns).foreach(c =>
      throw new IllegalArgumentException(s"column name '$c' is reserved by assignSessions"))
    val u = col(s"`$userCol`")
    val ts = col(s"`$tsCol`")
    // NULLS LAST on both sort keys (Spark's ascending default is NULLS
    // FIRST; DuckDB's is NULLS LAST — the capPerGroup divergence): a
    // null-ts event sorts after the user's real events in both engines
    // and, its gap being null (never > gap), joins the final session.
    val w = Window.partitionBy(u)
      .orderBy(ts.asc_nulls_last, col(s"`$orderCol`").asc_nulls_last)
    // break flag: silence strictly longer than the gap (first event: lag
    // is null -> coalesce to 0 -> never a break, session 0)
    val brk = when(
      unix_timestamp(ts) - coalesce(unix_timestamp(lag(ts, 1).over(w)), unix_timestamp(ts))
        > gapSeconds, lit(1L)).otherwise(lit(0L))
    df.withColumn("__sess_brk", brk)
      .withColumn(sessionCol,
        sum(col("__sess_brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__sess_brk")
  }

  /** Collapse an [[assignSessions]] output to one row per session:
    * (userCol, sessionCol, session_start, session_end, n_events,
    * duration_s). */
  def sessionStats(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      sessionCol: String = "session_seq"): DataFrame = {
    val ts = col(s"`$tsCol`")
    df.groupBy(col(s"`$userCol`"), col(s"`$sessionCol`"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_s",
        unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
  }
}
