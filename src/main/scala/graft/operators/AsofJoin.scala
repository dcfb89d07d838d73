package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: each left row picks up the right row with the nearest
  * timestamp for the same key, under one of three strategies (Polars
  * join_asof(strategy=...) — the reference exposes it through the blanket
  * method wrapper, SURVEY.md §2.2 joins table):
  *
  *   - backward (default): most recent right with rightTs <= leftTs
  *   - forward:            earliest right with rightTs >= leftTs
  *   - nearest:            whichever of the two is closer in time
  *                         (tie -> backward; needs a numeric/timestamp
  *                         order column for the distance arithmetic)
  *
  * Spark has no native asof join, and a naive range join explodes into
  * BroadcastNestedLoop. This is the scalable union+window technique:
  *
  *   union both sides tagged by origin -> ONE shuffle by key ->
  *   last(struct(values), ignoreNulls) over (key ORDER BY time, side) ->
  *   keep left, project the struct fields
  *
  * Forward is the same scan mirrored (ORDER BY time DESC, nulls first so a
  * null left timestamp still matches nothing); nearest evaluates both
  * windows over the SAME key partitioning — one exchange, two in-partition
  * sorts — and picks per row by absolute time distance.
  *
  * The values ride in ONE struct so every output column comes from the SAME
  * matched right row — a NULL in one value column of the matched row
  * surfaces as NULL (DuckDB ASOF JOIN row semantics), instead of
  * per-column forward-filling an older row's value.
  *
  * Cost is a single hash partition + per-partition sort(s) — linear, no
  * pair blow-up, skew handled by AQE like any window. Right rows sort
  * BEFORE left rows at equal timestamps, so an exact-timestamp match is
  * taken by every strategy (DuckDB ASOF `l.ts >= r.ts` semantics).
  */
object AsofJoin {

  val Strategies: Set[String] = Set("backward", "forward", "nearest")

  /** @param valueCols right-side columns to attach (surfaced as
    *                  `asof_<name>`); must not collide with left columns.
    * @param tolerance  Polars join_asof(tolerance=...): a match farther
    *                  than this from the left timestamp is discarded
    *                  (row keeps all-null `asof_*`). Units: epoch SECONDS
    *                  whenever either order column is a timestamp (both
    *                  flavors; a date mixed with a timestamp counts),
    *                  whole DAYS when both are dates, the raw value for
    *                  numerics. Must be positive; applies to every
    *                  strategy. Both order columns must be in the same
    *                  axis family (time-typed or numeric).
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      strategy: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {
    require(Strategies.contains(strategy),
      s"unknown asof strategy '$strategy' (one of ${Strategies.mkString("/")})")
    require(tolerance.forall(_ > 0), s"tolerance must be positive, got $tolerance")
    require(keyCols.nonEmpty, "asof join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(v => !leftCols.contains(s"asof_$v")),
      s"output columns ${valueCols.map("asof_" + _).mkString(",")} collide with left columns")
    require(!(leftCols ++ valueCols).exists(Set("__t", "__side", "__asof", "__ts").contains),
      "__t/__side/__asof/__ts are reserved helper names in asof join")

    // One struct per right row (never null, even if every value inside is
    // null) so last(ignoreNulls) selects whole ROWS, not per-column values.
    // The matched row's own timestamp rides along as __ts — nearest needs
    // it for the distance compare; the final projection drops it.
    val asofType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "__ts", right.schema(rightTsCol).dataType, nullable = true) +:
      valueCols.map(v => org.apache.spark.sql.types.StructField(
        v, right.schema(v).dataType, nullable = true)))

    val l = left
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) :+ col("__t") :+ col("__side") :+
        lit(null).cast(asofType).as("__asof"): _*)
    val r = right
      // a null right timestamp can never satisfy either comparison (DuckDB
      // ASOF semantics) — but unfiltered it would sort FIRST under
      // nulls-first ascending and back-fill every pre-first-event left row
      .filter(col(rightTsCol).isNotNull)
      .withColumn("__t", col(rightTsCol))
      .withColumn("__side", lit(0))
      .select(leftCols.map { c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__t") :+ col("__side") :+
        struct(col(rightTsCol).as("__ts") +:
          valueCols.map(v => col(v).as(v)): _*).as("__asof"): _*)

    def win(ord: Seq[Column]) = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // backward scan: time ascending (nulls first: a null LEFT timestamp
    // precedes every right row and matches nothing)
    val wB = win(Seq(col("__t").asc, col("__side").asc))
    // forward scan: the mirror — time descending with nulls FIRST for the
    // same null-left-timestamp reason (desc defaults to nulls last, which
    // would hand null-ts rows the smallest right timestamp)
    val wF = win(Seq(col("__t").desc_nulls_first, col("__side").asc))

    val backward = last(col("__asof"), ignoreNulls = true).over(wB)
    val forward = last(col("__asof"), ignoreNulls = true).over(wF)
    // Distance axis: when BOTH order columns are integral (e.g.
    // nanosecond-epoch longs) compare in LONG arithmetic — a double
    // cast is lossy past 2^53 and can pick the FARTHER candidate.
    // Timestamps CANNOT be cast to double in Spark 4 (TIMESTAMP_NTZ ->
    // DOUBLE is a hard analysis error — this crashed the whole nearest
    // strategy in round 7), so both timestamp flavors are normalized
    // through unix_micros to exact long micros (NTZ goes via a cast to
    // TIMESTAMP, interpreted in the session timezone — Sessions.local
    // pins UTC, making the mapping absolute and monotone) and dates
    // through unix_date (long days). If either side is genuinely
    // fractional (float/double/decimal), fall back to double: casting
    // the fractional side to long would truncate its distance. Long
    // caveat: a backward/forward candidate pair spanning >
    // Long.MaxValue of the axis unit overflows the subtraction.
    import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def timeTyped(dt: DataType) = dt match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    def timestampish(dt: DataType) = dt match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    def longAxis(dt: DataType) = integral(dt) || timeTyped(dt)
    val (lDt, rDt) = (left.schema(leftTsCol).dataType, right.schema(rightTsCol).dataType)
    // Both order columns must live on ONE axis: time-typed against
    // time-typed, numeric against numeric. A (timestamp, numeric) mix has
    // no coherent distance unit (micros vs raw values) and previously died
    // deep inside analysis with an opaque cast error — reject it at the
    // boundary instead.
    require(timeTyped(lDt) == timeTyped(rDt),
      s"asof order columns must share an axis family (both time-typed or " +
        s"both numeric): '$leftTsCol' is $lDt, '$rightTsCol' is $rDt")
    // TIMESTAMP_NTZ is mapped to epoch micros through a cast to TIMESTAMP,
    // which is monotone only under a fixed-offset session timezone; in a
    // DST zone the fall-back hour folds and nearest/tolerance could pick
    // the wrong candidate. Sessions.local pins UTC — enforce rather than
    // assume it when an NTZ axis is actually in play.
    if (lDt == TimestampNTZType || rDt == TimestampNTZType) {
      val tz = left.sparkSession.conf.get("spark.sql.session.timeZone")
      // UTC/GMT/Etc-* and explicit ±hh:mm offsets are all fixed-offset;
      // region zones (America/*, Europe/*, ...) may carry DST and are
      // rejected even when their current offset happens to be stable
      require(tz.startsWith("UTC") || tz.startsWith("GMT") ||
        tz.startsWith("Etc/") || tz.matches("[+-]\\d{2}:\\d{2}"),
        s"asof join over TIMESTAMP_NTZ needs a fixed-offset session " +
          s"timezone (spark.sql.session.timeZone=$tz); DST zones make the " +
          "NTZ->micros mapping non-monotone in the fall-back hour")
    }
    val distType = if (longAxis(lDt) && longAxis(rDt)) "long" else "double"
    // Mixed date/timestamp time axes measure in MICROS (dates scale by
    // 86_400e6); pure-date axes stay in whole days.
    val microsAxis = timestampish(lDt) || timestampish(rDt)
    def axis(c: Column, dt: DataType): Column = dt match {
      case TimestampType    => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType if microsAxis => unix_date(c).cast(LongType) * lit(86400000000L)
      case DateType         => unix_date(c).cast(distType)
      case _                => c.cast(distType)
    }
    // __t takes the UNION's coerced type (date unions with timestamp to
    // timestamp, int widths widen — the left declared type may not survive),
    // so resolve its axis from the unioned schema. __ts inside the struct
    // always keeps the right side's declared type.
    val unioned = l.unionByName(r)
    val tDt = unioned.schema("__t").dataType
    def dist(s: Column) =
      abs(axis(col("__t"), tDt) - axis(s.getField("__ts"), rDt))
    val picked: Column = strategy match {
      case "backward" => backward
      case "forward" => forward
      case "nearest" =>
        // Strict < means a tie keeps the backward match — the deterministic
        // rule this engine documents.
        when(backward.isNull, forward)
          .when(forward.isNull, backward)
          .when(dist(forward) < dist(backward), forward)
          .otherwise(backward)
    }
    // tolerance discards a match farther than `tol` (null struct -> all-null
    // asof_* row, Polars join_asof(tolerance=...) semantics). A null picked
    // row makes dist null; `null <= tol` is null -> otherwise(null) — safe.
    // The threshold is CAST TO distType before comparing: on integral axes
    // dist is exact long arithmetic, and comparing it against a double
    // literal would promote the long to double — re-introducing the >2^53
    // lossiness the distType machinery exists to avoid (2^53+1 would pass
    // a 2^53 tolerance). Long-casting the tolerance truncates any
    // fractional part, which on an integer axis can only ADMIT a distance
    // the caller's fractional threshold already admits (floor(tol) accepts
    // exactly the same integers as tol).
    // On micros axes (any timestamp side, including a date mixed with a
    // timestamp) dist is measured in MICROS while the documented tolerance
    // unit stays epoch SECONDS — scale the caller's threshold onto the
    // axis. Pure-date axes measure in whole days, numerics in the raw
    // value; neither scales. The axis-family require above makes a
    // (timestamp, numeric) mix — where this scale would be incoherent —
    // unreachable.
    val tolScale: Double = if (microsAxis) 1e6 else 1.0
    val pickedTol: Column = tolerance match {
      case None => picked
      case Some(tol) =>
        when(dist(picked) <= lit(tol * tolScale).cast(distType), picked)
          .otherwise(lit(null).cast(asofType))
    }

    unioned
      .withColumn("__asof", pickedTol)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"__asof.$v").as(s"asof_$v")): _*)
  }
}
