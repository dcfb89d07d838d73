package graft

import org.apache.spark.sql.SparkSession

/** One session-builder for Verify, Bench, and the test suite — the gate,
  * the benchmark, and the specs must all run under the SAME engine
  * configuration or they verify different semantics (this config had
  * already drifted three ways before being centralized).
  */
object Sessions {
  def local(cores: String, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // SURVEY.md §4.2 config parity: null-on-bad-cast (pandas
      // errors='coerce') semantics, not ANSI errors
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // runtime skew handling: AQE splits oversized shuffle partitions in
      // joins (complements the explicit salting in operators/Scale) and
      // coalesces tiny ones — both default-on in Spark 4, pinned here so
      // the gate/bench/specs can't drift from the cluster posture
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // some events.parquet vintages carry TIMESTAMP(NANOS), which Spark 4
      // rejects by default; read those as long and convert (Tables.events).
      // Harmless for MICROS-typed fixtures — kept so the engine reads both.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
  }
}
