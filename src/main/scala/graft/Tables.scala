package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared testdata loaders used by the gate queries ([[SparkEntry]]), the
  * bench, and the specs — ONE place that knows about fixture quirks, so the
  * engine and its tests can never drift apart on a testdata regeneration.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` column has shipped in two flavors across testdata
    * generations: TIMESTAMP(NANOS) — which Spark 4 only reads under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (pinned in [[Sessions]]),
    * surfacing as Long nanoseconds — and TIMESTAMP_MICROS (NTZ). Normalize
    * the long flavor to a micros timestamp here (integer division: ns
    * magnitudes overflow double math) and pass time-typed columns through
    * unchanged, so every consumer sees a time-typed `ts` either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "events"), "ts")

  /** Long epoch-nanos -> TIMESTAMP micros; already-time-typed columns are
    * left as-is (TIMESTAMP and TIMESTAMP_NTZ both work downstream).
    */
  def normalizeTs(df: DataFrame, col: String): DataFrame =
    df.schema(col).dataType match {
      case LongType => df.withColumn(col, timestamp_micros(expr(s"`$col` div 1000")))
      case _        => df
    }
}
