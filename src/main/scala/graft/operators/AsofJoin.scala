package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join: each left row picks up the most recent right row
  * with rightTs <= leftTs for the same key. The reference exposes Polars'
  * join_asof only through the blanket method wrapper (SURVEY.md §2.2 joins
  * table); Spark has no native asof join, and a naive range join explodes
  * into BroadcastNestedLoop. This is the scalable union+window technique:
  *
  *   union both sides tagged by origin -> ONE shuffle by key ->
  *   last(struct(values), ignoreNulls) over (key ORDER BY time, side) ->
  *   keep left, project the struct fields
  *
  * The values ride in ONE struct so every output column comes from the SAME
  * most-recent right row — a NULL in one value column of the matched row
  * surfaces as NULL (DuckDB ASOF JOIN row semantics), instead of
  * per-column forward-filling an older row's value.
  *
  * Cost is a single hash partition + per-partition sort — linear, no pair
  * blow-up, skew handled by AQE like any window. Right rows sort BEFORE
  * left rows at equal timestamps, so an exact-timestamp match is taken
  * (DuckDB ASOF `l.ts >= r.ts` semantics).
  */
object AsofJoin {

  /** @param valueCols right-side columns to attach (surfaced as
    *                  `asof_<name>`); must not collide with left columns.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(v => !leftCols.contains(s"asof_$v")),
      s"output columns ${valueCols.map("asof_" + _).mkString(",")} collide with left columns")
    require(!(leftCols ++ valueCols).exists(Set("__t", "__side", "__asof").contains),
      "__t/__side/__asof are reserved helper names in asof join")

    // One struct per right row (never null, even if every value inside is
    // null) so last(ignoreNulls) selects whole ROWS, not per-column values.
    val asofType = org.apache.spark.sql.types.StructType(
      valueCols.map(v => org.apache.spark.sql.types.StructField(
        v, right.schema(v).dataType, nullable = true)))

    val l = left
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) :+ col("__t") :+ col("__side") :+
        lit(null).cast(asofType).as("__asof"): _*)
    val r = right
      // a null right timestamp can never satisfy l.ts >= r.ts (DuckDB ASOF
      // comparison semantics) — but unfiltered it would sort FIRST under
      // nulls-first ascending and back-fill every pre-first-event left row
      .filter(col(rightTsCol).isNotNull)
      .withColumn("__t", col(rightTsCol))
      .withColumn("__side", lit(0))
      .select(leftCols.map { c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__t") :+ col("__side") :+
        struct(valueCols.map(v => col(v).as(v)): _*).as("__asof"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"__asof.$v").as(s"asof_$v")): _*)
  }
}
