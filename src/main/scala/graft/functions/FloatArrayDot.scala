package graft.functions

import org.apache.spark.sql.Column

/** Public surface for the native codegen'd float-array dot product; the
  * Expression itself lives in the org.apache.spark.sql namespace because
  * Catalyst's extension points (ExpectsInputTypes, ExpressionUtils, ...)
  * are private[sql]. See org.apache.spark.sql.graft.FloatArrayDot.
  */
object FloatArrayDot {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.FloatArrayDot.dot(a, b)
  def normSq(a: Column): Column =
    org.apache.spark.sql.graft.FloatArrayDot.normSq(a)
}
