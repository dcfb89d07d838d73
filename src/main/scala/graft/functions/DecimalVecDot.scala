package graft.functions

import org.apache.spark.sql.Column

/** Public surface for the native exact-decimal-fold vector ops; the
  * Expression lives in the org.apache.spark.sql namespace because
  * Catalyst's extension points (ExpectsInputTypes, ExpressionUtils, ...)
  * are private[sql]. See org.apache.spark.sql.graft.DecimalVecFold for
  * the exactness contract (scale-18 terms, unbounded accumulator).
  */
object DecimalVecDot {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DecimalVecFold.dot(a, b)
  def normSq(a: Column): Column =
    org.apache.spark.sql.graft.DecimalVecFold.normSq(a)
  def distSq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DecimalVecFold.distSq(a, b)
}
