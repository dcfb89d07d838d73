package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime function registration into an EXISTING session (sessionState is
  * private[sql], hence this bridge). GraftExtensions covers the
  * config-driven path (spark.sql.extensions) for new sessions; this covers
  * sessions already running. */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("float_array_dot"),
      new ExpressionInfo(classOf[FloatArrayDot].getName, "float_array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_array_dot(a, b) takes two arrays")
        FloatArrayDot(children.head, children(1))
      })
}
