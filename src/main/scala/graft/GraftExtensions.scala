package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so they're reachable from spark.sql(...)
  * and ANSI SQL pipelines, not just the Column API.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions  // config-driven
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_array_dot"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.FloatArrayDot].getName,
        "float_array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_array_dot(a, b) takes two arrays")
        org.apache.spark.sql.graft.FloatArrayDot(children.head, children(1))
      }))
  }
}
