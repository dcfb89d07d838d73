package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product of two float-array columns.
  *
  * The expression-tree alternative (`aggregate(zip_with(...))`) allocates an
  * intermediate array per row and evaluates its lambdas interpreted — Spark
  * never compiles higher-order functions. This expression generates a tight
  * primitive loop inside WholeStageCodegen (SURVEY.md §2.2 UDF preference
  * order: native Expression with doGenCode > UDF > anything else).
  *
  * Plain double accumulation in index order: deterministic on the JVM, used
  * on the ANN scale path (bucketing + re-rank). The oracle-exact decimal
  * variant (Similarity.dot) stays for queries the DuckDB gate hash-checks.
  */
case class FloatArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatArrayDot =
    copy(left = newLeft, right = newRight)
}

object FloatArrayDot {
  /** Column API: codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatArrayDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd squared L2 norm (dot with itself). */
  def normSq(a: Column): Column = dot(a, a)
}
