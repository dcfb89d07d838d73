package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Clipped multiset-overlap count of two string arrays:
  * Σ_g min(count_a(g), count_b(g)) over the distinct values of `a` —
  * the BLEU/ROUGE modified-n-gram-precision numerator (Papineni 2002).
  * Exists because the expression-tree form
  * `aggregate(array_distinct(a), 0, (acc, g) -> acc + least(size(filter(
  * a, =g)), size(filter(b, =g))))` runs INTERPRETED (higher-order
  * functions don't codegen) and rescans both arrays per distinct value —
  * O(distinct·(|a|+|b|)) with per-step boxing; measured 13.5 s for the
  * p236 gate at sf0.1. This is two hash-count passes, O(|a|+|b|),
  * value-identical (exact integer counts).
  *
  * NULL array on either side → NULL (the old `when` guards never passed
  * NULL arrays; kept for safety). NULL ELEMENTS are skipped on both
  * sides — SQL equality can never prove a NULL gram equal to anything,
  * so it contributes no overlap (and the gram builders never emit
  * NULL elements).
  *
  * 100 TB shape: a pure per-row expression, no shuffle. Interpreted
  * (CodegenFallback): the hash loop is already tight JVM code. */
case class ClippedCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "clipped_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val ca = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i < xa.numElements()) {
      if (!xa.isNullAt(i)) ca.merge(xa.getUTF8String(i), 1, Integer.sum _)
      i += 1
    }
    if (ca.isEmpty) return 0
    val cb = new java.util.HashMap[UTF8String, Int]()
    i = 0
    while (i < xb.numElements()) {
      if (!xb.isNullAt(i)) cb.merge(xb.getUTF8String(i), 1, Integer.sum _)
      i += 1
    }
    var clipped = 0
    val it = ca.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val inB = cb.getOrDefault(e.getKey, 0)
      if (inB > 0) clipped += math.min(e.getValue, inB)
    }
    clipped
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClippedCount =
    copy(left = newLeft, right = newRight)
}

object ClippedCount {
  def of(a: Column, b: Column): Column =
    ExpressionUtils.column(ClippedCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
