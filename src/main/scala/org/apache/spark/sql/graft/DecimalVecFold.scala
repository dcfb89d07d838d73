package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Exact decimal fold over two float-array columns: Σᵢ q(xᵢ·yᵢ) (dot) or
  * Σᵢ q((xᵢ−yᵢ)²) (squared distance), where q quantizes each term to
  * scale 18 (HALF_UP — Spark's own double→DECIMAL(38,18) cast semantics)
  * and the accumulator is an UNBOUNDED java.math.BigDecimal.
  *
  * Why this exists (ADVICE round-10 known-open item): the expression-tree
  * fold `aggregate(zip_with(..cast(Dec)), ..., (acc, v) => (acc+v).cast(Dec))`
  * re-rounds the intermediate at every step — Spark's DECIMAL(38,18) +
  * DECIMAL(38,18) promotes to precision 39, overflows the cap, and
  * allowPrecisionLoss re-rounds the running sum to scale 17 — so the final
  * double could sit ~1 ulp from DuckDB's exact int128 decimal sum of the
  * SAME terms. Here the terms are quantized identically to the old path
  * (so nothing else moves) but the accumulation is exact, like DuckDB's:
  * the fold no longer contributes any error, and the result is the
  * correctly-rounded double of the exact scale-18 term sum.
  *
  * Float×float products are exact in double (24-bit × 24-bit mantissas
  * < 53 — the p08 observation), so for dot the ONLY remaining
  * cross-engine caveat is the double→decimal cast-boundary family
  * documented in ADVICE.md (Spark quantizes the shortest decimal repr,
  * DuckDB the exact binary value — divergent only ON a quantization
  * boundary). For distSq the subtraction is also exact (Sterbenz-adjacent
  * exact for same-magnitude floats; in general x−y of float-valued
  * doubles is exact in double since both have ≤ 24-bit mantissas over a
  * shared exponent range ≤ 2⁵³).
  *
  * NaN/Infinity terms yield NULL (the old path's cast-to-decimal → NULL
  * fold behavior), and so does a NULL ARRAY ELEMENT on either side — the
  * old `zip_with` fold propagated element nulls through `+` into a NULL
  * sum, and reading the slot raw would silently treat an undefined value
  * as a zero term (ADVICE round-11). Mismatched lengths fold the common
  * prefix (zip_with would null-pad — callers always pass equal-dim
  * vectors, and the shorter-prefix rule matches [[FloatArrayDot]]).
  *
  * Codegen: a tight generated loop inside WholeStageCodegen (the repo's
  * UDF preference order — native Expression > UDF). BigDecimal.add on a
  * shared-scale pair is integer addition on the unscaled value — far
  * cheaper than the old path's per-element Decimal boxing through the
  * interpreted HigherOrderFunction lambdas.
  */
case class DecimalVecFold(left: Expression, right: Expression,
    squaredDiff: Boolean)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // ALWAYS nullable: a NaN/Infinity term yields NULL even when both
  // inputs are non-null (e.g. literal vectors) — the BinaryExpression
  // default (children's nullability) would let the optimizer elide
  // IsNull checks and nullSafeCodeGen pin isNull to a false literal
  override def nullable: Boolean = true
  override def prettyName: String =
    if (squaredDiff) "decimal_vec_dist_sq" else "decimal_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      val t = if (squaredDiff) { val d = xv - yv; d * d } else xv * yv
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) return null
      acc = acc.add(java.math.BigDecimal.valueOf(t)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val term = if (squaredDiff) s"($xv - $yv) * ($xv - $yv)" else s"$xv * $yv"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |java.math.BigDecimal $acc = java.math.BigDecimal.ZERO;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  double $t = $term;
         |  if (java.lang.Double.isNaN($t) || java.lang.Double.isInfinite($t)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $acc = $acc.add(java.math.BigDecimal.valueOf($t)
         |    .setScale(18, java.math.RoundingMode.HALF_UP));
         |}
         |${ev.value} = ${ev.isNull} ? 0.0 : $acc.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalVecFold =
    copy(left = newLeft, right = newRight)
}

object DecimalVecFold {
  /** Exact-fold dot product: Σ q₁₈(xᵢ·yᵢ), correctly-rounded double. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DecimalVecFold(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      squaredDiff = false))

  /** Exact-fold squared L2 norm (dot with itself). */
  def normSq(a: Column): Column = dot(a, a)

  /** Exact-fold squared L2 distance: Σ q₁₈((xᵢ−yᵢ)²). */
  def distSq(a: Column, b: Column): Column =
    ExpressionUtils.column(DecimalVecFold(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      squaredDiff = true))
}
