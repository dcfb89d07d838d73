package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a polynomial rolling hash — the
  * Rabin-fingerprint chunking family (Muthitacharoen, Chen & Mazières
  * 2001, LBFS): position i (1-based, codepoint index, i >= `window`) is a
  * boundary iff the hash of the `window` codepoints ENDING at i satisfies
  * h % `divisor` == 0. Because boundaries depend only on LOCAL content,
  * an insertion early in a document shifts every byte offset but leaves
  * all later chunk boundaries — and therefore their hashes — intact;
  * that is the property that lets chunk-level dedup find shared content
  * between near-identical documents where fixed-width chunking finds
  * nothing (average chunk length ≈ `divisor` codepoints).
  *
  * Hash: H(i) = (Σ_{j=0..w−1} cp(i−w+1+j) · B^{w−1−j}) mod M with
  * B = 257, M = 1048573 (prime < 2^20) — small enough that the DuckDB
  * oracle reproduces it as an explicit w-term integer sum per position,
  * while this kernel maintains it with the O(1) rolling update
  * (H·B + in − out·B^w), one pass per document. Codepoint-based on both
  * engines (Java iterates codePoints; DuckDB ord()), so semantics do not
  * depend on UTF-16 vs UTF-8 units.
  *
  * Returns array<int> of boundary end positions; empty array for strings
  * shorter than `window`; NULL for NULL input. The expression evaluates
  * as ONE static call inside WholeStageCodegen.
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 2, s"window must be >= 2, got $window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CdcBoundaries.boundaries($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  val Base = 257L
  val Mod = 1048573L // largest prime below 2^20

  /** Rolling-hash kernel shared by eval and codegen. */
  def boundaries(s: UTF8String, window: Int, divisor: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < window) return new GenericArrayData(Array.empty[Int])
    // outPow = B^window mod M (rolling removal factor)
    var outPow = 1L
    var k = 0
    while (k < window) { outPow = (outPow * Base) % Mod; k += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * Base + cps(i) % Mod) % Mod
      if (i >= window) {
        // remove the codepoint that slid out of the window
        h = ((h - (cps(i - window) % Mod) * outPow) % Mod + Mod) % Mod
      }
      if (i >= window - 1 && h % divisor == 0) out += (i + 1)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API with the chunking defaults (window 8, ~64-codepoint
    * average chunks). */
  def boundaries(c: Column, window: Int = 8, divisor: Int = 64): Column =
    ExpressionUtils.column(
      CdcBoundaries(ExpressionUtils.expression(c), window, divisor))
}
