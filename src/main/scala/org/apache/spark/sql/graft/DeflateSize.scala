package org.apache.spark.sql.graft

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd DEFLATE-compressed size of a string's UTF-8 bytes —
  * the kernel behind the compression-ratio quality signal modern corpus
  * pipelines run alongside [[graft.functions.TextFunctions.charEntropy]]
  * (RefinedWeb/Gopher-style "too compressible" filters): templated,
  * repetitive or machine-generated text compresses far below natural
  * prose, and unlike per-character entropy the ratio also catches
  * LONG-RANGE repetition (copy-pasted paragraphs, boilerplate blocks).
  *
  * One static call inside WholeStageCodegen; a fresh Deflater per row
  * (BEST_SPEED, default strategy, no preset dictionary, headerless raw
  * deflate) so results are a pure function of the bytes. Deterministic
  * for a given zlib build — the JDK may link the platform zlib, so the
  * exact count is pinned per-deployment, not cross-engine: there is
  * deliberately NO DuckDB oracle for it, and consumers should treat the
  * ratio as a ranking/threshold signal (the spec asserts ordering
  * properties plus within-JVM determinism, not golden byte counts).
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.DeflateSize.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  /** Runtime kernel shared by eval and codegen: raw-deflate byte count
    * at BEST_SPEED (quality filters need relative order, not maximal
    * compression — level 1 is ~5x faster than 6 and ranks the same). */
  def deflatedSize(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new Deflater(Deflater.BEST_SPEED, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column API: compressed byte count of the UTF-8 text (NULL in,
    * NULL out). */
  def deflateSize(c: Column): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(c)))
}
