package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd accent stripping: canonical decomposition (NFD)
  * followed by removal of combining marks (Unicode category Mn) — the
  * matching-side normalization for search/dedup keys where "café" must
  * hit "cafe" (query normalization, fuzzy URL slugs, cross-source entity
  * keys). Characters WITHOUT a canonical decomposition (ø, đ, Ω) pass
  * through — this is the standard NFD-based transform (DuckDB's
  * utf8proc-backed strip_accents, the p119 oracle, behaves the same), not
  * a transliterator. ASCII input takes a scan-only fast path. Compose
  * with [[NfcNormalize]] upstream when input may arrive decomposed —
  * NFD makes the result identical either way.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  /** Runtime kernel shared by eval and codegen. */
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: pure ASCII has no decompositions and no marks
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column API: accent-stripped string (NULL in, NULL out). */
  def stripAccents(c: Column): Column =
    ExpressionUtils.column(StripAccents(ExpressionUtils.expression(c)))
}
