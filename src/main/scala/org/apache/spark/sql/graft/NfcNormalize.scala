package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization (UAX #15 canonical
  * composition) — the corpus-cleaning step that merges byte-different,
  * render-identical text ("é" as U+00E9 vs U+0065 U+0301) BEFORE any
  * hash-keyed operator sees it: exact dedup fingerprints, shingle hashes,
  * URL keys and vocabulary counts all treat those encodings as distinct
  * strings unless the corpus is normalized first.
  *
  * Spark ships no normalization expression; the UDF alternative breaks
  * codegen. This stays inside WholeStageCodegen as one static call, with
  * an isNormalized fast path so the (overwhelmingly common) already-NFC
  * row costs a scan, not an allocation. The p112 gate checks it against
  * DuckDB's utf8proc-backed nfc_normalize — both implement the same
  * Unicode standard (stable for all codepoints the fixtures use; an
  * engine pinned to a much older Unicode table could diverge on
  * codepoints newer than it).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Runtime kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: NFC-normalized string (NULL in, NULL out). */
  def nfc(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}
