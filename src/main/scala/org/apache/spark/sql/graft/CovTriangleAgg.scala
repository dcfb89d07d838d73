package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Packed upper-triangle covariance-ingredient aggregate over a
  * float-vector column: ONE pass that folds every vector's d(d+1)/2
  * dimension pairs (i ≤ j) into four flat long arrays — n, Σ q(xᵢxⱼ),
  * Σ q(xᵢ), Σ q(xⱼ) with q = round-to-long at 1e10 fixed point — and
  * emits the per-cell rows at the end.
  *
  * Why this exists (round-14 verdict #3): the expression-tree shape
  * (nested transform → struct per cell → explode → hash aggregate on
  * (i, j)) allocates a struct and pays a hash probe PER CELL —
  * n·d(d+1)/2 of each (4.2M at the p211 fixture, measured 7.5 s). Here
  * each vector updates a primitive long-array accumulator in a tight
  * loop (no per-cell allocation, no hash), partials combine
  * element-wise, and only |partitions| buffers ever shuffle — the ideal
  * 100 TB shape for a bounded-d statistic: corpus-sized input, d²-sized
  * state.
  *
  * Cell packing is length-independent — idx(i, j) = j(j+1)/2 + i — so
  * RAGGED vectors align: a short vector updates exactly the prefix of
  * cells it has (n_vecs stays per-cell, the documented
  * embeddingCovariance contract).
  *
  * Quantization replays Spark's `round(x * 1e10).cast("long")`
  * bit-for-bit (the contract the p211 oracle pins): BigDecimal.valueOf
  * (shortest decimal repr) → setScale(0, HALF_UP) → double → truncating
  * long cast; NaN → 0, ±Inf saturates — Spark's non-ANSI double→long
  * cast. Per-ELEMENT rounds are hoisted (computed d times per vector,
  * not d² — the Σ q(xᵢ) term for cell (i, j) doesn't depend on j);
  * only the product term rounds per cell. NULL elements mirror the
  * old null-propagating sums: the cell's n still counts, each sum
  * skips exactly the terms a NULL side nulls out.
  *
  * Output: array<struct<i int, j int, n_vecs long, sxy long, sx long,
  * sy long>> over cells with n_vecs > 0, in packed order. NULL input
  * vectors contribute nothing.
  */
case class CovTriangleAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovTriangleAgg.Buf]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import CovTriangleAgg._

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n_vecs", LongType, nullable = false),
    StructField("sxy", LongType, nullable = false),
    StructField("sx", LongType, nullable = false),
    StructField("sy", LongType, nullable = false))))
  override def prettyName: String = "cov_triangle_agg"

  override def createAggregationBuffer(): Buf = new Buf(0)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    buf.grow(d * (d + 1) / 2)
    // hoisted per-element quantization: rx holds each element's q value
    // and the parallel nul array tracks NULL slots (a NULL element's rx
    // entry stays 0 and is never read — every consumer checks nul first)
    val rx = new Array[Long](d)
    val nul = new Array[Boolean](d)
    var e = 0
    while (e < d) {
      if (arr.isNullAt(e)) nul(e) = true
      else rx(e) = roundCastQ(arr.getFloat(e).toDouble * Q)
      e += 1
    }
    var j = 0
    while (j < d) {
      val base = j * (j + 1) / 2
      val xjNull = nul(j)
      val xj = if (xjNull) 0.0 else arr.getFloat(j).toDouble
      var i = 0
      while (i <= j) {
        val idx = base + i
        buf.n(idx) += 1L
        if (!nul(i)) {
          buf.sx(idx) += rx(i)
          if (!xjNull) buf.sxy(idx) += roundCastQ(arr.getFloat(i).toDouble * xj * Q)
        }
        if (!xjNull) buf.sy(idx) += rx(j)
        i += 1
      }
      j += 1
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.grow(b.len)
    var i = 0
    while (i < b.len) {
      a.n(i) += b.n(i); a.sxy(i) += b.sxy(i)
      a.sx(i) += b.sx(i); a.sy(i) += b.sy(i)
      i += 1
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val rows = new Array[Any](buf.len)
    var m = 0
    var j = 0
    var base = 0
    // walk packed order, recovering (i, j) without per-cell arithmetic
    while (base < buf.len) {
      var i = 0
      while (i <= j && base + i < buf.len) {
        val idx = base + i
        if (buf.n(idx) > 0L) {
          rows(m) = InternalRow(i, j, buf.n(idx), buf.sxy(idx), buf.sx(idx), buf.sy(idx))
          m += 1
        }
        i += 1
      }
      base += j + 1
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(rows.asInstanceOf[Array[Object]], m))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 32 * buf.len)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) {
      bb.putLong(buf.n(i)); bb.putLong(buf.sxy(i))
      bb.putLong(buf.sx(i)); bb.putLong(buf.sy(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val len = bb.getInt
    val buf = new Buf(len)
    var i = 0
    while (i < len) {
      buf.n(i) = bb.getLong; buf.sxy(i) = bb.getLong
      buf.sx(i) = bb.getLong; buf.sy(i) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CovTriangleAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CovTriangleAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CovTriangleAgg =
    copy(child = newChild)
}

object CovTriangleAgg {
  private val Q = 1e10

  /** Mutable packed-triangle accumulator; grows to the largest vector's
    * cell count (ragged inputs update prefixes). */
  final class Buf(initialLen: Int) {
    var len: Int = initialLen
    var n: Array[Long] = new Array[Long](initialLen)
    var sxy: Array[Long] = new Array[Long](initialLen)
    var sx: Array[Long] = new Array[Long](initialLen)
    var sy: Array[Long] = new Array[Long](initialLen)
    def grow(to: Int): Unit = if (to > len) {
      n = java.util.Arrays.copyOf(n, to)
      sxy = java.util.Arrays.copyOf(sxy, to)
      sx = java.util.Arrays.copyOf(sx, to)
      sy = java.util.Arrays.copyOf(sy, to)
      len = to
    }
  }

  /** Spark's `round(t).cast("long")` (non-ANSI), replayed exactly:
    * Round(DoubleType) passes NaN/Inf through and otherwise rounds the
    * SHORTEST DECIMAL REPR half-up (BigDecimal.valueOf); the long cast
    * truncates, NaN → 0, ±Inf saturates. A fast integer path covers the
    * common case — it falls back to BigDecimal whenever the fractional
    * part sits within 1e-5 of the .5 boundary (where shortest-repr and
    * binary value could disagree; half-ulp at |t| = 1e10 is ~1e-6) or
    * |t| ≥ 1e10 (ulp too coarse for the band). */
  private[graft] def roundCastQ(t: Double): Long = {
    if (java.lang.Double.isNaN(t)) return 0L
    if (java.lang.Double.isInfinite(t))
      return if (t > 0) Long.MaxValue else Long.MinValue
    val a = math.abs(t)
    if (a < 1e10) {
      val f = math.floor(a)
      val r = a - f
      if (math.abs(r - 0.5) > 1e-5) {
        val m = f.toLong + (if (r > 0.5) 1L else 0L)
        return if (t < 0) -m else m
      }
    }
    java.math.BigDecimal.valueOf(t)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** Column wrapper: cov_triangle_agg(vec) as an aggregate function. */
  def cells(vec: Column): Column =
    ExpressionUtils.column(CovTriangleAgg(ExpressionUtils.expression(vec))
      .toAggregateExpression())
}
