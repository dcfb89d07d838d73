package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bridge to Spark's codegen'd bloom-filter membership expression
  * (`BloomFilterMightContain`, the engine's own runtime-row-filter
  * machinery — private[sql], hence this namespace; the same reason
  * [[FloatArrayDot]] lives here).
  *
  * Contract: the filter is built with `putLong` and probed with
  * `mightContainLong` — both sides hash the SAME caller-supplied long, so
  * any deterministic 64-bit hash (md5Hash60 in this codebase) works and
  * the sketch never sees raw values.
  */
object BloomSketch {

  /** Serialize a bloom filter over `hashes` sized for `expectedItems` at
    * `fpp`. Driver-side and bounded by construction — callers must bound
    * `hashes` (see Decontaminate.bloomDecontaminate's limit). */
  def build(hashes: IterableOnce[Long], expectedItems: Long, fpp: Double): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bf = BloomFilter.create(math.max(expectedItems, 1L), fpp)
    hashes.iterator.foreach(bf.putLong)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen'd membership probe of a long-hash column against a serialized
    * filter (shipped to executors as a literal — no join, no shuffle). */
  def mightContainLong(filterBytes: Array[Byte], hash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType), ExpressionUtils.expression(hash)))
}
