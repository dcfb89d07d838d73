package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (beyond-reference, SURVEY.md §2.4): media
  * payloads travel as opaque BinaryType columns with a typed metadata
  * struct; decode / feature-extraction / frame-sampling are per-row or
  * per-batch functions over those bytes.
  *
  * IMPORTANT — the actual byte->pixels/samples decode is a STUB: no
  * image/audio codec libraries exist in this container. [[FakeDecoder]] is
  * a deterministic placeholder; the Spark-side contract around it — the
  * schema, the partition-sized batching, the explode shape of frame
  * sampling, and the feature-vector plumbing — is real and tested, and a
  * real decoder drops in by implementing [[MediaDecoder]].
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Attach a binary payload column + typed metadata struct. `checksum` is
    * md5 over the payload bytes (hex), computed before encoding so the
    * oracle (whose md5 only takes VARCHAR) can reproduce it. */
  def attachBinary(df: DataFrame, textCol: String, mime: String,
      binCol: String = "media", metaCol: String = "media_meta"): DataFrame =
    df.withColumn(binCol, encode(col(textCol), "UTF-8"))
      .withColumn(metaCol, struct(
        lit(mime).as("mime"),
        octet_length(col(binCol)).cast("long").as("n_bytes"),
        md5(col(textCol)).as("checksum")))

  /** Frame sampling: split a payload into fixed-size frames every `stride`
    * bytes — one output row per frame with its offset and real byte slice.
    * Pure explode over a sequence expression: distributed, no UDF. */
  def frameSample(df: DataFrame, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val bin = col(s"`${binCol.replace("`", "``")}`")
    val n = octet_length(bin)
    val offsets = sequence(lit(0), greatest(n - 1, lit(0)), lit(stride))
    df.filter(n > 0) // empty payload -> zero frames (sequence(0,0) is [0])
      .withColumn("__off", explode(offsets))
      .withColumn("frame_idx", (col("__off") / stride).cast("int"))
      // Column-API substr, NOT a SQL-string expr: dotted payload names
      // (JsonFlatten's key.subKey) would parse as struct access there
      .withColumn("frame", bin.substr(col("__off") + 1, lit(frameBytes)))
      .withColumn("frame_bytes", octet_length(col("frame")).cast("long"))
      .drop("__off")
  }

  // ------------------------------------------------------------ decoders

  /** Byte-payload -> feature-vector decode contract. Real image/audio
    * decoders implement this; instances must be Serializable because they
    * ship to executors. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** STUB decoder (no codec libs in this container): deterministic features
    * from byte statistics — bucket sums of the payload bytes, normalized.
    * Stands in for "decode image, pool pixels". */
  final class FakeDecoder(val dim: Int) extends MediaDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += bytes(i) & 0xff
        i += 1
      }
      val n = math.max(bytes.length, 1).toDouble
      acc.map(v => (v / n).toFloat)
    }
  }

  /** Per-partition batch decode: Dataset-native mapPartitions so a real
    * decoder can amortize model/codec setup once per partition (the Scala
    * analogue of mapInPandas batching). Appends `features: array<float>`.
    *
    * Stays inside the Dataset plan (DeserializeToObject -> MapPartitions ->
    * SerializeFromObject) rather than dropping to `df.rdd`: the single plan
    * keeps AQE + downstream whole-stage codegen, and avoids the RDD scan
    * barrier that re-analyzes the frame from scratch. */
  def decodeFeatures(df: DataFrame, binCol: String, decoder: MediaDecoder,
      outCol: String = "features"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // real decoders initialize their codec/session HERE, once per partition
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val feats = decoder.decode(if (bytes == null) Array.emptyByteArray else bytes)
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }(enc)
  }
}
