package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("attachBinary: bytes + typed metadata struct") {
    val df = Seq((1L, "hello")).toDF("id", "text")
    val out = Multimodal.attachBinary(df, "text", "text/plain")
    val row = out.select("media", "media_meta.mime", "media_meta.n_bytes",
      "media_meta.checksum").head()
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") === "hello")
    assert(row.getString(1) === "text/plain")
    assert(row.getLong(2) === 5L)
    assert(row.getString(3) === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
  }

  test("frameSample slices real byte ranges with offsets") {
    val df = Multimodal.attachBinary(
      Seq((1L, "a" * 100)).toDF("id", "text"), "text", "text/plain")
    val frames = Multimodal.frameSample(df, "media", 32, 32)
      .orderBy("frame_idx").select("frame_idx", "frame_bytes").as[(Int, Long)].collect()
    assert(frames.toSeq === Seq((0, 32L), (1, 32L), (2, 32L), (3, 4L)))
  }

  test("FakeDecoder is deterministic; decodeFeatures appends array<float>") {
    val dec = new Multimodal.FakeDecoder(8)
    val bytes = "some media payload".getBytes("UTF-8")
    assert(dec.decode(bytes).toSeq === dec.decode(bytes).toSeq)
    assert(dec.decode(bytes).length === 8)
    val df = Multimodal.attachBinary(
      Seq((1L, "abc"), (2L, "defg")).toDF("id", "text"), "text", "text/plain")
    val out = Multimodal.decodeFeatures(df, "media", dec)
    assert(out.schema("features").dataType.typeName === "array")
    assert(out.select(size(col("features"))).as[Int].collect().toSeq === Seq(8, 8))
    // Dataset-native mapPartitions: one plan, no RDD scan barrier
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("MapPartitions"), plan)
  }
}
