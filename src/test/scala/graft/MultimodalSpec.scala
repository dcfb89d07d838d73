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

  test("imageDimensions parses real PNG/GIF/JPEG headers from bytes (no codec)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // minimal real headers, hand-assembled per spec
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      b(0, 0, 1, 0x40, /* width 320 */ 0, 0, 0, 0xF0 /* height 240 */, 8, 6, 0, 0, 0)
    val gif = "GIF89a".getBytes("US-ASCII") ++
      b(0x40, 0x01, /* width 320 LE */ 0xF0, 0x00 /* height 240 LE */, 0, 0, 0)
    val jpg = b(0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46, // APP0 stub
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0xF0, 0x01, 0x40) // SOF0: h=240 w=320
    val junk = "not an image".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, gif), (3L, jpg), (4L, junk)).toDF("id", "media")
      .withColumn("dims", Multimodal.imageDimensions(col("media")))
    val got = df.select(col("id"), col("dims.format"), col("dims.width"), col("dims.height"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) === ((Some("png"), Some(320), Some(240))))
    assert(got(2L) === ((Some("gif"), Some(320), Some(240))))
    assert(got(3L) === ((Some("jpeg"), Some(320), Some(240))))
    assert(got(4L) === ((None, None, None)))
  }

  test("imageDimensions parses TIFF IFDs in both byte orders (SHORT and LONG values)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // little-endian: II*\0, IFD at 8; 2 entries: width SHORT 320,
    // height LONG 240; next-IFD pointer 0
    val tiffLE = b(0x49, 0x49, 0x2A, 0x00, 0x08, 0x00, 0x00, 0x00,
      0x02, 0x00,
      0x00, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00, 0x40, 0x01, 0x00, 0x00,
      0x01, 0x01, 0x04, 0x00, 0x01, 0x00, 0x00, 0x00, 0xF0, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00)
    // big-endian: MM\0*; SHORT values are LEFT-justified in the field
    val tiffBE = b(0x4D, 0x4D, 0x00, 0x2A, 0x00, 0x00, 0x00, 0x08,
      0x00, 0x02,
      0x01, 0x00, 0x00, 0x03, 0x00, 0x00, 0x00, 0x01, 0x01, 0x40, 0x00, 0x00,
      0x01, 0x01, 0x00, 0x04, 0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0xF0,
      0x00, 0x00, 0x00, 0x00)
    // IFD with only an Orientation tag (274) — no dimensions -> refuse
    val tiffNoDims = b(0x49, 0x49, 0x2A, 0x00, 0x08, 0x00, 0x00, 0x00,
      0x01, 0x00,
      0x12, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00)
    val truncated = b(0x49, 0x49, 0x2A, 0x00, 0x08, 0x00)
    val got = Seq((1L, tiffLE), (2L, tiffBE), (3L, tiffNoDims), (4L, truncated))
      .toDF("id", "media")
      .withColumn("dims", Multimodal.imageDimensions(col("media")))
      .select(col("id"), col("dims.format"), col("dims.width"), col("dims.height"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) === ((Some("tiff"), Some(320), Some(240))))
    assert(got(2L) === ((Some("tiff"), Some(320), Some(240))))
    assert(got(3L) === ((None, None, None)))
    assert(got(4L) === ((None, None, None)))
  }

  test("imageDimensions: FFC0 straddling a byte boundary is not a SOF (nibble alignment)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // payload bytes 2F FC 00 hex-encode to '2FFC00...': the unanchored
    // pattern matched 'FFC0' at an odd character and parsed garbage dims
    val trap = b(0xFF, 0xD8, 0x2F, 0xFC, 0x00, 0x11, 0x22, 0x33, 0x44, 0x55,
      0x66, 0x77, 0x88, 0x99, 0xAA, 0xBB, 0xCC)
    val out = Seq(Tuple1(trap)).toDF("media")
      .select(Multimodal.imageDimensions(col("media")).as("dims")).head()
    assert(out.isNullAt(0))
  }

  test("audioMeta parses canonical WAV headers; non-canonical layouts fall through") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le16(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF)
    def le32(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF)
    // canonical 44-byte PCM header: 2ch, 44100 Hz, 16-bit, 1s of audio
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(36 + 176400) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(176400)
    // same file with a LIST chunk before data: canonical parser must refuse
    val listWav = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16) ++
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII")
    val junk = "not audio at all".getBytes("UTF-8")
    val df = Seq((1L, wav), (2L, listWav), (3L, junk)).toDF("id", "media")
      .withColumn("meta", Multimodal.audioMeta(col("media")))
    val got = df.select(col("id"), col("meta.format"), col("meta.channels"),
        col("meta.sample_rate"), col("meta.bits_per_sample"), col("meta.n_frames"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).map(f =>
        (f, r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got(1L) === Some(("wav", 2, 44100, 16, 44100L)))
    assert(got(2L) === None)
    assert(got(3L) === None)
  }

  test("audioMetaFlac parses STREAMINFO; wrong magic or block type falls through") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // 44100 Hz, stereo, 16-bit, 1000 samples:
    // bytes 19-21: srate(20 bits) | channels-1(3) | bps-1 high bit(1)
    val streaminfo = b(0x10, 0x00, 0x10, 0x00) ++ // min/max blocksize
      b(0, 0, 0, 0, 0, 0) ++ // min/max framesize (u24 x2)
      b(0x0A, 0xC4, 0x42, 0xF0) ++ // packed srate/ch/bps + samples hi
      b(0x00, 0x00, 0x03, 0xE8) ++ // total samples low 32 = 1000
      Array.fill[Byte](16)(0) // md5 signature
    val flac = "fLaC".getBytes("US-ASCII") ++ b(0x00, 0x00, 0x00, 0x22) ++ streaminfo
    // same bytes but first block marked type 4 (VORBIS_COMMENT): refuse
    val wrongType = "fLaC".getBytes("US-ASCII") ++ b(0x04, 0x00, 0x00, 0x22) ++ streaminfo
    // last-block flag set is still STREAMINFO (bit 7 masked off)
    val lastFlag = "fLaC".getBytes("US-ASCII") ++ b(0x80, 0x00, 0x00, 0x22) ++ streaminfo
    val junk = "fLaX nope".getBytes("UTF-8")
    val df = Seq((1L, flac), (2L, wrongType), (3L, lastFlag), (4L, junk))
      .toDF("id", "media")
      .withColumn("meta", Multimodal.audioMetaFlac(col("media")))
    val got = df.select(col("id"), col("meta.format"), col("meta.sample_rate"),
        col("meta.channels"), col("meta.bits_per_sample"), col("meta.n_samples"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).map(f =>
        (f, r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got(1L) === Some(("flac", 44100, 2, 16, 1000L)))
    assert(got(2L) === None)
    assert(got(3L) === Some(("flac", 44100, 2, 16, 1000L)))
    assert(got(4L) === None)
  }

  test("videoMeta parses canonical MP4 ftyp+moov/mvhd headers, both versions") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(v: Long) = b(((v >> 24) & 0xFF).toInt, ((v >> 16) & 0xFF).toInt,
      ((v >> 8) & 0xFF).toInt, (v & 0xFF).toInt)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    val ftyp = be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0x200)
    // v0 mvhd: version+flags, creation, modification, timescale, duration
    val mvhd0 = be32(108) ++ "mvhd".getBytes("US-ASCII") ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(5000) ++ Array.fill[Byte](80)(0)
    val mp4v0 = ftyp ++ (be32(8 + mvhd0.length) ++ "moov".getBytes("US-ASCII") ++ mvhd0)
    // v1 mvhd: 64-bit creation/modification/duration, timescale still u32
    val mvhd1 = be32(120) ++ "mvhd".getBytes("US-ASCII") ++ b(1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(90000) ++ be64(450000L) ++ Array.fill[Byte](80)(0)
    val mp4v1 = ftyp ++ (be32(8 + mvhd1.length) ++ "moov".getBytes("US-ASCII") ++ mvhd1)
    // mdat-first (no faststart): canonical parser must refuse
    val tail = ftyp ++ (be32(16) ++ "mdat".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0))
    // all-ones duration = the ISO-BMFF "unknown duration" sentinel: refuse
    // (v0: 0xFFFFFFFF; v1: 2^64-1, negative/overflowed through the long cast)
    val mvhdU0 = be32(108) ++ "mvhd".getBytes("US-ASCII") ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(0xFFFFFFFFL) ++ Array.fill[Byte](80)(0)
    val mp4u0 = ftyp ++ (be32(8 + mvhdU0.length) ++ "moov".getBytes("US-ASCII") ++ mvhdU0)
    val mvhdU1 = be32(120) ++ "mvhd".getBytes("US-ASCII") ++ b(1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(90000) ++ Array.fill[Byte](8)(0xFF.toByte) ++
      Array.fill[Byte](80)(0)
    val mp4u1 = ftyp ++ (be32(8 + mvhdU1.length) ++ "moov".getBytes("US-ASCII") ++ mvhdU1)
    val df = Seq((1L, mp4v0), (2L, mp4v1), (3L, tail),
      (4L, "junk".getBytes("UTF-8")), (5L, mp4u0), (6L, mp4u1)).toDF("id", "media")
      .withColumn("m", Multimodal.videoMeta(col("media")))
    val got = df.select(col("id"), col("m.format"), col("m.major_brand"),
        col("m.timescale"), col("m.duration"), col("m.duration_s"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).map(f =>
        (f, r.getString(2), r.getInt(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(1L) === Some(("mp4", "isom", 1000, 5000L, 5.0)))
    assert(got(2L) === Some(("mp4", "isom", 90000, 450000L, 5.0)))
    assert(got(3L) === None)
    assert(got(4L) === None)
    assert(got(5L) === None)
    assert(got(6L) === None)
  }

  test("audioMetaMp3 parses MPEG-1 Layer III headers, with and without an ID3v2 tag") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // 0xFF 0xFB: sync + MPEG-1 + Layer III; 0x90: bitrate idx 9 (128k), 44100
    val frame = b(0xFF, 0xFB, 0x90, 0x00) ++ Array.fill[Byte](16)(0)
    // ID3v2 header: "ID3", v2.3, flags 0, synchsafe size 10 -> audio at 21
    val tagged = b(0x49, 0x44, 0x33, 3, 0, 0, 0, 0, 0, 10) ++
      Array.fill[Byte](10)(0) ++ frame
    val mpeg2 = b(0xFF, 0xF3, 0x90, 0x00) // version bits 10 = MPEG-2: refuse
    val df = Seq((1L, frame), (2L, tagged), (3L, mpeg2),
      (4L, "junk".getBytes("UTF-8"))).toDF("id", "media")
      .withColumn("m", Multimodal.audioMetaMp3(col("media")))
    val got = df.select(col("id"), col("m.format"), col("m.bitrate_kbps"),
        col("m.sample_rate"), col("m.has_id3"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).map(f =>
        (f, r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(got(1L) === Some(("mp3", 128, 44100, false)))
    assert(got(2L) === Some(("mp3", 128, 44100, true)))
    assert(got(3L) === None)
    assert(got(4L) === None)
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

  // --- real pixel/sample decode (round 16) ------------------------------

  /** Real encoded fixture: solid-rgb image via BufferedImage + the JDK's
    * own ImageIO writer — the same codec path production payloads take. */
  private def encodeImage(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  test("ImageIoDecoder: decoded dims equal header-parsed dims on every real fixture") {
    val fmts = Seq("png", "jpg", "bmp", "gif", "tiff")
    val rows = fmts.zipWithIndex.map { case (f, i) =>
      (i.toLong, f, encodeImage(f, 320, 240, 0x50A0C0)) }
    val df = rows.toDF("id", "fmt", "media")
    val out = Multimodal.imagePixelStats(df, "media")
      .withColumn("hdr", Multimodal.imageDimensions(col("media")))
      .select(col("fmt"), col("pixel_stats.width"), col("pixel_stats.height"),
        col("hdr.width").as("hw"), col("hdr.height").as("hh"))
      .collect()
    assert(out.length === fmts.length)
    out.foreach { r =>
      val fmt = r.getString(0)
      assert(r.getInt(1) === 320, s"$fmt decoded width")
      assert(r.getInt(2) === 240, s"$fmt decoded height")
      // the cross-check: byte-arithmetic header parse == real pixel decode
      assert(!r.isNullAt(3) && r.getInt(3) === 320, s"$fmt header width")
      assert(!r.isNullAt(4) && r.getInt(4) === 240, s"$fmt header height")
    }
  }

  test("ImageIoDecoder: exact channel means and luma histogram on lossless fixtures") {
    val dec = new Multimodal.ImageIoDecoder(8)
    // solid rgb(200,100,50): luma = (299*200+587*100+114*50)/1000 = 124 -> bin 3
    for (fmt <- Seq("png", "bmp")) {
      val f = dec.decode(encodeImage(fmt, 4, 2, (200 << 16) | (100 << 8) | 50))
      assert(f != null, fmt)
      assert(f.length === 13)
      assert((f(0), f(1)) === ((4f, 2f)), fmt)
      assert((f(2), f(3), f(4)) === ((200f, 100f, 50f)), fmt)
      assert(f.drop(5).toSeq === Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f), fmt)
    }
    // half black / half white: means 127.5, luma bins 0 and 7 at 0.5 each
    val two = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    two.setRGB(0, 0, 0x000000); two.setRGB(1, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(two, "png", bos)
    val g = dec.decode(bos.toByteArray)
    assert((g(2), g(3), g(4)) === ((127.5f, 127.5f, 127.5f)))
    assert(g.drop(5).toSeq === Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f))
    // undecodable bytes -> null (the fall-through contract)
    assert(dec.decode("not an image".getBytes("UTF-8")) == null)
    assert(dec.decode(Array.emptyByteArray) == null)
  }

  test("ImageIoDecoder: decompression-bomb guard rejects huge declared dims pre-decode") {
    // real 8x8 PNG, IHDR width/height patched to 100k x 100k: the header
    // pre-screen must return null WITHOUT attempting the O(w*h) raster
    // allocation (r16 advice, medium). IHDR layout: bytes 16..19 width,
    // 20..23 height, big-endian.
    val png = encodeImage("png", 8, 8, 0x336699).clone()
    def putBE(off: Int, v: Int): Unit = {
      png(off) = (v >>> 24).toByte; png(off + 1) = (v >>> 16).toByte
      png(off + 2) = (v >>> 8).toByte; png(off + 3) = v.toByte
    }
    putBE(16, 100000); putBE(20, 100000)
    val dec = new Multimodal.ImageIoDecoder(8)
    assert(dec.decode(png) == null, "10-gigapixel claim must be rejected")
    // a genuine image within the bound still decodes under the same guard
    assert(dec.decode(encodeImage("png", 8, 8, 0x336699)) != null)
    // an explicit tiny bound rejects even an honest image above it
    val tiny = new Multimodal.ImageIoDecoder(8, maxPixels = 16L)
    assert(tiny.decode(encodeImage("png", 8, 8, 0x336699)) == null)
    assert(tiny.decode(encodeImage("png", 4, 4, 0x336699)) != null)
    // audit classifies the bomb as header_only (signature parsed, decode refused)
    val df = Seq((1L, png)).toDF("id", "media")
    val audit = Multimodal.imageDecodeAudit(df, "media")
      .select(col("decode_audit.status"), col("decode_audit.header_w")).collect()
    assert(audit.head.getString(0) === "header_only")
    assert(audit.head.getInt(1) === 100000)
  }

  test("decode operators refuse existing output columns and reserved names") {
    val png = encodeImage("png", 2, 2, 0x010203)
    val df = Seq((1L, png)).toDF("id", "media")
    intercept[IllegalArgumentException] {
      Multimodal.imagePixelStats(df.withColumn("pixel_stats", lit(1)), "media")
    }
    intercept[IllegalArgumentException] {
      Multimodal.wavSampleStats(df.withColumn("audio_stats", lit(1)), "media")
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeFeatures(df.withColumn("features", lit(1)), "media",
        new Multimodal.FakeDecoder(4))
    }
    intercept[IllegalArgumentException] {
      Multimodal.imageDecodeAudit(df.withColumn("__mm_pix", lit(1)), "media")
    }
    intercept[IllegalArgumentException] {
      Multimodal.imageDecodeAudit(df.withColumn("__mm_hdr", lit(1)), "media")
    }
  }

  test("imagePixelStats / decodeFeatures: null struct for junk, single Dataset plan") {
    val png = encodeImage("png", 3, 3, 0x010203)
    val df = Seq((1L, png), (2L, "junk".getBytes("UTF-8"))).toDF("id", "media")
    val out = Multimodal.imagePixelStats(df, "media")
    val got = out.select(col("id"), col("pixel_stats")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val s = got(1L).get
    assert((s.getInt(0), s.getInt(1)) === ((3, 3)))
    assert((s.getDouble(2), s.getDouble(3), s.getDouble(4)) === ((1.0, 2.0, 3.0)))
    assert(got(2L) === None)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("MapPartitions"), plan)
    // decodeFeatures with the real decoder: junk -> null features column
    val feats = Multimodal.decodeFeatures(df, "media", new Multimodal.ImageIoDecoder(8))
    val fm = feats.select(col("id"), col("features")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fm(1L).isDefined && fm(2L).isEmpty)
  }

  test("imageDecodeAudit: ok / header_only / decode_only / undecodable statuses") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = encodeImage("png", 5, 4, 0x334455)                  // both agree
    val truncatedPng = png.take(30)                               // header parses, decode fails
    // minimal WEBP VP8X header: signature parses, but the JVM has no reader
    val webp = "RIFF".getBytes("US-ASCII") ++ b(0, 0, 0, 0) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8X".getBytes("US-ASCII") ++
      b(0, 0, 0, 0) ++ b(0, 0, 0, 0, 0x3F, 1, 0, 0xEF, 0, 0)
    val wbmp = {                                                  // ImageIO-only format
      val img = new java.awt.image.BufferedImage(
        6, 2, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "wbmp", bos), "no wbmp writer")
      bos.toByteArray
    }
    val junk = "definitely not pixels".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, truncatedPng), (3L, webp), (4L, wbmp), (5L, junk))
      .toDF("id", "media")
    val got = Multimodal.imageDecodeAudit(df, "media")
      .select(col("id"), col("decode_audit.status"), col("decode_audit.header_format"),
        col("decode_audit.decoded_w"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2)), Option(r.get(3))))).toMap
    assert(got(1L) === (("ok", Some("png"), Some(5))))
    assert(got(2L) === (("header_only", Some("png"), None)))
    assert(got(3L) === (("header_only", Some("webp"), None)))
    assert(got(4L) === (("decode_only", None, Some(6))))
    assert(got(5L) === (("undecodable", None, None)))
  }

  /** Canonical 44-byte-header PCM WAV with the given samples. */
  private def wavBytes(sampleRate: Int, channels: Int, bits: Int,
      samples16: Seq[Int]): Array[Byte] = {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le16(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF)
    def le32(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF)
    val bytesPerSample = bits / 8
    val data = samples16.flatMap(s =>
      if (bits == 16) le16(s & 0xFFFF).toSeq else Seq((s & 0xFF).toByte)).toArray
    val blockAlign = channels * bytesPerSample
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  test("wavSampleStats: exact RMS/peak/clip on hand-built 16-bit and 8-bit PCM") {
    // 16-bit mono @8000 Hz: [0, 16384, -16384, 32767, -32768, 0, 0, 0]
    val s16 = Seq(0, 16384, -16384, 32767, -32768, 0, 0, 0)
    val full = 32767.0 / 32768.0
    val rms16 = math.sqrt((0.25 + 0.25 + full * full + 1.0) / 8)
    // 8-bit mono: [128, 255, 0, 128] -> norms [0, 127/128, -1, 0]
    val s8 = Seq(128, 255, 0, 128)
    val n8 = 127.0 / 128.0
    val rms8 = math.sqrt((n8 * n8 + 1.0) / 4)
    val df = Seq(
      (1L, wavBytes(8000, 1, 16, s16)),
      (2L, wavBytes(8000, 1, 8, s8)),
      (3L, "junk junk junk junk junk junk junk junk junk".getBytes("UTF-8"))
    ).toDF("id", "media")
    val got = Multimodal.wavSampleStats(df, "media")
      .select(col("id"), col("audio_stats")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val a = got(1L).get
    assert(a.getLong(0) === 8L)
    assert(a.getDouble(1) === 8.0 / 8000)
    assert(a.getDouble(2) === rms16)
    assert(a.getDouble(3) === 1.0)
    assert(a.getDouble(4) === 0.25) // 32767 and -32768: 2 of 8 pinned
    val c = got(2L).get
    assert(c.getLong(0) === 4L)
    assert(c.getDouble(1) === 4.0 / 8000)
    assert(c.getDouble(2) === rms8)
    assert(c.getDouble(3) === 1.0)
    assert(c.getDouble(4) === 0.5) // 255 and 0: 2 of 4 pinned
    assert(got(3L) === None)
  }

  test("wavSampleStats: stereo frames, float-PCM refusal, truncated data chunk") {
    // stereo: 2 frames of 2 samples each; n_frames = 2, rms over ALL 4 samples
    val st = Multimodal.decodeWavStats(wavBytes(44100, 2, 16, Seq(16384, -16384, 0, 32767)))
    assert(st.getLong(0) === 2L)
    assert(st.getDouble(1) === 2.0 / 44100)
    val full = 32767.0 / 32768.0
    assert(st.getDouble(2) === math.sqrt((0.25 + 0.25 + full * full) / 4))
    // format code 3 (IEEE float) is not integer PCM: refuse
    val floatFmt = wavBytes(8000, 1, 16, Seq(0, 0))
    floatFmt(20) = 3
    assert(Multimodal.decodeWavStats(floatFmt) == null)
    // header declares 100 data bytes but only 4 are present: decode what
    // exists (2 samples), never read past the payload
    val decl = wavBytes(8000, 1, 16, Seq(16384, -16384))
    val lied = decl.clone(); lied(40) = 100
    val t = Multimodal.decodeWavStats(lied)
    assert(t.getLong(0) === 2L && t.getDouble(3) === 0.5)
    // empty data chunk: zero frames, all-zero stats (not null - it IS canonical)
    val empty = Multimodal.decodeWavStats(wavBytes(8000, 1, 16, Seq()))
    assert(empty != null, "44-byte canonical header with empty data must decode")
    assert(empty.getLong(0) === 0L && empty.getDouble(2) === 0.0)
  }

  test("imageDimensions parses BMP (both row orders) and WEBP (VP8/VP8L/VP8X)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // BITMAPINFOHEADER: "BM", 12 junk bytes, DIB size 40, w 320, h 240
    val bmp = b(0x42, 0x4D) ++ b(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      b(40, 0, 0, 0, 0x40, 1, 0, 0, 0xF0, 0, 0, 0)
    // top-down BMP: height stored NEGATIVE (-240 = 0xFFFFFF10 LE)
    val bmpTopDown = b(0x42, 0x4D) ++ b(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      b(40, 0, 0, 0, 0x40, 1, 0, 0, 0x10, 0xFF, 0xFF, 0xFF)
    // ancient BITMAPCOREHEADER (12) -> null, MediaDecoder path
    val bmpCore = b(0x42, 0x4D) ++ b(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      b(12, 0, 0, 0, 0x40, 1, 0xF0, 0)
    // malformed: NEGATIVE width (-320) — no valid BMP has one; null, not
    // a negative int leaking through s32
    val bmpNegW = b(0x42, 0x4D) ++ b(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      b(40, 0, 0, 0, 0xC0, 0xFE, 0xFF, 0xFF, 0xF0, 0, 0, 0)
    // malformed: zero height -> null
    val bmpZeroH = b(0x42, 0x4D) ++ b(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      b(40, 0, 0, 0, 0x40, 1, 0, 0, 0, 0, 0, 0)
    def riff(cc: String, payload: Array[Byte]) =
      "RIFF".getBytes("US-ASCII") ++ b(0, 0, 0, 0) ++
        "WEBP".getBytes("US-ASCII") ++ cc.getBytes("US-ASCII") ++
        b(0, 0, 0, 0) ++ payload
    // VP8X: flags+reserved, canvas w-1=319 u24 LE, h-1=239 u24 LE
    val vp8x = riff("VP8X", b(0, 0, 0, 0, 0x3F, 1, 0, 0xEF, 0, 0))
    // VP8L: 0x2F then 319 | 239<<14 = 0x3BC13F as LE u32
    val vp8l = riff("VP8L", b(0x2F, 0x3F, 0xC1, 0x3B, 0x00))
    // VP8: 3-byte frame tag, start code 9D 01 2A, w 320 LE u16, h 240
    val vp8 = riff("VP8 ", b(0, 0, 0, 0x9D, 0x01, 0x2A, 0x40, 1, 0xF0, 0))
    val df = Seq((1L, bmp), (2L, bmpTopDown), (3L, bmpCore),
      (4L, vp8x), (5L, vp8l), (6L, vp8),
      (7L, bmpNegW), (8L, bmpZeroH)).toDF("id", "media")
      .withColumn("dims", Multimodal.imageDimensions(col("media")))
    val got = df.select(col("id"), col("dims.format"), col("dims.width"),
      col("dims.height")).collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) === ((Some("bmp"), Some(320), Some(240))))
    assert(got(2L) === ((Some("bmp"), Some(320), Some(240))))
    assert(got(3L) === ((None, None, None)))
    assert(got(4L) === ((Some("webp"), Some(320), Some(240))))
    assert(got(5L) === ((Some("webp"), Some(320), Some(240))))
    assert(got(6L) === ((Some("webp"), Some(320), Some(240))))
    assert(got(7L) === ((None, None, None)))
    assert(got(8L) === ((None, None, None)))
  }
}
