package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (beyond-reference, SURVEY.md §2.4): media
  * payloads travel as opaque BinaryType columns with a typed metadata
  * struct; decode / feature-extraction / frame-sampling are per-row or
  * per-batch functions over those bytes.
  *
  * Image pixel decode is REAL: [[ImageIoDecoder]] decodes PNG/JPEG/GIF/
  * BMP/TIFF/WBMP through the JDK's own `javax.imageio` (no external codec
  * jar) into width/height + per-channel means + a luminance histogram, and
  * [[imagePixelStats]] exposes the same decode as a typed struct column.
  * WAV/PCM sample decode is also real ([[wavSampleStats]]): pure byte
  * arithmetic over the canonical RIFF data chunk — RMS, peak, clipping
  * rate, duration. Codecs the JDK does not ship (video frames, MP3/FLAC
  * sample decode) still go through the [[MediaDecoder]] seam, where
  * [[FakeDecoder]] is a clearly-marked deterministic placeholder; the
  * Spark-side contract — schema, partition-sized batching, explode shape
  * of frame sampling, feature-vector plumbing — is identical either way.
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

  /** REAL (non-stub) header metadata extraction: image format + pixel
    * dimensions parsed straight from the payload bytes with built-in
    * expressions (hex/substr/conv) — no codec library, fully codegen'd,
    * zero shuffle. Returns struct(format, width, height) or NULL when the
    * payload matches no known signature.
    *
    *  - PNG: 8-byte signature, then IHDR width/height as big-endian u32
    *    at fixed offsets 17-20 / 21-24 (1-based).
    *  - GIF (87a/89a): logical-screen width/height as little-endian u16
    *    at offsets 7-8 / 9-10.
    *  - JPEG: SOF0/SOF2 frame header located by a bounded regex over the
    *    hex of the first 64 KiB (markers precede entropy-coded data;
    *    heuristic in the same way every fast-path prober is — a crafted
    *    comment segment containing FFC0 bytes can fool it, a full parser
    *    drops in via [[MediaDecoder]] when that matters).
    *  - TIFF (II*\0 little-endian / MM\0* big-endian, the container EXIF
    *    rides on): walk the FIRST IFD's entries — 2-byte count, 12-byte
    *    entries (tag u16, type u16, count u32, left-justified value) —
    *    for ImageWidth (256) / ImageLength (257), SHORT(3) or LONG(4)
    *    typed. The walk is bounded at 16 entries: TIFF mandates
    *    ascending tag order and 256/257 sit below nearly every other
    *    tag, so they land in the first few; exotic files beyond the cap
    *    return null (MediaDecoder fallback, the house contract).
    */
  def imageDimensions(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def beU32(off: Int) = conv(hex(bin.substr(lit(off), lit(4))), 16, 10).cast("int")
    def leU16(off: Int) = conv(
      concat(hex(bin.substr(lit(off + 1), lit(1))), hex(bin.substr(lit(off), lit(1)))),
      16, 10).cast("int")
    val isPng = hex(bin.substr(lit(1), lit(8))) === "89504E470D0A1A0A"
    val isGif = hex(bin.substr(lit(1), lit(4))) === "47494638" // "GIF8"
    val isJpg = hex(bin.substr(lit(1), lit(2))) === "FFD8"
    // SOF0/SOF2: marker, 2-byte length, 1-byte precision, height u16, width
    // u16. The `^(?:..)*?` prefix forces the match onto an EVEN hex offset
    // — without it, payload bytes like 2F FC 0A would match 'FFC0' at an
    // odd nibble and parse byte-straddling garbage as dimensions. Still a
    // first-marker heuristic: an EXIF thumbnail's own SOF (inside APP1)
    // precedes the main frame's and wins — the full segment-walking parser
    // is the MediaDecoder path, as the scaladoc above says.
    val sof = regexp_extract(hex(bin.substr(lit(1), lit(65536))),
      "^(?:[0-9A-F]{2})*?(FFC[02][0-9A-F]{4}[0-9A-F]{2}[0-9A-F]{4}[0-9A-F]{4})", 1)
    val jH = conv(substring(sof, 11, 4), 16, 10).cast("int")
    val jW = conv(substring(sof, 15, 4), 16, 10).cast("int")
    val isTiffLE = hex(bin.substr(lit(1), lit(4))) === "49492A00"
    val isTiffBE = hex(bin.substr(lit(1), lit(4))) === "4D4D002A"
    def tBe(off: org.apache.spark.sql.Column, len: Int) =
      conv(hex(bin.substr(off, lit(len))), 16, 10).cast("long")
    def tLe(off: org.apache.spark.sql.Column, len: Int) = conv(
      concat((0 until len).reverse.map(i =>
        hex(bin.substr(off + lit(i), lit(1)))): _*), 16, 10).cast("long")
    def tU(off: org.apache.spark.sql.Column, len: Int) =
      when(isTiffLE, tLe(off, len)).otherwise(tBe(off, len))
    val ifd1 = (tU(lit(5), 4) + 1L).cast("int") // 1-based first-IFD start
    val tEntries = tU(ifd1, 2)
    def tEntry(i: Int) = ifd1 + lit(2 + 12 * i)
    // value is LEFT-JUSTIFIED in the 4-byte field (TIFF 6.0 §2), so a
    // SHORT reads the first 2 bytes under either byte order
    def tValue(i: Int) = {
      val typ = tU(tEntry(i) + lit(2), 2)
      when(typ === 3L, tU(tEntry(i) + lit(8), 2))
        .when(typ === 4L, tU(tEntry(i) + lit(8), 4))
    }
    def tFind(tag: Int): org.apache.spark.sql.Column =
      (0 until 16).foldRight(
        lit(null).cast("long"): org.apache.spark.sql.Column) { (i, rest) =>
        when(lit(i.toLong) < tEntries && tU(tEntry(i), 2) === tag.toLong,
          tValue(i)).otherwise(rest)
      }
    val tW = tFind(256)
    val tH = tFind(257)
    // BMP: "BM", then the DIB header — BITMAPINFOHEADER (size field 40 at
    // offset 15, the layout every encoder emits by default) carries width
    // LE s32 @19, height LE s32 @23 (negative = top-down rows -> abs);
    // the ancient BITMAPCOREHEADER (12) returns null, MediaDecoder path
    def leU32(off: Int) = conv(
      concat((0 until 4).reverse.map(i =>
        hex(bin.substr(lit(off + i), lit(1)))): _*), 16, 10).cast("long")
    val isBmp = hex(bin.substr(lit(1), lit(2))) === "424D"
    val bmpInfo = leU32(15) === 40L
    val bW = leU32(19)
    val bH = leU32(23)
    // s32 from the u32 read: values >= 2^31 are negative (top-down)
    def s32(u: org.apache.spark.sql.Column) =
      when(u >= 2147483648L, u - 4294967296L).otherwise(u)
    // WEBP (RIFF): "RIFF....WEBP" then the first chunk decides the flavor.
    //  - VP8  (lossy): 3-byte frame tag @21, start code 9D012A @24,
    //    width/height as LE u16 @27/@29 with the top 2 bits scaling hints
    //  - VP8L (lossless): 0x2F @21, then 14+14 bits packed LE in @22-25,
    //    stored minus one
    //  - VP8X (extended): canvas width/height as LE u24 @25/@28, minus one
    val isWebp = hex(bin.substr(lit(1), lit(4))) === "52494646" &&
      hex(bin.substr(lit(9), lit(4))) === "57454250"
    val cc = hex(bin.substr(lit(13), lit(4)))
    val isVp8 = cc === "56503820" && hex(bin.substr(lit(24), lit(3))) === "9D012A"
    val isVp8l = cc === "5650384C" && hex(bin.substr(lit(21), lit(1))) === "2F"
    val isVp8x = cc === "56503858"
    def leU24(off: Int) = conv(
      concat((0 until 3).reverse.map(i =>
        hex(bin.substr(lit(off + i), lit(1)))): _*), 16, 10).cast("long")
    val lV = leU32(22)
    val webpW = when(isVp8, leU16(27).cast("long") % 16384L)
      .when(isVp8l, lV % 16384L + 1L)
      .when(isVp8x, leU24(25) + 1L)
    val webpH = when(isVp8, leU16(29).cast("long") % 16384L)
      .when(isVp8l, shiftright(lV, 14) % 16384L + 1L)
      .when(isVp8x, leU24(28) + 1L)
    when(isPng, struct(lit("png").as("format"),
        beU32(17).as("width"), beU32(21).as("height")))
      .when(isGif, struct(lit("gif").as("format"),
        leU16(7).as("width"), leU16(9).as("height")))
      .when(isJpg && sof =!= "", struct(lit("jpeg").as("format"),
        jW.as("width"), jH.as("height")))
      .when((isTiffLE || isTiffBE) && tW.isNotNull && tH.isNotNull,
        struct(lit("tiff").as("format"),
          tW.cast("int").as("width"), tH.cast("int").as("height")))
      // width must be strictly positive (the format allows no negative
      // width — a negative s32 here is a malformed header, not top-down
      // rows) and height nonzero; both fall through to the null struct
      .when(isBmp && bmpInfo && s32(bW) > 0L && s32(bH) =!= 0L,
        struct(lit("bmp").as("format"),
          s32(bW).cast("int").as("width"),
          abs(s32(bH)).cast("int").as("height")))
      .when(isWebp && webpW.isNotNull, struct(lit("webp").as("format"),
        webpW.cast("int").as("width"), webpH.cast("int").as("height")))
      .otherwise(lit(null).cast(
        "struct<format:string,width:int,height:int>"))
  }

  /** Real audio metadata from CANONICAL WAV (RIFF) headers — same
    * philosophy as [[imageDimensions]]: no codec library needed, the
    * container header IS parseable with byte arithmetic. Canonical layout
    * only ("RIFF…WAVE", 16-byte "fmt " chunk at offset 13, "data" chunk
    * directly after, the layout every encoder emits by default); files
    * with extra chunks (LIST/INFO metadata) return null and fall through
    * to a [[MediaDecoder]], exactly like non-SOF JPEGs.
    *
    * Fields (1-based offsets): channels LE u16 @23, sample_rate LE u32
    * @25, block_align LE u16 @33, bits_per_sample LE u16 @35, data byte
    * length LE u32 @41. n_frames = data_len / block_align (exact integer
    * division; block_align > 0 guarded). */
  def audioMeta(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // LONG, not int: a u32 data-chunk length is up to 4 GiB-1 — an int
    // cast would wrap files past 2 GiB to negative frame counts
    def le(off: Int, len: Int) = conv(
      concat((0 until len).reverse.map(i => hex(bin.substr(lit(off + i), lit(1)))): _*),
      16, 10).cast("long")
    val isRiffWave = hex(bin.substr(lit(1), lit(4))) === "52494646" && // "RIFF"
      hex(bin.substr(lit(9), lit(8))) === "57415645666D7420" && // "WAVEfmt "
      le(17, 4) === 16 && // canonical 16-byte PCM fmt chunk
      hex(bin.substr(lit(37), lit(4))) === "64617461" // "data" directly after
    val blockAlign = le(33, 2)
    when(isRiffWave && blockAlign > 0,
        struct(lit("wav").as("format"),
          le(23, 2).cast("int").as("channels"),
          le(25, 4).cast("int").as("sample_rate"),
          le(35, 2).cast("int").as("bits_per_sample"),
          (le(41, 4) / blockAlign).cast("long").as("n_frames")))
      .otherwise(lit(null).cast(
        "struct<format:string,channels:int,sample_rate:int,bits_per_sample:int,n_frames:bigint>"))
  }

  /** Real audio metadata from FLAC STREAMINFO — the mandatory first
    * metadata block every FLAC file starts with, so unlike MP3's
    * ID3-skip heuristic this is pure fixed-offset byte arithmetic:
    * "fLaC" magic, block type 0 with the canonical 34-byte length, then
    * sample rate (20 bits), channels−1 (3), bits-per-sample−1 (5) and
    * the 36-bit total-sample count packed big-endian at bytes 19–26
    * (1-indexed). Returns
    * struct(format='flac', sample_rate int, channels int,
    * bits_per_sample int, n_samples bigint) or NULL for anything that
    * is not a canonical FLAC header (the imageDimensions contract:
    * null falls through to a [[MediaDecoder]]). */
  def audioMetaFlac(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def u8(off: Int) = conv(hex(bin.substr(lit(off), lit(1))), 16, 10).cast("int")
    def be(off: Int, len: Int) =
      conv(hex(bin.substr(lit(off), lit(len))), 16, 10).cast("long")
    val isFlac = hex(bin.substr(lit(1), lit(4))) === "664C6143" && // "fLaC"
      u8(5).bitwiseAND(lit(127)) === 0 && // first block is STREAMINFO
      be(6, 3) === 34L // canonical STREAMINFO length
    val sampleRate = shiftright(be(19, 3), 4)
    val channels = shiftright(u8(21), 1).bitwiseAND(lit(7)) + 1
    val bps = shiftleft(u8(21).bitwiseAND(lit(1)), 4)
      .bitwiseOR(shiftright(u8(22), 4)) + 1
    val nSamples = shiftleft(u8(22).bitwiseAND(lit(15)).cast("long"), 32) +
      be(23, 4)
    when(isFlac && sampleRate > 0L,
        struct(lit("flac").as("format"),
          sampleRate.cast("int").as("sample_rate"),
          channels.as("channels"),
          bps.as("bits_per_sample"),
          nSamples.as("n_samples")))
      .otherwise(lit(null).cast(
        "struct<format:string,sample_rate:int,channels:int,bits_per_sample:int,n_samples:bigint>"))
  }

  /** Real video metadata from CANONICAL ISO-BMFF (MP4/MOV) headers — no
    * codec needed: the container's ftyp + moov/mvhd boxes are fixed byte
    * arithmetic once the layout is the faststart one every web encoder
    * emits (ftyp first, moov second, mvhd its first child). Dynamic
    * offsets (substr by a computed Column) handle any ftyp size; both
    * mvhd versions parse (v0: 32-bit times @+20/+24; v1: 64-bit, the
    * timescale shifts to +28, duration u64 @+32). Non-canonical layouts
    * (moov at the tail, free/mdat first) return null and fall through to
    * a [[MediaDecoder]], the imageDimensions contract. */
  def videoMeta(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def beAt(off: org.apache.spark.sql.Column, len: Int) =
      conv(hex(bin.substr(off, lit(len))), 16, 10).cast("long")
    def hexAt(off: org.apache.spark.sql.Column, len: Int) =
      hex(bin.substr(off, lit(len)))
    val ftypSize = beAt(lit(1), 4)
    val isFtyp = hexAt(lit(5), 4) === "66747970" // "ftyp"
    val majorBrand = bin.substr(lit(9), lit(4)).cast("string")
    val moovOff = (ftypSize + 1L).cast("int") // 1-indexed start of box 2
    val isMoov = hexAt(moovOff + 4, 4) === "6D6F6F76" // "moov"
    val m = moovOff + 8 // first child box (canonical: mvhd)
    val isMvhd = hexAt(m + 4, 4) === "6D766864" // "mvhd"
    val version = beAt(m + 8, 1)
    val tsV0 = beAt(m + 20, 4)
    val durV0 = beAt(m + 24, 4)
    val tsV1 = beAt(m + 28, 4)
    val durV1 = beAt(m + 32, 8)
    val ts = when(version === 0, tsV0).otherwise(tsV1)
    val dur = when(version === 0, durV0).otherwise(durV1)
    // ISO-BMFF 'unknown duration' sentinel: all-ones (0xFFFFFFFF in v0;
    // 2^64-1 in v1, which wraps NEGATIVE through the long cast). A sentinel
    // is not a real duration -- refuse and fall through to the MediaDecoder
    // like any other non-canonical layout.
    val durKnown = when(version === 0, durV0 =!= 4294967295L).otherwise(dur >= 0L)
    when(isFtyp && isMoov && isMvhd && (version === 0 || version === 1) && ts > 0 &&
        durKnown,
        struct(lit("mp4").as("format"), majorBrand.as("major_brand"),
          ts.cast("int").as("timescale"), dur.as("duration"),
          (dur.cast("double") / ts.cast("double")).as("duration_s")))
      .otherwise(lit(null).cast(
        "struct<format:string,major_brand:string,timescale:int,duration:bigint,duration_s:double>"))
  }

  /** Real MP3 metadata from the MPEG-1 Layer III frame header — byte
    * arithmetic only: 4 header bytes carry sync, version, layer, bitrate
    * and sample-rate indices. An ID3v2 tag prefix is skipped via its
    * synchsafe 28-bit size (the tag every tagger writes); other
    * prefixes / MPEG-2 / other layers return null (MediaDecoder
    * fallback). Bitrate/sample-rate decode through the standard MPEG-1
    * Layer III tables as array literals. */
  def audioMetaMp3(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def u8(off: org.apache.spark.sql.Column) =
      conv(hex(bin.substr(off, lit(1))), 16, 10).cast("int")
    val hasId3 = hex(bin.substr(lit(1), lit(3))) === "494433" // "ID3"
    // synchsafe u28 at bytes 7..10 (1-indexed), tag header is 10 bytes
    val tagSize = (shiftleft(u8(lit(7)), 21) + shiftleft(u8(lit(8)), 14) +
      shiftleft(u8(lit(9)), 7) + u8(lit(10)))
    val h = when(hasId3, tagSize + 11).otherwise(lit(1)) // 1-indexed header start
    val b1 = u8(h)
    val b2 = u8(h + 1)
    val b3 = u8(h + 2)
    val sync = b1 === 255 && shiftright(b2, 5) === 7
    val isMpeg1 = shiftright(b2, 3).bitwiseAND(lit(3)) === 3
    val isLayer3 = shiftright(b2, 1).bitwiseAND(lit(3)) === 1
    val brIdx = shiftright(b3, 4)
    val srIdx = shiftright(b3, 2).bitwiseAND(lit(3))
    val bitrates = array((Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      160, 192, 224, 256, 320).map(lit)): _*) // idx 15 = bad, guarded below
    val rates = array(Seq(44100, 48000, 32000).map(lit): _*)
    when(sync && isMpeg1 && isLayer3 && brIdx > 0 && brIdx < 15 && srIdx < 3,
        struct(lit("mp3").as("format"),
          element_at(bitrates, brIdx + 1).as("bitrate_kbps"),
          element_at(rates, srIdx + 1).as("sample_rate"),
          hasId3.as("has_id3")))
      .otherwise(lit(null).cast(
        "struct<format:string,bitrate_kbps:int,sample_rate:int,has_id3:boolean>"))
  }

  // ------------------------------------------------------------ decoders

  /** Byte-payload -> feature-vector decode contract. Real image/audio
    * decoders implement this; instances must be Serializable because they
    * ship to executors. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** REAL image pixel decoder over the JDK's own `javax.imageio` readers
    * (PNG/JPEG/GIF/BMP/TIFF/WBMP — zero external jars). Feature layout is
    * `[width, height, mean_r, mean_g, mean_b] ++ lumaHist(lumaBins)` where
    * the histogram buckets BT.601 integer luma `(299r+587g+114b)/1000`
    * into `lumaBins` equal slices of 0..255, each normalized by the pixel
    * count.
    *
    * Decompression-bomb guard: the reader's HEADER dimensions
    * (`ImageReader.getWidth/getHeight`, no raster decode) are checked
    * against `maxPixels` BEFORE `read()` — a small hostile payload
    * declaring 100k x 100k returns null instead of allocating an
    * O(w*h) raster and OOMing the executor. Within the bound, the
    * decoded BufferedImage is necessarily O(w*h) <= O(maxPixels); the
    * row-by-row `getRGB` into a reused width-sized buffer keeps the
    * TRAVERSAL overhead at O(width) on top of that raster (it avoids a
    * second full-image int[] copy, it does not make the decode itself
    * sub-linear). Input is wrapped in a MemoryCacheImageInputStream, so
    * no per-decode executor temp file regardless of the JVM-global
    * `ImageIO.setUseCache` state. Undecodable / truncated / over-bound
    * payloads return null (the [[imageDimensions]] fall-through
    * contract). */
  final class ImageIoDecoder(val lumaBins: Int = 8,
      val maxPixels: Long = ImageIoDecoder.DefaultMaxPixels) extends MediaDecoder {
    require(lumaBins > 0, s"lumaBins must be positive, got $lumaBins")
    require(maxPixels > 0, s"maxPixels must be positive, got $maxPixels")
    val dim: Int = 5 + lumaBins
    def decode(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null || bytes.isEmpty) return null
      val img =
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) null
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, true, true)
                // header-only dimension probe — no raster allocation yet
                val hw = reader.getWidth(0).toLong
                val hh = reader.getHeight(0).toLong
                if (hw <= 0 || hh <= 0 || hw * hh > maxPixels) null
                else reader.read(0)
              } finally reader.dispose()
            }
          } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return null
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return null
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Long](lumaBins)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          val bin = luma * lumaBins / 256
          hist(if (bin >= lumaBins) lumaBins - 1 else bin) += 1L
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h.toLong
      val out = new Array[Float](dim)
      out(0) = w.toFloat
      out(1) = h.toFloat
      out(2) = (sr.toDouble / n).toFloat
      out(3) = (sg.toDouble / n).toFloat
      out(4) = (sb.toDouble / n).toFloat
      var i = 0
      while (i < lumaBins) { out(5 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
      out
    }
  }

  object ImageIoDecoder {
    /** Default decompression-bomb bound: 2^24 pixels (~16.8 MP) — a
      * 64 MiB ARGB raster, large enough for any sane web image while
      * keeping 32 concurrent decodes under ~2 GiB of raster memory. */
    val DefaultMaxPixels: Long = 1L << 24
  }

  /** STUB decoder for codecs the JDK does not ship (video frames, lossy
    * audio samples): deterministic features from byte statistics — bucket
    * sums of the payload bytes, normalized. Stands in for "decode, pool". */
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
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // real decoders initialize their codec/session HERE, once per partition
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val feats = decoder.decode(if (bytes == null) Array.emptyByteArray else bytes)
        // a real decoder returns null on undecodable bytes -> null column
        Row.fromSeq(row.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc)
  }

  /** REAL pixel decode as a typed struct column: appends
    * `outCol: struct<width:int, height:int, mean_r:double, mean_g:double,
    * mean_b:double, luma_hist:array<double>>` via [[ImageIoDecoder]] in the
    * same partition-batched Dataset path as [[decodeFeatures]] (single
    * logical plan, AQE-friendly, no RDD round-trip). Null struct for
    * payloads ImageIO cannot decode. The [[imageDimensions]] header parse
    * and this decode must agree on width/height for every canonical file —
    * MultimodalSpec pins that cross-check on real encoded fixtures. */
  def imagePixelStats(df: DataFrame, binCol: String, lumaBins: Int = 8,
      outCol: String = "pixel_stats",
      maxPixels: Long = ImageIoDecoder.DefaultMaxPixels): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val statsType = StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false),
      StructField("luma_hist", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, statsType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val decoder = new ImageIoDecoder(lumaBins, maxPixels)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val f = decoder.decode(bytes)
        val stats = if (f == null) null else Row(
          f(0).toInt, f(1).toInt, f(2).toDouble, f(3).toDouble, f(4).toDouble,
          (5 until f.length).map(i => f(i).toDouble))
        Row.fromSeq(row.toSeq :+ stats)
      }
    }(enc)
  }

  /** Corruption/consistency screen for image payloads: the byte-arithmetic
    * header parse ([[imageDimensions]]) CROSS-CHECKED against the real
    * pixel decode ([[ImageIoDecoder]]) per row. Appends `outCol:
    * struct<status:string, header_format:string, header_w:int,
    * header_h:int, decoded_w:int, decoded_h:int>` where status is
    *
    *  - 'ok'            — both paths ran and agree on dimensions;
    *  - 'dims_mismatch' — both ran and DISAGREE (a lying or spliced
    *                      container — the alarm value a curation run
    *                      quarantines);
    *  - 'header_only'   — the signature parsed but the decode failed
    *                      (truncated payload, a format the JVM has no
    *                      reader for, e.g. WEBP, or declared dimensions
    *                      past the decoder's decompression-bomb bound);
    *  - 'decode_only'   — no known signature yet ImageIO decoded it
    *                      (formats outside the header parser's set, e.g.
    *                      WBMP);
    *  - 'undecodable'   — neither path recognizes the bytes.
    *
    * 100 TB shape: [[imagePixelStats]]'s partition-batched decode pass
    * plus codegen'd header expressions — one corpus scan, no shuffle;
    * group the statuses downstream for the corpus report. */
  def imageDecodeAudit(df: DataFrame, binCol: String,
      outCol: String = "decode_audit"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    (Seq("__mm_pix", "__mm_hdr") intersect df.columns.toSeq)
      .foreach(c => throw new IllegalArgumentException(
        s"column name '$c' is reserved by imageDecodeAudit"))
    val withPix = imagePixelStats(df, binCol, lumaBins = 1, outCol = "__mm_pix")
    val bin = col(s"`${binCol.replace("`", "``")}`")
    val hdr = imageDimensions(bin)
    val pix = col("__mm_pix")
    withPix
      .withColumn("__mm_hdr", hdr)
      .withColumn(outCol, struct(
        when(col("__mm_hdr").isNull && pix.isNull, lit("undecodable"))
          .when(col("__mm_hdr").isNull, lit("decode_only"))
          .when(pix.isNull, lit("header_only"))
          .when(col("__mm_hdr.width") === pix.getField("width") &&
            col("__mm_hdr.height") === pix.getField("height"), lit("ok"))
          .otherwise(lit("dims_mismatch")).as("status"),
        col("__mm_hdr.format").as("header_format"),
        col("__mm_hdr.width").as("header_w"),
        col("__mm_hdr.height").as("header_h"),
        pix.getField("width").as("decoded_w"),
        pix.getField("height").as("decoded_h")))
      .drop("__mm_pix", "__mm_hdr")
  }

  /** REAL WAV/PCM sample decode — pure byte arithmetic over the canonical
    * RIFF layout [[audioMeta]] already validates (16-byte PCM "fmt " chunk,
    * "data" directly after; format code 1 = integer PCM, 8- or 16-bit).
    * Appends `outCol: struct<n_frames:bigint, duration_s:double,
    * rms:double, peak:double, clip_rate:double>` where samples are
    * normalized to [-1, 1] full scale (16-bit: s/32768 signed LE; 8-bit:
    * (s-128)/128 unsigned — the WAV spec's two integer encodings), `rms`
    * is the root-mean-square over ALL channels interleaved, `peak` is
    * max |s|, and `clip_rate` is the fraction of samples pinned at a
    * digital rail (16-bit: 32767 / -32768; 8-bit: 0 / 255). A header
    * shorter than 44 bytes, a non-canonical layout, or a non-PCM format
    * code returns a null struct — the same fall-through contract as
    * every header parser here; a data chunk DECLARING more bytes than
    * the payload carries (a truncated file) is clamped to the bytes
    * present and stats cover the partial payload (truncation loses
    * samples, it does not invalidate the ones on disk). Runs in
    * [[decodeFeatures]]'s partition-batched Dataset path: one
    * sequential pass per payload, O(1) extra memory per row. */
  def wavSampleStats(df: DataFrame, binCol: String,
      outCol: String = "audio_stats"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val statsType = StructType(Seq(
      StructField("n_frames", LongType, nullable = false),
      StructField("duration_s", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("peak", DoubleType, nullable = false),
      StructField("clip_rate", DoubleType, nullable = false)))
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, statsType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        Row.fromSeq(row.toSeq :+ decodeWavStats(bytes))
      }
    }(enc)
  }

  /** Single-pass PCM decode for [[wavSampleStats]]; null on anything
    * non-canonical, over-declared data lengths clamped to the bytes
    * present (see [[wavSampleStats]]). Package-private for direct spec
    * coverage. */
  private[graft] def decodeWavStats(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 44) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
      (u8(i + 3).toLong << 24)
    val canonical = bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E' && bytes(12) == 'f' && bytes(13) == 'm' && bytes(14) == 't' &&
      bytes(15) == ' ' && le32(16) == 16L && bytes(36) == 'd' && bytes(37) == 'a' &&
      bytes(38) == 't' && bytes(39) == 'a'
    if (!canonical) return null
    val fmtCode = le16(20)
    val channels = le16(22)
    val sampleRate = le32(24)
    val blockAlign = le16(32)
    val bits = le16(34)
    val dataLen = math.min(le32(40), (bytes.length - 44).toLong)
    if (fmtCode != 1 || channels <= 0 || sampleRate <= 0 || blockAlign <= 0 ||
        (bits != 8 && bits != 16)) return null
    val bytesPerSample = bits / 8
    if (blockAlign != channels * bytesPerSample) return null
    val nSamples = dataLen / bytesPerSample
    val nFrames = dataLen / blockAlign
    if (nSamples == 0L) return Row(0L, 0.0, 0.0, 0.0, 0.0)
    var sumSq = 0.0
    var peak = 0.0
    var clipped = 0L
    var i = 0L
    while (i < nSamples) {
      val off = 44 + (i * bytesPerSample).toInt
      val norm = if (bits == 16) {
        val s = (le16(off) << 16) >> 16 // sign-extend LE int16
        if (s == 32767 || s == -32768) clipped += 1L
        s / 32768.0
      } else {
        val s = u8(off)
        if (s == 0 || s == 255) clipped += 1L
        (s - 128) / 128.0
      }
      sumSq += norm * norm
      val a = math.abs(norm)
      if (a > peak) peak = a
      i += 1L
    }
    Row(nFrames, nFrames.toDouble / sampleRate,
      math.sqrt(sumSq / nSamples), peak, clipped.toDouble / nSamples)
  }
}
