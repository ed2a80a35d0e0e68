package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata, decode/feature-extract/frame-sample as partition-wise operators.
  *
  * The Spark-side shape is real and tested — schemas, batch iteration (`mapPartitions`
  * over an explicit row iterator = the Scala analog of `mapInPandas` batch processing),
  * partition sizing. IMAGES decode for real through the JDK's own ImageIO
  * (PNG/JPEG/GIF/BMP — no added dependencies): header metadata, bilinear resize with
  * PNG re-encode, and luminance-grid features. Payloads the JDK cannot decode
  * (audio/video — no codec libs in this container) fall back to the clearly-marked
  * DETERMINISTIC STUBs, which derive plausible metadata/features from the payload
  * bytes reproducibly; swapping in a real A/V codec changes only the stub bodies.
  */
object Multimodal {

  // ImageIO's default createImageInputStream backs every probe with a DISK
  // cache file (create+write+delete in java.io.tmpdir PER ROW) — pure
  // overhead for in-memory byte[] payloads. Memory-cached streams decode
  // identically. (guide §1.2: fix per-task work once the job shape is right)
  // The JVM-global mutation is DELIBERATE and invoked lazily at the top of
  // each decode helper (r16 advice: not as a hidden side effect of object
  // initialization that only lands if/when this object happens to load first).
  private lazy val imageIoInit: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Cheap magic-byte sniff for the formats the JDK's ImageIO can actually
    * read (JPEG/PNG/GIF/BMP/TIFF/WBMP): constructing an ImageInputStream and
    * walking the reader registry per row costs ~100 µs even when no reader
    * matches, which at corpus scale is the whole metadata pass. Payloads
    * without a known signature return false and take the same None path the
    * registry walk would have taken — byte-identical results. WBMP has no
    * magic; its header starts 0x00 0x00, matched exactly.
    */
  private def imageMagic(b: Array[Byte]): Boolean =
    (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) || // JPEG
    (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||  // PNG
    (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||          // GIF
    (b(0) == 'B' && b(1) == 'M') ||                                        // BMP
    (b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a && b(3) == 0) ||           // TIFF LE
    (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a) ||           // TIFF BE
    (b(0) == 0 && b(1) == 0)                                               // WBMP
  private def audioMagic(b: Array[Byte]): Boolean =
    (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||          // WAV
    (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||          // AIFF
    (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')             // AU

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType)))

  /** REAL image decode via the JDK's own ImageIO (PNG/JPEG/GIF/BMP — zero added
    * dependencies): metadata comes from the image header without rendering
    * pixels. Non-image payloads (and the audio/video formats the JDK has no
    * reader for) return None and the caller falls back to the deterministic
    * stub, so the operator contract covers every payload.
    */
  def decodeReal(bytes: Array[Byte]): Option[Row] = try {
    imageIoInit
    if (bytes == null || bytes.length < 8) None
    else if (!imageMagic(bytes)) None // same None the reader-registry walk returns
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some(Row(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
              0L, bytes.length.toLong))
          } finally r.dispose()
        }
      } finally iis.close()
    }
  } catch { case _: Exception => None }

  /** REAL resize: ImageIO decode → bilinear scale → PNG re-encode (the JDK PNG
    * writer is deterministic for a given JDK). None for non-image payloads.
    */
  def resizeReal(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = try {
    imageIoInit
    if (bytes == null || bytes.length < 8 || !imageMagic(bytes)) return None
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  } catch { case _: Exception => None }

  /** REAL features: decode, scale to a luminance grid, row-major floats in
    * [-1, 1] — the classic tiny-thumbnail embedding. None for non-images.
    */
  def featuresReal(bytes: Array[Byte], dim: Int): Option[Array[Float]] = try {
    imageIoInit
    if (bytes == null || bytes.length < 8 || !imageMagic(bytes)) return None
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val side = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
      val thumb = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = thumb.createGraphics()
      g.drawImage(img, 0, 0, side, side, null)
      g.dispose()
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        val rgb = thumb.getRGB(d % side, d / side)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        out(d) = lum.toFloat / 127.5f - 1.0f
        d += 1
      }
      Some(out)
    }
  } catch { case _: Exception => None }

  /** REAL audio metadata via the JDK's own javax.sound.sampled (WAV/AIFF/AU —
    * zero added dependencies): container format and duration from the header,
    * no sample decode. `duration_ms` = frameLength / frameRate; unknown frame
    * counts (streamed headers) report 0 rather than guessing. None for
    * payloads the JDK has no audio reader for — compressed audio (MP3/OGG)
    * and all video stay on the deterministic stub (documented exclusion:
    * the JDK ships no codecs for them).
    */
  def decodeAudioReal(bytes: Array[Byte]): Option[Row] = try {
    if (bytes == null || bytes.length < 12) None
    else if (!audioMagic(bytes)) None // same None getAudioFileFormat's throw becomes
    else {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      val durMs =
        if (aff.getFrameLength > 0 && fmt.getFrameRate > 0)
          (aff.getFrameLength * 1000.0 / fmt.getFrameRate).toLong
        else 0L
      Some(Row(aff.getType.toString.toLowerCase, 0, 0, durMs, bytes.length.toLong))
    }
  } catch { case _: Exception => None }

  /** REAL video CONTAINER metadata — no codecs needed: MP4/ISO-BMFF box headers
    * (`moov/mvhd` duration+timescale, `trak/tkhd` 16.16-fixed track dims) and
    * WebM/Matroska EBML headers (`Info/TimecodeScale+Duration`,
    * `Tracks/TrackEntry/Video/PixelWidth+PixelHeight`). Frame DECODE still
    * requires codecs the JDK does not ship — that stays the documented stub —
    * but format/duration/dimensions are pure header reads, exactly what a
    * metadata pass over a 100 TB multimodal corpus extracts.
    */
  def decodeVideoReal(bytes: Array[Byte]): Option[Row] = try {
    if (bytes == null || bytes.length < 12) None
    else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
      decodeMp4(bytes)
    else if ((bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
             (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
      decodeEbml(bytes)
    else None
  } catch { case _: Exception => None }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** ISO BMFF: walk the box tree for mvhd (duration) and the first tkhd with
    * nonzero dims. Handles 64-bit largesize and version-1 time fields.
    */
  private def decodeMp4(b: Array[Byte]): Option[Row] = {
    var durMs = 0L
    var w = 0; var h = 0
    def walk(from: Long, to: Long): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size0 = be32(b, off.toInt)
        val typ = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        val (size, hdr) =
          if (size0 == 1 && off + 16 <= to) (be64(b, off.toInt + 8), 16)
          else if (size0 == 0) (to - off, 8)
          else (size0, 8)
        if (size < hdr) return
        val end = math.min(off + size, to)
        typ match {
          case "moov" | "trak" => walk(off + hdr, end)
          case "mvhd" if durMs == 0L =>
            val p = (off + hdr).toInt
            val ver = b(p) & 0xff
            val (ts, dur) =
              if (ver == 1) (be32(b, p + 20), be64(b, p + 24))
              else (be32(b, p + 12), be32(b, p + 16))
            if (ts > 0) durMs = dur * 1000L / ts
          case "tkhd" if w == 0 =>
            val p = (off + hdr).toInt
            val ver = b(p) & 0xff
            val dimOff = if (ver == 1) 88 else 76
            if (p + dimOff + 8 <= end) {
              w = (be32(b, p + dimOff) >> 16).toInt
              h = (be32(b, p + dimOff + 4) >> 16).toInt
            }
          case _ => ()
        }
        off = end
      }
    }
    walk(0L, b.length.toLong)
    if (durMs == 0L && w == 0) None
    else Some(Row("mp4", w, h, durMs, b.length.toLong))
  }

  /** Matroska/WebM EBML: variable-length IDs/sizes; descend the master
    * elements that lead to duration (Segment→Info) and video dims
    * (Segment→Tracks→TrackEntry→Video); skip everything else.
    */
  private def decodeEbml(b: Array[Byte]): Option[Row] = {
    var fmt = "matroska"
    var tcScale = 1000000L // ns per timecode tick (Matroska default)
    var durTicks = 0.0
    var w = 0; var h = 0
    // (value keeping marker for IDs, stripped for sizes; length consumed)
    def vint(off: Int, keepMarker: Boolean): (Long, Int) = {
      val first = b(off) & 0xff
      var len = 1
      var mask = 0x80
      while (len <= 8 && (first & mask) == 0) { len += 1; mask >>= 1 }
      var v = if (keepMarker) first.toLong else (first & (mask - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      (v, len)
    }
    def beN(off: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      v
    }
    val masters = Set(0x18538067L, 0x1549A966L, 0x1654AE6BL, 0xAEL, 0xE0L,
      0x1A45DFA3L)
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off < to && off + 2 <= b.length) {
        val (id, idLen) = vint(off, keepMarker = true)
        val (sz, szLen) = vint(off + idLen, keepMarker = false)
        val p = off + idLen + szLen
        val end = math.min(to.toLong, p + sz).toInt
        if (p > to) return
        id match {
          case m if masters(m) => walk(p, end)
          case 0x4282L => // DocType
            fmt = new String(b, p, (end - p), "ISO-8859-1").trim
          case 0x2AD7B1L => tcScale = beN(p, end - p)
          case 0x4489L => // Duration: 4- or 8-byte float
            durTicks =
              if (end - p == 4) java.lang.Float.intBitsToFloat(beN(p, 4).toInt).toDouble
              else java.lang.Double.longBitsToDouble(beN(p, 8))
          case 0xB0L if w == 0 => w = beN(p, end - p).toInt
          case 0xBAL if h == 0 => h = beN(p, end - p).toInt
          case _ => ()
        }
        off = end
      }
    }
    walk(0, b.length)
    val durMs = (durTicks * tcScale / 1e6).toLong
    if (durMs == 0L && w == 0) None
    else Some(Row(fmt, w, h, durMs, b.length.toLong))
  }

  /** ===== STUB ===== deterministic fake decode: metadata derived from payload bytes.
    * The real-codec paths (decodeReal for images, decodeAudioReal for
    * WAV/AIFF/AU, decodeVideoReal for MP4/WebM container headers) run first;
    * this is the fallback for payloads the JDK cannot decode (compressed
    * audio, codec-level frame data).
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) Row("empty", 0, 0, 0L, 0L)
    else {
      val h = bytes.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
      val fmt = Seq("jpeg", "png", "wav", "mp4")(((h % 4) + 4).toInt % 4)
      Row(fmt, (math.abs(h) % 1920 + 64).toInt, (math.abs(h / 7) % 1080 + 64).toInt,
        math.abs(h / 13) % 600000L, bytes.length.toLong)
    }
  }

  /** ===== STUB ===== deterministic fake feature vector from payload bytes. */
  def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < math.min(bytes.length, 4096)) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 16) % 2000).toFloat / 1000.0f - 1.0f
      d += 1
    }
    out
  }

  /** Attach a binary payload column (driver data has no media files; documents' text
    * bytes stand in so the binary plumbing is exercised end-to-end).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast(BinaryType))

  /** Decode metadata partition-wise: binary column → typed meta struct.
    * Input is spread across the session's cores first: the codec work is
    * per-row-fat and opaque to Catalyst, and a small corpus (or a pruned
    * scan) otherwise runs it on the scan's few file splits — measured 3 tasks
    * on 32 cores for the whole battery's media pass (guide §2.6 idle
    * capacity; spread() is a no-op when the scan is already wide).
    */
  def decodeMeta(df0: DataFrame, binCol: String): DataFrame = {
    val df = graft.engine.DfOps.spread(df0)
    val inSchema = df.schema
    val schema = StructType(inSchema.fields :+ StructField("meta", metaSchema))
    val idx = inSchema.fieldIndex(binCol)
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      val toRow = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(inSchema)
      it.map { ir =>
        val r = toRow(ir).asInstanceOf[Row]
        val b = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeReal(b).orElse(decodeAudioReal(b))
          .orElse(decodeVideoReal(b)).getOrElse(decodeStub(b)))
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Feature extraction: binary column → dense float vector (batch-iterated).
    * Spread like decodeMeta — per-row-fat opaque compute. */
  def extractFeatures(df0: DataFrame, binCol: String, dim: Int = 64): DataFrame = {
    val df = graft.engine.DfOps.spread(df0)
    val inSchema = df.schema
    val schema = StructType(inSchema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val idx = inSchema.fieldIndex(binCol)
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      val toRow = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(inSchema)
      it.map { ir =>
        val r = toRow(ir).asInstanceOf[Row]
        val b = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+
          featuresReal(b, dim).getOrElse(featureStub(b, dim)).toSeq)
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Frame sampling: one row per sampled frame offset (video analog of explode). */
  def frameSample(df: DataFrame, binCol: String, nFrames: Int): DataFrame =
    decodeMeta(df, binCol)
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_offset_ms",
        (col("meta")("duration_ms") * col("frame_idx") / nFrames).cast(LongType))

  /** ===== STUB ===== deterministic fake resize: a real implementation decodes,
    * scales and re-encodes here (and only here). The stub emits a
    * target-dimension-proportional prefix of the payload so output sizes follow
    * the real cost model (bytes ∝ target area, capped by the source).
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) Array.emptyByteArray
    else {
      val outLen = math.max(16, math.min(bytes.length, (w.toLong * h / 64L).toInt))
      java.util.Arrays.copyOf(bytes, outLen)
    }
  }

  /** Resize to (w, h): binary column → resized binary + updated meta dims,
    * batch-iterated partition-wise like the other codec stages.
    */
  def resize(df0: DataFrame, binCol: String, w: Int, h: Int): DataFrame = {
    val df = graft.engine.DfOps.spread(df0)
    val inSchema = df.schema
    val schema = StructType(inSchema.fields :+
      StructField("resized", BinaryType) :+
      StructField("resized_width", IntegerType) :+
      StructField("resized_height", IntegerType))
    val idx = inSchema.fieldIndex(binCol)
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      val toRow = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(inSchema)
      it.map { ir =>
        val r = toRow(ir).asInstanceOf[Row]
        val b = r.getAs[Array[Byte]](idx)
        val out = resizeReal(b, w, h).getOrElse(resizeStub(b, w, h))
        Row.fromSeq(r.toSeq :+ out :+ w :+ h)
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
