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
    if (bytes == null || bytes.length < 8) None
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

  /** ===== STUB ===== deterministic fake decode: metadata derived from payload bytes.
    * The real-codec paths (decodeReal for images, decodeAudioReal for
    * WAV/AIFF/AU) run first; this is the fallback for payloads the JDK cannot
    * decode (compressed audio and video — no codec libs in the JDK).
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

  /** Decode metadata partition-wise: binary column → typed meta struct. */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
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
          .getOrElse(decodeStub(b)))
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Feature extraction: binary column → dense float vector (batch-iterated). */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 64): DataFrame = {
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
  def resize(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame = {
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
