package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata, decode/feature-extract/frame-sample as partition-wise operators.
  *
  * The Spark-side shape is real and tested — schemas, batch iteration (`mapPartitions`
  * over an explicit row iterator = the Scala analog of `mapInPandas` batch processing),
  * partition sizing — while the codec itself is a clearly-marked DETERMINISTIC STUB
  * (`decodeStub`): the container has no image/audio libraries, so the stub derives
  * plausible metadata/features from the payload bytes reproducibly. Swapping in a real
  * codec changes only the stub body; every schema and operator contract stays.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType)))

  /** ===== STUB ===== deterministic fake decode: metadata derived from payload bytes.
    * A real implementation calls the codec here (and only here).
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
        Row.fromSeq(r.toSeq :+ decodeStub(r.getAs[Array[Byte]](idx)))
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
        Row.fromSeq(r.toSeq :+ featureStub(r.getAs[Array[Byte]](idx), dim).toSeq)
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
        val out = resizeStub(r.getAs[Array[Byte]](idx), w, h)
        Row.fromSeq(r.toSeq :+ out :+ w :+ h)
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
