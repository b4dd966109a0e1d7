package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped per-partition decoding.
  *
  * The actual media codecs are NOT in this container, so the decode
  * kernel is a clearly-marked deterministic STUB — but everything
  * Spark-side is real and tested: the binary column representation,
  * the mapPartitions batch iteration (the JVM analogue of a Pandas-UDF
  * batch loop: rows are processed in bounded groups so a real decoder
  * could amortize codec init per batch), the output schema, and the
  * partitioning behavior.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))

  /** STUB decode kernel — deterministic fake standing in for a real
    * image decoder (swap body for e.g. javax.imageio / ffmpeg JNI).
    * Derives metadata purely from the bytes so tests and oracles can
    * reproduce it. */
  private[operators] def decodeStub(bytes: Array[Byte]): Row = {
    val b0 = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    val fmt = (b0 % 3) match {
      case 0 => "png"; case 1 => "jpeg"; case 2 => "webp"
    }
    Row(fmt, 1 + b0 % 64, 1 + bytes.length % 64, bytes.length)
  }

  /** Decode per-row media metadata with batch-shaped iteration.
    *
    * @param batchSize rows per decode batch (amortizes per-batch codec
    *                  setup in a real decoder, mirrors Pandas-UDF batch
    *                  semantics)
    */
  def decodeMeta(df: DataFrame, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", metaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real decoder: init codec once per batch here
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val meta = if (bytes == null) null else decodeStub(bytes)
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }
  }

  /** STUB feature extraction: binary → fixed-dim float embedding via a
    * deterministic byte-rolling hash (stand-in for a vision encoder).
    * Pure column expression — stays in codegen. */
  def featurizeStub(bin: org.apache.spark.sql.Column, dim: Int = 8): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (conv(substring(md5(concat(bin, i.cast("string").cast("binary"))), 1, 6), 16, 10)
        .cast("double") / lit(16777215.0)))

  /** REAL (not stubbed) image dimensions from PNG/JPEG/GIF container
    * headers — codec-free byte parsing, codegen'd
    * ([[graft.expr.ImageDims]]); null for unrecognized bytes. */
  def imageDims(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expr.ImageDims(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(bin)))

  /** REAL WAV audio metadata (channels, sample rate, bit depth) from
    * the RIFF header — codec-free ([[graft.expr.WavMeta]]). */
  def wavMeta(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expr.WavMeta(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(bin)))

  /** Frame sampling for a video-like `array<binary>` column: every
    * `stride`-th frame (SURVEY's frame-sample op). */
  def frameSample(frames: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    filter(frames, (_, i) => i % stride === 0)
}
