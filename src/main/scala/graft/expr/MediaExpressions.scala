package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd media-header expressions over `binary` columns
  * ([[graft.functions.MediaHeaders]]): container metadata without any
  * codec dependency, null for unrecognized/truncated bytes. */
case class ImageDims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    graft.functions.MediaHeaders.imageDims(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("dims")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.InternalRow $res =
      |  graft.functions.MediaHeaders.imageDims($c);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): ImageDims =
    copy(child = c)
}

case class WavMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    graft.functions.MediaHeaders.wavMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("meta")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.InternalRow $res =
      |  graft.functions.MediaHeaders.wavMeta($c);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): WavMeta =
    copy(child = c)
}

/** Unicode NFC normalization (java.text.Normalizer — the JVM's
  * canonical composition, matching DuckDB's `nfc_normalize`). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.MediaHeaders.nfc(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaHeaders.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Deflate compression ratio of a text's UTF-8 bytes (the Gopher/
  * CCNet quality signal: highly repetitive text compresses far below
  * natural prose). Deterministic for a fixed JVM zlib level. */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.MediaHeaders.deflateRatio(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaHeaders.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): CompressionRatio =
    copy(child = c)
}

/** Row-local dense mat-vec against a literal row-major d×d matrix
  * (the broadcast-back step of [[graft.operators.PcaRotate]]). */
case class MatVecLit(child: Expression, mat: Array[Double], d: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.VectorKernels.matVec(mat, d,
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotmat", mat, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.matVec($ref, $d, $c)")
  }
  override protected def withNewChildInternal(c: Expression): MatVecLit =
    copy(child = c)
}
