package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd SimHash / MinHash signature expressions over word/shingle
  * arrays (SURVEY north-star dedup ops). One static-kernel call per row
  * ([[graft.functions.TextHashKernels]]) replaces the interpreted
  * aggregate/zip_with vote loop and the per-seed transform+array_min
  * chain — semantics identical to the column forms and the DuckDB
  * oracles (same md5-derived 32-bit hash, same affine constants).
  */
case class SimHashText(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextHashKernels.simhash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.simhash($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SimHashText =
    copy(child = c)
}

/** Winnowing fingerprint over pre-normalized text (the
  * [[graft.functions.TextHashKernels.winnow]] deque kernel): child is
  * evaluated once per row, so the normalization regex never re-runs
  * inside a per-element lambda. */
case class WinnowText(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextHashKernels.winnow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowText =
    copy(child = c)
}

case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    graft.functions.TextHashKernels.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData $res =
      |  graft.functions.TextHashKernels.minhashSig($c, $k);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Content-defined-chunking cut positions over raw text
  * ([[graft.functions.TextHashKernels.cdcCuts]]): one digest per
  * char window instead of the interpreted per-character HOF chain —
  * the hot inner loop of [[graft.operators.Dedup.cdcChunks]]. */
case class CdcCuts(child: Expression, w: Int, divisor: Int, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextHashKernels.cdcCuts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      w, divisor, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.cdcCuts($c, $w, $divisor, $seed)")
  override protected def withNewChildInternal(c: Expression): CdcCuts =
    copy(child = c)
}

/** 60-bit token-window hashes over pre-normalized text
  * ([[graft.functions.TextHashKernels.wordWindowHash60]]): one digest
  * per window over zero-copy byte slices — the hot inner loop of
  * substring-duplicate detection ([[graft.operators.Dedup.duplicateSpans]]). */
case class WordWindowHash60(child: Expression, l: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextHashKernels.wordWindowHash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], l)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.wordWindowHash60($c, $l)")
  override protected def withNewChildInternal(c: Expression): WordWindowHash60 =
    copy(child = c)
}
