package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Catalyst expressions for quantized projections (SURVEY P2/F7/U2).
  *
  * Native `UnaryExpression`s with `doGenCode` so the quantize stays
  * inside whole-stage codegen (one static-method call per row, no UDF
  * serialization). Vector features quantize via the `transform` HOF
  * elementwise over the array.
  */
abstract class QuantizeBase extends UnaryExpression {
  override def dataType: DataType = FloatType
  protected def fnName: String // static method on Minifloat
  override protected def nullSafeEval(v: Any): Any = fnName match {
    case "fp16"    => Minifloat.fp16(v.asInstanceOf[Double])
    case "fp8e4m3" => Minifloat.fp8e4m3(v.asInstanceOf[Double])
    case "fp8e5m2" => Minifloat.fp8e5m2(v.asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Minifloat.$fnName($c)")
}

case class QuantizeFp16(child: Expression) extends QuantizeBase {
  override protected def fnName = "fp16"
  override protected def withNewChildInternal(c: Expression): QuantizeFp16 = copy(c)
}
case class QuantizeFp8E4M3(child: Expression) extends QuantizeBase {
  override protected def fnName = "fp8e4m3"
  override protected def withNewChildInternal(c: Expression): QuantizeFp8E4M3 = copy(c)
}
case class QuantizeFp8E5M2(child: Expression) extends QuantizeBase {
  override protected def fnName = "fp8e5m2"
  override protected def withNewChildInternal(c: Expression): QuantizeFp8E5M2 = copy(c)
}

object Quantize {
  private def dbl(c: Column): Expression =
    Cast(ColumnBridge.expression(c), DoubleType)

  def fp16(c: Column): Column    = ColumnBridge.column(QuantizeFp16(dbl(c)))
  def fp8e4m3(c: Column): Column = ColumnBridge.column(QuantizeFp8E4M3(dbl(c)))
  def fp8e5m2(c: Column): Column = ColumnBridge.column(QuantizeFp8E5M2(dbl(c)))

  /** Elementwise quantization of an array column. */
  def fp16Vec(c: Column): Column    = transform(c, fp16(_))
  def fp8e4m3Vec(c: Column): Column = transform(c, fp8e4m3(_))
  def fp8e5m2Vec(c: Column): Column = transform(c, fp8e5m2(_))
}
