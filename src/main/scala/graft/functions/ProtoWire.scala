package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf wire-format codec for the ingestion surface (SURVEY F15/S7:
  * the reference's Spark push client serializes rows to `persist.Query`
  * protos before the Kafka hop, `py-sdk/spark_feature_push_client/
  * spark_feature_push_client/client.py:47-276`; consumers
  * `proto.Unmarshal` them, `kafka.go:236-240`).
  *
  * Implements the public proto3 wire format (varint, length-delimited,
  * packed little-endian floats) for one persist event:
  *
  * {{{
  * message PersistEvent {
  *   string entity  = 1;
  *   string key     = 2;   // composite key string (F9)
  *   int64  version = 3;
  *   repeated float values = 4;  // packed
  * }
  * }}}
  *
  * Codegen'd expressions; the decoder skips unknown fields by wire
  * type, per proto3 forward-compatibility rules.
  */
object ProtoWire {

  val persistSchema: StructType = StructType(Seq(
    StructField("entity", StringType),
    StructField("key", StringType),
    StructField("version", LongType),
    StructField("values", ArrayType(FloatType, containsNull = false))))

  def protoEncode(entity: Column, key: Column, version: Column,
      values: Column): Column =
    ColumnBridge.column(EncodePersistProto(
      ColumnBridge.expression(entity), ColumnBridge.expression(key),
      ColumnBridge.expression(version),
      ColumnBridge.expression(values.cast("array<float>"))))

  def protoDecode(bin: Column): Column =
    ColumnBridge.column(DecodePersistProto(ColumnBridge.expression(bin)))

  // ---- kernels ----

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def encode(entity: UTF8String, key: UTF8String, version: Long,
      values: ArrayData): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    val eb = entity.getBytes
    out.write(0x0a); writeVarint(out, eb.length.toLong); out.write(eb, 0, eb.length)
    val kb = key.getBytes
    out.write(0x12); writeVarint(out, kb.length.toLong); out.write(kb, 0, kb.length)
    out.write(0x18); writeVarint(out, version)
    val n = values.numElements()
    out.write(0x22); writeVarint(out, 4L * n)
    val bb = ByteBuffer.allocate(4 * n).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { bb.putFloat(values.getFloat(i)); i += 1 }
    out.write(bb.array(), 0, 4 * n)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    var pos = 0
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    var entity: UTF8String = null
    var key: UTF8String = null
    var version = 0L
    var values: ArrayData = new GenericArrayData(Array.empty[Float])
    while (pos < bytes.length) {
      val tag = readVarint()
      val field = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      (field, wt) match {
        case (1, 2) =>
          val len = readVarint().toInt
          entity = UTF8String.fromBytes(bytes, pos, len); pos += len
        case (2, 2) =>
          val len = readVarint().toInt
          key = UTF8String.fromBytes(bytes, pos, len); pos += len
        case (3, 0) => version = readVarint()
        case (4, 2) =>
          val len = readVarint().toInt
          val bb = ByteBuffer.wrap(bytes, pos, len).order(ByteOrder.LITTLE_ENDIAN)
          val fs = new Array[Float](len / 4)
          var i = 0
          while (i < fs.length) { fs(i) = bb.getFloat(); i += 1 }
          values = new GenericArrayData(fs); pos += len
        case (_, 0) => readVarint()          // skip unknown varint
        case (_, 1) => pos += 8              // skip fixed64
        case (_, 2) => pos += readVarint().toInt // skip length-delimited
        case (_, 5) => pos += 4              // skip fixed32
        case _ => pos = bytes.length         // unknown wire type: stop
      }
    }
    InternalRow(entity, key, version, values)
  }
}

case class EncodePersistProto(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, LongType, ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(e: Any, k: Any, v: Any, vs: Any): Any =
    ProtoWire.encode(e.asInstanceOf[UTF8String], k.asInstanceOf[UTF8String],
      v.asInstanceOf[Long], vs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, k, v, vs) =>
      s"graft.functions.ProtoWire.encode($e, $k, $v, $vs)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): EncodePersistProto =
    copy(first = a, second = b, third = c, fourth = d)
}

case class DecodePersistProto(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ProtoWire.persistSchema
  override protected def nullSafeEval(v: Any): Any =
    ProtoWire.decode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ProtoWire.decode($c)")
  override protected def withNewChildInternal(c: Expression): DecodePersistProto =
    copy(child = c)
}
