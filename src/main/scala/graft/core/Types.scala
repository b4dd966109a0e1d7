package graft.core

import org.apache.spark.sql.types._

/** The reference's 30-way type system (15 scalar + 15 vector), mapped to
  * Spark types.
  *
  * Mirrors `online-feature-store/internal/types/data_type.go:9-41` in the
  * reference. FP8/FP16 have no Spark storage type: they are carried as
  * FloatType and reproduced semantically by the quantize expressions in
  * [[graft.functions.Quantize]] (round-trip through the reduced
  * precision). Unsigned ints map to the next wider signed type; uint64
  * maps to DecimalType(20,0) to keep the full range.
  */
sealed abstract class FeatureType(
    val name: String,
    val sparkType: DataType,
    val isVector: Boolean) extends Serializable

object FeatureType {
  // scalar
  case object FP8E5M2  extends FeatureType("FP8E5M2", FloatType, false)
  case object FP8E4M3  extends FeatureType("FP8E4M3", FloatType, false)
  case object FP16     extends FeatureType("FP16", FloatType, false)
  case object FP32     extends FeatureType("FP32", FloatType, false)
  case object FP64     extends FeatureType("FP64", DoubleType, false)
  case object Int8     extends FeatureType("Int8", ByteType, false)
  case object Int16    extends FeatureType("Int16", ShortType, false)
  case object Int32    extends FeatureType("Int32", IntegerType, false)
  case object Int64    extends FeatureType("Int64", LongType, false)
  case object Uint8    extends FeatureType("Uint8", ShortType, false)
  case object Uint16   extends FeatureType("Uint16", IntegerType, false)
  case object Uint32   extends FeatureType("Uint32", LongType, false)
  case object Uint64   extends FeatureType("Uint64", DecimalType(20, 0), false)
  case object Str      extends FeatureType("String", StringType, false)
  case object Bool     extends FeatureType("Bool", BooleanType, false)
  // vector (fixed length per feature, FeatureDef.vectorLength)
  case object FP8E5M2Vector extends FeatureType("FP8E5M2Vector", ArrayType(FloatType), true)
  case object FP8E4M3Vector extends FeatureType("FP8E4M3Vector", ArrayType(FloatType), true)
  case object FP16Vector    extends FeatureType("FP16Vector", ArrayType(FloatType), true)
  case object FP32Vector    extends FeatureType("FP32Vector", ArrayType(FloatType), true)
  case object FP64Vector    extends FeatureType("FP64Vector", ArrayType(DoubleType), true)
  case object Int8Vector    extends FeatureType("Int8Vector", ArrayType(ByteType), true)
  case object Int16Vector   extends FeatureType("Int16Vector", ArrayType(ShortType), true)
  case object Int32Vector   extends FeatureType("Int32Vector", ArrayType(IntegerType), true)
  case object Int64Vector   extends FeatureType("Int64Vector", ArrayType(LongType), true)
  case object Uint8Vector   extends FeatureType("Uint8Vector", ArrayType(ShortType), true)
  case object Uint16Vector  extends FeatureType("Uint16Vector", ArrayType(IntegerType), true)
  case object Uint32Vector  extends FeatureType("Uint32Vector", ArrayType(LongType), true)
  case object Uint64Vector  extends FeatureType("Uint64Vector", ArrayType(DecimalType(20, 0)), true)
  case object StrVector     extends FeatureType("StringVector", ArrayType(StringType), true)
  case object BoolVector    extends FeatureType("BoolVector", ArrayType(BooleanType), true)

  val all: Seq[FeatureType] = Seq(
    FP8E5M2, FP8E4M3, FP16, FP32, FP64, Int8, Int16, Int32, Int64,
    Uint8, Uint16, Uint32, Uint64, Str, Bool,
    FP8E5M2Vector, FP8E4M3Vector, FP16Vector, FP32Vector, FP64Vector,
    Int8Vector, Int16Vector, Int32Vector, Int64Vector,
    Uint8Vector, Uint16Vector, Uint32Vector, Uint64Vector,
    StrVector, BoolVector)

  private val byName: Map[String, FeatureType] =
    all.map(t => t.name.toLowerCase -> t).toMap

  /** Parse `DataTypeFP16` / `FP16` / `fp16` style names (used by the
    * `feature@DataType` quantized-projection suffix, SURVEY P2). */
  def parse(s: String): Option[FeatureType] = {
    val k = s.stripPrefix("DataType").stripPrefix("datatype").toLowerCase
    byName.get(k)
  }
}
