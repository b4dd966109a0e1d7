package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.FeatureType

/** Display decoding — the `RetrieveDecodedResult` surface (SURVEY F8):
  * the reference decodes stored bytes to display strings per data type
  * (`go-sdk/pkg/datatypeconverter/typeconverter/tyeconverter.go:13-329`,
  * one converter per each of the 30 types). On Spark the bytes layer
  * does not exist, so decode is a deterministic string rendering per
  * logical type.
  *
  * Floats render through DECIMAL(30,6) so the text form is identical
  * across engines (raw double→string formatting differs between JVM
  * and C-family printf). Vectors render elementwise, comma-joined.
  */
object Decode {

  /** Decode one column to its display string by feature type. */
  def display(c: Column, t: FeatureType): Column = t match {
    case FeatureType.FP32 | FeatureType.FP64 |
         FeatureType.FP16 | FeatureType.FP8E4M3 | FeatureType.FP8E5M2 =>
      c.cast("decimal(30,6)").cast("string")
    case FeatureType.Bool => c.cast("string")
    case FeatureType.Str  => c.cast("string")
    case _                => c.cast("string") // integral family
  }

  /** Decode a vector column elementwise → "v1,v2,…". */
  def displayVector(c: Column, elem: FeatureType): Column =
    concat_ws(",", transform(c, e => display(e, elem)))
}
