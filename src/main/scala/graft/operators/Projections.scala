package graft.operators

import org.apache.spark.sql.Column
import graft.core.{FeatureGroupDef, FeatureType}
import graft.functions.Quantize

/** Parsed feature projection, optionally quantized (SURVEY P1/P2).
  *
  * Reproduces the reference's `feature@DataTypeX` request syntax
  * (`ParseFeatureLabel`, `online-feature-store/internal/handler/feature/
  * retrieve.go:1071-1090`): a suffix asks for on-the-fly down-conversion
  * of the stored value. FP16/FP8 targets round-trip through the reduced
  * precision via the [[graft.functions.Quantize]] expressions; plain
  * width changes are Spark casts.
  */
final case class Projection(
    source: String,
    outName: String,
    default: Column,
    target: Option[FeatureType],
    sinceVersion: Int = 1) {

  def quantize(c: Column): Column = target match {
    case None => c
    case Some(t) => t match {
      case FeatureType.FP16          => Quantize.fp16(c)
      case FeatureType.FP8E4M3       => Quantize.fp8e4m3(c)
      case FeatureType.FP8E5M2       => Quantize.fp8e5m2(c)
      case FeatureType.FP16Vector    => Quantize.fp16Vec(c)
      case FeatureType.FP8E4M3Vector => Quantize.fp8e4m3Vec(c)
      case FeatureType.FP8E5M2Vector => Quantize.fp8e5m2Vec(c)
      case other                     => c.cast(other.sparkType)
    }
  }
}

object Projections {
  /** Parse `name` or `name@DataTypeX`; defaults come from the registry. */
  def parse(fg: FeatureGroupDef, request: String): Projection =
    request.split("@") match {
      case Array(name) =>
        val f = fg.feature(name)
        Projection(name, name, f.defaultLit, None, f.sinceVersion)
      case Array(name, dt) =>
        val t = FeatureType.parse(dt).getOrElse(
          throw new IllegalArgumentException(s"unknown data type suffix '$dt'"))
        val f = fg.feature(name)
        Projection(name, s"${name}__${t.name.toLowerCase}",
          f.defaultLit, Some(t), f.sinceVersion)
      case _ =>
        throw new IllegalArgumentException(s"bad feature request '$request'")
    }
}
