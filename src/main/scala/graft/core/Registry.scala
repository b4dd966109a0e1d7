package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, lit}

/** Registry model: entities → feature groups → features.
  *
  * Mirrors the reference's registry shapes
  * (`online-feature-store/internal/config/models.go:27-78`: Entity,
  * FeatureGroup, FeatureMeta) minus the storage/caching knobs that have
  * no Spark meaning (store ids, cache flags, layout versions). Schema
  * versioning keeps the reference's read-side rule: a feature missing
  * from the version a row was written under resolves to the active
  * version's default (`internal/handler/feature/retrieve.go:819-858`).
  */
final case class FeatureDef(
    name: String,
    dtype: FeatureType,
    default: Any = null,
    stringLength: Int = 0,
    vectorLength: Int = 0,
    sinceVersion: Int = 1) {
  /** Default value as a literal Column of the feature's Spark type. */
  def defaultLit: Column =
    (if (default == null) lit(null) else default match {
      case s: Seq[_] => array(s.map(v => lit(v)): _*)
      case v         => lit(v)
    }).cast(dtype.sparkType)
}

final case class FeatureGroupDef(
    label: String,
    id: Int,
    features: Seq[FeatureDef],
    ttlSeconds: Long = 0L,          // 0 = no expiry
    activeVersion: Int = 1) {
  def feature(name: String): FeatureDef =
    features.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"feature group '$label' has no feature '$name'"))
}

final case class EntityDef(
    label: String,
    keys: Seq[String],              // ordered composite PK
    featureGroups: Seq[FeatureGroupDef]) {
  def group(label: String): FeatureGroupDef =
    featureGroups.find(_.label == label)
      .getOrElse(throw new IllegalArgumentException(
        s"entity '${this.label}' has no feature group '$label'"))
}

/** In-memory catalog keyed by entity label (the reference keeps this in
  * MySQL/etcd via horizon; the engine needs only the lookup surface). */
final case class Registry(entities: Map[String, EntityDef]) {
  def entity(label: String): EntityDef =
    entities.getOrElse(label,
      throw new IllegalArgumentException(s"unknown entity '$label'"))
}

object Registry {
  def apply(entities: EntityDef*): Registry =
    Registry(entities.map(e => e.label -> e).toMap)
}
