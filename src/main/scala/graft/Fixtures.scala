package graft

import graft.core._

/** Registry fixtures mapping the TPC-H-ish test tables onto the
  * reference's entity/feature-group model (FIXTURES.md §1/§5): customer
  * and order rows act as feature-group rows, custkey/orderkey as entity
  * keys. Defaults follow the reference's per-feature default-value
  * semantics (`FeatureMeta.DefaultValuesInBytes`, models.go:75).
  */
object Fixtures {

  val customerProfile: FeatureGroupDef = FeatureGroupDef(
    label = "profile", id = 1,
    features = Seq(
      FeatureDef("c_name", FeatureType.Str, default = "N/A"),
      FeatureDef("c_acctbal", FeatureType.FP64, default = 0.0),
      FeatureDef("c_mktsegment", FeatureType.Str, default = "NONE")))

  val customerOrderStats: FeatureGroupDef = FeatureGroupDef(
    label = "order_stats", id = 2,
    features = Seq(
      FeatureDef("order_cnt", FeatureType.Int64, default = 0L),
      FeatureDef("total_spend", FeatureType.FP64, default = 0.0)))

  /** 400-day TTL on order facts; written_at = o_orderdate. */
  val orderFacts: FeatureGroupDef = FeatureGroupDef(
    label = "order_facts", id = 3,
    features = Seq(
      FeatureDef("o_totalprice", FeatureType.FP64, default = 0.0),
      FeatureDef("o_orderpriority", FeatureType.Str, default = "NONE")),
    ttlSeconds = 400L * 86400)

  val partFacts: FeatureGroupDef = FeatureGroupDef(
    label = "part_facts", id = 4,
    features = Seq(
      FeatureDef("p_retailprice", FeatureType.FP64, default = 0.0)))

  /** Vector feature group: fixed-length FP32 embedding with an all-zero
    * default (FeatureMeta.VectorLength semantics, models.go:77). */
  val embeddingFg: FeatureGroupDef = FeatureGroupDef(
    label = "embedding_fg", id = 5,
    features = Seq(
      FeatureDef("embedding", FeatureType.FP32Vector,
        default = Seq.fill(64)(0.0f), vectorLength = 64)))

  /** Evolving-schema variant of [[customerProfile]]: the FG is on
    * schema version 3; `c_acctbal` was added in v2 and `c_mktsegment`
    * in v3. A row written under an older version resolves the missing
    * features to the active version's defaults
    * (`retrieve.go:833-858` — seq == -1 in the written version →
    * active-version default). */
  val customerProfileVersioned: FeatureGroupDef = FeatureGroupDef(
    label = "profile_versioned", id = 6,
    features = Seq(
      FeatureDef("c_name", FeatureType.Str, default = "N/A"),
      FeatureDef("c_acctbal", FeatureType.FP64, default = 0.0,
        sinceVersion = 2),
      FeatureDef("c_mktsegment", FeatureType.Str, default = "NONE",
        sinceVersion = 3)),
    activeVersion = 3)

  val customerEntity: EntityDef = EntityDef(
    "customer", Seq("c_custkey"), Seq(customerProfile, customerOrderStats))

  val orderEntity: EntityDef = EntityDef(
    "order", Seq("o_orderkey"), Seq(orderFacts))

  val registry: Registry = Registry(customerEntity, orderEntity)
}
