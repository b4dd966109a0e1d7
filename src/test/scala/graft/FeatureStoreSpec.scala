package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FeatureDef, FeatureGroupDef, FeatureType}
import graft.operators.FeatureStore

class FeatureStoreSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val fg = FeatureGroupDef("f", 1, Seq(
    FeatureDef("v", FeatureType.FP64, default = -1.0),
    FeatureDef("s", FeatureType.Str, default = "D")))

  test("retrieve fills defaults for absent keys and null values (P3/P5)") {
    val table = Seq((1L, 10.0, "a"), (2L, 20.0, null.asInstanceOf[String]))
      .toDF("k", "v", "s")
    val keys = Seq(1L, 2L, 3L).toDF("k")
    val out = FeatureStore.retrieve(keys, table, Seq("k"), fg, Seq("v", "s"))
      .orderBy("k").collect()
    assert(out === Array(Row(1L, 10.0, "a"), Row(2L, 20.0, "D"), Row(3L, -1.0, "D")))
  }

  test("retrieve fans out duplicate request keys (J3)") {
    val table = Seq((1L, 10.0, "a")).toDF("k", "v", "s")
    val keys = Seq(1L, 1L, 9L).toDF("k")
    val out = FeatureStore.retrieve(keys, table, Seq("k"), fg, Seq("v"))
    assert(out.count() === 3)
    assert(out.filter($"k" === 1L).count() === 2)
  }

  test("TTL expiry masks stored values with defaults (P4)") {
    val ttlFg = fg.copy(ttlSeconds = 3600)
    val table = Seq(
      (1L, 10.0, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 20.0, "b", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("k", "v", "s", "written_at")
    val out = FeatureStore.retrieve(
      Seq(1L, 2L).toDF("k"), table, Seq("k"), ttlFg, Seq("v"),
      asOf = Some(lit("2024-01-01 02:00:00").cast("timestamp")))
      .orderBy("k").collect()
    assert(out === Array(Row(1L, -1.0), Row(2L, 20.0))) // 1 expired, 2 live
  }

  test("per-row schema-version resolution: features missing in the " +
      "written version read as active defaults (retrieve.go:819-858)") {
    val vFg = FeatureGroupDef("f", 1, Seq(
      FeatureDef("v", FeatureType.FP64, default = -1.0),               // v1
      FeatureDef("s", FeatureType.Str, default = "D", sinceVersion = 2)), // v2+
      activeVersion = 2)
    // row 1 written under v1 (before `s` existed — its column bytes are
    // stale garbage and must NOT surface); row 2 written under v2
    val table = Seq((1L, 10.0, "stale", 1), (2L, 20.0, "real", 2))
      .toDF("k", "v", "s", "schema_version")
    val out = FeatureStore.retrieve(Seq(1L, 2L).toDF("k"), table,
        Seq("k"), vFg, Seq("v", "s"))
      .orderBy("k").collect()
    assert(out === Array(Row(1L, 10.0, "D"), Row(2L, 20.0, "real")))
    // a table without the version column behaves as before
    val plain = FeatureStore.retrieve(Seq(1L).toDF("k"),
        Seq((1L, 10.0, "a")).toDF("k", "v", "s"), Seq("k"), vFg, Seq("s"))
      .collect()
    assert(plain === Array(Row(1L, "a")))
  }

  test("composite keys (ordered multi-column PK)") {
    val table = Seq((1L, "x", 5.0), (1L, "y", 6.0)).toDF("k1", "k2", "v")
    val keys = Seq((1L, "x"), (1L, "z")).toDF("k1", "k2")
    val out = FeatureStore.retrieve(keys, table, Seq("k1", "k2"),
        fg.copy(features = Seq(FeatureDef("v", FeatureType.FP64, default = -1.0))),
        Seq("v"))
      .orderBy("k1", "k2").collect()
    assert(out === Array(Row(1L, "x", 5.0), Row(1L, "z", -1.0)))
  }

  test("quantized projection parses @DataType suffix (P2)") {
    val table = Seq((1L, 0.1, "a")).toDF("k", "v", "s")
    val out = FeatureStore.retrieve(Seq(1L).toDF("k"), table, Seq("k"), fg,
      Seq("v", "v@DataTypeFP16"))
    assert(out.columns.toSeq === Seq("k", "v", "v__fp16"))
    val r = out.collect()(0)
    assert(r.getDouble(1) === 0.1)
    assert(r.getFloat(2) === 0.0999755859375f)
  }

  test("upsert is last-write-wins per key (ST3)") {
    val current = Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("k", "v", "ver")
    val updates = Seq((2L, 21.0, 2L), (2L, 22.0, 3L), (3L, 30.0, 2L))
      .toDF("k", "v", "ver")
    val out = FeatureStore.upsert(current, updates, Seq("k"), "ver")
      .orderBy("k").select("k", "v").collect()
    assert(out === Array(Row(1L, 10.0), Row(2L, 22.0), Row(3L, 30.0)))
  }

  test("applyChangeEvents: latest-version-wins with DELETE tombstones (ST9 delta)") {
    val current = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val events = Seq(
      (2L, 21.0, 1L, "UPSERT"), (2L, 0.0, 2L, "DELETE"),   // delete wins at v2
      (3L, 31.0, 1L, "DELETE"), (3L, 32.0, 2L, "UPSERT"),  // resurrect at v2
      (4L, 40.0, 1L, "UPSERT"))                            // fresh insert
      .toDF("k", "v", "ver", "op")
    val out = FeatureStore.applyChangeEvents(current, events, Seq("k"), "ver", "op")
      .orderBy("k").collect()
    assert(out === Array(Row(1L, 10.0), Row(3L, 32.0), Row(4L, 40.0)))
  }

  test("reset replaces an entity's rows wholesale (ST9 full sync)") {
    val current = Seq((1L, 100L, 1.0), (1L, 101L, 2.0), (2L, 200L, 3.0))
      .toDF("ent", "id", "v")
    // entity 1 resyncs to a SMALLER row set; entity 2 untouched
    val replacement = Seq((1L, 102L, 9.0)).toDF("ent", "id", "v")
    val out = FeatureStore.reset(current, replacement, Seq("ent"))
      .orderBy("ent", "id").collect()
    assert(out === Array(Row(1L, 102L, 9.0), Row(2L, 200L, 3.0)))
  }

  test("schema versioning on read: rows written before a feature exists resolve to its default") {
    // The reference resolves a requested feature in the VERSION each row
    // was written under, falling back to the active version's default
    // when absent (retrieve.go:819-858). Spark-native equivalent:
    // parquet schema evolution — v1 files lack the new column, a
    // mergeSchema read nulls it for old rows, and the retrieve
    // projection coalesces those nulls to the registry default.
    val dir = java.nio.file.Files.createTempDirectory("graft-schemaver").toString
    Seq((1L, 10.0)).toDF("k", "v")
      .write.mode("append").parquet(dir)                  // written under v1
    Seq((2L, 20.0, "fresh")).toDF("k", "v", "s")
      .write.mode("append").parquet(dir)                  // written under v2
    val table = spark.read.option("mergeSchema", "true").parquet(dir)
    val out = FeatureStore.retrieve(
        Seq(1L, 2L).toDF("k"), table, Seq("k"), fg, Seq("v", "s"))
      .orderBy("k").collect()
    assert(out === Array(Row(1L, 10.0, "D"), Row(2L, 20.0, "fresh")))
  }

  test("retrieve plan broadcasts the key set, never shuffles the table") {
    // Auto-broadcast OFF (both static and adaptive): at gate scale
    // Spark's 10 MB threshold broadcasts any small side on its own,
    // which made the EXPLICIT broadcast hint unobservable by every
    // other gate (the r14 kill-test's broadcast_hint_drop survived the
    // driver compare AND the sf0.1 plan audit — plan-identical there).
    // With the thresholds at -1, BroadcastHashJoin below can come ONLY
    // from the hint, so dropping it reads RED here. The hint is
    // load-bearing at 100 TB, where the keys side exceeds any
    // threshold and an unhinted plan shuffles the full table.
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val table = Tables.customer(spark, sf)
      val keys = Seq(1L, 2L, 3L).toDF("c_custkey")
      val plan = FeatureStore.retrieve(keys, table, Seq("c_custkey"),
        Fixtures.customerProfile, Seq("c_name")).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("SortMergeJoin"))
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
