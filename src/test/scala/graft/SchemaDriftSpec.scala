package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Canary for testdata schema drift (round-7 incident: the driver
  * regenerated `events.parquet` from TIMESTAMP(NANOS) to naive-µs
  * TIMESTAMP and 8 event-time queries broke). [[Tables.events]] must
  * accept every encoding the generator has shipped and yield one
  * normalized type, so the whole event-time surface keeps analyzing
  * when the generator shifts again.
  */
class SchemaDriftSpec extends AnyFunSuite with SparkSuite {

  test("Tables.events normalizes all three ts encodings to TimestampType " +
      "with identical unix_millis") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-drift")
    // epoch micros spanning a DST-sensitive range; values exact in µs
    // bounded so µs→ns (×1000) stays inside Long: |µs| < 9.2e15 (~2262)
    val micros = Seq(0L, 1L, 1697040123456789L, 1700000000000000L,
      -3600000000L, 9000000000000000L)
    val src = micros.toDF("us")
      .withColumn("user_id", monotonically_increasing_id())

    def eventsDir(tag: String)(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
      val d = s"$base/$tag"
      write(src).select("user_id", "ts")
        .write.parquet(s"$d/events.parquet")
      d
    }

    // (1) legacy nanos-as-Long (TIMESTAMP(NANOS) reads as LongType under
    //     spark.sql.legacy.parquet.nanosAsLong — a raw Long column lands
    //     in the identical loader branch)
    val nsDir = eventsDir("ns")(_.withColumn("ts", col("us") * lit(1000L)))
    // (2) naive-µs TIMESTAMP (isAdjustedToUTC=false → TIMESTAMP_NTZ)
    val ntzDir = eventsDir("ntz")(
      _.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz")))
    // (3) UTC-adjusted µs TIMESTAMP (plain TimestampType)
    val utcDir = eventsDir("utc")(
      _.withColumn("ts", timestamp_micros(col("us"))))

    val frames = Seq("ns" -> nsDir, "ntz" -> ntzDir, "utc" -> utcDir)
      .map { case (tag, d) => tag -> Tables.events(spark, d) }
    frames.foreach { case (tag, df) =>
      assert(df.schema("ts").dataType == TimestampType,
        s"encoding '$tag' did not normalize to TimestampType: " +
          df.schema("ts").dataType)
    }
    val millis = frames.map { case (tag, df) =>
      tag -> df.select($"user_id", unix_millis($"ts").as("ms"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }.toMap
    assert(millis("ns") == millis("utc"),
      "nanos-long and UTC-µs encodings disagree on unix_millis")
    assert(millis("ntz") == millis("utc"),
      "NTZ-µs and UTC-µs encodings disagree on unix_millis")
    // and the values are the staged micros, floored to millis
    val expect = src.select($"user_id", ($"us" - pmod($"us", lit(1000L)))
      .divide(lit(1000L)).cast("long").as("ms"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(millis("utc") == expect, "unix_millis drifted from staged µs")
  }

  test("the CURRENT testdata encoding round-trips through Tables.events") {
    // whatever the generator last wrote, the loader must yield
    // TimestampType and non-degenerate event times
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    val n = ev.filter(unix_millis(col("ts")) > 0).count()
    assert(n > 0, "events.ts normalized to all-null/zero — loader drift")
  }
}
