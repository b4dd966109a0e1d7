package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Every operator query takes the scale-factor directory as input and
  * reads parquet lazily — filters/projections placed on these frames
  * push down to the parquet scan (verify via `PushedFilters` in
  * `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in three parquet encodings across testdata
    * generations; normalize all of them to session-zone TimestampType so
    * every downstream event-time expression (`unix_millis`, watermarks)
    * sees one type:
    *
    *  - TIMESTAMP(NANOS): Spark has no nanos type; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it reads as Long
    *    nanos, and truncating division to micros matches DuckDB's ns→µs
    *    coercion exactly (verified empirically: DuckDB floor-divides).
    *  - TIMESTAMP(µs, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
    *    the session zone is UTC (GraftSession), so casting to
    *    TimestampType is instant-preserving and matches DuckDB's naive
    *    read of the same file.
    *  - TIMESTAMP(µs, UTC): already TimestampType; pass through.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Normalize an events frame's `ts` to TimestampType regardless of
    * which of the three encodings the file carried (see [[events]]).
    * Shared by the batch loader and the streaming fixtures so a future
    * encoding shift breaks in exactly one place.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
