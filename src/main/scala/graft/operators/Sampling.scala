package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic sampling for training-data pipelines.
  *
  * Random `df.sample` is non-reproducible across runs/partitionings;
  * these operators decide membership from a hash of the row's KEY, so
  * a sample is stable under re-execution, repartitioning and engine
  * changes (the md5-derived hash is the same one the DuckDB oracles
  * compute) — the property a 100 TB pipeline needs to re-derive the
  * exact same training set twice.
  */
object Sampling {

  private final val Bucket = 1000000L

  /** Hash bucket in [0, 1e6) for a key column — membership tests are
    * `bucket < rate * 1e6`. */
  def hashBucket(key: Column, seed: Int = 7): Column =
    TextFunctions.md5Hash32(key.cast("string"), seed) % Bucket

  /** Keep each row iff its key hashes under `rate`. */
  def byHash(df: DataFrame, keyCol: String, rate: Double, seed: Int = 7): DataFrame =
    df.filter(hashBucket(col(keyCol), seed) < (rate * Bucket).toLong)

  /** Per-stratum rates: `rates(stratumValue) -> rate`, keys absent from
    * the map fall back to `defaultRate`. */
  def stratified(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      seed: Int = 7): DataFrame = {
    val rateCol = rates.foldLeft(lit((defaultRate * Bucket).toLong)) {
      case (acc, (value, rate)) =>
        when(col(strataCol) === value, lit((rate * Bucket).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), seed) < rateCol)
  }
}
