package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for the 100 TB target (SURVEY §4 physical
  * notes): feature tables bucketed by entity key, event tables
  * partitioned by event-time week.
  *
  * == Why ==
  *  - A feature table bucketed on its pk joins against another table
  *    bucketed the same way (or is upserted into) WITHOUT a shuffle of
  *    the big side — the join becomes a per-bucket zip. At 1000
  *    executors that is the difference between a full-table exchange
  *    per batch and none.
  *  - An event table partitioned by week turns every time-range
  *    predicate ([[graft.operators.InteractionStore.retrieveRange]])
  *    and retention sweep ([[graft.operators.InteractionStore.retention]])
  *    into partition pruning: only the ≤24 touched weekly directories
  *    are listed and scanned.
  */
object Layout {

  /** Write a feature-group table bucketed+sorted by its entity key.
    * Bucketed tables require the session catalog (`saveAsTable`). */
  def writeBucketedFeatureTable(
      df: DataFrame,
      table: String,
      pk: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, pk.head, pk.tail: _*)
      .sortBy(pk.head, pk.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write an event table partitioned by event-time week. */
  def writeWeekPartitionedEvents(
      df: DataFrame,
      path: String,
      tsCol: String = "ts"): Unit =
    df.withColumn("week", graft.operators.InteractionStore.week(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("week")
      .parquet(path)

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist an IVF index with the corpus partitioned by `cell_id`.
    * Probing then prunes at the DIRECTORY level: the `cell_id` join in
    * [[graft.operators.IvfIndex.search]] triggers dynamic partition
    * pruning, so a search over a 100 TB corpus lists and reads only the
    * `nProbe` probed cells' files — the IVF promise carried all the way
    * into the scan. */
  def writeIvf(idx: graft.operators.IvfIndex, path: String): Unit = {
    idx.assigned.write.mode("overwrite")
      .partitionBy("cell_id").parquet(s"$path/assigned")
    idx.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIvf(spark: SparkSession, path: String): graft.operators.IvfIndex =
    graft.operators.IvfIndex(
      spark.read.parquet(s"$path/assigned"),
      spark.read.parquet(s"$path/centroids"))
}
