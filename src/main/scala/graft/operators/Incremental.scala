package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (delta-based) aggregate maintenance: keep per-key
  * aggregate STATE (count + exact decimal sum) as a materialized
  * table, fold new batches in by merging states — never rescan
  * history. The batch counterpart of the reference's streaming upsert
  * path (SURVEY ST3): a feature like "lifetime order value per user"
  * over 100 TB of history refreshes by scanning only the day's delta.
  *
  * State is mergeable because count and decimal-sum are commutative
  * monoids; avg derives at read time (`sum/cnt`), so it is exact no
  * matter how many increments the state absorbed. The decimal carrier
  * ([[graft.OracleMath]] micro-unit convention) makes the merge
  * order-independent — state computed shard-by-shard equals the
  * full-history aggregate bit for bit.
  */
object Incremental {

  private def dec(scale: Int) = DecimalType(38, scale)

  /** Aggregate state of one batch: per-key `cnt` and exact `sum_dec`
    * (valueCol rounded to `scale` dp then decimal-summed). */
  def aggState(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      scale: Int = 6): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("cnt"),
        sum(round(col(valueCol), scale).cast(dec(scale))).as("sum_dec"))

  /** Merge any number of states into one: union + re-aggregate (sum of
    * counts, sum of decimal sums). A key present in only some states
    * merges correctly (absent = identity). One shuffle over the union
    * of the (small) state tables — the raw data is never touched. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        sum(col("sum_dec")).as("sum_dec"))

  /** Read-time finish: state → (cnt, sum, avg) in double. */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(col("cnt"),
      col("sum_dec").cast("double").as("val_sum"),
      (col("sum_dec").cast("double") / col("cnt")).as("val_avg")): _*)

  /** First/last-touch state of one batch: per-key earliest and latest
    * event-time (epoch millis) plus the touch count. Min/max/count are
    * all commutative monoids, so the state merges exactly under ANY
    * batching — the incremental carrier for a user-profile store's
    * "first seen / last active" columns (reference: the feature
    * store's per-entity metadata refresh, SURVEY ST3/A2). */
  def touchState(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(unix_millis(col(tsCol))).as("first_ms"),
        max(unix_millis(col(tsCol))).as("last_ms"),
        count(lit(1)).as("cnt"))

  /** Merge touch states: min of firsts, max of lasts, sum of counts —
    * absent keys are identities, exactly like [[mergeStates]]. */
  def mergeTouchStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(min(col("first_ms")).as("first_ms"),
        max(col("last_ms")).as("last_ms"),
        sum(col("cnt")).cast("long").as("cnt"))

  /** Read-time finish: first/last touch plus the derived active span. */
  def finishTouch(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(col("first_ms"), col("last_ms"),
      col("cnt"), (col("last_ms") - col("first_ms")).as("span_ms")): _*)

  /** Second-moment state: per-key (count, exact decimal sum, exact
    * decimal sum of squares) — mean AND variance maintainable from
    * deltas, the carrier for incremental per-key anomaly baselines.
    * Squares multiply as decimals (a rounded value squared is exact in
    * decimal, order-independent in the sum). */
  def momentState(df: DataFrame, keys: Seq[String], valueCol: String,
      scale: Int = 6): DataFrame = {
    val vr = round(col(valueCol), scale).cast(dec(scale))
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("cnt"),
        sum(vr).as("sum_dec"),
        sum(vr * vr).as("sumsq_dec"))
  }

  /** Merge moment states: all three components are sums. */
  def mergeMomentStates(states: Seq[DataFrame],
      keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        sum(col("sumsq_dec")).as("sumsq_dec"))

  /** Read-time finish: mean and population variance in double (the
    * two closing divisions are the only float ops). */
  def finishMoments(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(col("cnt"),
      (col("sum_dec").cast("double") / col("cnt").cast("double"))
        .as("mean"),
      (col("sumsq_dec").cast("double") / col("cnt").cast("double") -
        (col("sum_dec").cast("double") / col("cnt").cast("double")) *
          (col("sum_dec").cast("double") / col("cnt").cast("double")))
        .as("variance")): _*)
}
