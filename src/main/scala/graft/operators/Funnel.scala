package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over the event stream: for each user, the
  * earliest time each stage of a funnel (`view → click → purchase`)
  * was reached IN ORDER — stage k counts only at-or-after stage k-1
  * was reached. The offline twin of the interaction store's
  * click/order retrieval (SURVEY §2.1 S8/J5): same events table, but
  * whole-corpus conversion analysis instead of per-user point lookup.
  *
  * == Scale design ==
  * ONE shuffle: all stage timestamps are window aggregates over the
  * same `partitionBy(user)` partitioning, so Catalyst plans a single
  * exchange and chains the Window operators over it — no self-joins,
  * no per-stage scans. The per-user reduction at the end reuses the
  * same partitioning (no second exchange under AQE).
  */
object Funnel {

  /** Per-user funnel timestamps: one row per user with
    * `ts_<stage>` = earliest in-order reach time (null = never
    * reached) and `depth` = number of stages reached. */
  def reach(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    // chain: ts_k = min ts of a stage-k event at-or-after ts_{k-1}
    val withStages = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val cond = if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage &&
            col(s"ts_${stages(i - 1)}").isNotNull &&
            col(tsCol) >= col(s"ts_${stages(i - 1)}")
        df.withColumn(s"ts_$stage", min(when(cond, col(tsCol))).over(w))
    }
    val firstAggs = stages.map(s => first(col(s"ts_$s")).as(s"ts_$s"))
    withStages
      .groupBy(col(userCol))
      .agg(firstAggs.head, firstAggs.tail: _*)
      .withColumn("depth",
        stages.map(s => when(col(s"ts_$s").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
  }

  /** Funnel summary: users reaching each stage in order, with
    * stage-over-stage conversion. Tiny output (|stages| rows). */
  /** Behavior transition matrix (first-order Markov counts): for each
    * user's event stream in time order, count `from → to` event-type
    * transitions and their conditional probability per source state.
    * One shuffle on the user key for the `lead`, one aggregate; the
    * probability is a single exact-integer division. */
  def transitionCounts(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val fromTotal = Window.partitionBy(col("from_type"))
    events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(ord))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(fromTotal).cast("double"))
  }

  def summary(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    val r = reach(events, userCol, tsCol, typeCol, stages)
    val aggs = stages.map(s => count(col(s"ts_$s")).as(s"n_$s"))
    r.agg(aggs.head, aggs.tail: _*)
  }

  /** Time-to-convert distribution: exact duration quantiles from each
    * user's FIRST `fromStage` event to their first `toStage` event at
    * or after it — the latency view of a funnel ([[summary]] says how
    * many convert; this says how long they take, as percentiles
    * because conversion lag is heavy-tailed and a mean would lie).
    *
    * == Scale ==
    * One user-keyed window pass finds both anchor timestamps;
    * durations then ride [[Normalize.quantilesBy]]'s rank arithmetic
    * (no single-partition window). Output, one row per prob:
    * `(prob, n_started, n_converted, quantile_sec)`. */
  def timeToConvert(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      fromStage: String,
      toStage: String,
      probs: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val staged = events
      .withColumn("__tf",
        min(when(col(typeCol) === fromStage, col(tsCol))).over(w))
      .withColumn("__tt",
        min(when(col(typeCol) === toStage && col(tsCol) >= col("__tf"),
          col(tsCol))).over(w))
    val users = staged.groupBy(col(userCol))
      .agg(first(col("__tf")).as("__tf"), first(col("__tt")).as("__tt"))
      .filter(col("__tf").isNotNull)
    val durations = users.filter(col("__tt").isNotNull)
      .select(expr("(unix_millis(__tt) - unix_millis(__tf)) div 1000")
        .as("__dur_sec"))
      .withColumn("__g", lit("all"))
    val summary = users.agg(count(lit(1)).as("n_started"),
      count(col("__tt")).as("n_converted"))
    Normalize.quantilesBy(durations, "__g", "__dur_sec", probs)
      .crossJoin(broadcast(summary))
      .select(col("prob"), col("n_started"), col("n_converted"),
        col("quantile").as("quantile_sec"))
  }

  /** Linear multi-touch attribution: every conversion splits one unit
    * of credit EQUALLY over the user's touch events since their
    * previous conversion (the epoch) — the standard correction to
    * last-touch's "the final click did everything" bias. Conversions
    * with no preceding touch stay unattributed (reported separately).
    *
    * Mechanics: each event's epoch index = how many of the user's
    * conversions came strictly before it (a window cumsum), so a
    * conversion and the touches it credits share an epoch. Per-epoch
    * per-type credit `cnt_type/n_touches` rounds to micro-units
    * before the cross-epoch sum — order-free integers, engine-exact.
    *
    * == Scale ==
    * One shuffle on the user key (the epoch window), one on (user,
    * epoch, type) for the counts — no conversion × touch pair
    * fan-out. Output: one row per touch type
    * `(touch_type, n_touches, n_epochs, credit)` — Σ credit over
    * types = attributed conversions. */
  def linearAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      convType: String,
      touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"touchTypes must be non-empty and exclude '$convType'")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isConv = (col(typeCol) === convType).cast("long")
    val typed = events
      .filter(col(typeCol) === convType || col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("touch_type"), isConv.as("__conv"))
      .withColumn("__epoch", coalesce(sum(col("__conv")).over(w), lit(0L)))
    val epochs = typed
      .groupBy(col(userCol), col("__epoch"), col("touch_type"))
      .agg(count(lit(1)).as("__c"), max(col("__conv")).as("__anyconv"))
    val epochTotals = epochs
      .groupBy(col(userCol), col("__epoch"))
      .agg(sum(when(col("touch_type") =!= convType, col("__c"))
          .otherwise(0L)).as("__nt"),
        max(col("__anyconv")).as("__closed"))
    epochs.filter(col("touch_type") =!= convType)
      .join(epochTotals, Seq(userCol, "__epoch"))
      .filter(col("__closed") === 1L && col("__nt") > 0L)
      .withColumn("__credit_micro",
        round(col("__c").cast("double") / col("__nt").cast("double") * 1e6)
          .cast("long"))
      .groupBy(col("touch_type"))
      .agg(sum(col("__c")).as("n_touches"),
        count(lit(1)).as("n_epochs"),
        (sum(col("__credit_micro")).cast("double") / 1e6).as("credit"))
  }

  /** Top-k most common 3-step behavior paths: adjacent event-type
    * trigrams per user timeline (ts, event_id order), counted
    * corpus-wide. The sequence-mining primitive behind "what do users
    * do right before churning/purchasing" — two `lead`s in ONE
    * user-keyed window (single shuffle), a count, and a
    * TakeOrdered-style top-k (count desc, path asc — deterministic). */
  def pathTrigrams(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("__t1"))
      .withColumn("__t2", lead(col("__t1"), 1).over(w))
      .withColumn("__t3", lead(col("__t1"), 2).over(w))
      .filter(col("__t2").isNotNull && col("__t3").isNotNull)
      .select(concat_ws(">", col("__t1"), col("__t2"), col("__t3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }
}
