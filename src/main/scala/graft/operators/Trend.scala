package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonparametric trend and changepoint statistics over per-key metric
  * series (daily counts, hourly volumes) — the monitoring layer's
  * "is this metric drifting, and since when" primitives, exact on any
  * engine.
  *
  * Series are time-bounded (a retention horizon caps points per key),
  * so the O(n²) pair statistics are a per-key constant; every shuffle
  * keys on the series id and the windows are series-partitioned —
  * nothing global, scale follows the number of series. */
object Trend {

  /** Mann-Kendall trend test + Theil-Sen slope per series.
    *
    *  - `s_stat = Σ_{i<j} sign(x_j − x_i)` — integer.
    *  - variance with the tie correction
    *    `18·Var = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)` — integer.
    *  - `z` — the usual continuity-corrected normal approximation;
    *    the single non-integer step (one sqrt + one division).
    *  - `theil_sen` — the median pairwise slope; slopes floor to
    *    micro-units (floor on the double quotient — identical in
    *    every engine, unlike truncating integer division, whose
    *    negative-operand behavior differs between engines), median
    *    via [[Normalize.quantilesBy]]'s exact integer ranks.
    */
  def mannKendall(series: DataFrame, keyCol: String, timeCol: String,
      valCol: String): DataFrame = {
    val base = series.select(col(keyCol).as("__k"),
      col(timeCol).cast("long").as("__t"), col(valCol).cast("long").as("__x"))
    val pairs = base.as("a")
      .join(base.select(col("__k"), col("__t").as("__t2"),
        col("__x").as("__x2")), Seq("__k"))
      .filter(col("__t2") > col("__t"))
    val sAgg = pairs.groupBy(col("__k"))
      .agg(sum(signum(col("__x2") - col("__x")).cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val n = base.groupBy(col("__k")).agg(count(lit(1)).as("n_points"))
    val ties = base.groupBy(col("__k"), col("__x"))
      .agg(count(lit(1)).as("__tg"))
      .groupBy(col("__k"))
      .agg(sum(col("__tg") * (col("__tg") - 1) * (lit(2) * col("__tg") + 5))
        .as("__tie_corr"))
    val slopes = pairs.select(col("__k"),
      (floor((col("__x2") - col("__x")).cast("double") * 1e6 /
        (col("__t2") - col("__t")).cast("double")).cast("long") / 1e6)
        .as("__slope"))
    val ts = Normalize.quantilesBy(slopes, "__k", "__slope", Seq(0.5))
      .select(col("__k"), col("quantile").as("theil_sen"))
    sAgg.join(n, Seq("__k")).join(ties, Seq("__k")).join(ts, Seq("__k"))
      .withColumn("__var18",
        col("n_points") * (col("n_points") - 1) *
          (lit(2) * col("n_points") + 5) - col("__tie_corr"))
      .withColumn("z", when(col("__var18") <= 0L, lit(0.0)).otherwise(
        when(col("s_stat") > 0L, (col("s_stat") - 1L).cast("double"))
          .when(col("s_stat") < 0L, (col("s_stat") + 1L).cast("double"))
          .otherwise(lit(0.0)) /
          sqrt(col("__var18").cast("double") / 18.0)))
      .select(col("__k").as(keyCol), col("n_points"), col("s_stat"),
        round(col("z"), 6).as("z"),
        when(col("z") > 1.96, "up").when(col("z") < -1.96, "down")
          .otherwise("none").as("trend"),
        col("theil_sen"))
  }

  /** CUSUM changepoint scan: the k at which the cumulative deviation
    * from the series mean peaks, per series. With μ = S/n, the scaled
    * cusum `C_k = Σ_{d≤k}(n·x_d − S)` is integer-exact; the reported
    * changepoint is the time of max |C_k| (earliest on ties). A level
    * shift at time τ makes |C_k| peak at τ — the classic offline
    * single-changepoint estimator. */
  def cusumChangepoint(series: DataFrame, keyCol: String, timeCol: String,
      valCol: String): DataFrame = {
    val base = series.select(col(keyCol).as("__k"),
      col(timeCol).cast("long").as("__t"), col(valCol).cast("long").as("__x"))
    val stats = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = base.join(stats, Seq("__k"))
      .withColumn("__c",
        sum(col("__n") * col("__x") - col("__s")).over(w))
      .withColumn("__absc", abs(col("__c")))
    val best = Window.partitionBy(col("__k"))
      .orderBy(col("__absc").desc, col("__t").asc)
    cusum.withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(col("__k").as(keyCol), col("__n").as("n_points"),
        col("__t").as("cp_time"), col("__absc").as("max_abs_cusum"),
        // peak magnitude rescaled by n² (the n-scaling the integer
        // cusum carries), comparable across series lengths
        round(col("__absc").cast("double") /
          (col("__n").cast("double") * col("__n").cast("double")), 6)
          .as("cusum_scaled"))
  }
}
