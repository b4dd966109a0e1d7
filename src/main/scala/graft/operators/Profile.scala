package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the per-column statistics pass a pipeline runs
  * on every new data drop before trusting it (null spikes, cardinality
  * collapse, and range drift are the three classic ingestion bugs;
  * the reference's config registry keeps per-feature metadata the
  * same audit would populate,
  * `online-feature-store/internal/config/manager.go`).
  *
  * == Scale design ==
  * ONE scan computes every column's statistics: the per-column
  * aggregates all ride a single `agg(...)` (Catalyst plans the exact
  * distinct counts via one Expand — |cols|+1 projections of the scan,
  * partial-aggregated map-side), and the single result row unpivots
  * row-locally into one row per column ([[Evaluation.prCurve]]'s
  * inline-array convention — never a per-column pass over the data).
  * All outputs are exact (counts, min/max) — no sampled or
  * approximate figures, so the audit is engine-reproducible.
  */
object Profile {

  /** Profile `cols` (numeric or castable-to-double) of `df`: total
    * rows, null count, exact distinct count (nulls excluded), min and
    * max as double. Output: one row per column,
    * `(col_name, n, n_null, n_distinct, min_v, max_v)`. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_v"),
        col(s"__mx_$c").as("max_v"))
    }: _*)
    one.select(explode(rows).as("__r")).select(col("__r.*"))
  }
}
