package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Shannon entropy (nats) of each categorical column's value
    * distribution — the cardinality-collapse / constant-column alarm a
    * profiling pass raises (entropy ≈ 0 = the column stopped carrying
    * information; a sudden drop = an upstream join started fanning one
    * value out). Nulls are excluded (they're [[numericProfile]]'s
    * `n_null` signal).
    *
    * One scan explodes each row into |cols| `(col, value)` pairs and
    * one shuffle counts them; per-VALUE terms `−p·ln(p)` round to
    * micro-nats BEFORE the per-column sum (the
    * [[graft.operators.Normalize.psiBins]] rounded-ln convention), so
    * `entropy_micro` is an order-free integer and engine-exact.
    * Output: `(col_name, n, n_distinct, entropy_micro, entropy)`. */
  def categoricalEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val pairs = df
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("__v"))
      }: _*)).as("__e"))
      .select(col("__e.col_name").as("col_name"), col("__e.__v").as("__v"))
      .filter(col("__v").isNotNull)
    val counts = pairs.groupBy(col("col_name"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("col_name"))
      .agg(sum(col("__c")).as("__t"))
    counts.join(totals, "col_name")
      .select(col("col_name"), col("__c"), col("__t"),
        round((col("__c").cast("double") / col("__t").cast("double")) *
          -log(col("__c").cast("double") / col("__t").cast("double")) * 1e6)
          .cast("long").as("__term"))
      .groupBy(col("col_name"))
      .agg(
        max(col("__t")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(col("__term")).as("entropy_micro"))
      .withColumn("entropy", col("entropy_micro").cast("double") / 1e6)
  }

  /** Mutual information (nats) between two categorical columns — the
    * independence audit for a mixing decision (is language balance
    * uniform across sources? does a label leak through a metadata
    * field?). `MI = Σ_cells p(a,b)·ln(p(a,b)/(p(a)·p(b)))`, per-cell
    * terms rounded to micro-nats before the sum ([[categoricalEntropy]]'s
    * order-free integer convention). Null rows in either column are
    * excluded.
    *
    * == Scale ==
    * One (a,b) count shuffle; marginals derive from the CELL table
    * (|A|·|B| rows, never the data again), and the total joins back as
    * a broadcast one-row aggregate. Output (one row):
    * `(n, n_cells, card_a, card_b, mi_micro, mi)`. */
  def mutualInformation(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__c"))
    val ma = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ca"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
    val tot = cells.agg(sum(col("__c")).as("__t"))
    def p(c: Column) = c.cast("double") / col("__t").cast("double")
    cells.join(ma, "__a").join(mb, "__b").crossJoin(broadcast(tot))
      .select(col("__a"), col("__b"), col("__t"),
        round(p(col("__c")) *
          log(p(col("__c")) / (p(col("__ca")) * p(col("__cb")))) * 1e6)
          .cast("long").as("__term"))
      .agg(
        max(col("__t")).as("n"),
        count(lit(1)).as("n_cells"),
        countDistinct(col("__a")).as("card_a"),
        countDistinct(col("__b")).as("card_b"),
        sum(col("__term")).as("mi_micro"))
      .withColumn("mi", col("mi_micro").cast("double") / 1e6)
  }
}
