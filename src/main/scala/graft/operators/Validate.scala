package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation (the expectations gate an ingest pipeline
  * runs before publishing a table): each rule is a violation predicate;
  * the report is one row per rule with its violation count and rate.
  *
  * == Scale ==
  * ONE scan regardless of rule count — every rule is a conditional sum
  * in a single aggregate; the per-rule rows come from exploding the
  * one aggregated row. */
object Validate {

  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (name, cond) =>
        sum(when(cond, 1L).otherwise(0L)).as(s"__v_$name") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(col("__n"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__v_$name").as("violations"))
      }: _*)).as("__r"))
      .select(col("__r.rule").as("rule"),
        col("__r.violations").as("violations"),
        col("__n").as("n_rows"),
        (col("__r.violations").cast("double") / col("__n").cast("double"))
          .as("rate"))
  }
}
