package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak supervision: combine noisy binary labeling functions into one
  * training label (the Snorkel-style programmatic-labeling step a
  * curation pipeline uses when no ground truth exists).
  *
  * One-step label model, fully deterministic:
  *   1. per-row majority vote of the rules;
  *   2. each rule's agreement rate with the majority — its estimated
  *      accuracy under the usual better-than-chance assumption;
  *   3. re-vote with log-odds weights `ln(a/(1−a))` (clamped away
  *      from 0/1, micro-nat rounded — the repo's ln convention), so
  *      reliable rules dominate and near-random rules contribute ~0.
  *
  * Plan: one scan for votes, one 1-row aggregate for the agreement
  * table (broadcast back), one elementwise re-vote — two passes
  * total, no per-rule scans. */
object Labeling {

  def weakLabelModel(df: DataFrame, idCol: String,
      ruleCols: Seq[String]): DataFrame = {
    require(ruleCols.size >= 3 && ruleCols.size % 2 == 1,
      "need an odd number (>= 3) of rules for a tie-free majority")
    val staged = df.select(col(idCol) +:
      ruleCols.map(c => col(c).cast("long").as(c)): _*)
    val voteSum = ruleCols.map(col).reduce(_ + _)
    val voted = staged.withColumn("majority",
      (voteSum * 2 > ruleCols.size).cast("long"))
    val agree = voted.agg(count(lit(1)).as("__n"),
      ruleCols.map(c => sum((col(c) === col("majority")).cast("long"))
        .as(s"__agr_$c")): _*)
    val weighted = voted.crossJoin(broadcast(agree))
    val wCols = ruleCols.map { c =>
      val a = greatest(least(col(s"__agr_$c").cast("double") /
        col("__n").cast("double"), lit(0.99)), lit(0.01))
      round(log(a / (lit(1.0) - a)) * 1e6).cast("long").as(s"__w_$c")
    }
    val scored = weighted.select(col(idCol) +: col("majority") +:
      ruleCols.map(col) ++: wCols: _*)
    val score = ruleCols.map(c =>
      col(s"__w_$c") * (col(c) * 2 - 1)).reduce(_ + _)
    scored.withColumn("score_micro", score)
      .withColumn("weak_label", (col("score_micro") > 0L).cast("long"))
      .drop(ruleCols.map(c => s"__w_$c"): _*)
  }
}
