package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline ranking-model evaluation over scored interaction logs — the
  * metrics pass an ML platform runs after batch scoring.
  *
  * == Scale design ==
  * One shuffle on the group key: rank and tie-count ride two window
  * specs over the same partitioning, and the metric reduces per group.
  * All rank arithmetic stays in exact integers (tie-averaged ranks are
  * carried in 2× units); the single double division happens per group
  * at the end, so results are independent of partitioning and row
  * order.
  */
object Evaluation {

  /** Tie-aware ROC AUC per group (the Mann-Whitney U form):
    * `AUC = (Σ_pos avgRank − nPos(nPos+1)/2) / (nPos·nNeg)`, with
    * tied scores contributing their average rank. Groups with no
    * positives or no negatives yield null.
    *
    * `labelCol` must be 0/1 (cast to long). Avg ranks are exact:
    * `2·avgRank = 2·(rank−1) + cntEq + 1` is an integer, summed as
    * longs, so the AUC is bit-reproducible in any engine. */
  def groupAuc(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: String): DataFrame = {
    val g = groupCols.map(col)
    val byScore = Window.partitionBy(g: _*).orderBy(col(scoreCol).asc)
    val tieSpec = Window.partitionBy(g :+ col(scoreCol): _*)
    val staged = df
      .select(g :+ col(scoreCol) :+ col(labelCol).cast("long").as("__y"): _*)
      .withColumn("__rank", rank().over(byScore))
      .withColumn("__eq", count(lit(1)).over(tieSpec))
    val nPos = sum(col("__y"))
    val nNeg = sum(lit(1L) - col("__y"))
    // Σ over positives of 2·avgRank, as an exact long
    val s2 = sum(col("__y") * (lit(2) * (col("__rank") - 1) + col("__eq") + 1))
    staged.groupBy(g: _*)
      .agg(nPos.as("n_pos"), nNeg.as("n_neg"), s2.as("__s2"))
      .withColumn("auc",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(
            (col("__s2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
              (lit(2.0) * (col("n_pos") * col("n_neg")).cast("double"))))
      .drop("__s2")
  }

  /** Precision@k per group: of each group's top-`k` rows by score
    * (ties broken by `tieCol` ascending for determinism), the fraction
    * with a positive label. */
  def precisionAtK(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.select(g :+ col(scoreCol) :+ col(tieCol) :+
        col(labelCol).cast("long").as("__y"): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_at_k"),
        (sum(col("__y")).cast("double") / count(lit(1)).cast("double"))
          .as("precision"))
  }
}
