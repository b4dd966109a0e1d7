package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoders — the label-aware and frequency
  * transforms a training pipeline applies to high-cardinality keys
  * before a model sees them.
  *
  * == Scale design ==
  * Every encoder is one shuffle on the category key (window or
  * groupBy with map-side combine); label sums stay exact integers and
  * each output is a single final division, so encodings are
  * partition-invariant and engine-reproducible. Nothing driver-side
  * scales with cardinality.
  */
object Encode {

  /** Leave-one-out target-mean encoding (the leakage-safe form: each
    * row's own label is excluded from its category mean, so the
    * encoding never memorizes the row it describes) plus the
    * smoothed variant `(Σ−y + α·ȳ_global) / (n−1+α)` that shrinks
    * rare categories toward the global mean. Singleton categories
    * yield null `loo_mean` (no peers) but a valid `smoothed_mean`
    * (pure prior).
    *
    * `labelCol` must be 0/1-castable; `α` is the pseudo-count prior
    * weight. Output: input columns + `(loo_mean, smoothed_mean)`. */
  def targetEncodeLoo(
      df: DataFrame,
      keyCol: String,
      labelCol: String,
      alpha: Double = 20.0): DataFrame = {
    require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
    val w = Window.partitionBy(col(keyCol))
    val y = col(labelCol).cast("long")
    val globals = df.agg(
      sum(col(labelCol).cast("long")).as("__g"),
      count(lit(1)).as("__n"))
    val withStats = df
      .withColumn("__s", sum(y).over(w))
      .withColumn("__c", count(lit(1)).over(w))
      .crossJoin(broadcast(globals))
    val gm = col("__g").cast("double") / col("__n").cast("double")
    withStats
      .withColumn("loo_mean",
        when(col("__c") > 1,
          (col("__s") - y).cast("double") / (col("__c") - 1).cast("double")))
      .withColumn("smoothed_mean",
        ((col("__s") - y).cast("double") + lit(alpha) * gm) /
          ((col("__c") - 1).cast("double") + lit(alpha)))
      .drop("__s", "__c", "__g", "__n")
  }

  /** Frequency encoding with rare-category collapse: every category
    * below `minCount` folds into the `rareToken` bucket, and each row
    * carries its (post-collapse) category count and frequency — the
    * cardinality-control step before one-hot/embedding layers (a
    * million-tail key becomes a bounded vocabulary; unseen serving
    * values fold into the same bucket by construction). Output: input
    * columns + `(encoded_cat, cat_count, cat_freq)`. */
  def frequencyEncode(
      df: DataFrame,
      keyCol: String,
      minCount: Long,
      rareToken: String = "__rare__"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c0"))
    // one-row totals: corpus size + the rare bucket's pooled count —
    // never a per-member array (the rare tail can be millions of
    // categories; the mapping table stays one row per category)
    val totals = counts.agg(
      sum(col("__c0")).as("__t"),
      coalesce(sum(when(col("__c0") < minCount, col("__c0"))), lit(0L))
        .as("__rare"))
    val mapping = counts.crossJoin(broadcast(totals))
      .select(col("__k"),
        when(col("__c0") >= minCount, col("__k")).otherwise(lit(rareToken))
          .as("encoded_cat"),
        when(col("__c0") >= minCount, col("__c0")).otherwise(col("__rare"))
          .as("cat_count"),
        col("__t"))
    df.withColumn("__k", col(keyCol).cast("string"))
      .join(mapping, "__k")
      .withColumn("cat_freq",
        col("cat_count").cast("double") / col("__t").cast("double"))
      .drop("__k", "__t")
  }
}
