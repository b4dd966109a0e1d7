package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level text statistics for training-data pipelines: vocabulary
  * construction and TF-IDF term weighting. Both are pure
  * explode/groupBy shapes — one shuffle per aggregation level, map-side
  * partial aggregation for free, no UDFs.
  */
object Corpus {

  /** Corpus vocabulary: global token counts, top `n` by
    * (count desc, token asc) with a 1-based rank.
    *
    * == Scale ==
    * The count is a plain explode + groupBy (shuffled by token, partial
    * aggregation map-side). The top-n runs as `TakeOrderedAndProject` —
    * a per-partition bounded heap + driver merge, never a global sort —
    * and only the n survivors enter the rank window.
    */
  def vocab(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("token").asc).limit(n)
      .withColumn("rank", row_number().over( // n rows only
        Window.orderBy(col("cnt").desc, col("token").asc)))
  }

  /** Top TF-IDF terms per document: tf = in-doc count / doc length,
    * idf = ln(N / df), scores rounded to `scale` dp BEFORE ranking so
    * the ordering is reproducible across engines (ln differs in the
    * last ulps between libm implementations; 6 dp is far above that
    * noise), ties broken by token ascending.
    *
    * == Scale ==
    * ONE scan + explode of the corpus. Doc lengths and document
    * frequencies come from window aggregates OVER the (doc, token)
    * count table rather than separate aggregation+join legs — the
    * naive three-leg shape re-executes the explode per leg (measured:
    * 3 scans, 10 exchanges; this plan: 1 scan, 3 exchanges of the
    * far-smaller tf table). The doc-partitioned exchange is shared by
    * the length window and the rank window.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topPerDoc: Int,
      scale: Int = 6): DataFrame = {
    val nDocs = docs.select(count(lit(1)).as("__n"))
    val terms = docs
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = terms.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf_cnt"))
    val scored = tf
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .withColumn("__len", sum(col("tf_cnt")).over(
        Window.partitionBy(col(idCol))))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf_cnt").cast("double") / col("__len") *
          log(col("__n").cast("double") / col("__df")), scale))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("token").asc)))
      .filter(col("rank") <= topPerDoc)
      .select(col(idCol), col("token"), col("score"), col("rank"))
  }

  /** Fixed-size sliding-window chunking of documents into token
    * chunks — the pretraining/RAG sharding step: windows of `size`
    * tokens starting every `stride` tokens (stride < size ⇒ overlap;
    * a document shorter than `size` yields one chunk of itself).
    *
    * == Scale ==
    * Pure per-row explode — embarrassingly parallel, no shuffle at
    * all. The word split runs ONCE per document (staged projection),
    * chunk texts are built by `slice` + `concat_ws` over the staged
    * array inside codegen.
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      "chunk needs chunkSize > 0 and stride > 0")
    val staged = docs.select(col(idCol),
      TextFunctions.words(col(textCol)).as("__w"))
    staged
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(1),
          greatest(size(col("__w")) - (chunkSize - 1), lit(1)), lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", slice(col("__w"), col("__start"), lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize), size(col("__w")) - col("__start") + 1)
          .as("n_tokens"))
  }

  /** Equal-width histogram of a numeric column: `buckets` bins spanning
    * [min, max], the max value clamped into the last bin. Bin edges ride
    * along so the result is self-describing. One aggregate for the
    * bounds (broadcast back) + one groupBy — no sort, no window.
    */
  def histogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    val bounds = df.agg(min(col(c)).as("__mn"), max(col(c)).as("__mx"))
    df.crossJoin(broadcast(bounds))
      .select(least(
        floor((col(c) - col("__mn")) / (col("__mx") - col("__mn")) * buckets),
        lit(buckets - 1L)).cast("long").as("bucket"),
        col("__mn"), col("__mx"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        // per-group constants: edges derive from the global bounds
        (first(col("__mn")) + col("bucket") *
          (first(col("__mx")) - first(col("__mn"))) / buckets).as("lo"),
        (first(col("__mn")) + (col("bucket") + 1) *
          (first(col("__mx")) - first(col("__mn"))) / buckets).as("hi"))
  }
}
