package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inferflow-style dataflow composition (SURVEY U4, J7/J8, §3.3).
  *
  * The reference executes a component DAG with Kahn's algorithm and a
  * shared mutable row matrix
  * (`inferflow/dag-topology-executor/handlers/dag/executor.go:36-98`);
  * here components are `DataFrame => DataFrame` stages composed by
  * ordinary function composition — Spark's lazy plan IS the DAG, and
  * Catalyst recovers the parallelism between independent column
  * subtrees without a scheduler.
  */
object Pipeline {

  type Stage = DataFrame => DataFrame

  /** Sequential composition of stages (the inferflow topology). */
  def apply(stages: Stage*): Stage = stages.reduce(_ andThen _)

  /** Context ⊗ targets expansion (J7): project request-level context
    * features onto every target row
    * (`FeatureInitComponent.Run`, feature_init_component.go:31-48).
    * `context` must be a single row — enforced semantically by the
    * caller (an aggregate or a literal frame); it broadcasts. */
  def withContext(context: DataFrame): Stage =
    targets => targets.crossJoin(broadcast(context))

  /** Pairwise target composition (J8): pair rows reference two target
    * indexes; both sides join against the target matrix
    * (`predict.proto:84-121`). Targets are expected small per request —
    * broadcast both legs; for bulk scoring swap to shuffle joins by
    * leaving `hint = false`. */
  def pairwise(
      targets: DataFrame,
      pairs: DataFrame,
      targetIdx: String,
      leftIdx: String,
      rightIdx: String,
      hint: Boolean = true): DataFrame = {
    def leg(alias: String) = {
      val t = targets.columns.foldLeft(targets)((d, c) =>
        d.withColumnRenamed(c, s"${alias}_$c"))
      if (hint) broadcast(t) else t
    }
    pairs
      .join(leg("a"), col(leftIdx) === col(s"a_$targetIdx"))
      .join(leg("b"), col(rightIdx) === col(s"b_$targetIdx"))
  }

  /** Slate composition (J8): slate rows carry an array of member
    * target indexes; explode + join expands each slate to its member
    * rows (`parseSlateTargetRows`, predator_component.go:175-192). */
  def slatewise(
      targets: DataFrame,
      slates: DataFrame,
      slateMembers: String,
      targetIdx: String): DataFrame =
    slates.withColumn("__member", explode(col(slateMembers)))
      .drop(slateMembers)
      .join(targets, col("__member") === col(targetIdx))
      .drop("__member")

  /** Category-capped slate rerank (the diversity constraint a slate
    * composer applies before serving): per group, keep each
    * candidate's within-category rank ≤ `maxPerCat`, then the best `k`
    * survivors overall. Two window specs over the SAME group
    * partitioning — one shuffle; ties break by `tieCol` ascending so
    * the slate is reproducible. */
  def constrainedRerank(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      catCol: String,
      tieCol: String,
      maxPerCat: Int,
      k: Int): DataFrame = {
    require(maxPerCat >= 1 && k >= 1, "maxPerCat and k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val byCat = Window.partitionBy(g :+ col(catCol): _*)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val byGroup = Window.partitionBy(g: _*)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("__cr", row_number().over(byCat))
      .filter(col("__cr") <= maxPerCat)
      .withColumn("rank", row_number().over(byGroup))
      .filter(col("rank") <= k)
      .drop("__cr")
  }

  /** MMR (maximal-marginal-relevance) diversified top-K per group —
    * the greedy slate selector
    * (`experiments/episodic-memory-prototype/memory/retriever.py:131-177`
    * `_select_with_mmr`): slot 1 takes the best raw score; each later
    * slot re-scores every remaining candidate as
    * `score · (1 − penalty · max(0, max_cos_sim_to_selected))` and
    * takes the argmax. Selected rows keep their ORIGINAL score (the
    * reference appends `(score, ep)`, not the penalized value).
    *
    * == Determinism ==
    * Candidates are gathered with `sort_array(..., asc=false)` over
    * `(score, item, emb)` structs — descending (score, item) order —
    * and argmax ties resolve to the first candidate in that order, so
    * the selection is a pure function of the input set: SQL-equivalent
    * to `ROW_NUMBER() OVER (ORDER BY mmr DESC, score DESC, item DESC)`
    * per slot. Cosines are the same ascending-index double fold as
    * [[graft.expr.DotProduct]], so a SQL oracle replays bit-identical.
    *
    * == Scale ==
    * One shuffle gathers each group's candidates (caller bounds the
    * pool: `poolSize` keeps the per-group state ≤ poolSize·dim
    * doubles); the O(k·pool·k·dim) greedy kernel runs executor-side
    * per group — nothing driver-side scales with |groups|, the
    * [[graft.operators.Normalize.pavCalibrateCountsBy]] invariant.
    *
    * Embeddings must be non-null (build the pool with an inner join
    * against the embedding table). Output:
    * `(groupCols…, rank, itemCol, scoreCol)`, rank 1-based.
    */
  def mmrRerank(
      candidates: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      scoreCol: String,
      embCol: String,
      k: Int,
      penalty: Double = 0.5,
      poolSize: Int = 500): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(penalty >= 0.0 && penalty <= 1.0,
      s"penalty must be in [0,1], got $penalty")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val g = groupCols.map(col)
    val byGroup = Window.partitionBy(g: _*)
      .orderBy(col(scoreCol).desc, col(itemCol).asc)
    val pooled = candidates
      .withColumn("__pr", row_number().over(byGroup))
      .filter(col("__pr") <= poolSize)
    val gathered = pooled
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(
        col(scoreCol).cast("double").as("s"),
        col(itemCol).as("i"),
        col(embCol).cast("array<double>").as("e"))), asc = false).as("__cs"))
    val inSchema = gathered.schema
    val itemField = inSchema("__cs").dataType
      .asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("i")
    val outSchema = StructType(
      groupCols.map(c => inSchema(c)) ++ Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField(itemCol, itemField.dataType, itemField.nullable),
        StructField(scoreCol, DoubleType, nullable = true)))
    val nGroup = groupCols.length
    gathered.flatMap { row =>
      val cands = row.getSeq[Row](nGroup)
      // same ascending-index left fold as graft.expr.DotProduct
      def dot(a: Seq[Double], b: Seq[Double]): Double = {
        var acc = 0.0; var j = 0
        while (j < a.length) { acc += a(j) * b(j); j += 1 }
        acc
      }
      def cos(a: Seq[Double], b: Seq[Double]): Double =
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var rank = 1
      while (rank <= k && remaining.nonEmpty) {
        val bestIdx =
          if (selected.isEmpty) 0 // head of (score desc, item desc) order
          else {
            var bi = 0
            var bm = Double.NegativeInfinity
            var idx = 0
            while (idx < remaining.length) {
              val c = remaining(idx)
              val e = c.getSeq[Double](2)
              var ms = 0.0
              selected.foreach { se => val sim = cos(e, se); if (sim > ms) ms = sim }
              val mmr = c.getDouble(0) * (1 - penalty * ms)
              // strict >: ties keep the earliest candidate in
              // (score desc, item desc) order
              if (mmr > bm) { bm = mmr; bi = idx }
              idx += 1
            }
            bi
          }
        val chosen = remaining.remove(bestIdx)
        selected += chosen.getSeq[Double](2)
        out += Row.fromSeq(
          (0 until nGroup).map(row.get) ++
            Seq(rank, chosen.get(1), chosen.getDouble(0)))
        rank += 1
      }
      out
    }(Encoders.row(outSchema))
  }
}

/** Changed-row detection (SURVEY A7) — the skye Scylla aggregator's
  * delta path (`scylla_aggregator.go:47-93`): compare an incoming
  * snapshot against the stored one and emit only rows whose compared
  * columns changed (or are new), so downstream indexing touches the
  * minimum set.
  */
object ChangeCapture {
  /** Rows of `next` that are new or differ from `current` on any of
    * `compareCols` (null-safe comparison). One shuffle on pk. */
  def changedRows(
      current: DataFrame,
      next: DataFrame,
      pk: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val cur = compareCols.foldLeft(current.select((pk ++ compareCols).map(col): _*))(
      (d, c) => d.withColumnRenamed(c, s"__old_$c"))
    val joined = next.join(cur, pk, "left")
    val changed = compareCols.map(c => !(col(c) <=> col(s"__old_$c")))
      .reduce(_ || _)
    joined.filter(changed).drop(compareCols.map(c => s"__old_$c"): _*)
  }

  /** Collapse a per-key snapshot/event series into SCD2 validity
    * intervals: keep only rows where any of `valueCols` changed
    * (null-safe) vs the key's previous snapshot, stamp `valid_from` =
    * the snapshot time and `valid_to` = the next change's time (null
    * while current). The output is the feature HISTORY table
    * [[Training.pointInTime]] consumes — snapshots → history → PIT
    * join closes the training-data loop. One window shuffle on the
    * key; input must be unique per (keys, tsCol). */
  def scd2(
      snapshots: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    val changed = valueCols.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col(tsCol), 1).over(w).isNull
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("valid_from").asc)
    snapshots
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wc))
      .drop("__chg")
  }
}
