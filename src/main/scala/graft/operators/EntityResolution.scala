package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: resolve dirty records to a canonical
  * table by edit distance, comparing only within blocks.
  *
  * All-pairs fuzzy matching is quadratic and dies first at scale; the
  * standard ER shape is (1) a cheap BLOCKING key (here an exact
  * attribute; composite/phonetic keys slot in the same way), (2)
  * pairwise scoring only inside each block — the equi-join on the
  * block key makes the plan a plain shuffled hash join whose fan-out
  * is bounded by block size, and (3) per-dirty-record best-match
  * selection with a deterministic tiebreak. Block-size skew is the
  * scale hazard: a degenerate block (half the table one key)
  * re-creates the quadratic IN ONE TASK — `maxBlock` sub-splits hot
  * blocks ([[Skew.cappedFanJoin]], the shared census-adaptive salting
  * kernel) so the largest join task holds ≤ maxBlock clean rows, with
  * output row-identical to the uncapped run (every in-block pair is
  * still compared exactly once; the intrinsic pair mass is the
  * caller's blocking-key choice, the cap only stops it from
  * serializing onto one executor).
  *
  * Scoring uses `levenshtein` — codegen'd in Spark, identical
  * unit-cost edit distance in any engine, so a SQL oracle reproduces
  * the linkage bit-for-bit.
  */
object EntityResolution {

  /** Link each `dirty` record (`dkey`, `dname`, `block`) to its best
    * `clean` match (`ckey`, `cname`, `block`) with edit distance ≤
    * `maxDist`. Output per matched dirty record: the chosen key, the
    * distance, the in-threshold candidate count, and whether the
    * match hit the record's true source (`dkey == matched ckey` —
    * meaningful when dirty records derive from clean ones, as in a
    * corruption audit; harmless otherwise). Ties break on (distance
    * asc, clean key asc).
    *
    * `maxBlock > 0` caps the clean rows any single join task sees:
    * blocks whose clean census exceeds it are split into
    * `ceil(n/maxBlock)` sub-blocks by a deterministic hash of the
    * clean key, and the block's dirty rows fan out across the
    * sub-blocks — [[Skew.cappedFanJoin]] per-key salting, so
    * cold blocks pay zero replication. Output is identical to
    * `maxBlock = 0`: each (dirty, clean) in-block pair meets in
    * exactly one sub-block. The census join is a plain equi-join on
    * the block key (AQE broadcasts the census when it is small;
    * no forced broadcast — block-key cardinality is unbounded).
    * Gate/knob scale table: [[graft.ScaleProfile]]. */
  def blockedBestMatch(clean: DataFrame, dirty: DataFrame,
      maxDist: Int, maxBlock: Int = 0): DataFrame = {
    val paired =
      if (maxBlock <= 0) dirty.join(clean, Seq("block"))
      else Skew.cappedFanJoin(dirty, clean, Seq("block"),
        Seq(col("ckey")), maxBlock)
    // thresholded levenshtein (returns -1 when distance > maxDist):
    // the DP early-exits at O(len·maxDist) instead of O(len²) — at
    // bench scale this is the difference between ~1 s and ~20 s,
    // because the candidate fan-out evaluates the distance for every
    // in-block pair (twice, after predicate pushdown splits the
    // filter from the projection)
    val cand = paired
      .withColumn("dist",
        levenshtein(col("dname"), col("cname"), maxDist))
      .filter(col("dist") >= 0)
    val byBest = Window.partitionBy(col("dkey"))
      .orderBy(col("dist").asc, col("ckey").asc)
    cand
      .withColumn("cand_cnt",
        count(lit(1)).over(Window.partitionBy(col("dkey"))))
      .withColumn("__rn", row_number().over(byBest))
      .filter(col("__rn") === 1)
      .select(col("dkey"), col("ckey").as("matched_key"), col("dist"),
        col("cand_cnt"), (col("dkey") === col("ckey")).as("is_correct"))
  }
}
