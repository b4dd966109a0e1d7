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
  * re-creates the quadratic — cap or sub-split hot blocks exactly
  * like [[Skew]] salting before shipping at 100 TB.
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
    * asc, clean key asc). */
  def blockedBestMatch(clean: DataFrame, dirty: DataFrame,
      maxDist: Int): DataFrame = {
    // thresholded levenshtein (returns -1 when distance > maxDist):
    // the DP early-exits at O(len·maxDist) instead of O(len²) — at
    // bench scale this is the difference between ~1 s and ~20 s,
    // because the candidate fan-out evaluates the distance for every
    // in-block pair (twice, after predicate pushdown splits the
    // filter from the projection)
    val cand = dirty.join(clean, Seq("block"))
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
