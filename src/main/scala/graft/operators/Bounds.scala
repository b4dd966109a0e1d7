package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loud-failure guard for explicit-bound caps.
  *
  * Operators with a pairwise/broadcast leg trim that leg to a provable
  * bound (`orderBy().limit(cap)` — see [[graft.PlanAudit.BoundedBuildRows]]).
  * The trim is a TRUNCATION: an input beyond the cap silently loses its
  * highest keys, the silent-wrong-answer default [[graft.sources.Layout]]
  * `loadIvf` already refuses with a loud `require`. This guard gives the
  * lazy operators the same posture without a driver-side action: a
  * one-row census of the pre-trim table is cross-joined onto the
  * operator OUTPUT (the repo-standard `crossJoin(broadcast(one-row
  * aggregate))` shape the plan audit proves bounded) and `assert_true`
  * fails the job when the census exceeds the cap — so exceeding a cap
  * without opting into truncation is an ERROR, never a quietly-smaller
  * answer. Building the census from the pre-trim table lets Spark's
  * exchange reuse serve it from the trim's own shuffle where one exists.
  *
  * Known blind spot (documented, accepted): the assertion evaluates per
  * output row, so an operator whose output is EMPTY cannot raise — an
  * over-cap input whose every pair is filtered away passes silently.
  */
object Bounds {

  /** `out` unchanged when `census` (one row, column `__cap_n`) is ≤
    * `cap`; the job fails with a `what`-labelled error otherwise. */
  def guardCap(out: DataFrame, census: DataFrame, cap: Int,
      what: String): DataFrame =
    out.crossJoin(broadcast(census))
      .withColumn("__cap_g", assert_true(col("__cap_n") <= cap,
        concat(lit(s"$what: input has "), col("__cap_n"),
          lit(s" rows, over the cap of $cap — the trim would silently" +
            " drop the highest keys. Chunk the input, raise the cap," +
            " or pass allowTruncate = true to accept the truncation."))))
      .filter(col("__cap_g").isNull)
      .drop("__cap_n", "__cap_g")

  /** One-row census of `preTrim`: its row count as `__cap_n`. */
  def census(preTrim: DataFrame): DataFrame =
    preTrim.agg(count(lit(1)).as("__cap_n"))
}
