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
  * The per-output-row assertion alone has a blind spot — an over-cap
  * input whose operator output is EMPTY evaluates nothing — so the
  * guard also unions a SENTINEL leg: the census row filtered to
  * `__cap_n > cap`, projected into the output schema through the same
  * assertion. Zero rows (plan-pruned projection, never evaluated) when
  * the cap holds; when it doesn't, the sentinel row exists and its
  * first column evaluation raises — so the guard now fires even when
  * the operator produced no rows. (The sentinel's assert condition
  * rides the census COLUMN, not a literal false: a foldable
  * `assert_true(false)` would be constant-folded — and thrown — at
  * optimization time regardless of row counts.)
  */
object Bounds {

  /** `out` unchanged when `census` (one row, column `__cap_n`) is ≤
    * `cap`; the job fails with a `what`-labelled error otherwise —
    * including when `out` is empty (sentinel leg). */
  def guardCap(out: DataFrame, census: DataFrame, cap: Int,
      what: String): DataFrame = {
    def trap = assert_true(col("__cap_n") <= cap,
      concat(lit(s"$what: input has "), col("__cap_n"),
        lit(s" rows, over the cap of $cap — the trim would silently" +
          " drop the highest keys. Chunk the input, raise the cap," +
          " or pass allowTruncate = true to accept the truncation.")))
    val guarded = out.crossJoin(broadcast(census))
      .withColumn("__cap_g", trap)
      .filter(col("__cap_g").isNull)
      .drop("__cap_n", "__cap_g")
    // the assertion must sit in a FILTER, not the projection: an
    // aggregate consumer (count()) column-prunes unreferenced project
    // expressions, side effects included. A row survives this filter
    // only if the assertion PASSED (returned null), which the
    // `__cap_n > cap` conjunct makes impossible — so the leg is
    // always either empty or an error, never a spurious output row.
    val sentinel = census
      .filter(col("__cap_n") > cap && trap.isNull)
      .select(out.schema.fields.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    guarded.unionByName(sentinel)
  }

  /** One-row census of `preTrim`: its row count as `__cap_n`. */
  def census(preTrim: DataFrame): DataFrame =
    preTrim.agg(count(lit(1)).as("__cap_n"))
}
