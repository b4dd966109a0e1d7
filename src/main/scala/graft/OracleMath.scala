package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic float aggregation.
  *
  * Summing doubles is order-dependent, so a Spark sum and a DuckDB sum
  * of identical inputs can differ in the last ulps and break hash
  * comparison. The fix used throughout `SparkEntry.oracleSql`:
  * elementwise math stays in double (IEEE ops are bit-identical in both
  * engines), then each term is rounded to a fixed scale, cast to
  * decimal (exact, order-independent addition), summed, and the total
  * cast back to double. Same construction on the SQL side:
  * `CAST(SUM(CAST(ROUND(expr, s) AS DECIMAL(38,s))) AS DOUBLE)`.
  */
object OracleMath {
  /** Order-independent sum of a double expression, exact to `scale` dp. */
  def xsum(e: Column, scale: Int = 6): Column =
    sum(round(e, scale).cast(DecimalType(38, scale))).cast("double")

  /** Order-independent mean: exact decimal sum → double, then a single
    * double division (decimal division scale rules differ per engine).
    */
  def xavg(e: Column, scale: Int = 6): Column =
    sum(round(e, scale).cast(DecimalType(38, scale))).cast("double") / count(e)

  /** SQL-side twin of [[xsum]] for oracle strings. */
  def sqlSum(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(ROUND($expr, $scale) AS DECIMAL(38,$scale))) AS DOUBLE)"

  def sqlAvg(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(ROUND($expr, $scale) AS DECIMAL(38,$scale))) AS DOUBLE) / COUNT($expr)"
}
