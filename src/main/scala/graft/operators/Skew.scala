package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew tooling for pathological join keys.
  *
  * AQE's skew-join splitting handles moderate runtime skew; when one
  * key carries an outsized share of a 100 TB table (the celebrity-user
  * problem), salting bounds the largest task deterministically:
  * replicate the SMALL side `salt` ways, scatter the big side into
  * `salt` sub-keys by a deterministic row hash, and join on
  * (key, salt-bucket). Result is row-identical to the plain join.
  */
object Skew {

  /** Salted inner equi-join of a skewed `big` side against a `small`
    * side on `keys`. `saltSource` must be a deterministic per-row
    * expression on `big` (an id column, not `rand()` — reruns must
    * produce the same partitioning).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      salt: Int): DataFrame = {
    require(salt > 0)
    val b = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salt.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
