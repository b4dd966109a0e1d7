package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity measures (SURVEY A6/J6) as native higher-order
  * column functions — codegen'd, no UDFs.
  *
  * Matches the reference's scoring surface: dot product
  * (`skye/internal/serving/handlers/embedding/v1.go:278-291`
  * `CalculateDotProduct`, fp64 query × fp32 stored accumulated in f64)
  * and the DOT/Cosine/Euclidean distance functions of the vector
  * backends (`skye/README.md:17`).
  *
  * Accumulation is a strict left fold in double — deterministic and
  * reproducible across engines (the DuckDB oracle uses the same fold).
  */
object Similarity {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ, left-fold accumulation in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Euclidean distance. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Pad with zeros / truncate an embedding to `dim` (SURVEY F13/P8). */
  def fitDim(a: Column, dim: Int): Column = {
    val padded = concat(d(a), array_repeat(lit(0.0), dim))
    slice(padded, 1, dim)
  }
}
