package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Embedding similarity measures (SURVEY A6/J6) as native Catalyst
  * expressions with codegen ([[graft.expr.DotProduct]] — a primitive
  * loop inside whole-stage codegen, no UDFs, no per-element lambda
  * interpretation).
  *
  * Matches the reference's scoring surface: dot product
  * (`skye/internal/serving/handlers/embedding/v1.go:278-291`
  * `CalculateDotProduct`, fp64 query × fp32 stored accumulated in f64)
  * and the DOT/Cosine/Euclidean distance functions of the vector
  * backends (`skye/README.md:17`).
  *
  * Accumulation is a strict ascending-index left fold in double —
  * deterministic and reproducible across engines (the DuckDB oracle
  * uses the same fold).
  */
object Similarity {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ, left-fold accumulation in double. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(graft.expr.DotProduct(
      ColumnBridge.expression(d(a)), ColumnBridge.expression(d(b))))

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Euclidean distance. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(ColumnBridge.column(graft.expr.SquaredDistance(
      ColumnBridge.expression(d(a)), ColumnBridge.expression(d(b)))))

  /** Pad with zeros / truncate an embedding to `dim` (SURVEY F13/P8). */
  def fitDim(a: Column, dim: Int): Column = {
    val padded = concat(d(a), array_repeat(lit(0.0), dim))
    slice(padded, 1, dim)
  }
}
