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

  // ---- int8 symmetric quantization (the embedding-storage scale
  // path: 4× less IO than fp32, integer dot kernel; scores approximate
  // the float dot to |err| ≤ (|a|₁·sb + |b|₁·sa)/2 per pair) ----

  /** Per-vector symmetric scale: max |xᵢ| / 127 (1.0 for the zero
    * vector so codes stay well-defined). */
  def int8Scale(a: Column): Column = {
    val mx = array_max(transform(d(a), abs(_)))
    when(mx === 0.0, lit(1.0)).otherwise(mx / 127.0)
  }

  /** int8 codes: round-to-nearest-even of xᵢ/scale, clamped to
    * [-127, 127]. `rint` == DuckDB `round_even`, so the codes (and any
    * score built from them) reproduce exactly in the SQL oracle. */
  def int8Codes(a: Column, scale: Column): Column =
    transform(d(a), x =>
      greatest(least(rint(x / scale), lit(127.0)), lit(-127.0)).cast("tinyint"))

  /** Integer dot over int8 codes (codegen'd long accumulation). */
  def dotInt8(qa: Column, qb: Column): Column =
    ColumnBridge.column(graft.expr.DotProductInt8(
      ColumnBridge.expression(qa), ColumnBridge.expression(qb)))

  /** Approximate dot product from codes + scales. */
  def dotInt8Scored(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    dotInt8(qa, qb) * sa * sb
}
