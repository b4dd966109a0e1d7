package graft.functions

/** Reduced-precision float round-tripping (fp16, fp8-e4m3, fp8-e5m2).
  *
  * The reference quantizes features to these formats at read time
  * (`online-feature-store/internal/quantization/quantization_utils.go:123-268`,
  * `pkg/float8/float8_e4m3.go`, `float8_e5m2.go`). Spark has no reduced-
  * precision types, so the engine reproduces the semantics: quantize =
  * round the value to the nearest representable minifloat (ties to even)
  * and return it widened back to float. Formats follow the public
  * IEEE-754 half and OCP 8-bit floating point specifications: fp16 =
  * 1-5-10 bias 15, e4m3 = 1-4-3 bias 7 (no infinities, max 448),
  * e5m2 = 1-5-2 bias 15 (max 57344).
  *
  * Specials pin the reference byte-level conversions exactly:
  *  - fp16 / e5m2 HAVE infinities: finite overflow rounds to ±Inf and
  *    ±Inf passes through (`float8_e5m2.go:37-42` emits 0x7C = Inf for
  *    |f| ≥ 2^16; fp16 via the IEEE x448/float16 lib).
  *  - e4m3 has NO infinity encoding: overflow and ±Inf land on the
  *    all-ones byte 0x7f, which decodes as NaN
  *    (`float8_e4m3.go:34-35,69-71`) — so overflow → NaN, not
  *    saturation.
  *
  * All arithmetic is in double: every representable value, step size and
  * rounding midpoint of these formats is exact in binary64, so
  * `Math.rint(v / step) * step` performs exact round-to-nearest-even.
  */
object Minifloat extends Serializable {

  /** Round `v` to a minifloat with `manBits` mantissa bits, minimum
    * normal exponent `minExp`, and largest finite value `maxFinite`.
    * `infOnOverflow`: true → format has ±Inf (fp16/e5m2), overflow
    * rounds to ±Inf; false → no-Inf format (e4m3), overflow → NaN. */
  private def roundTo(v: Double, manBits: Int, minExp: Int, maxFinite: Double,
      infOnOverflow: Boolean): Double = {
    if (java.lang.Double.isNaN(v)) return Double.NaN
    if (java.lang.Double.isInfinite(v))
      return if (infOnOverflow) v else Double.NaN
    val a = math.abs(v)
    if (a == 0.0) return v
    // exponent of the target bucket; clamp to minExp for subnormals
    var e = Math.getExponent(a)
    if (e < minExp) e = minExp
    var step = Math.scalb(1.0, e - manBits)
    var r = Math.rint(a / step) * step
    // rounding can carry into the next binade; recompute step once
    if (r >= Math.scalb(2.0, e) && e >= minExp) {
      step = Math.scalb(1.0, e + 1 - manBits)
      r = Math.rint(a / step) * step
    }
    if (r > maxFinite)
      return if (infOnOverflow) {
        if (v < 0) Double.NegativeInfinity else Double.PositiveInfinity
      } else Double.NaN
    if (v < 0) -r else r
  }

  final val Fp16MaxFinite   = 65504.0
  final val E4M3MaxFinite   = 448.0
  final val E5M2MaxFinite   = 57344.0

  def fp16(v: Double): Float    = roundTo(v, 10, -14, Fp16MaxFinite, infOnOverflow = true).toFloat
  def fp8e4m3(v: Double): Float = roundTo(v, 3, -6, E4M3MaxFinite, infOnOverflow = false).toFloat
  def fp8e5m2(v: Double): Float = roundTo(v, 2, -14, E5M2MaxFinite, infOnOverflow = true).toFloat
}
