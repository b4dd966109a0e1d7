package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Minifloat

/** Bit-level semantics of the minifloat round-trips (SURVEY F7/U2).
  * Exhaustive/property style mirrors the reference's fp8 test tables
  * (`online-feature-store/pkg/float8/float8_e4m3_test.go`).
  */
class QuantizeSpec extends AnyFunSuite {

  test("fp16 known values") {
    assert(Minifloat.fp16(1.0) === 1.0f)
    assert(Minifloat.fp16(65504.0) === 65504.0f)
    assert(Minifloat.fp16(65505.0) === 65504.0f)          // rounds back down
    assert(Minifloat.fp16(65520.0).isPosInfinity)         // tie → 65536 → Inf
    assert(Minifloat.fp16(1e9).isPosInfinity)             // IEEE overflow → Inf
    assert(Minifloat.fp16(-1e9).isNegInfinity)
    assert(Minifloat.fp16(0.1) === 0.0999755859375f)      // 0x2E66
    assert(Minifloat.fp16(2.9e-8) === 0.0f)               // below 2^-25
    assert(Minifloat.fp16(5.9604644775390625e-8) === 5.9604645e-8f) // 2^-24
    assert(Minifloat.fp16(-2.5) === -2.5f)
    assert(Minifloat.fp16(1.0009765625) === 1.0009765625f) // 1 + 2^-10 exact
    assert(Minifloat.fp16(1.00048828125) === 1.0f)         // 1 + 2^-11 ties to even
    assert(Minifloat.fp16(1.00146484375) === 1.001953125f) // tie → even (1026)
    assert(Minifloat.fp16(1.0015) === 1.001953125f)        // rounds up
    assert(Minifloat.fp16(Double.NaN).isNaN)
    assert(Minifloat.fp16(Double.PositiveInfinity).isPosInfinity)
    assert(Minifloat.fp16(-0.0).equals(-0.0f))
  }

  test("fp8 e4m3 known values (OCP spec: bias 7, max 448, NO infinities)") {
    assert(Minifloat.fp8e4m3(448.0) === 448.0f)
    // e4m3 has no Inf encoding: overflow and ±Inf land on the all-ones
    // NaN byte (reference float8_e4m3.go:34-35 emits 0x7f for
    // |f| >= 480; 464 ties down to 448, above 464 rounds into NaN)
    assert(Minifloat.fp8e4m3(463.9) === 448.0f)             // rounds back down
    assert(Minifloat.fp8e4m3(464.0) === 448.0f)             // tie → even (448)
    assert(Minifloat.fp8e4m3(465.0).isNaN)                  // rounds past max
    assert(Minifloat.fp8e4m3(1e6).isNaN)                    // overflow → NaN
    assert(Minifloat.fp8e4m3(-1e6).isNaN)
    assert(Minifloat.fp8e4m3(Double.PositiveInfinity).isNaN)
    assert(Minifloat.fp8e4m3(Double.NegativeInfinity).isNaN)
    assert(Minifloat.fp8e4m3(Double.NaN).isNaN)
    assert(Minifloat.fp8e4m3(1.0) === 1.0f)
    assert(Minifloat.fp8e4m3(1.0625) === 1.0f)              // tie to even (step 1/8)
    assert(Minifloat.fp8e4m3(1.1875) === 1.25f)             // tie, odd → up
    assert(Minifloat.fp8e4m3(0.001953125) === 0.001953125f) // min subnormal 2^-9
    assert(Minifloat.fp8e4m3(0.0009765625) === 0.0f)        // 2^-10 ties to zero
    assert(Minifloat.fp8e4m3(-3.3) === -3.25f)
  }

  test("fp8 e5m2 known values (bias 15, max 57344)") {
    assert(Minifloat.fp8e5m2(57344.0) === 57344.0f)
    // e5m2 HAS an Inf encoding (0x7C, float8_e5m2.go:37-42): overflow
    // rounds to ±Inf; 61440 ties up (57344's mantissa is odd)
    assert(Minifloat.fp8e5m2(61439.0) === 57344.0f)
    assert(Minifloat.fp8e5m2(61440.0).isPosInfinity)        // tie, odd → up → Inf
    assert(Minifloat.fp8e5m2(1e9).isPosInfinity)
    assert(Minifloat.fp8e5m2(-1e9).isNegInfinity)
    assert(Minifloat.fp8e5m2(Double.PositiveInfinity).isPosInfinity)
    assert(Minifloat.fp8e5m2(Double.NaN).isNaN)
    assert(Minifloat.fp8e5m2(1.0) === 1.0f)
    assert(Minifloat.fp8e5m2(1.125) === 1.0f)               // tie to even (step 1/4)
    assert(Minifloat.fp8e5m2(1.26) === 1.25f)
    assert(Minifloat.fp8e5m2(1.52587890625e-5) === 1.52587890625e-5f) // 2^-16
  }

  private def samples(n: Int): Seq[Double] = {
    val r = new scala.util.Random(42)
    (1 to n).flatMap { _ =>
      Seq(r.nextDouble() * 2e6 - 1e6, r.nextDouble() * 2 - 1,
        (r.nextDouble() * 2 - 1) * 1e-5)
    }
  }

  test("property: idempotent (quantized values are fixed points)") {
    for (d <- samples(2000)) {
      val h = Minifloat.fp16(d); assert(Minifloat.fp16(h.toDouble) === h)
      val a = Minifloat.fp8e4m3(d)
      if (a.isNaN) assert(Minifloat.fp8e4m3(a.toDouble).isNaN) // NaN fixed point
      else assert(Minifloat.fp8e4m3(a.toDouble) === a)
      val b = Minifloat.fp8e5m2(d); assert(Minifloat.fp8e5m2(b.toDouble) === b)
    }
  }

  test("property: monotone non-decreasing (over the finite range)") {
    val s = samples(2000)
    for ((x, y) <- s.zip(s.tail)) {
      val (lo, hi) = if (x < y) (x, y) else (y, x)
      assert(Minifloat.fp16(lo) <= Minifloat.fp16(hi))
      // e4m3 overflow is NaN (unordered) — monotonicity applies to the
      // finite range only
      val (a1, a2) = (Minifloat.fp8e4m3(lo), Minifloat.fp8e4m3(hi))
      if (!a1.isNaN && !a2.isNaN) assert(a1 <= a2)
      assert(Minifloat.fp8e5m2(lo) <= Minifloat.fp8e5m2(hi))
    }
  }

  test("property: relative error bounded by half ulp (normals)") {
    val r = new scala.util.Random(7)
    for (_ <- 1 to 5000) {
      val d = 1e-3 + r.nextDouble() * 400.0
      assert(math.abs(Minifloat.fp8e4m3(d) - d) <= d / 16 + 1e-12) // 2^-4
      assert(math.abs(Minifloat.fp16(d) - d) <= d / 2048 + 1e-12)  // 2^-11
    }
  }

  test("fp16 exhaustive: every finite half bit pattern is a fixed point") {
    for (bits <- 0 until 0x7c00; sign <- Seq(1.0, -1.0)) {
      val e = bits >>> 10; val m = bits & 0x3ff
      val v = if (e == 0) sign * m * math.pow(2, -24)
              else sign * (1 + m / 1024.0) * math.pow(2, e - 15)
      assert(Minifloat.fp16(v).toDouble === v, s"bits=$bits sign=$sign")
    }
  }

  test("fp8 e4m3 exhaustive: every finite e4m3 bit pattern is a fixed point") {
    for (bits <- 0 until 0x7f; sign <- Seq(1.0, -1.0)) {
      val e = bits >>> 3; val m = bits & 0x7
      if (!(e == 15 && m == 7)) { // S.1111.111 is NaN in e4m3
        val v = if (e == 0) sign * m * math.pow(2, -9)
                else sign * (1 + m / 8.0) * math.pow(2, e - 7)
        assert(Minifloat.fp8e4m3(v).toDouble === v, s"bits=$bits sign=$sign")
      }
    }
  }
}
