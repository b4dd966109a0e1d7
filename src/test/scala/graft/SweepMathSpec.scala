package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench sweep's arithmetic, pinned as unit facts — three rounds
  * of flagged-but-healthy artifacts were measurement bugs, so the
  * math that decides a flag deserves specs of its own. */
class SweepMathSpec extends AnyFunSuite {

  test("sfOf parses exact sf basenames only") {
    assert(SweepMath.sfOf("/root/testdata/sf0.01") === Some(0.01))
    assert(SweepMath.sfOf("benchdata/sf1") === Some(1.0))
    assert(SweepMath.sfOf("benchdata/sf3/") === Some(3.0))
    assert(SweepMath.sfOf("benchdata/sf0.10") === Some(0.10))
    assert(SweepMath.sfOf("somewhere/else") === None)
    assert(SweepMath.sfOf("data/sf1x") === None)
    assert(SweepMath.sfOf("data/xsf1") === None)
  }

  test("axis uses log10(sf) when every dir parses, leg index otherwise") {
    val dirs = Seq("/t/sf0.01", "/t/sf0.1", "/t/sf1", "/t/sf3")
    val xs = SweepMath.axis(dirs)
    assert(xs.take(3) === Seq(-2.0, -1.0, 0.0))
    assert(math.abs(xs(3) - math.log10(3.0)) < 1e-12)
    assert(SweepMath.axis(Seq("/a", "/b", "/c")) === Seq(0.0, 1.0, 2.0))
  }

  test("slopes: top segment normalizes by the REAL decade width — " +
      "an sf1->sf3 step is 0.48 decades, not 1") {
    // t grows exactly linearly in sf: t = sf. On the log-log axis the
    // slope is 1 REGARDLESS of leg spacing; the old index-axis math
    // would have read the sf1->sf3 segment as log10(3) = 0.48.
    val dirs = Seq("/t/sf0.1", "/t/sf1", "/t/sf3")
    val xs = SweepMath.axis(dirs)
    val (eLast, eFit) = SweepMath.slopes(xs, Seq(0.1, 1.0, 3.0))
    assert(math.abs(eLast - 1.0) < 1e-12)
    assert(math.abs(eFit - 1.0) < 1e-12)
    // quadratic growth reads 2 on the top segment
    val (q, _) = SweepMath.slopes(xs, Seq(0.01, 1.0, 9.0))
    assert(math.abs(q - 2.0) < 1e-12)
    // index-axis fallback: one 10x time step per leg = exponent 1
    val (i1, _) = SweepMath.slopes(Seq(0.0, 1.0), Seq(0.5, 5.0))
    assert(math.abs(i1 - 1.0) < 1e-12)
  }

  test("mergeMin keeps each winning leg paired with ITS run's calib " +
      "and never lets a crashed leg win") {
    val a = (Seq(2.0, -1.0, 5.0), Seq(0.5, 0.6, 0.7))
    val b = (Seq(3.0, 4.0, 1.0), Seq(1.5, 1.6, 1.7))
    val (ts, cs) = SweepMath.mergeMin(a, b)
    assert(ts === Seq(2.0, 4.0, 1.0))
    assert(cs === Seq(0.5, 1.6, 1.7)) // leg 0 from a, legs 1-2 from b
    // crashed retry never replaces a good original
    val c = (Seq(-1.0, -1.0, -1.0), Seq(9.9, 9.9, 9.9))
    assert(SweepMath.mergeMin(a, c) === a)
  }

  test("factors and normalizedTimes: missing canary reads -1; sub-1 " +
      "factors never inflate") {
    val f = SweepMath.factors(Seq(0.856, -1.0, 0.214), 0.428)
    assert(f === Seq(2.0, -1.0, 0.5))
    val nt = SweepMath.normalizedTimes(Seq(10.0, 10.0, 10.0), f)
    assert(nt === Seq(5.0, 10.0, 10.0)) // only the >1 factor deflates
  }

  test("parseResult: arity-checked times, calib degrades to -1, " +
      "malformed lines rejected") {
    val good = """SWEEPONE_RESULT {"times":[1.500,2.000,4.700],""" +
      """"calib":[0.450,0.460,0.470]}"""
    assert(SweepMath.parseResult(good, 3) ===
      Some((Seq(1.5, 2.0, 4.7), Seq(0.45, 0.46, 0.47))))
    // crashed legs come through as -1 times
    val crashed = """SWEEPONE_RESULT {"times":[1.500,-1.000],""" +
      """"calib":[0.450,0.460]}"""
    assert(SweepMath.parseResult(crashed, 2) ===
      Some((Seq(1.5, -1.0), Seq(0.45, 0.46))))
    // old-protocol child (no calib): times kept, calib all -1
    val old = """SWEEPONE_RESULT {"times":[1.500,2.000]}"""
    assert(SweepMath.parseResult(old, 2) ===
      Some((Seq(1.5, 2.0), Seq(-1.0, -1.0))))
    // wrong arity / no times / garbage: rejected
    assert(SweepMath.parseResult(good, 4) === None)
    assert(SweepMath.parseResult("SWEEPONE_RESULT {}", 2) === None)
    assert(SweepMath.parseResult(
      """SWEEPONE_RESULT {"times":[a,b]}""", 2) === None)
  }

  test("adjudicate: the full decision matrix") {
    val cf = 2.0
    // healthy: no raw flag regardless of factors
    assert(SweepMath.adjudicate(0.5, 10.0, 0.5, 10.0,
      Seq(1.0, 5.0), cf, intrinsic = false) === ((false, false, true)))
    // genuine regression on an idle box: flags
    assert(SweepMath.adjudicate(1.5, 10.0, 1.5, 10.0,
      Seq(1.0, 1.1), cf, intrinsic = false) === ((true, true, false)))
    // raw flag + contended legs + normalized exponent clears:
    // re-labeled, not counted (the r11 pathology)
    assert(SweepMath.adjudicate(1.77, 97.6, 0.39, 4.6,
      Seq(1.2, 21.0), cf, intrinsic = false) === ((false, true, true)))
    // raw flag + contended + STILL superlinear after normalization:
    // the flag survives (contention cannot launder a real regression)
    assert(SweepMath.adjudicate(2.5, 50.0, 1.5, 20.0,
      Seq(3.0, 3.0), cf, intrinsic = false) === ((true, true, true)))
    // sub-1s top leg: the job-scheduling floor never flags
    assert(SweepMath.adjudicate(2.0, 0.8, 2.0, 0.8,
      Seq(1.0, 1.0), cf, intrinsic = false) === ((false, false, false)))
    // contention on a NON-defining early leg does not mark contended
    assert(SweepMath.adjudicate(1.5, 10.0, 1.5, 10.0,
      Seq(5.0, 1.0, 1.0), cf, intrinsic = false) === ((true, true, false)))
    // reviewed intrinsic: raw flag reported, never counted
    assert(SweepMath.adjudicate(1.37, 37.3, 1.19, 30.0,
      Seq(1.1, 1.4), cf, intrinsic = true) === ((false, true, false)))
  }
}
