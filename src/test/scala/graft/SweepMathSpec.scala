package graft

import org.scalatest.funsuite.AnyFunSuite

import SweepMath.Leg

/** The bench sweep's arithmetic, pinned as unit facts — four rounds
  * of flagged-but-healthy artifacts were measurement bugs, so the
  * math that decides a flag deserves specs of its own. */
class SweepMathSpec extends AnyFunSuite {

  private def leg(t: Double, calib: Double = -1.0, scanary: Double = -1.0,
      run: Double = -1.0, cpu: Double = -1.0) =
    Leg(t, calib, scanary, run, cpu)

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

  test("slopes enforces its preconditions loudly: a duplicated sweep " +
      "dir or a leaked crashed leg must never read as silently-green") {
    // duplicated dir -> duplicated x -> 0/0 = NaN exponent, and
    // NaN > 1.2 is false: a misconfigured sweep would never flag
    intercept[IllegalArgumentException] {
      SweepMath.slopes(Seq(-1.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0))
    }
    intercept[IllegalArgumentException] { // unordered axis
      SweepMath.slopes(Seq(0.0, -1.0), Seq(1.0, 2.0))
    }
    intercept[IllegalArgumentException] { // crashed leg (-1 time)
      SweepMath.slopes(Seq(-1.0, 0.0), Seq(1.0, -1.0))
    }
    intercept[IllegalArgumentException] { // arity
      SweepMath.slopes(Seq(0.0), Seq(1.0))
    }
  }

  test("mergeMin keeps each winning leg's WHOLE record paired " +
      "and never lets a crashed leg win") {
    val a = Seq(leg(2.0, calib = 0.5, cpu = 9.0),
      leg(-1.0, calib = 0.6), leg(5.0, calib = 0.7))
    val b = Seq(leg(3.0, calib = 1.5), leg(4.0, calib = 1.6),
      leg(1.0, calib = 1.7, run = 8.0))
    val m = SweepMath.mergeMin(a, b)
    assert(m.map(_.t) === Seq(2.0, 4.0, 1.0))
    // leg 0 from a (with its calib AND cpu), legs 1-2 from b
    assert(m(0) === leg(2.0, calib = 0.5, cpu = 9.0))
    assert(m(1).calib === 1.6)
    assert(m(2).run === 8.0)
    // crashed retry never replaces a good original
    val c = Seq(leg(-1.0, calib = 9.9), leg(-1.0, calib = 9.9),
      leg(-1.0, calib = 9.9))
    assert(SweepMath.mergeMin(a, c) === a)
  }

  test("factors, qfactors and normalizedTimes: missing samples read " +
      "-1; sub-1 factors never inflate") {
    val f = SweepMath.factors(Seq(0.856, -1.0, 0.214), 0.428)
    assert(f === Seq(2.0, -1.0, 0.5))
    val nt = SweepMath.normalizedTimes(Seq(10.0, 10.0, 10.0), f)
    assert(nt === Seq(5.0, 10.0, 10.0)) // only the >1 factor deflates
    // run/cpu starvation factor; -1 when either side is missing
    val q = SweepMath.qfactors(Seq(
      leg(1.0, run = 6.0, cpu = 2.0), leg(1.0, run = 6.0),
      leg(1.0, cpu = 2.0), leg(1.0, run = 3.0, cpu = 3.0)))
    assert(q === Seq(3.0, -1.0, -1.0, 1.0))
    // starvation deflators are RELATIVE to the query's own quietest
    // leg (idle occupancy differs per query shape), floored at 1, and
    // profile-less legs never deflate. Legs INSIDE the idle band
    // (ratio <= StarveDeflateCeiling = 1.6) never deflate either:
    // idle-box run/cpu naturally reads 1.05-1.6 on shuffle-heavy deep
    // legs, so in-band excess over a CPU-tight shallow leg is scale
    // shape, not starvation (r13 ADVICE — deflating it shaved
    // ~0.18/decade off genuine borderline regressions)
    assert(SweepMath.starveDeflators(Seq(1.2, 14.4, -1.0, 1.5)) ===
      Seq(1.0, 12.0, 1.0, 1.0))
    // just past the ceiling: deflates by the FULL ratio over the
    // quietest leg, not the excess over the ceiling
    assert(SweepMath.starveDeflators(Seq(1.2, 1.8)) === Seq(1.0, 1.5))
    assert(SweepMath.starveDeflators(Seq(-1.0, -1.0)) === Seq(1.0, 1.0))
  }

  test("parseResult: arity-checked times, missing annotation arrays " +
      "degrade to -1, malformed lines rejected") {
    val good = """SWEEPONE_RESULT {"times":[1.500,2.000,4.700],""" +
      """"calib":[0.450,0.460,0.470],"scanary":[0.250,0.260,0.270],""" +
      """"run":[10.000,20.000,40.000],"cpu":[8.000,16.000,32.000]}"""
    assert(SweepMath.parseResult(good, 3) === Some(Seq(
      Leg(1.5, 0.45, 0.25, 10.0, 8.0),
      Leg(2.0, 0.46, 0.26, 20.0, 16.0),
      Leg(4.7, 0.47, 0.27, 40.0, 32.0))))
    // crashed legs come through as -1 times
    val crashed = """SWEEPONE_RESULT {"times":[1.500,-1.000],""" +
      """"calib":[0.450,0.460]}"""
    assert(SweepMath.parseResult(crashed, 2) === Some(Seq(
      Leg(1.5, 0.45, -1.0, -1.0, -1.0),
      Leg(-1.0, 0.46, -1.0, -1.0, -1.0))))
    // old-protocol child (times only): kept, annotations all -1
    val old = """SWEEPONE_RESULT {"times":[1.500,2.000]}"""
    assert(SweepMath.parseResult(old, 2) === Some(Seq(
      Leg(1.5, -1.0, -1.0, -1.0, -1.0),
      Leg(2.0, -1.0, -1.0, -1.0, -1.0))))
    // wrong-arity annotation array degrades to -1 rather than
    // misaligning samples across legs
    val skewed = """SWEEPONE_RESULT {"times":[1.500,2.000],""" +
      """"calib":[0.450]}"""
    assert(SweepMath.parseResult(skewed, 2).get.map(_.calib) ===
      Seq(-1.0, -1.0))
    // wrong arity / no times / garbage: rejected
    assert(SweepMath.parseResult(good, 4) === None)
    assert(SweepMath.parseResult("SWEEPONE_RESULT {}", 2) === None)
    assert(SweepMath.parseResult(
      """SWEEPONE_RESULT {"times":[a,b]}""", 2) === None)
  }

  test("parseLeg: per-leg line -> (index, Leg); crashed leg carries " +
      "-1 time with its canaries; malformed lines rejected") {
    val good = """SWEEPONE_LEG {"i":2,"t":4.700,"calib":0.470,""" +
      """"scanary":0.270,"run":40.000,"cpu":32.000}"""
    assert(SweepMath.parseLeg(good) ===
      Some((2, Leg(4.7, 0.47, 0.27, 40.0, 32.0))))
    // a leg whose QUERY crashed still emits (time -1, canaries kept)
    val crashed = """SWEEPONE_LEG {"i":1,"t":-1.000,"calib":0.460,""" +
      """"scanary":-1.000,"run":-1.000,"cpu":-1.000}"""
    assert(SweepMath.parseLeg(crashed) ===
      Some((1, Leg(-1.0, 0.46, -1.0, -1.0, -1.0))))
    assert(SweepMath.parseLeg("SWEEPONE_LEG {}") === None)
    assert(SweepMath.parseLeg("""SWEEPONE_LEG {"i":0}""") === None)
  }

  test("adjudicate: the full decision matrix") {
    val cf = 2.0
    val sf = 3.0
    val quiet = Seq(1.0, 1.1)
    def adj(eLast: Double, lastTime: Double,
        eNorm: Double, lastNorm: Double,
        xor: Seq[Double] = quiet, spark: Seq[Double] = quiet,
        q: Seq[Double] = Seq(1.2, 1.4), intrinsic: Boolean = false) =
      SweepMath.adjudicate(eLast, lastTime, eNorm, lastNorm,
        xor, spark, q, cf, sf, intrinsic)
    // healthy: no raw flag regardless of factors
    assert(adj(0.5, 10.0, 0.5, 10.0, xor = Seq(1.0, 5.0)) ===
      ((false, false, true, false)))
    // genuine regression on an idle box: flags
    assert(adj(1.5, 10.0, 1.5, 10.0) ===
      ((true, true, false, false)))
    // raw flag + xor-contended legs + the corrected exponent clears:
    // re-labeled, not counted (the r11 pathology)
    assert(adj(1.77, 97.6, 0.39, 4.6,
      xor = Seq(1.2, 21.0)) === ((false, true, true, false)))
    // raw flag + quiet CANARIES but the query's own tasks starved
    // (run >> cpu); the starvation-deflated exponent clears: the r12
    // q229 pathology — contention the register loop cannot feel,
    // adjudicated from the query's own resource profile
    assert(adj(1.5, 18.2, 0.3, 1.6,
      q = Seq(1.3, 12.0)) === ((false, true, false, true)))
    // mini-Spark canary hot counts as contended even when xor is cold
    assert(adj(1.5, 18.2, 0.3, 1.6,
      spark = Seq(1.1, 4.0)) === ((false, true, true, false)))
    // contended/starved + STILL superlinear after the correction:
    // the flag survives (contention cannot launder a real regression)
    assert(adj(2.5, 50.0, 1.5, 20.0,
      xor = Seq(3.0, 3.0)) === ((true, true, true, false)))
    assert(adj(2.5, 50.0, 1.5, 20.0,
      q = Seq(5.0, 5.0)) === ((true, true, false, true)))
    // sub-1s top leg: the job-scheduling floor never flags
    assert(adj(2.0, 0.8, 2.0, 0.8) ===
      ((false, false, false, false)))
    // contention on a NON-defining early leg does not mark contended
    assert(adj(1.5, 10.0, 1.5, 10.0,
      xor = Seq(5.0, 1.0, 1.0), q = Seq(9.0, 1.1, 1.1)) ===
      ((true, true, false, false)))
    // reviewed intrinsic: raw flag reported, never counted
    assert(adj(1.37, 37.3, 1.19, 30.0, intrinsic = true) ===
      ((false, true, false, false)))
  }

  test("the r12 q229 scenario end-to-end: a 12x-starved leg at cold " +
      "canaries is corrected by the query's own profile and " +
      "re-labeled, while the same wall shape with a clean profile " +
      "keeps its flag") {
    val xs = Seq(-2.0, -1.0, 0.0)
    // wall ~19 s where the isolated box measures ~1.5: exponent 1.2+
    val times = Seq(0.88, 1.17, 19.0)
    val (eLast, _) = SweepMath.slopes(xs, times)
    assert(eLast > 1.2)
    // the starved leg's run/cpu reads ~12x the quiet legs' ratio
    val qF = Seq(1.15, 1.08, 13.0)
    val deflators = SweepMath.starveDeflators(qF)
    val norm = SweepMath.normalizedTimes(times, deflators)
    val (eNorm, _) = SweepMath.slopes(xs, norm)
    val (flag, raw, contended, starved) = SweepMath.adjudicate(
      eLast, times.last, eNorm, norm.last,
      Seq(1.2, 1.2, 1.3), Seq(1.1, 1.2, 1.4), qF, 2.0, 3.0,
      intrinsic = false)
    assert(raw && starved && !contended && !flag)
    // the same wall with a CLEAN task profile is a real regression:
    // nothing deflates, the flag stands
    val qClean = Seq(1.15, 1.08, 1.2)
    val norm2 = SweepMath.normalizedTimes(times,
      SweepMath.starveDeflators(qClean))
    val (eNorm2, _) = SweepMath.slopes(xs, norm2)
    val (flag2, raw2, cont2, starv2) = SweepMath.adjudicate(
      eLast, times.last, eNorm2, norm2.last,
      Seq(1.2, 1.2, 1.3), Seq(1.1, 1.2, 1.4), qClean, 2.0, 3.0,
      intrinsic = false)
    assert(raw2 && !cont2 && !starv2 && flag2)
  }

  test("crossLegDistorted: unequal defining-leg deflators past the " +
      "1.5x ratio, with sub-1 factors clamped to the no-deflation 1") {
    assert(SweepMath.crossLegDistorted(Seq(1.0, 4.66, 2.3)))
    assert(!SweepMath.crossLegDistorted(Seq(9.0, 2.0, 2.0)))
    assert(!SweepMath.crossLegDistorted(Seq(1.0, 1.2))) // inside ratio
    assert(SweepMath.crossLegDistorted(Seq(0.5, 2.0))) // clamps to 1 vs 2
    assert(!SweepMath.crossLegDistorted(Seq(3.0))) // no defining pair
  }

  test("the r14 q285 false flag replayed: unequal per-leg deflation " +
      "manufactures a corrected exponent > 2 on a 0.70 operator; the " +
      "tail re-measure + splice clears it without a judge") {
    // sf1 -> sf3 -> sf10 axis; true isolated walls [5.1, 7.4, 17.2]
    // (judge-measured, exponent 0.70). The contended driver box
    // inflates sf3 x1.5 and sf10 x4.0, while the canaries MISREAD the
    // inflation (sf3 canary 4.66, sf10 canary 2.3 — the r14 artifact's
    // actual factors): per-leg self-deflation then over-corrects sf3
    // and under-corrects sf10, bending the corrected curve STEEPER.
    val xs = Seq(0.0, math.log10(3.0), 1.0)
    val trueWalls = Seq(5.1, 7.4, 17.2)
    val observed = Seq(5.1, 7.4 * 1.5, 17.2 * 4.0)
    val envF = Seq(1.0, 4.66, 2.3)
    val (eRaw, _) = SweepMath.slopes(xs, observed)
    assert(eRaw > 1.2, s"raw exponent $eRaw should flag")
    val norm = SweepMath.normalizedTimes(observed, envF)
    val (eNorm, _) = SweepMath.slopes(xs, norm)
    assert(eNorm > 1.2, s"corrected exponent $eNorm replicates the " +
      "false-flag distortion (r14 read 2.20 on this operator)")
    // OLD rule (distorted unknown): corrected exponent confirms ->
    // false flag on a healthy operator
    val (oldFlag, _, _, _) = SweepMath.adjudicate(
      eRaw, observed.last, eNorm, norm.last,
      envF, Seq(1.0, 1.0, 1.0), Seq(1.1, 1.1, 1.1), 2.0, 3.0,
      intrinsic = false)
    assert(oldFlag, "without distortion detection the healthy " +
      "operator false-flags — the r14 failure this fix exists for")
    // NEW rule: the distortion is machine-detectable, triggers the
    // targeted tail re-measure...
    assert(SweepMath.needsTailRemeasure(eRaw, observed.last,
      envF, Seq(1.0, 1.0, 1.0), Seq(1.1, 1.1, 1.1), envF,
      2.0, 3.0, intrinsic = false))
    // ...and the post-cooldown quiet re-measure splices in via
    // mergeMin (fresh quiet walls win the per-leg min), after which
    // nothing is left to adjudicate: no raw flag, no contention
    val staleTail = Seq(leg(observed(1), calib = 4.66 * 0.494),
      leg(observed(2), calib = 2.3 * 0.494))
    val freshTail = Seq(leg(trueWalls(1), calib = 0.494 * 1.02),
      leg(trueWalls(2), calib = 0.494 * 1.05))
    val splicedTail = SweepMath.mergeMin(staleTail, freshTail)
    assert(splicedTail.map(_.t) === Seq(7.4, 17.2))
    val splicedWalls = observed.head +: splicedTail.map(_.t)
    val splicedF = 1.0 +: SweepMath.factors(
      splicedTail.map(_.calib), 0.494)
    val (eSpliced, _) = SweepMath.slopes(xs, splicedWalls)
    assert(math.abs(eSpliced - 0.70) < 0.02)
    val (flagS, rawS, contS, _) = SweepMath.adjudicate(
      eSpliced, splicedWalls.last, eSpliced, splicedWalls.last,
      splicedF, Seq(1.0, 1.0, 1.0), Seq(1.1, 1.1, 1.1), 2.0, 3.0,
      intrinsic = false)
    assert(!flagS && !rawS && !contS,
      "the healthy operator clears locally after the splice")
    // endgame when the box is STILL hot at re-measure time: the
    // correction stays distorted, and a distorted correction can
    // CONFIRM nothing — relabeled contended, never a false flag
    val (flagD, rawD, contD, _) = SweepMath.adjudicate(
      eRaw, observed.last, eNorm, norm.last,
      envF, Seq(1.0, 1.0, 1.0), Seq(1.1, 1.1, 1.1), 2.0, 3.0,
      intrinsic = false, distorted = true)
    assert(!flagD && rawD && contD,
      "unresolved distortion relabels contended instead of flagging")
  }

  test("a genuine superlinear plant under the same distorted " +
      "contention still flags after the splice") {
    // true walls [2, 10, 50]: exponent 1.34 — a real regression. Same
    // contamination pattern as the q285 replay (sf3 x1.5 @ canary
    // 4.66, sf10 x4.0 @ canary 2.3).
    val xs = Seq(0.0, math.log10(3.0), 1.0)
    val trueWalls = Seq(2.0, 10.0, 50.0)
    val observed = Seq(2.0, 15.0, 200.0)
    val envF = Seq(1.0, 4.66, 2.3)
    val (eRaw, _) = SweepMath.slopes(xs, observed)
    assert(SweepMath.needsTailRemeasure(eRaw, observed.last,
      envF, Seq(1.0, 1.0, 1.0), Seq(1.1, 1.1, 1.1), envF,
      2.0, 3.0, intrinsic = false))
    // quiet re-measure: the true (still superlinear) walls win the min
    val splicedTail = SweepMath.mergeMin(
      Seq(leg(observed(1), calib = 2.3), leg(observed(2), calib = 1.14)),
      Seq(leg(trueWalls(1), calib = 0.494 * 1.02),
        leg(trueWalls(2), calib = 0.494 * 1.03)))
    val walls = observed.head +: splicedTail.map(_.t)
    val fs = 1.0 +: SweepMath.factors(splicedTail.map(_.calib), 0.494)
    val (eS, _) = SweepMath.slopes(xs, walls)
    assert(eS > 1.2, s"plant exponent $eS survives the splice")
    assert(!SweepMath.crossLegDistorted(fs))
    val (flag, raw, cont, _) = SweepMath.adjudicate(
      eS, walls.last, eS, walls.last,
      fs, Seq(1.0, 1.0, 1.0), Seq(1.1, 1.1, 1.1), 2.0, 3.0,
      intrinsic = false)
    assert(flag && raw && !cont,
      "contention + distortion cannot launder a real regression")
  }
}
