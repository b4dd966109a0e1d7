package graft

/** The pure arithmetic of the bench scaling sweep, factored out of
  * [[Bench]]'s main so the load-bearing decisions — exponent slopes on
  * a NON-uniform log10(sf) axis, per-leg min-merging of repeated
  * measurements, contention/starvation signals, and the flag
  * adjudication — are unit-testable ([[SweepMathSpec]]) instead of
  * only observable through a full bench run. */
private[graft] object SweepMath {

  /** One sweep leg's full measurement record. `t` is the min-of-passes
    * query wall time; `calib` / `scanary` are the xorshift and
    * mini-Spark canary walls sampled just before the passes
    * ([[Calib]]); `run` / `cpu` are the query's OWN summed executor
    * task run time and task CPU time (seconds) for the pass that won
    * the min — the resource profile that adjudicates a flag without a
    * judge run. -1 marks a missing sample; t <= 0 marks a crashed
    * leg. */
  case class Leg(t: Double, calib: Double, scanary: Double,
      run: Double, cpu: Double)

  /** sf of a sweep dir, parsed from its exact basename ("sf0.1" ->
    * 0.1). None for a basename that isn't `sf<number>` — the caller
    * falls back to assuming 10x steps (leg-index axis). */
  def sfOf(dir: String): Option[Double] =
    "^sf([0-9]+(?:\\.[0-9]+)?)$".r.findFirstMatchIn(
      dir.replaceAll("/+$", "").split('/').last)
      .map(_.group(1).toDouble)

  /** Decade positions for the sweep dirs: log10(sf) when every
    * basename parses, else the leg index (assumed-decade fallback).
    * The legs are NOT equally spaced once the sf3 deep tier joins
    * (sf1 -> sf3 is log10(3) = 0.48 decades), so exponents must be
    * slopes on this axis, not per-leg ratios. */
  def axis(dirs: Seq[String]): Seq[Double] = {
    val sfs = dirs.map(sfOf)
    if (sfs.forall(_.isDefined)) sfs.map(s => math.log10(s.get))
    else dirs.indices.map(_.toDouble)
  }

  /** (top-segment slope, least-squares slope) of log10(ts) on xs —
    * the per-decade scaling exponents. The documented preconditions
    * are ENFORCED, not assumed: a duplicated sweep dir would make the
    * top segment 0/0 = NaN, and `NaN > 1.2` is false — a misconfigured
    * sweep would silently never flag. Fail loudly instead. */
  def slopes(xs: Seq[Double], ts: Seq[Double]): (Double, Double) = {
    require(xs.size == ts.size && ts.size >= 2,
      s"slopes needs >= 2 aligned legs, got ${xs.size}/${ts.size}")
    require(xs.zip(xs.tail).forall { case (a, b) => a < b },
      s"slopes needs strictly increasing sf axis, got $xs " +
        "(duplicated or unordered sweep dirs?)")
    require(ts.forall(_ > 0.0),
      s"slopes needs positive times, got $ts (crashed leg leaked in?)")
    def lg(x: Double) = math.log10(x)
    val n = ts.size
    val eLast = (lg(ts.last) - lg(ts(n - 2))) / (xs.last - xs(n - 2))
    val xb = xs.sum / n
    val ys = ts.map(lg)
    val yb = ys.sum / n
    val eFit = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }.sum /
      xs.map(x => (x - xb) * (x - xb)).sum
    (eLast, eFit)
  }

  /** Per-leg min-merge of two measurements: the winner of each leg is
    * the run with the smaller positive wall time, and its ENTIRE leg
    * record comes along (a time paired with the OTHER run's canary or
    * task-time samples would be meaningless). A crashed leg (t <= 0)
    * never wins the min. */
  def mergeMin(a: Seq[Leg], b: Seq[Leg]): Seq[Leg] =
    a.zip(b).map { case (la, lb) =>
      if (lb.t > 0.0 && (la.t <= 0.0 || lb.t < la.t)) lb else la
    }

  /** Per-leg contention factor: canary time over the idle-box pin;
    * -1 marks a leg without a canary sample. */
  def factors(calibs: Seq[Double], baselineSec: Double): Seq[Double] =
    calibs.map(c => if (c > 0.0) c / baselineSec else -1.0)

  /** Per-leg starvation factor from the query's OWN resource profile:
    * executor task run time over task CPU time (>= ~1 for a leg whose
    * task threads actually ran while scheduled; large when the tasks
    * spent their lifetime waiting — CPU steal, IO wait, page-cache
    * thrash — whatever the mechanism, the query visibly did not get
    * the machine). -1 when either sample is missing. */
  def qfactors(legs: Seq[Leg]): Seq[Double] =
    legs.map(l => if (l.run > 0.0 && l.cpu > 0.0) l.run / l.cpu else -1.0)

  /** Wall times deflated by the measured oversubscription. Factor
    * <= 1 (or missing) never inflates a time — an idle box IS the
    * baseline. */
  def normalizedTimes(times: Seq[Double],
      factors: Seq[Double]): Seq[Double] =
    times.zip(factors).map { case (t, f) => if (f > 1.0) t / f else t }

  /** Per-leg starvation deflators from the query's OWN task profile:
    * each leg's run/cpu ratio over the query's quietest leg's ratio.
    * A leg whose tasks spent 12x longer scheduled-but-not-executing
    * than the same query's best leg was starved by that multiple,
    * whatever the mechanism — the deflator that recovers the
    * wall the box actually allowed (the r12 q229 mode: 12x wall at
    * cold canaries, which THIS ratio sees because it is measured
    * inside the query itself). Legs without a profile deflate by 1.
    *
    * Only legs whose ratio exceeds `idleCeiling` deflate AT ALL
    * (r13 ADVICE): idle-box run/cpu naturally grows with scale —
    * shuffle-heavy deep legs read 1.05–1.6 on a quiet box ([[Bench]]
    * doc) — so a deep leg whose ratio sits inside that idle band is
    * exhibiting the operator's scale shape, not starvation, and
    * deflating it by its excess over the query's (typically shallow,
    * CPU-tight) quietest leg would shave ~0.18/decade off the top
    * segment and could relabel a genuine borderline regression as
    * contended. Legs past the ceiling still deflate by their full
    * ratio over the quietest leg — once tasks measurably starve, the
    * whole excess is environment, not shape. */
  def starveDeflators(qFactors: Seq[Double],
      idleCeiling: Double = Bench.StarveDeflateCeiling): Seq[Double] = {
    val pos = qFactors.filter(_ > 0.0)
    if (pos.isEmpty) qFactors.map(_ => 1.0)
    else {
      val base = pos.min
      qFactors.map(f =>
        if (f > idleCeiling) math.max(1.0, f / base) else 1.0)
    }
  }

  /** Parse a `SWEEPONE_RESULT {...}` protocol line into per-dir legs.
    * None when the line carries no well-formed times array of the
    * right arity (the caller treats that like a crashed child). Any
    * other malformed/missing array degrades to all -1 (no sample)
    * rather than rejecting the measurement — times are the payload,
    * the rest annotation. */
  def parseResult(line: String, nDirs: Int): Option[Seq[Leg]] = {
    def arr(key: String): Seq[Double] = {
      val parsed = (s""""$key":\\[([^\\]]*)\\]""").r.findFirstMatchIn(line)
        .map(_.group(1).split(',').filter(_.nonEmpty)
          .flatMap(s => scala.util.Try(s.trim.toDouble).toOption).toSeq)
        .getOrElse(Nil)
      if (parsed.size == nDirs) parsed else Seq.fill(nDirs)(-1.0)
    }
    val ts = (s""""times":\\[([^\\]]*)\\]""").r.findFirstMatchIn(line)
      .map(_.group(1).split(',').filter(_.nonEmpty)
        .flatMap(s => scala.util.Try(s.trim.toDouble).toOption).toSeq)
      .getOrElse(Nil)
    if (ts.size != nDirs) None
    else {
      val (cs, ss, rs, us) = (arr("calib"), arr("scanary"),
        arr("run"), arr("cpu"))
      Some(ts.indices.map(i => Leg(ts(i), cs(i), ss(i), rs(i), us(i))))
    }
  }

  /** One `SWEEPONE_LEG {"i":N,"t":...,"calib":...,"scanary":...,
    * "run":...,"cpu":...}` line → (dir index, Leg). The child emits
    * one per completed dir so a later-leg death (watchdog kill, OOM)
    * cannot erase finished legs; None for a malformed line. */
  def parseLeg(line: String): Option[(Int, Leg)] = {
    def num(key: String): Option[Double] =
      (s""""$key":(-?[0-9.]+)""").r.findFirstMatchIn(line)
        .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
    for {
      i <- num("i").map(_.toInt)
      t <- num("t")
    } yield (i, Leg(t, num("calib").getOrElse(-1.0),
      num("scanary").getOrElse(-1.0), num("run").getOrElse(-1.0),
      num("cpu").getOrElse(-1.0)))
  }

  /** Maximum ratio between the exponent-defining legs' per-leg
    * deflators before the CORRECTED exponent stops being trustworthy
    * ([[crossLegDistorted]]). ~1.5 per the r14 adjudication: the
    * false-flag distortion needs materially unequal correction
    * (4.66/2.3 ≈ 2x in the observed case), while equal-contention
    * runs — the common mode — deflate both legs alike and keep the
    * corrected slope meaningful. */
  val CrossLegRatio: Double = 1.5

  /** True when the two exponent-defining (last) legs' effective
    * deflators differ by more than `ratio`. Per-leg self-deflation is
    * only sound when the canary factor tracks the query's ACTUAL
    * inflation; since it tracks it only approximately, unequal
    * factors on adjacent legs inject slope error up to their ratio —
    * the r14 q285 false flag (sf3 deflated ÷4.66, sf10 ÷2.3 →
    * exponent_norm 2.20 on a judge-isolated 0.70 operator). When this
    * is true the caller should RE-MEASURE the defining legs after a
    * cooldown and splice ([[mergeMin]] on those legs) instead of
    * arithmetic-correcting; [[adjudicate]] with `distorted = true`
    * refuses to let the corrected exponent confirm a flag. Factors
    * <= 1 clamp to 1 (they never deflate — [[normalizedTimes]]). */
  def crossLegDistorted(envFactors: Seq[Double],
      ratio: Double = CrossLegRatio): Boolean = {
    val tail = envFactors.takeRight(2).map(f => math.max(1.0, f))
    tail.size == 2 && math.max(tail.head, tail.last) /
      math.min(tail.head, tail.last) > ratio
  }

  /** Whether a raw flag needs the targeted tail re-measure before
    * adjudication: the flag would be decided by the CORRECTED
    * exponent (raw flag on a contended/starved run) AND that
    * correction is cross-leg distorted. Pure decision so the
    * replayed-contention scenarios are spec-testable without forking
    * a measurement child. */
  def needsTailRemeasure(eLast: Double, lastTime: Double,
      xorFactors: Seq[Double], sparkFactors: Seq[Double],
      qFactors: Seq[Double], envFactors: Seq[Double],
      contendedFactor: Double, starvedFactor: Double,
      intrinsic: Boolean): Boolean = {
    def hot(fs: Seq[Double], th: Double) = fs.takeRight(2).exists(_ > th)
    val rawFlag = eLast > 1.2 && lastTime > 1.0
    val contended = hot(xorFactors, contendedFactor) ||
      hot(sparkFactors, contendedFactor)
    val starved = hot(qFactors, starvedFactor)
    rawFlag && (contended || starved) && !intrinsic &&
      crossLegDistorted(envFactors)
  }

  /** The flag adjudication:
    *  - `raw` — the unadjusted superlinear signal (top-segment wall
    *    exponent > 1.2 on a > 1 s top leg);
    *  - `contended` — an exponent-defining leg's ENVIRONMENT canary
    *    (xorshift or mini-Spark) ran > `contendedFactor` over its pin;
    *  - `starved` — an exponent-defining leg's own task profile shows
    *    run/cpu > `starvedFactor`: the query's threads spent most of
    *    their task lifetime not executing, whatever the mechanism —
    *    the r12 failure mode (contention the CPU canary cannot feel)
    *    made machine-readable from the query itself;
    *  - a contended/starved raw flag survives ONLY if the
    *    contention-CORRECTED wall exponent still flags: wall deflated
    *    per leg by the worse of the environment canary factor and the
    *    query's own starvation ratio ([[starveDeflators]]). When the
    *    correction is cross-leg DISTORTED ([[crossLegDistorted]] still
    *    true after the caller's targeted tail re-measure+splice), the
    *    corrected exponent can neither confirm nor clear — the row
    *    relabels contended/starved (never flags) and carries
    *    `distorted` so a reader knows local adjudication ran out of
    *    road (r14: per-leg self-deflation manufactured exponent 2.20
    *    on a judge-measured 0.70 operator). NOT the
    *    task-CPU exponent: CPU-seconds growth is work growth, which
    *    parallelism headroom legitimately absorbs at small sf (healthy
    *    queries measure cpu exponents of 1.3-2.0 with flat wall, and
    *    deep-leg saturation makes it meaningful only past sf1), so a
    *    cpu-exponent survival rule would re-flag exactly the healthy
    *    operators this machinery exists to clear. The cpu exponent is
    *    still RECORDED (`exponent_cpu`) as work-growth evidence for a
    *    human reading the row;
    *  - a reviewed-`intrinsic` query never flags (by-design growth,
    *    annotated instead).
    * Returns (flag, rawFlag, contended, starved). */
  def adjudicate(eLast: Double, lastTime: Double,
      eNorm: Double, lastNorm: Double,
      xorFactors: Seq[Double], sparkFactors: Seq[Double],
      qFactors: Seq[Double],
      contendedFactor: Double, starvedFactor: Double,
      intrinsic: Boolean,
      distorted: Boolean = false): (Boolean, Boolean, Boolean, Boolean) = {
    val rawFlag = eLast > 1.2 && lastTime > 1.0
    def hot(fs: Seq[Double], th: Double) =
      fs.takeRight(2).exists(_ > th)
    val contended = hot(xorFactors, contendedFactor) ||
      hot(sparkFactors, contendedFactor)
    val starved = hot(qFactors, starvedFactor)
    val correctedFlag = eNorm > 1.2 && lastNorm > 1.0 && !distorted
    val flag = rawFlag && (!(contended || starved) || correctedFlag) &&
      !intrinsic
    (flag, rawFlag, contended, starved)
  }
}
