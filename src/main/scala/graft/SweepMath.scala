package graft

/** The pure arithmetic of the bench scaling sweep, factored out of
  * [[Bench]]'s main so the load-bearing decisions — exponent slopes on
  * a NON-uniform log10(sf) axis, per-leg min-merging of repeated
  * measurements, contention factors, and the flag adjudication — are
  * unit-testable ([[SweepMathSpec]]) instead of only observable
  * through a full bench run. */
private[graft] object SweepMath {

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
    * the per-decade scaling exponents. Requires xs strictly
    * increasing and ts positive. */
  def slopes(xs: Seq[Double], ts: Seq[Double]): (Double, Double) = {
    require(xs.size == ts.size && ts.size >= 2,
      s"slopes needs >= 2 aligned legs, got ${xs.size}/${ts.size}")
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

  /** Per-leg min-merge of two (times, calibs) measurements, keeping
    * each leg's time PAIRED with the calib sample from the run it
    * came from (a time divided by the OTHER run's contention factor
    * would be meaningless). Negative/zero times mean "crashed leg":
    * a crashed leg never wins the min. */
  def mergeMin(a: (Seq[Double], Seq[Double]),
      b: (Seq[Double], Seq[Double])): (Seq[Double], Seq[Double]) = {
    val picked = a._1.indices.map { i =>
      if (b._1(i) > 0.0 && (a._1(i) <= 0.0 || b._1(i) < a._1(i)))
        (b._1(i), b._2(i))
      else (a._1(i), a._2(i))
    }
    (picked.map(_._1), picked.map(_._2))
  }

  /** Per-leg contention factor: canary time over the idle-box pin;
    * -1 marks a leg without a canary sample. */
  def factors(calibs: Seq[Double], baselineSec: Double): Seq[Double] =
    calibs.map(c => if (c > 0.0) c / baselineSec else -1.0)

  /** Wall times deflated by the measured oversubscription. Factor
    * <= 1 (or missing) never inflates a time — an idle box IS the
    * baseline. */
  def normalizedTimes(times: Seq[Double],
      factors: Seq[Double]): Seq[Double] =
    times.zip(factors).map { case (t, f) => if (f > 1.0) t / f else t }

  /** Parse a `SWEEPONE_RESULT {...}` protocol line into
    * (times, calibs), both `nDirs` long. None when the line carries
    * no well-formed times array of the right arity (the caller
    * treats that like a crashed child). A malformed/missing calib
    * array degrades to all -1 (no canary data) rather than rejecting
    * the measurement — times are the payload, calibs the annotation. */
  def parseResult(line: String, nDirs: Int)
      : Option[(Seq[Double], Seq[Double])] = {
    def arr(key: String): Seq[Double] =
      (s""""$key":\\[([^\\]]*)\\]""").r.findFirstMatchIn(line)
        .map(_.group(1).split(',').filter(_.nonEmpty)
          .flatMap(s => scala.util.Try(s.trim.toDouble).toOption).toSeq)
        .getOrElse(Nil)
    val ts = arr("times")
    val cs = arr("calib")
    if (ts.size == nDirs)
      Some((ts, if (cs.size == nDirs) cs else Seq.fill(nDirs)(-1.0)))
    else None
  }

  /** The flag adjudication:
    *  - `raw` — the unadjusted superlinear signal (top-segment
    *    exponent > 1.2 on a > 1 s top leg);
    *  - `contended` — either exponent-defining leg ran with factor >
    *    `contendedFactor`;
    *  - a contended raw flag survives ONLY if the normalized exponent
    *    still flags (otherwise the box, not the operator, is
    *    superlinear);
    *  - a reviewed-`intrinsic` query never flags (by-design growth,
    *    annotated instead).
    * Returns (flag, rawFlag, contended). */
  def adjudicate(eLast: Double, lastTime: Double, eNorm: Double,
      lastNorm: Double, legFactors: Seq[Double],
      contendedFactor: Double,
      intrinsic: Boolean): (Boolean, Boolean, Boolean) = {
    val rawFlag = eLast > 1.2 && lastTime > 1.0
    val contended = legFactors.takeRight(2).exists(_ > contendedFactor)
    val normFlag = eNorm > 1.2 && lastNorm > 1.0
    val flag = rawFlag && (!contended || normFlag) && !intrinsic
    (flag, rawFlag, contended)
  }
}
