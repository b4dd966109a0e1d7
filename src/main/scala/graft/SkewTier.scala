package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The SKEW TIER of the bench: measures the skew machinery
  * ([[graft.operators.Skew]]'s salted agg/join, the census-adaptive
  * `cappedFanJoin` behind `maxBin`/`maxBlock`) under data that is
  * actually skewed, instead of the TPC-H-ish near-uniform sweep tiers
  * (r14 verdict item 1: the 100 TB hot-key story was spec-proven on
  * toy one-hot fixtures only).
  *
  * Three kinds of driver-gated evidence, all emitted into the bench
  * JSON's `"skew"` block:
  *
  *  1. '''Timing rows''' — each skew query measured in a fresh forked
  *     JVM ([[SweepOne]], the sweep's own isolation harness) across
  *     `[uniform sf1, skew sf1, skew sf3]` per-round — plus a `skew
  *     sf10` fourth leg on NOTES-cadence deep runs
  *     (`SPARK_GRAFT_SKEW_DEEP=1`; [[SkewDepth]]-capped queries stay
  *     at their cap either way). Same row counts per sf, Zipf
  *     α=1.1 keys — [[graft.tools.GenSf]] `--skew`. The artifact
  *     records the skew/uniform wall ratio at equal volume (the key
  *     distribution is the only variable), the skew-decade exponent
  *     (sf1→sf3 on the SKEWED data), per-leg parallelism
  *     (task-run-seconds / wall — a hot-key straggler collapses it),
  *     and the sweep's canary/starvation adjudication so a contended
  *     box cannot fake a skew cliff.
  *  2. '''Row-identity checks''' — the salted/capped paths against
  *     their direct twins ON SKEWED DATA (multiset signature over all
  *     columns): `saltedCountSum` vs direct groupBy, `saltedJoin` vs
  *     plain join, `blockedBestMatch(maxBlock)` vs uncapped,
  *     `sessionConcurrency(maxBin)` vs uncapped. The call-site specs
  *     prove these on one-hot fixtures; this promotes them to
  *     driver-gated evidence on Zipf data at sweep scale.
  *  3. '''Plan audit''' — every skew query's final adaptive plan at
  *     skew sf1 through [[PlanAudit]] (no cartesian products, no
  *     unbounded nested-loop joins beyond the reviewed `!bnlj`
  *     allowances; shuffle counts recorded).
  *
  * Flag semantics (mirrors the sweep, INCLUDING its raw-flag retry):
  * a first-pass `flag` triggers one cooldown re-measure of all legs
  * with per-leg min-merge before the row is final — a transient
  * inflated forked sample (real task-CPU inflation the canaries
  * cannot see; observed live on q163, one sample at 3.4× the CPU of
  * four others on identical legs) must not flag a healthy operator.
  * `flag` = superlinear wall
  * exponent across the skew decade that survives contention
  * correction; `straggler` = parallelism collapse on the skew leg vs
  * the uniform leg at equal volume (> [[StragglerRatio]]×);
  * `skew_sensitive` = corrected equal-volume wall ratio >
  * [[RatioBound]] (annotation — extra work under skew can be the
  * data's own property, e.g. hot-hour concurrency mass; the exponent
  * and straggler signals separate engine cliffs from data mass).
  * When the two equal-volume legs' deflators are cross-leg distorted
  * the RAW ratio adjudicates instead (`ratio_distorted` recorded) —
  * per-leg self-deflation must not manufacture the annotation.
  * Identity mismatches and crashed legs are hard failures
  * (`skew_errors`, process exit like sweep errors).
  */
object SkewTier {

  /** Queries measured on the skew tier: the salted-agg gate, the two
    * co-visitation shapes (hot items), the concurrency pair-join and
    * its sweep-line twin (hot hours), and the blocked-match linkage
    * (hot block).
    *
    * Per-round cadence (r15 verdict item 2): the DRIVER bench
    * measures a [[RotationSize]]-query window of this list chosen by
    * [[rotation]] — six forked skew sweeps per run do not fit the
    * 3600 s driver budget next to the uniform sweep (BENCH_r15 was
    * killed at exactly the timeout), and the identity checks + plan
    * audits (the hard gates, cheap, in-process) still run over the
    * FULL list every round. Non-depth-capped queries run
    * [skew sf1, sf3] per-round; the sf10 fourth leg — the full skew
    * decade — is reserved for NOTES-cadence deep runs
    * (`SPARK_GRAFT_SKEW_DEEP=1`), where the uniform tier's
    * three-decade evidence gets its skewed counterpart. */
  val Queries: Seq[String] = Seq(
    "q126_skew_salted_agg", "q104_covisitation",
    "q163_session_covisitation", "q241_session_concurrency",
    "q282_concurrency_sweepline", "q247_fuzzy_linkage")

  /** Rotation window size: 3 of the 6 skew queries per round, so two
    * consecutive rounds cover the whole tier. */
  val RotationSize: Int = 3

  /** Deterministic per-round rotation window — exactly the kill-test
    * sampler's rule (`tools/killtest.py --sample`): round R takes the
    * window starting at `(R * k) mod n`, wrapping, so consecutive
    * rounds sweep the list with no query starved. Pure; spec-tested
    * (every query appears within ceil(n/k) consecutive rounds). */
  def rotation(round: Int, k: Int = RotationSize,
      qs: Seq[String] = Queries): Seq[String] = {
    val n = qs.size
    val start = ((round * k) % n + n) % n
    (0 until math.min(k, n)).map(i => qs((start + i) % n))
  }

  /** Per-query cap on how many SKEW legs (after the uniform leg) a
    * query takes, mirroring the sweep's `deepDepth`:
    *  - q241's pair mass is the data's own concurrency growth
    *    (documented intrinsic at RangeJoin); its skew evidence is the
    *    sf1 ratio (measured 0.27 — hot hours MERGE a user's events
    *    into fewer, denser sessions, shrinking span count and pair
    *    mass), and the sweep-line twin q282 carries the skew decade;
    *  - q247's within-block pair mass grows ~sf² when the blocking
    *    key has fixed cardinality (25 nations) — the documented
    *    intrinsic ER hazard (EntityResolution scaladoc: the blocking-
    *    key choice, not the plan). Measured once on the full depth:
    *    skew legs [19.8, 154.1] s, exponent 1.87 / cpu 1.92 ≈ the
    *    predicted square, parallelism flat at 28–30 (the capped fan
    *    join keeps it distributed — no straggler); retired to the
    *    sf1 ratio leg (measured 2.19 ≈ the Zipf Σp² ratio over 25
    *    blocks) so the per-round bench doesn't pay a 2×154 s leg to
    *    re-prove a by-design quadratic. */
  val SkewDepth: Map[String, Int] = Map(
    "q241_session_concurrency" -> 1,
    "q247_fuzzy_linkage" -> 1)

  /** Corrected equal-volume skew/uniform wall ratio above which a row
    * is annotated `skew_sensitive`. 3× leaves room for the legitimate
    * extra data mass skew creates (hot-hour overlap, denser per-key
    * groups) while catching an operator whose plan degenerates. */
  val RatioBound: Double = 3.0

  /** Parallelism-collapse factor for the `straggler` annotation: the
    * uniform leg's task parallelism (run-seconds/wall) over the
    * equal-volume skew leg's. A salted/capped plan keeps parallelism
    * within this of the uniform leg; one hot task collapses it. Only
    * meaningful when the uniform leg itself was parallel (> 4×) and
    * the skew leg is past the scheduling floor (> 1 s). */
  val StragglerRatio: Double = 4.0

  /** One adjudicated skew-tier timing row. `rank` orders rows
    * healthy-first in the artifact (0 ok, 1 annotated, 2 flagged,
    * 3 error). `retried` records that the caller re-measured the legs
    * after a first-pass flag (the sweep's own raw-flag rule, ported
    * here after a live false flag: one forked q163 sample burned
    * 3.4× the task CPU of four other samples of the SAME legs with
    * CLEAN canaries — transient real-work inflation no deflator can
    * correct; only a second sample clears it). */
  final case class Row(name: String, json: String, rank: Int,
      flag: Boolean, straggler: Boolean, sensitive: Boolean,
      contended: Boolean, error: Boolean)

  private def jnum(x: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(x))

  /** Adjudicate one query's legs into an artifact row. `legs` are
    * `[uniform sf1, skew sf1, (skew sf3, (skew sf10))]` in dir order
    * — per-round runs stop at sf3, deep runs add sf10, and
    * [[SkewDepth]]-capped queries stop at their cap; the skew-decade
    * exponent fits whatever skew legs are present. Pure — spec-tested
    * in SkewTierSpec. */
  def row(name: String, dirs: Seq[String], legs: Seq[SweepMath.Leg],
      contendedFactor: Double, starvedFactor: Double,
      retried: Boolean = false): Row = {
    def legArr(key: String, f: SweepMath.Leg => Double,
        digits: Int): String =
      s""""$key":[${legs.map(l => jnum(f(l), digits)).mkString(",")}]"""
    val times = legs.map(_.t)
    if (times.exists(_ <= 0.0)) {
      return Row(name, s"""{${legArr("times", _.t, 3)},""" +
        s"""${legArr("calib", _.calib, 3)},"error":true}""",
        3, flag = false, straggler = false, sensitive = false,
        contended = false, error = true)
    }
    val xorF = SweepMath.factors(legs.map(_.calib), Calib.BaselineSec)
    val sparkF = SweepMath.factors(legs.map(_.scanary),
      Calib.SparkBaselineSec)
    val qF = SweepMath.qfactors(legs)
    val starveD = SweepMath.starveDeflators(qF)
    val envF = xorF.zip(sparkF).zip(starveD).map {
      case ((a, b), s) => math.max(math.max(a, b), s) }
    val normTs = SweepMath.normalizedTimes(times, envF)
    // equal-volume ratio: skew sf1 leg over uniform sf1 leg
    val ratio = times(1) / times(0)
    val ratioNorm = normTs(1) / normTs(0)
    // Ratio distortion guard (observed live, r16 deep run): when the
    // two equal-volume legs' environment deflators are themselves
    // unequal (> SweepMath.CrossLegRatio), the NORMALIZED quotient is
    // manufactured by per-leg self-deflation, not by the query —
    // q247's raw ratio read 2.11 (the documented Zipf Σp² intrinsic)
    // while ratio_norm read 7.88 because the uniform leg sampled
    // ~3.7x more starved than the skew leg. Mirror the sweep's
    // refusal to adjudicate on distorted numbers: bound-check the RAW
    // ratio instead, and record the distortion in the row.
    val ratioDistorted = SweepMath.crossLegDistorted(envF.take(2))
    val ratioForBound = if (ratioDistorted) ratio else ratioNorm
    // per-leg task parallelism: run-seconds over wall (missing -> -1)
    val par = legs.map(l => if (l.run > 0.0) l.run / l.t else -1.0)
    val straggler = par(0) > 4.0 && par(1) > 0.0 &&
      par(0) / par(1) > StragglerRatio && times(1) > 1.0
    val sensitive = ratioForBound > RatioBound && times(1) > 1.0
    // skew-decade exponent + sweep-style adjudication on the skew legs
    val skewLegs = legs.drop(1)
    val (flag, contended, expJson) =
      if (skewLegs.size >= 2) {
        val xs = SweepMath.axis(dirs.drop(1))
        val (eLast, _) = SweepMath.slopes(xs, skewLegs.map(_.t))
        val (eNorm, _) = SweepMath.slopes(xs, normTs.drop(1))
        val eCpu =
          if (skewLegs.forall(_.cpu > 0.0))
            Some(SweepMath.slopes(xs, skewLegs.map(_.cpu))._1)
          else None
        val distorted = SweepMath.crossLegDistorted(envF.drop(1))
        val (f, _, c, _) = SweepMath.adjudicate(
          eLast, skewLegs.last.t, eNorm, normTs.drop(1).last,
          xorF.drop(1), sparkF.drop(1), qF.drop(1),
          contendedFactor, starvedFactor, intrinsic = false,
          distorted = distorted)
        (f, c,
          s""""exponent_skew":${jnum(eLast, 2)},""" +
          s""""exponent_skew_norm":${jnum(eNorm, 2)},""" +
          eCpu.map(e => s""""exponent_skew_cpu":${jnum(e, 2)},""")
            .getOrElse("") +
          s""""distorted":$distorted,""")
      } else {
        // single skew leg: no exponent; contention still reported
        val c = xorF.drop(1).exists(_ > contendedFactor) ||
          sparkF.drop(1).exists(_ > contendedFactor)
        (false, c, "")
      }
    val rank = if (flag) 2 else if (straggler || sensitive) 1 else 0
    Row(name,
      s"""{${legArr("times", _.t, 3)},""" +
      s"""${legArr("calib", _.calib, 3)},""" +
      s"""${legArr("scanary", _.scanary, 3)},""" +
      s"""${legArr("run", _.run, 3)},""" +
      s"""${legArr("cpu", _.cpu, 3)},""" +
      s""""par":[${par.map(jnum(_, 1)).mkString(",")}],""" +
      s""""factor":[${xorF.map(jnum(_, 2)).mkString(",")}],""" +
      s""""sfactor":[${sparkF.map(jnum(_, 2)).mkString(",")}],""" +
      s""""qfactor":[${qF.map(jnum(_, 2)).mkString(",")}],""" +
      s""""ratio":${jnum(ratio, 2)},"ratio_norm":${jnum(ratioNorm, 2)},""" +
      s""""ratio_distorted":$ratioDistorted,""" +
      expJson +
      s""""contended":$contended,"straggler":$straggler,""" +
      s""""retried":$retried,""" +
      s""""skew_sensitive":$sensitive,"flag":$flag}""",
      rank, flag, straggler, sensitive, contended, error = false)
  }

  /** Order-insensitive multiset signature of a DataFrame: row count,
    * sum of per-row hashes, and a second moment, with every column
    * cast to string through Spark's own formatter (both sides of a
    * compare are Spark, so formatting cancels). Hashes are reduced
    * mod ~1e9 before summing so the sums cannot overflow under ANSI
    * arithmetic at any sweep sf. */
  def msetSig(df: DataFrame): (Long, Long, Long) = {
    val h0 = xxhash64(df.columns.sorted.map(c => col(c).cast("string")): _*)
    val r = df
      .select(pmod(h0, lit(1000000007L)).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s1"),
        sum(pmod(col("h") * col("h"), lit(999999937L))).as("s2"))
      .head()
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  private def compare(label: String, a: => DataFrame,
      b: => DataFrame): (String, String) =
    try {
      val (sa, sb) = (msetSig(a), msetSig(b))
      if (sa == sb) label -> s"ok(${sa._1})"
      else label -> s"MISMATCH:$sa!=$sb"
    } catch {
      case e: Throwable => label -> s"error:${e.getClass.getSimpleName}"
    }

  /** The row-identity checks, run on a SKEWED dir: every salted or
    * census-capped path must be row-identical to its direct twin on
    * the same Zipf data. Returns (check, verdict) pairs; any verdict
    * not starting with "ok" is a hard failure. */
  def identityChecks(s: SparkSession, dir: String): Seq[(String, String)] = {
    import graft.operators.{EntityResolution, RangeJoin, Skew}
    val ev = Tables.events(s, dir)
    val dec = DecimalType(38, 6)

    val saltedSum = compare("salted_sum",
      Skew.saltedCountSum(ev, Seq("user_id"), "value",
        col("event_id"), salt = 16),
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value"), 6).cast(dec)).cast("double")
            .as("value_sum")))

    // small side: per-user first-seen week — a genuine dim the plain
    // join would broadcast; identity is over the enriched event rows
    val userDim = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
    val saltedJoin = compare("salted_join",
      Skew.saltedJoin(ev.select("event_id", "user_id"), userDim,
        Seq("user_id"), col("event_id"), salt = 16),
      ev.select("event_id", "user_id").join(userDim, Seq("user_id")))

    // q247's linkage shape on the skew-tier customer table (hot
    // nation block): capped vs uncapped best-match
    val cust = Tables.customer(s, dir)
    val clean = cust.select(col("c_custkey").as("ckey"),
      col("c_name").as("cname"), col("c_nationkey").as("block"))
    val dirty = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("dkey"),
        expr("concat(substr(c_name, 1, cast(9 + c_custkey % 9 as int))," +
          " substr(c_name, cast(11 + c_custkey % 9 as int), 100))")
          .as("dname"),
        col("c_nationkey").as("block"))
    val blockCap = compare("blocked_match_cap",
      EntityResolution.blockedBestMatch(clean, dirty,
        maxDist = 2, maxBlock = 32),
      EntityResolution.blockedBestMatch(clean, dirty,
        maxDist = 2, maxBlock = 0))

    // q241's concurrency histogram (hot hours): capped vs uncapped
    val spans = RangeJoin.sessionSpans(ev, gap = "6 hours")
    val binCap = compare("session_bins_cap",
      RangeJoin.sessionConcurrency(spans, binMs = 3600000L,
        maxBin = 4096),
      RangeJoin.sessionConcurrency(spans, binMs = 3600000L))

    Seq(saltedSum, saltedJoin, blockCap, binCap)
  }

  /** Final-plan audit of each skew query at a skewed dir: executes
    * the query so AQE finalizes, then applies [[PlanAudit]]. `!bnlj`
    * allowances come from the same reviewed baseline as the main
    * audit. Returns (name, verdict). */
  def audit(s: SparkSession, dir: String, names: Seq[String],
      baseline: Map[String, Int]): Seq[(String, String)] =
    names.map { name =>
      name -> (try {
        val df = SparkEntry.queries(name)(s, dir)
        df.queryExecution.toRdd.count()
        val shape = PlanAudit.audit(df.queryExecution.executedPlan)
        val okBnlj = baseline.getOrElse(s"$name!bnlj", 0)
        if (shape.cartesian > 0) "CartesianProduct"
        else if (shape.unboundedBnlj > okBnlj)
          s"BroadcastNestedLoopJoin:${shape.unboundedBnlj}>$okBnlj"
        else s"ok(shuffles:${shape.shuffles})"
      } catch {
        case e: Throwable => s"error:${e.getClass.getSimpleName}"
      })
    }
}
