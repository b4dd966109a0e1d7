package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import SweepMath.Leg

/** The skew tier's adjudication arithmetic and identity machinery,
  * pinned as unit facts (the same discipline as [[SweepMathSpec]]:
  * the math that decides a skew flag must be testable without a
  * two-minute forked measurement run). The in-memory Zipf fixture
  * mirrors the generated tier's shape: one celebrity key carrying
  * ~threefold the tail's mass per salt bucket. */
class SkewTierSpec extends AnyFunSuite with SparkSuite {

  private val dirs3 = Seq("benchdata/sf1", "benchdata/skew/sf1",
    "benchdata/skew/sf3")

  private def leg(t: Double, calib: Double = 0.43, scanary: Double = 0.27,
      run: Double = -1.0, cpu: Double = -1.0) =
    Leg(t, calib, scanary, run, cpu)

  // pins: Calib.BaselineSec = 0.428, SparkBaselineSec = 0.266 — the
  // default legs read factor ~1.0 (idle box) unless a test inflates

  test("healthy row: flat ratio, sublinear skew exponent, no flags") {
    val legs = Seq(leg(2.0, run = 40.0, cpu = 30.0),
      leg(2.4, run = 48.0, cpu = 36.0), leg(4.0, run = 80.0, cpu = 60.0))
    val r = SkewTier.row("q", dirs3, legs, 2.0, 3.0)
    assert(!r.flag && !r.straggler && !r.sensitive && !r.error)
    assert(r.rank === 0)
    // sf1 -> sf3 is log10(3) decades: slope of (2.4 -> 4.0)
    val expect = (math.log10(4.0) - math.log10(2.4)) / math.log10(3.0)
    assert(r.json.contains(s""""exponent_skew":${f"$expect%.2f"}"""))
    assert(r.json.contains(""""ratio":1.20"""))
  }

  test("straggler: parallelism collapse on the skew leg annotates") {
    // uniform leg 20x parallel; skew leg does the same task-seconds
    // on ~2 effective cores -> par ratio 10 > 4
    val legs = Seq(leg(2.0, run = 40.0, cpu = 38.0),
      leg(20.0, run = 40.0, cpu = 38.0), leg(34.0, run = 68.0, cpu = 64.0))
    val r = SkewTier.row("q", dirs3, legs, 2.0, 3.0)
    assert(r.straggler)
    assert(r.rank === 1)
    // ratio 10 > RatioBound also marks skew_sensitive
    assert(r.sensitive)
  }

  test("superlinear skew decade flags; contention clears it") {
    // wall quadruples over 0.48 decades -> exponent ~2.9
    val legs = Seq(leg(1.0), leg(2.0), leg(8.0))
    val r = SkewTier.row("q", dirs3, legs, 2.0, 3.0)
    assert(r.flag && r.rank === 2)
    // same times but the skew legs' canaries read 5x the pin: the
    // corrected exponent (both legs deflated alike) still flags —
    // equal contention doesn't manufacture or hide slope
    val hot = Seq(leg(1.0), leg(2.0, calib = 2.14), leg(8.0, calib = 2.14))
    assert(SkewTier.row("q", dirs3, hot, 2.0, 3.0).flag)
    // unequal contention on the defining legs (cross-leg distorted):
    // the corrected exponent can't confirm -> contended, not flagged
    val skewed = Seq(leg(1.0), leg(2.0, calib = 2.14), leg(8.0, calib = 0.90))
    val rd = SkewTier.row("q", dirs3, skewed, 2.0, 3.0)
    assert(!rd.flag && rd.contended)
  }

  test("the live q163 false flag replayed: a transiently inflated " +
      "sample with CLEAN canaries flags; the retry's min-merge with " +
      "an honest second sample clears it and records retried") {
    // the observed numbers: healthy legs [2.28, 2.86, ~4.9] s, one
    // forked sample read the sf3 leg at 12.0 s / 150 task-CPU-s with
    // canaries at factor ~1.4 (clean) — no deflator can correct real
    // CPU inflation, so the first-pass row flags
    val inflated = Seq(leg(2.28, run = 25.0, cpu = 20.5),
      leg(2.86, run = 24.8, cpu = 20.0),
      leg(12.02, run = 267.9, cpu = 150.0))
    val first = SkewTier.row("q163", dirs3, inflated, 2.0, 3.0)
    assert(first.flag && !first.contended,
      "clean canaries cannot clear real one-sample CPU inflation")
    // the re-measure reads the honest legs; min-merge keeps per-leg
    // minima and the re-adjudicated row is healthy
    val honest = Seq(leg(2.43, run = 27.1, cpu = 21.1),
      leg(2.74, run = 25.6, cpu = 21.2),
      leg(4.86, run = 55.8, cpu = 39.4))
    val merged = SweepMath.mergeMin(inflated, honest)
    assert(merged.map(_.t) === Seq(2.28, 2.74, 4.86))
    val r = SkewTier.row("q163", dirs3, merged, 2.0, 3.0, retried = true)
    assert(!r.flag && r.rank === 0)
    assert(r.json.contains(""""retried":true"""))
    // a genuine skew cliff re-measures just as superlinear: the
    // min-merge of two consistent superlinear samples keeps the flag
    val cliff = Seq(leg(2.0), leg(2.5), leg(11.0))
    val mergedCliff = SweepMath.mergeMin(cliff,
      Seq(leg(2.1), leg(2.6), leg(10.8)))
    assert(SkewTier.row("q", dirs3, mergedCliff, 2.0, 3.0,
      retried = true).flag)
  }

  test("crashed leg is a loud error row") {
    val legs = Seq(leg(1.0), Leg(-1.0, -1.0, -1.0, -1.0, -1.0), leg(3.0))
    val r = SkewTier.row("q", dirs3, legs, 2.0, 3.0)
    assert(r.error && r.rank === 3)
    assert(r.json.contains(""""error":true"""))
  }

  test("single skew leg (depth-capped): ratio only, no exponent") {
    val legs = Seq(leg(2.0), leg(3.0))
    val r = SkewTier.row("q", dirs3.take(2), legs, 2.0, 3.0)
    assert(!r.flag && !r.error)
    assert(!r.json.contains("exponent_skew"))
    assert(r.json.contains(""""ratio":1.50"""))
  }

  test("msetSig is order-insensitive and value-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x", 1.5), (2L, "y", 2.5), (3L, "z", 3.5))
      .toDF("k", "s", "v")
    val b = Seq((3L, "z", 3.5), (1L, "x", 1.5), (2L, "y", 2.5))
      .toDF("k", "s", "v")
    val c = Seq((1L, "x", 1.5), (2L, "y", 2.5), (3L, "z", 3.6))
      .toDF("k", "s", "v")
    assert(SkewTier.msetSig(a) === SkewTier.msetSig(b))
    assert(SkewTier.msetSig(a) !== SkewTier.msetSig(c))
    // column ORDER doesn't matter either (columns are sorted by name)
    val d = b.select("v", "k", "s")
    assert(SkewTier.msetSig(a) === SkewTier.msetSig(d))
  }

  test("identity: salted paths match direct twins on a Zipf fixture") {
    import spark.implicits._
    import graft.operators.Skew
    import org.apache.spark.sql.types.DecimalType
    // celebrity key 7 carries half the rows; values vary per row
    val ev = spark.range(4000).select(
      col("id").as("event_id"),
      when(col("id") % 2 === 0, lit(7L))
        .otherwise(pmod(col("id"), lit(97L))).as("user_id"),
      round(pmod(col("id") * 37, lit(500)).cast("double") / 7.0, 2)
        .as("value"))
    val dec = DecimalType(38, 6)
    val direct = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 6).cast(dec)).cast("double")
          .as("value_sum"))
    val salted = Skew.saltedCountSum(ev, Seq("user_id"), "value",
      col("event_id"), salt = 16)
    assert(SkewTier.msetSig(salted) === SkewTier.msetSig(direct))

    val dim = ev.groupBy(col("user_id")).agg(min(col("event_id")).as("first"))
    val plain = ev.select("event_id", "user_id").join(dim, Seq("user_id"))
    val sj = Skew.saltedJoin(ev.select("event_id", "user_id"), dim,
      Seq("user_id"), col("event_id"), salt = 16)
    assert(SkewTier.msetSig(sj) === SkewTier.msetSig(plain))
  }

  test("the live q247 distorted-ratio replayed: an unequally-starved " +
      "uniform leg cannot manufacture skew_sensitive; an honestly " +
      "high ratio still annotates") {
    // the r16 deep-run numbers: uniform leg 9.68 s reading heavily
    // starved (run >> cpu -> big starve deflator), skew leg 20.47 s
    // clean. Raw ratio 2.11 (< 3, the documented intrinsic), norm
    // ratio ~7.9 purely from the unequal deflators.
    val distorted = Seq(leg(9.68, run = 261.0, cpu = 70.0),
      leg(20.47, run = 573.0, cpu = 556.0))
    val rd = SkewTier.row("q247", dirs3.take(2), distorted, 2.0, 3.0)
    assert(!rd.sensitive,
      "per-leg self-deflation manufactured the annotation")
    assert(rd.json.contains(""""ratio_distorted":true"""))
    assert(rd.json.contains(""""ratio":2.11"""))
    // equal deflators, genuinely 4x skew/uniform wall: still annotates
    val honest = Seq(leg(2.0, run = 40.0, cpu = 38.0),
      leg(8.0, run = 160.0, cpu = 152.0))
    val rh = SkewTier.row("q247", dirs3.take(2), honest, 2.0, 3.0)
    assert(rh.sensitive)
    assert(rh.json.contains(""""ratio_distorted":false"""))
    // distorted BUT the raw ratio itself exceeds the bound: the
    // annotation survives on the honest number
    val both = Seq(leg(2.0, run = 54.0, cpu = 14.0),
      leg(8.0, run = 160.0, cpu = 152.0))
    val rb = SkewTier.row("q247", dirs3.take(2), both, 2.0, 3.0)
    assert(rb.sensitive && rb.json.contains(""""ratio_distorted":true"""))
  }

  test("rotation: deterministic window, full coverage, no starvation") {
    val n = SkewTier.Queries.size
    val k = SkewTier.RotationSize
    // deterministic: same round -> same window
    assert(SkewTier.rotation(16) === SkewTier.rotation(16))
    // window size k, all members of the corpus, no duplicates
    (0 to 40).foreach { r =>
      val w = SkewTier.rotation(r)
      assert(w.size === k)
      assert(w.distinct.size === k)
      assert(w.forall(SkewTier.Queries.contains))
    }
    // killtest.py --sample rule: start = (R*k) mod n
    assert(SkewTier.rotation(16) ===
      SkewTier.Queries.slice(0, k)) // 48 % 6 == 0
    assert(SkewTier.rotation(17) ===
      SkewTier.Queries.slice(3, 6)) // 51 % 6 == 3
    // no starvation: every query appears within ceil(n/k) consecutive
    // rounds, from ANY starting round
    val span = (n + k - 1) / k
    (0 until n).foreach { r0 =>
      val seen = (r0 until r0 + span).flatMap(SkewTier.rotation(_)).toSet
      assert(seen === SkewTier.Queries.toSet,
        s"rounds [$r0, ${r0 + span}) missed ${SkewTier.Queries.toSet -- seen}")
    }
    // negative rounds don't crash or under-fill (defensive mod)
    assert(SkewTier.rotation(-3).size === k)
    // k >= n degrades to the whole list
    assert(SkewTier.rotation(5, k = 10).toSet === SkewTier.Queries.toSet)
  }
}
