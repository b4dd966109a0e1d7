package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BloomPrune, RangeJoin}
import graft.sources.Layout

/** Pruning-operator behaviors: bloom semi-join filter, Z-order layout
  * audit, binned interval-overlap join. Each checked against an
  * independent naive reimplementation on randomized fixtures plus the
  * invariants the 100 TB design relies on (no false negatives, exact
  * pair dedup across bins). */
class PruneJoinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("bloom filter never false-negatives and audit counts reconcile") {
    val rnd = new scala.util.Random(7)
    val buildKeys = Seq.fill(200)(rnd.nextInt(5000).toLong).distinct
    val probeKeys = Seq.fill(2000)(rnd.nextInt(8000).toLong)
    val build = buildKeys.toDF("k")
    val probe = probeKeys.toDF("k")
    val audit = BloomPrune.semiJoinAudit(probe, "k", build, "k",
      mBits = 1024, k = 3).collect().head
    val trueSet = buildKeys.toSet
    val nTrue = probeKeys.count(trueSet)
    assert(audit.getAs[Long]("n_probe") === probeKeys.size.toLong)
    assert(audit.getAs[Long]("n_true") === nTrue.toLong)
    assert(audit.getAs[Long]("n_false_neg") === 0L,
      "bloom filters must never drop a true match")
    assert(audit.getAs[Long]("n_candidates") ===
      audit.getAs[Long]("n_true") + audit.getAs[Long]("n_false_pos"))
    // the membership column itself: every true key passes
    val words = BloomPrune.buildWords(build, "k", 1024, 3)
    val flagged = BloomPrune.withMembership(probe, "k", words, 3, "m")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    assert(flagged.filter(kv => trueSet(kv._1)).forall(_._2))
  }

  test("bloom membership is a row-local plan: no join, no shuffle") {
    val build = (1L to 100L).toDF("k")
    val probe = (1L to 1000L).toDF("k")
    val words = BloomPrune.buildWords(build, "k", 1024, 3)
    val plan = BloomPrune.withMembership(probe, "k", words, 3, "m")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"membership must evaluate inside the scan stage:\n$plan")
  }

  test("zorder audit: bucket envelopes cover exactly the input") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(3000)((rnd.nextInt(1000).toLong,
      rnd.nextInt(100000).toLong))
    val df = rows.toDF("x", "y")
    val audit = Layout.zorderPruningAudit(df, "x", "y",
      bits = 8, buckets = 16).collect()
    assert(audit.map(_.getAs[Long]("cnt")).sum === rows.size.toLong)
    assert(audit.length <= 16)
    // envelopes are genuine min/max: global envelope matches the data
    assert(audit.map(_.getAs[Long]("min_x")).min === rows.map(_._1).min)
    assert(audit.map(_.getAs[Long]("max_y")).max === rows.map(_._2).max)
    // a bucket flagged skip_x must sit wholly outside the 40-60% band
    val (minX, maxX) = (rows.map(_._1).min, rows.map(_._1).max)
    val lo = minX + (maxX - minX + 1) * 40 / 100
    val hi = minX + (maxX - minX + 1) * 60 / 100
    audit.filter(_.getAs[Boolean]("skip_x")).foreach { r =>
      assert(r.getAs[Long]("max_x") < lo || r.getAs[Long]("min_x") > hi)
    }
  }

  test("zorder beats single-dim sort on the off-sort dimension") {
    // data clustered so both dims carry signal; y-band pruning under
    // z-order must beat the x-sorted layout's (≈zero) y-pruning
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(4000)((rnd.nextInt(100000).toLong,
      rnd.nextInt(100000).toLong))
    val df = rows.toDF("x", "y")
    val z = Layout.zorderPruningAudit(df, "x", "y", bits = 8, buckets = 32)
      .collect()
    val zSkipY = z.count(_.getAs[Boolean]("skip_y"))
    assert(zSkipY > 0, "z-order must make some buckets y-prunable")
  }

  test("session concurrency matches a naive interval self-join") {
    val rnd = new scala.util.Random(17)
    // spans: (user, idx, start, end) with end-start up to 3 bins
    val spans = (0 until 40).map { i =>
      val st = rnd.nextInt(100000).toLong
      (i % 7L, i.toLong, st, st + rnd.nextInt(30000).toLong)
    }
    val df = spans.toDF("user_id", "session_idx", "start_ms", "end_ms")
    val got = RangeJoin.sessionConcurrency(df, binMs = 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = spans.map { a =>
      spans.count(b => b._1 != a._1 && a._3 <= b._4 && b._3 <= a._4).toLong
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === naive)
  }

  test("sessionConcurrency maxBin: one-hot-bin fixture sub-splits with " +
      "output identical to the unsalted run (every pair meets once)") {
    import spark.implicits._
    // 40 sessions from 40 users all inside bin 0 (binMs 10000), all
    // mutually overlapping — the degenerate hot bin that would
    // serialize onto one task — plus two cold disjoint sessions
    val hot = (0L until 40L).map(u => (u, 1L, 100L + u, 5000L + u))
    val cold = Seq((100L, 1L, 20000L, 21000L), (101L, 1L, 50000L, 51000L))
    val spans = (hot ++ cold)
      .toDF("user_id", "session_idx", "start_ms", "end_ms")
    def hist(maxBin: Int) =
      RangeJoin.sessionConcurrency(spans, binMs = 10000L, maxBin = maxBin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unsalted = hist(0)
    // fan = ceil(40/8) = 5 sub-bins on the hot bin: rows identical
    assert(hist(8) === unsalted)
    // cap larger than any bin: degenerate fan 1, still identical
    assert(hist(4096) === unsalted)
    // the fixture's truth: 40 sessions each overlap 39 others; the 2
    // cold sessions overlap none
    assert(unsalted === Map(39L -> 40L, 0L -> 2L))
  }

  test("session concurrency is partition-invariant") {
    val ev = Tables.events(spark, sf)
    val spans = RangeJoin.sessionSpans(ev, "6 hours")
    val a = RangeJoin.sessionConcurrency(spans, 3600000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = RangeJoin.sessionConcurrency(spans.repartition(13), 3600000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
