package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.InteractionStore

class InteractionStoreSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user_id, type, value)
  private lazy val ev = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
    (2L, ts("2024-01-02 10:00:00"), 1L, "click", 2.0),
    (3L, ts("2024-01-03 10:00:00"), 1L, "purchase", 3.0),
    (4L, ts("2024-01-03 10:00:00"), 1L, "click", 4.0),   // ts tie with 3
    (5L, ts("2024-01-09 10:00:00"), 1L, "click", 5.0),   // next week
    (6L, ts("2024-01-02 09:00:00"), 2L, "view", 6.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("mergeCap keeps newest `cap` per (user, week), ties by event_id (A1)") {
    val kept = InteractionStore.mergeCap(ev, cap = 2)
      .select("event_id").as[Long].collect().sorted
    // user 1 week of Jan 1: events 1,2,3,4 → newest two by (ts desc, id asc) = 3,4
    assert(kept === Array(3L, 4L, 5L, 6L))
  }

  test("retrieveRange: desc order, rank capped, type filter (W1/O3)") {
    val out = InteractionStore.retrieveRange(ev,
      lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("2024-01-31 00:00:00").cast("timestamp"),
      limit = 3, types = Seq("click"))
    val u1 = out.filter($"user_id" === 1L).orderBy($"rank")
      .select("event_id").as[Long].collect()
    assert(u1 === Array(5L, 4L, 2L)) // newest first, capped at 3, clicks only
  }

  test("retrieveRange caps limit at MaxRetrieveLimit (O3)") {
    val out = InteractionStore.retrieveRange(ev,
      lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("2024-01-31 00:00:00").cast("timestamp"), limit = 100000)
    assert(out.agg(max($"rank")).as[Int].head() <= InteractionStore.MaxRetrieveLimit)
  }

  test("validateRange rejects bad ranges (P6)") {
    intercept[IllegalArgumentException] {
      InteractionStore.validateRange(100, 50, 10) }
    intercept[IllegalArgumentException] {
      InteractionStore.validateRange(0, 25L * 7 * 86400000, 10) } // > 24 weeks
    intercept[IllegalArgumentException] {
      InteractionStore.validateRange(0, 100, 0) }
    assert(InteractionStore.validateRange(0, 100, 99999) ===
      InteractionStore.MaxRetrieveLimit)
  }

  test("unionTyped tags event classes (J5)") {
    val out = InteractionStore.unionTyped(ev,
      Map("c" -> Seq("click", "view"), "o" -> Seq("purchase")))
    assert(out.filter($"event_class" === "c").count() === 5)
    assert(out.filter($"event_class" === "o").count() === 1)
  }

  test("week is Monday-start event-time bucketing (F10/ST5)") {
    val w = ev.select(InteractionStore.week($"ts").as("w"))
      .distinct().as[java.sql.Date].collect().map(_.toString).sorted
    assert(w === Array("2024-01-01", "2024-01-08"))
  }

  test("ringWeek is the mod-24 slot of the absolute week index (F10)") {
    val rw = ev.select(InteractionStore.weekIndex($"ts").as("wi"),
      InteractionStore.ringWeek($"ts").as("rw"))
      .as[(Long, Long)].collect()
    assert(rw.forall { case (wi, r) => r === wi % 24 && r >= 0 && r < 24 })
  }

  test("retention drops events >= horizon weeks behind the user's newest (ST6)") {
    // user 1 newest event is Jan 9 (week idx W); horizon 1 keeps only week W
    val kept = InteractionStore.retention(ev, horizonWeeks = 1)
      .filter($"user_id" === 1L).select("event_id").as[Long].collect().sorted
    assert(kept === Array(5L))
    // horizon 2 keeps both weeks; user 2 unaffected by user 1's clock
    assert(InteractionStore.retention(ev, horizonWeeks = 2).count() === 6L)
  }

  test("linearAttribution: credit splits equally per epoch, resets at " +
      "each conversion, orphan conversions stay unattributed") {
    import spark.implicits._
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // user 1: click,view -> PURCHASE (each 1/2); view -> PURCHASE (1);
    //         trailing click (no credit)
    // user 2: PURCHASE with no touches (unattributed)
    // user 3: click,click,view -> PURCHASE (2/3 click, 1/3 view)
    val rows = Seq(
      (1L, 1L, t(1), "click"), (1L, 2L, t(2), "view"),
      (1L, 3L, t(3), "purchase"), (1L, 4L, t(4), "view"),
      (1L, 5L, t(5), "purchase"), (1L, 6L, t(6), "click"),
      (2L, 7L, t(1), "purchase"),
      (3L, 8L, t(1), "click"), (3L, 9L, t(2), "click"),
      (3L, 10L, t(3), "view"), (3L, 11L, t(4), "purchase"),
      (3L, 12L, t(5), "error")) // non-touch type is ignored entirely
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    for (parts <- Seq(1, 4)) {
      val got = graft.operators.Funnel.linearAttribution(
          df.repartition(parts), "user_id", "ts", "event_id", "event_type",
          "purchase", Seq("click", "view"))
        .as[(String, Long, Long, Double)].collect()
        .map(t0 => t0._1 -> t0).toMap
      // click: 1/2 (u1 e0) + 2/3 (u3) ; view: 1/2 + 1 + 1/3
      val clickCredit = (math.round(0.5 * 1e6) +
        math.round(2.0 / 3.0 * 1e6)).toDouble / 1e6
      val viewCredit = (math.round(0.5 * 1e6) + math.round(1.0 * 1e6) +
        math.round(1.0 / 3.0 * 1e6)).toDouble / 1e6
      assert(got("click") === (("click", 3L, 2L, clickCredit)),
        s"parts=$parts")
      assert(got("view") === (("view", 3L, 3L, viewCredit)),
        s"parts=$parts")
      // attributed conversions = 3 of 4 (u2's orphan excluded)
      assert(math.abs(got("click")._4 + got("view")._4 - 3.0) < 1e-5)
    }
  }

  test("sessionStats: bounce/depth/duration from hand-built sessions") {
    import spark.implicits._
    def t(m: Int, s: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    // user 1: events at 0:00, 0:10, 0:20 (one session, 20 min... gap
    // 15 min: 0:00,0:10 in s1; 0:20 still within 15m of 0:10 -> s1)
    // then 50:00 -> new session (bounce)
    // user 2: single event (bounce)
    val rows = Seq(
      (1L, 1L, t(0, 0)), (1L, 2L, t(10, 0)), (1L, 3L, t(20, 0)),
      (1L, 4L, t(50, 0)),
      (2L, 5L, t(5, 0)))
    val got = InteractionStore.sessionStats(
        rows.toDF("user_id", "event_id", "ts"), gap = "15 minutes")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    // sessions: u1 {0,10,20}, u1 {50}, u2 {5} -> 3 sessions, 2 bounces
    assert(got._1 === 3L && got._2 === 5L && got._3 === 2L)
    assert(got._4 === 2.0 / 3.0)
    assert(got._5 === 5.0 / 3.0)
    // durations: 1200s + 0 + 0 over 3 sessions = 400s
    assert(got._6 === 400.0)
  }

  test("ohlcResample: open/close pick by (ts, id) order, high/low are " +
      "bucket extremes, hour buckets partition the stream") {
    import spark.implicits._
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      // user 1, hour 0: values in arrival order 5.0, 1.5, 9.0, 3.25
      (1L, 1L, t(0, 1), 5.0), (1L, 2L, t(0, 10), 1.5),
      (1L, 3L, t(0, 20), 9.0), (1L, 4L, t(0, 50), 3.25),
      // user 1, hour 1: single point
      (1L, 5L, t(1, 5), 7.0),
      // user 2, hour 0: ts tie broken by event_id (6 before 7)
      (2L, 6L, t(0, 30), 2.0), (2L, 7L, t(0, 30), 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    for (parts <- Seq(1, 4)) {
      val got = InteractionStore.ohlcResample(rows.repartition(parts))
        .as[(Long, Long, Long, Double, Double, Double, Double)]
        .collect().map(r => (r._1, r._2) -> r).toMap
      val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
        .getTime / 3600000
      assert(got((1L, h0)) === ((1L, h0, 4L, 5.0, 9.0, 1.5, 3.25)))
      assert(got((1L, h0 + 1)) === ((1L, h0 + 1, 1L, 7.0, 7.0, 7.0, 7.0)))
      assert(got((2L, h0)) === ((2L, h0, 2L, 2.0, 8.0, 2.0, 8.0)))
    }
  }

  test("timeToConvert: durations from first 'from' to first 'to' at " +
      "or after it; never-converted users count as started only") {
    import spark.implicits._
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      (1L, 1L, t(0), "view"), (1L, 2L, t(10), "buy"),   // 10 s
      (2L, 3L, t(5), "buy"),  // buy BEFORE any view: not a conversion
      (2L, 4L, t(6), "view"), (2L, 5L, t(36), "buy"),   // 30 s
      (3L, 6L, t(0), "view"),                           // never buys
      (4L, 7L, t(2), "buy"))  // never views: not started
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.operators.Funnel.timeToConvert(
        ev, "user_id", "ts", "event_type", "view", "buy",
        probs = Seq(0.5, 1.0))
      .as[(Double, Long, Long, Double)].collect()
      .map(t0 => t0._1 -> t0).toMap
    // started: users 1,2,3; converted: 1 (10s), 2 (30s)
    assert(got(0.5) === ((0.5, 3L, 2L, 10.0)))
    assert(got(1.0) === ((1.0, 3L, 2L, 30.0)))
  }

  test("activeUserCurve: WAU is the exact trailing distinct union, " +
      "stickiness = dau/wau, repeat visits within a day collapse") {
    import spark.implicits._
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val d0 = t(1).getTime / 86400000 // epoch day of Jan 1
    // user 1 active days 1 and 3 (twice on day 1); user 2 day 1 only
    val ev = Seq((1L, t(1)), (1L, t(1)), (1L, t(3)), (2L, t(1)))
      .toDF("user_id", "ts")
    val got = InteractionStore.activeUserCurve(ev, windowDays = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // day 1: dau 2 (u1,u2), wau 2
    assert(got(d0) === ((d0, 2L, 2L, 1.0)))
    // day 3: dau 1 (u1); wau window covers days 1..3 -> {u1,u2} = 2
    assert(got(d0 + 2) === ((d0 + 2, 1L, 2L, 0.5)))
    // day 2 has no DAU -> absent (inner join on dau days)
    assert(!got.contains(d0 + 1))
  }

  test("interArrivalStats: periodic users score burstiness -1-ish " +
      "(zero variance -> null), known gaps match the closed form") {
    import spark.implicits._
    def t(s: Int) = new Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: gaps 10, 10, 10 -> zero variance -> null std/burst
      (1L, 1L, t(0)), (1L, 2L, t(10)), (1L, 3L, t(20)), (1L, 4L, t(30)),
      // user 2: gaps 1 and 9 -> mean 5, var ((2*82)-100)/4 = 16, std 4
      (2L, 5L, t(0)), (2L, 6L, t(1)), (2L, 7L, t(10)),
      // user 3: single event -> no gaps -> absent
      (3L, 8L, t(5))).toDF("user_id", "event_id", "ts")
    val got = InteractionStore.interArrivalStats(ev)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(!got.contains(3L))
    assert(got(1L)._2 === 3L)
    assert(got(1L)._3 === Some(10.0))
    assert(got(1L)._4 === None && got(1L)._5 === None)
    assert(got(2L)._3 === Some(5.0))
    assert(got(2L)._4 === Some(4.0))
    assert(got(2L)._5 === Some((4.0 - 5.0) / (4.0 + 5.0)))
  }
}
