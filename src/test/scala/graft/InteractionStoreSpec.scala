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
}
