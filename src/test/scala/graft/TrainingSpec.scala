package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Training

/** Training-data assembly: point-in-time correctness (no feature
  * leakage) and trailing-window feature materialization. */
class TrainingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointInTime: latest value at-or-before label ts, never after (leakage)") {
    val history = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-05 00:00:00"), 50.0),
      (1L, ts("2024-01-09 00:00:00"), 90.0), // after the label: must NOT leak
      (2L, ts("2024-01-04 00:00:00"), 40.0)
    ).toDF("user_id", "ts", "value")
    val labels = Seq(
      (1L, ts("2024-01-07 00:00:00"), 100L), // between writes → sees 50
      (1L, ts("2024-01-05 00:00:00"), 101L), // exactly at a write → sees it
      (2L, ts("2024-01-01 00:00:00"), 102L), // before any write → null
      (3L, ts("2024-01-05 00:00:00"), 103L)  // unknown entity → null
    ).toDF("user_id", "ts", "label_id")
    val out = Training.pointInTime(labels, history,
        Seq("user_id"), "ts", "value")
      .orderBy("label_id").collect()
    assert(out === Array(
      Row(1L, ts("2024-01-07 00:00:00"), 100L, 50.0),
      Row(1L, ts("2024-01-05 00:00:00"), 101L, 50.0),
      Row(2L, ts("2024-01-01 00:00:00"), 102L, null),
      Row(3L, ts("2024-01-05 00:00:00"), 103L, null)))
  }

  test("aggregateFeatures: trailing windows are (asOf - d, asOf]") {
    val events = Seq(
      (1L, ts("2024-01-31 12:00:00"), 1.0), // inside 7d and 30d
      (1L, ts("2024-01-10 00:00:00"), 2.0), // inside 30d only
      (1L, ts("2023-12-01 00:00:00"), 4.0), // outside both
      (1L, ts("2024-02-01 00:00:00"), 8.0), // boundary: inclusive end
      (1L, ts("2024-02-02 00:00:00"), 16.0) // after asOf: excluded
    ).toDF("user_id", "ts", "value")
    val out = Training.aggregateFeatures(events, Seq("user_id"), "ts",
        "value", lit("2024-02-01 00:00:00").cast("timestamp"), Seq(7, 30))
      .collect()
    assert(out === Array(Row(1L, 2L, 9.0, 3L, 11.0)))
  }
}
