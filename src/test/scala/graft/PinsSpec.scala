package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The heavy-pin storage discipline (r17 verdict item 7): the same
  * call site pins to executor-local storage by default and to a
  * reliable checkpoint under `spark.graft.reliableHeavyPins=true` —
  * identical rows, truncated lineage, on both branches. */
class PinsSpec extends AnyFunSuite with SparkSuite {

  test("heavy: default branch localCheckpoints (plan roots at an RDD " +
      "scan, rows identical)") {
    val df = spark.range(100).select(col("id"),
      (col("id") % 7).as("k"))
    val pinned = graft.operators.Pins.heavy(df)
    assert(pinned.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName == "LogicalRDD"))
    assert(pinned.collect().map(_.getLong(0)).sorted
      === (0L until 100L).toArray)
  }

  test("heavy: reliable branch checkpoints to the checkpoint dir, " +
      "rows identical; conf is read per call") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pins-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(graft.operators.Pins.ReliableConf, "true")
    try {
      val df = spark.range(50).select(col("id"), (col("id") * 2).as("v"))
      val pinned = graft.operators.Pins.heavy(df)
      // reliable checkpoints materialize under the checkpoint dir
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .count() > 0)
      assert(pinned.queryExecution.optimizedPlan.collectLeaves()
        .forall(_.nodeName == "LogicalRDD"))
      assert(pinned.agg(sum(col("v"))).head.getLong(0) === 2450L)
    } finally spark.conf.unset(graft.operators.Pins.ReliableConf)
  }
}
