package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Labeling, Validate}

/** Weak-supervision label model and snapshot diff. */
class LabelingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("label model matches a naive driver-side reimplementation") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 1000).map { i =>
      val y = rnd.nextInt(2).toLong
      def noisy(acc: Int) = if (rnd.nextInt(100) < acc) y else 1 - y
      // two strong correlated rules + one mostly-inverted one: the
      // inverted rule's majority-agreement lands below 1/2 (even with
      // self-inclusion), so its weight must come out negative
      (i.toLong, noisy(95), noisy(90), noisy(30))
    }
    val out = Labeling.weakLabelModel(
      rows.toDF("id", "r1", "r2", "r3"), "id", Seq("r1", "r2", "r3"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("majority"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("weak_label")))).toMap
    // naive: same algorithm, plain scala
    val maj = rows.map(r =>
      r._1 -> (if (r._2 + r._3 + r._4 >= 2) 1L else 0L)).toMap
    val n = rows.size.toDouble
    val agrees = Seq(
      rows.count(r => r._2 == maj(r._1)), rows.count(r => r._3 == maj(r._1)),
      rows.count(r => r._4 == maj(r._1)))
    val ws = agrees.map { a =>
      val p = math.max(math.min(a / n, 0.99), 0.01)
      math.rint(math.log(p / (1 - p)) * 1e6).toLong
    }
    rows.foreach { case (id, r1, r2, r3) =>
      val score = ws(0) * (r1 * 2 - 1) + ws(1) * (r2 * 2 - 1) +
        ws(2) * (r3 * 2 - 1)
      val (gmaj, gscore, glabel) = out(id)
      assert(gmaj === maj(id))
      assert(gscore === score, s"id $id")
      assert(glabel === (if (score > 0) 1L else 0L))
    }
    // the 30%-accuracy rule is anti-correlated with the majority ->
    // negative weight (its vote flips)
    assert(ws(2) < 0L)
  }

  test("label model is deterministic under repartitioning") {
    val rows = (1 to 200).map(i =>
      (i.toLong, (i % 2).toLong, if (i % 3 == 0) 1L else 0L,
        if (i % 5 == 0) 1L else 0L))
    val df = rows.toDF("id", "r1", "r2", "r3")
    val a = Labeling.weakLabelModel(df, "id", Seq("r1", "r2", "r3"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score_micro"))
      .sortBy(_._1)
    val b = Labeling.weakLabelModel(df.repartition(11), "id",
        Seq("r1", "r2", "r3"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score_micro"))
      .sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("k-anonymity: hand-built classes, ladder thresholds") {
    // class sizes: 1, 1, 3, 5
    val df = (Seq(("a", 1)) ++ Seq(("b", 2)) ++
      Seq.fill(3)(("c", 3)) ++ Seq.fill(5)(("d", 4)))
      .toDF("q1", "q2")
    val got = Validate.kAnonymityAudit(df, Seq("q1", "q2"), Seq(2, 4, 10))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("risk_frac")))).toMap
    assert(got(2) === ((10L, 4L, 2L, 2L, 0.2)))   // two singletons
    assert(got(4) === ((10L, 4L, 5L, 3L, 0.5)))   // +the 3-class
    assert(got(10) === ((10L, 4L, 10L, 4L, 1.0))) // everything
  }

  test("leave-one-out impact matches per-group recomputation") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 300).map(i =>
      ("g" + (i % 4), rnd.nextInt(100).toLong))
    val got = graft.operators.Profile.leaveOneOutImpact(
      rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("mean_loo"), r.getAs[Double]("delta")))).toMap
    rows.map(_._1).distinct.foreach { g =>
      val others = rows.filter(_._1 != g).map(_._2)
      val loo = BigDecimal(others.sum.toDouble / others.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(g)._1 - loo) < 1e-9, s"group $g")
    }
    // deltas reference one shared global mean
    val all = rows.map(_._2)
    val global = BigDecimal(all.sum.toDouble / all.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.values.foreach { case (loo, delta) =>
      assert(math.abs(delta - BigDecimal(global - loo).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("deletion sweep: cascade counts and zero residual") {
    val raw = Seq((1L, "a"), (2L, "b"), (7L, "c"), (14L, "d"), (3L, "e"))
      .toDF("user_id", "x")
    val agg = raw.groupBy("user_id").agg(count(lit(1)).as("n"))
    val deletes = Seq(7L, 14L).toDF("user_id")
    val got = Validate.deletionSweep(
      Seq(("raw", raw, "user_id"), ("agg", agg, "user_id")),
      deletes, "user_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("raw") === ((5L, 3L, 2L, 0L)))
    assert(got("agg") === ((5L, 3L, 2L, 0L)))
  }

  test("cow amplification: clustered updates touch fewer files") {
    // file 0 holds all updates in layout A; spread across both in B
    val rows = Seq(
      ("A", 0L, 1), ("A", 0L, 1), ("A", 0L, 0), ("A", 1L, 0), ("A", 1L, 0),
      ("B", 0L, 1), ("B", 0L, 0), ("B", 1L, 1), ("B", 1L, 0), ("B", 1L, 0))
      .toDF("layout", "file_id", "is_upd")
    val got = graft.sources.Layout.cowAmplification(
        rows, "layout", "file_id", "is_upd")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("write_amp")))).toMap
    assert(got("A") === ((2L, 1L, 2L, 3L, 1.5)))
    assert(got("B") === ((2L, 2L, 2L, 5L, 2.5)))
  }

  test("snapshot diff classifies adds, removes, changes, unchanged") {
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "x")
    val v2 = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "D", 40.0),
      (5L, "e", 50.0)).toDF("k", "s", "x")
    val got = Validate.snapshotDiff(v1, v2, Seq("k"), Seq("s", "x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 2L, "added" -> 1L))
  }
}
