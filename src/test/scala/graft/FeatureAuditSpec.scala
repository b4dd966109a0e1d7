package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{InteractionStore, LinAlg, Profile}

/** Event-window features, Matryoshka truncation audit, and the join
  * cardinality estimators — naive reimplementations plus closed-form
  * fixtures. */
class FeatureAuditSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("eventWindowFeatures matches a naive trailing-window scan") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(200) * 3600000L),
        if (rnd.nextBoolean()) "purchase" else "view",
        rnd.nextInt(100) / 10.0)
    }
    val df = rows.toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = InteractionStore.eventWindowFeatures(df, "user_id", "ts",
        "purchase", "view", windowMs = 6L * 3600000L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    rows.filter(_._4 == "purchase").foreach { case (u, id, ts, _, _) =>
      val inWin = rows.filter(r => r._1 == u && r._4 == "view" &&
        r._3.getTime >= ts.getTime - 6L * 3600000L &&
        r._3.getTime <= ts.getTime - 1L)
      val cnt = inWin.size.toLong
      val sumMicro = inWin.map(r => math.floor(r._5 * 1e6).toLong).sum
      assert(got(id) === ((cnt, sumMicro.toDouble / 1e6)), s"event $id")
    }
  }

  test("matryoshka audit: energy fractions for a known ladder") {
    // v1 = all energy in dim 1; v2 = equal energy in 4 dims
    val vecs = Seq(
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(1f, 1f, 1f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = LinAlg.matryoshkaAudit(df, "embedding", Seq(1, 2, 4))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(4) === ((2L, 1.0, 1.0)))
    // k=1: fractions 1.0 and 0.25 -> avg 0.625, min 0.25
    assert(got(1) === ((2L, 0.625, 0.25)))
    // k=2: fractions 1.0 and 0.5 -> avg 0.75, min 0.5
    assert(got(2) === ((2L, 0.75, 0.5)))
  }

  test("join cardinality: mcv covering all keys makes the estimate exact") {
    // skew on BOTH sides (a uniform side would cancel the other
    // side's skew in sum(ca*cb) and make plain selinger exact too)
    val aRows = Seq.fill(55)(1L) ++ Seq.tabulate(45)(i => i % 9L)
    val bRows = Seq.fill(50)(1L) ++ Seq.tabulate(50)(i => i % 5L)
    val a = aRows.toDF("k")
    val b = bRows.toDF("k")
    val out = Profile.joinCardinalityEstimate(a, "k", b, "k", mcv = 20)
      .collect().head
    val actual = out.getAs[Long]("actual")
    val ca = aRows.groupBy(identity).map { case (k, xs) => k -> xs.size }
    val naive = bRows.groupBy(identity).map { case (k, xs) =>
      ca.getOrElse(k, 0).toLong * xs.size }.sum
    assert(actual === naive)
    // every key sits in both MCV lists -> mcv_est == actual exactly
    assert(out.getAs[Double]("mcv_est") === actual.toDouble)
    assert(out.getAs[Double]("mcv_rel_err") === 0.0)
    // skew makes plain selinger wrong: relative error visible
    assert(out.getAs[Double]("selinger_rel_err") > 0.1)
  }

  test("join cardinality: selinger exact on uniform keys, fk containment") {
    val a = Seq.tabulate(60)(i => i % 6L).toDF("k")   // uniform 6 x 10
    val b = Seq.tabulate(30)(i => i % 6L).toDF("k")   // uniform 6 x 5
    val out = Profile.joinCardinalityEstimate(a, "k", b, "k", mcv = 2)
      .collect().head
    // actual = 6 * 10 * 5 = 300; selinger = 60*30/max(6,6) = 300
    assert(out.getAs[Long]("actual") === 300L)
    assert(out.getAs[Double]("selinger_est") === 300.0)
  }
}
