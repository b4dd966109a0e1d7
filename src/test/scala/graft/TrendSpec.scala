package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Funnel, Trend, Validate}

/** Trend/changepoint statistics, path trigrams, table fingerprints. */
class TrendSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("mann-kendall: monotone series -> max S and 'up'; flat -> none") {
    val up = (0 until 20).map(t => ("up", t.toLong, (t * 3 + 1).toLong))
    val flat = (0 until 20).map(t => ("flat", t.toLong, 7L))
    val out = Trend.mannKendall((up ++ flat).toDF("k", "t", "x"),
        "k", "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    // strictly increasing: S = n(n-1)/2 = 190, trend up
    assert(out("up").getAs[Long]("s_stat") === 190L)
    assert(out("up").getAs[String]("trend") === "up")
    // slope of x = 3t + 1 is exactly 3
    assert(out("up").getAs[Double]("theil_sen") === 3.0)
    // constant series: S = 0, all ties -> var18 = 0 -> z = 0
    assert(out("flat").getAs[Long]("s_stat") === 0L)
    assert(out("flat").getAs[Double]("z") === 0.0)
    assert(out("flat").getAs[String]("trend") === "none")
  }

  test("mann-kendall S matches a naive pair scan on noisy data") {
    val rnd = new scala.util.Random(43)
    val xs = (0 until 25).map(t => (t.toLong, rnd.nextInt(10).toLong))
    val out = Trend.mannKendall(
        xs.map { case (t, x) => ("s", t, x) }.toDF("k", "t", "x"),
        "k", "t", "x").collect().head
    val naive = (for {
      i <- xs.indices; j <- xs.indices if i < j
    } yield math.signum(xs(j)._2 - xs(i)._2)).sum
    assert(out.getAs[Long]("s_stat") === naive.toLong)
  }

  test("cusum peaks at the level shift") {
    // level 10 for t<15, level 30 after: |cusum| max at the boundary
    val series = (0 until 30).map(t =>
      ("s", t.toLong, if (t < 15) 10L else 30L))
    val out = Trend.cusumChangepoint(series.toDF("k", "t", "x"),
      "k", "t", "x").collect().head
    assert(out.getAs[Long]("cp_time") === 14L,
      s"peak at ${out.getAs[Long]("cp_time")}")
    // C_14 = sum of 15 terms (30*10 - 600) = 15*(-300) -> |C| = 4500
    assert(out.getAs[Long]("max_abs_cusum") === 4500L)
  }

  test("path trigrams count adjacent triples per user") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .map { case (u, i, t) =>
        (u, i, new java.sql.Timestamp(1700000000000L + i * 1000), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.pathTrigrams(ev, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b>c" -> 2L, "b>c>b" -> 1L))
  }

  test("table fingerprint: order/partition-invariant, row-change-sensitive") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Validate.tableFingerprint(d, Seq("id", "v"))
        .collect().head match { case r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)) }
    val a = fp(df)
    assert(a === fp(df.repartition(17)))
    assert(a === fp(df.orderBy(col("id").desc)))
    // duplicate multiset sensitivity: doubling a row changes the digest
    val dup = fp(df.unionAll(df.filter(col("id") === 1L)))
    assert(dup !== a)
    // single-value change flips it too
    val mut = fp(df.withColumn("v",
      when(col("id") === 250L, lit("CHANGED")).otherwise(col("v"))))
    assert(mut !== a)
    assert(mut._1 === a._1)
  }
}
