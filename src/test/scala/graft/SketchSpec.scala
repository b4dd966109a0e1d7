package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.Sketches

/** KMV distinct-count sketch: exactness below capacity, estimation
  * accuracy above it, merge/union laws, partition invariance, SQL
  * registration. */
class SketchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def hashed(n: Int, parts: Int = 8) =
    (1 to n).map(i => s"v$i").toDF("v")
      .repartition(parts)
      .select(TextFunctions.md5Hash32(col("v"), 7).as("h"))

  test("exact below capacity: sketch of n < k distinct values IS the distinct hash set") {
    val df = hashed(40).union(hashed(40)) // duplicates must not count
    val minima = df.agg(Sketches.kmvMinima(col("h"), 64).as("m"))
      .select(col("m")).as[Seq[Long]].head()
    val expected = hashed(40).distinct().as[Long].collect().sorted.toSeq
    assert(minima === expected)
    val est = df.agg(
      Sketches.kmvEstimate(Sketches.kmvMinima(col("h"), 64), 64).as("e"))
      .as[Double].head()
    assert(est === 40.0)
  }

  test("estimate above capacity: within 25% of truth at k=64, n=5000") {
    val est = hashed(5000).agg(
      Sketches.kmvEstimate(Sketches.kmvMinima(col("h"), 64), 64).as("e"))
      .as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est")
  }

  test("partition invariance: same sketch at 1 and 32 partitions") {
    def minima(parts: Int) =
      hashed(500, parts).agg(Sketches.kmvMinima(col("h"), 16).as("m"))
        .select(col("m")).as[Seq[Long]].head()
    assert(minima(1) === minima(32))
  }

  test("union law: kmvUnion of two group sketches == sketch of the union") {
    val a = hashed(300)
    val b = (200 to 450).map(i => s"v$i").toDF("v") // overlaps a
      .select(TextFunctions.md5Hash32(col("v"), 7).as("h"))
    val k = 32
    val sa = a.agg(Sketches.kmvMinima(col("h"), k).as("m")).select("m")
    val sb = b.agg(Sketches.kmvMinima(col("h"), k).as("m")).select("m")
    val merged = sa.crossJoin(sb.withColumnRenamed("m", "m2"))
      .select(Sketches.kmvUnion(col("m"), col("m2"), k).as("u"))
      .as[Seq[Long]].head()
    val direct = a.union(b).agg(Sketches.kmvMinima(col("h"), k).as("m"))
      .select(col("m")).as[Seq[Long]].head()
    assert(merged === direct)
  }

  test("null hashes are skipped; empty input yields an empty sketch") {
    val df = Seq(Some(5L), None, Some(3L), Some(5L)).toDF("h")
    val m = df.agg(Sketches.kmvMinima(col("h"), 4).as("m"))
      .as[Seq[Long]].head()
    assert(m === Seq(3L, 5L))
    val empty = df.filter(col("h").isNull)
      .agg(Sketches.kmvMinima(col("h"), 4).as("m")).as[Seq[Long]].head()
    assert(empty === Seq.empty)
  }

  test("SQL surface: graft_kmv registered and grouping-aware") {
    org.apache.spark.sql.graftbridge.GraftInstaller.install(spark)
    hashed(100).createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT graft_kmv(h, 8) AS m FROM kmv_in").as[Seq[Long]].head()
    val viaApi = hashed(100).agg(Sketches.kmvMinima(col("h"), 8).as("m"))
      .as[Seq[Long]].head()
    assert(viaSql === viaApi)
  }

  test("distinctByGroup: exact and sketch columns agree with groupBy countDistinct") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 9L)).toDF("g", "u")
    val out = Sketches.distinctByGroup(df, "g", "u", k = 64)
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === Seq(("a", 2L, 2.0), ("b", 1L, 1.0)))
  }
}
