package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Similarity
import graft.operators.PqIndex

/** OPQ-lite (variance-balanced subspace allocation): permutation laws
  * and the recall claim it exists for — on variance-skewed data, plain
  * PQ concentrates the variance budget in one subspace and balanced
  * allocation must not be worse. */
class OpqSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // dims 0..3 carry ~100x the variance of the rest, so natural slicing
  // (m=4, subDim=4) puts ALL signal dims into subspace 0
  private lazy val skewed: DataFrame = {
    val rnd = new scala.util.Random(42)
    (0L until 200L).map { i =>
      (i, Seq.tabulate(16)(d =>
        if (d < 4) rnd.nextDouble() * 10 - 5 else rnd.nextDouble() * 0.1))
    }.toDF("vec_id", "embedding")
  }

  test("perm is a permutation and deals one high-variance dim per subspace") {
    val perm = PqIndex.varianceBalancedPerm(skewed, m = 4)
    assert(perm.sorted === (0 until 16))
    assert(perm.grouped(4).forall(g => g.count(_ < 4) === 1))
  }

  test("permuted() reorders row-locally and is norm-preserving") {
    val perm = PqIndex.varianceBalancedPerm(skewed, m = 4)
    val both = skewed.select(col("embedding").as("e"),
      PqIndex.permuted(col("embedding"), perm).as("p"))
    val bad = both.filter(
      abs(Similarity.dot(col("e"), col("e")) -
        Similarity.dot(col("p"), col("p"))) > 1e-12).count()
    assert(bad === 0)
  }

  test("recall@10 vs exact search: balanced allocation >= natural slicing") {
    def queries(src: DataFrame) = src.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
    def topIds(res: DataFrame) = res
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }

    val exact = skewed.crossJoin(queries(skewed))
      .withColumn("score", Similarity.dot(col("embedding"), col("query_embedding")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)))
      .filter(col("rank") <= 10)
    val truth = topIds(exact)

    val pq = topIds(PqIndex.build(skewed, m = 4, k = 16)
      .searchDot(queries(skewed), 10))

    val perm = PqIndex.varianceBalancedPerm(skewed, m = 4)
    val rotated = skewed.select(col("vec_id"),
      PqIndex.permuted(col("embedding"), perm).as("embedding"))
    val opq = topIds(PqIndex.build(rotated, m = 4, k = 16)
      .searchDot(queries(rotated), 10))

    def recall(got: Map[Long, Set[Long]]) =
      truth.keys.map(q => (got(q) & truth(q)).size / 10.0).sum / truth.size
    val (rPq, rOpq) = (recall(pq), recall(opq))
    info(s"recall@10 plain=$rPq balanced=$rOpq")
    assert(rOpq >= rPq,
      s"balanced allocation regressed recall: $rOpq < $rPq")
  }
}
