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

  test("jacobiEigen recovers a known spectrum; rotation orthonormal") {
    import graft.operators.PcaRotate
    // A = diag(5,2,1) conjugated by a known rotation about axis z
    val c = math.cos(0.3); val s = math.sin(0.3)
    val r = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val dmat = Array(Array(5.0, 0, 0), Array(0.0, 2, 0), Array(0.0, 0, 1))
    def mm(x: Array[Array[Double]], y: Array[Array[Double]]) =
      Array.tabulate(3, 3)((i, j) =>
        (0 until 3).map(k => x(i)(k) * y(k)(j)).sum)
    val a = mm(mm(r, dmat), r.map(_.clone()).transpose)
    val (eig, rot) = PcaRotate.jacobiEigen(a)
    assert(eig.zip(Seq(5.0, 2.0, 1.0)).forall { case (g, e) =>
      math.abs(g - e) < 1e-10 })
    // rows orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10, s"($i,$j)")
    }
    // rotating A's eigvecs diagonalizes: R A Rt ~ diag(eig)
    val rart = mm(mm(rot, a), rot.transpose)
    for (i <- 0 until 3; j <- 0 until 3 if i != j)
      assert(math.abs(rart(i)(j)) < 1e-9)
  }

  test("PCA rotation decorrelates and PQ recall does not regress") {
    import graft.operators.PcaRotate
    // correlated data: latent 4-dim signal mixed into 16 dims by a
    // fixed deterministic matrix — natural axes are all entangled
    val rnd = new scala.util.Random(7)
    val mix = Array.tabulate(16, 4)((i, j) =>
      math.sin(i * 4 + j + 1.0) * 2.0)
    val data = (0L until 200L).map { i =>
      val z = Array.fill(4)(rnd.nextDouble() * 4 - 2)
      (i, Seq.tabulate(16)(d =>
        (0 until 4).map(j => mix(d)(j) * z(j)).sum + rnd.nextDouble() * 0.05))
    }.toDF("vec_id", "embedding")

    val cov = PcaRotate.covariance(data, "embedding")
    val rot = PcaRotate.jacobiEigen(cov)._2
    val rotated = data.select(col("vec_id"),
      PcaRotate.rotate(col("embedding"), rot).as("embedding"))

    // rotation preserves norms (orthogonal)
    val bad = data.select(
        Similarity.dot(col("embedding"), col("embedding")).as("n0"),
        Similarity.dot(PcaRotate.rotate(col("embedding"), rot),
          PcaRotate.rotate(col("embedding"), rot)).as("n1"))
      .filter(abs(col("n0") - col("n1")) > abs(col("n0")) * 1e-9).count()
    assert(bad === 0)

    // rotated covariance is ~diagonal (top-left dominated)
    val covR = PcaRotate.covariance(rotated, "embedding")
    val offMass = (for (i <- 0 until 16; j <- 0 until 16 if i != j)
      yield math.abs(covR(i)(j))).sum
    val diagMass = (0 until 16).map(i => math.abs(covR(i)(i))).sum
    assert(offMass < 0.05 * diagMass,
      s"rotation failed to decorrelate: off=$offMass diag=$diagMass")

    def queries(src: DataFrame) = src.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_embedding"))
    def topIds(res: DataFrame) = res
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    def truthOf(src: DataFrame) = topIds(src.crossJoin(queries(src))
      .withColumn("score",
        Similarity.dot(col("embedding"), col("query_embedding")))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)))
      .filter(col("rank") <= 10))
    def recallOf(src: DataFrame) = {
      val truth = truthOf(src)
      val got = topIds(PqIndex.build(src, m = 4, k = 16)
        .searchDot(queries(src), 10))
      truth.keys.map(q => (got(q) & truth(q)).size / 10.0).sum / truth.size
    }
    val (rPlain, rRot) = (recallOf(data), recallOf(rotated))
    info(s"recall@10 plain=$rPlain pca-rotated=$rRot")
    assert(rRot >= rPlain - 0.05,
      s"PCA rotation badly regressed recall: $rRot vs $rPlain")
  }

  test("reconstructionError: zero exactly on codebook seed vectors, " +
      "matches the naive decode elsewhere") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val idx = graft.operators.PqIndex.build(emb, m = 8, k = 16)
    val errs = idx.reconstructionError(emb)
      .as[(Long, Long)].collect().toMap
    assert(errs.nonEmpty)
    assert(errs.values.forall(_ >= 0L))
    // the seed vectors ARE their own codewords: error exactly 0
    val n = emb.count()
    val stride = math.max(n / 16, 1L)
    val seeds = errs.keys.filter(id => id % stride == 0 && id < stride * 16)
    assert(seeds.nonEmpty)
    assert(seeds.forall(id => errs(id) == 0L),
      s"seed vectors must reconstruct exactly: " +
        s"${seeds.filter(errs(_) != 0L).take(3)}")
    // naive decode for a handful of vectors
    val cb = idx.codebook.as[(Int, Long, Seq[Double])].collect()
      .map { case (j, cid, c) => (j, cid) -> c }.toMap
    val codes = idx.codes.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val some = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    for ((id, e) <- some) {
      var total = 0.0
      for (j <- 0 until 8) {
        val cent = cb((j, codes(id)(j)))
        val sub = e.slice(j * 8, j * 8 + 8)
        var d = 0.0
        for (t <- 0 until 8) {
          val diff = sub(t) - cent(t)
          d += diff * diff
        }
        total += d
      }
      assert(errs(id) === math.floor(total * 1e6).toLong, s"vec $id")
    }
  }
}
