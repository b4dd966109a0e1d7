package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Learned rotation for OPQ (Ge et al., CVPR'13, the parametric
  * Gaussian solution): rotate embeddings into their PCA basis before
  * product quantization, so subspace codebooks quantize decorrelated
  * coordinates. Completes [[PqIndex.varianceBalancedPerm]] (allocation
  * only) with the actual learned rotation.
  *
  * == Scale design ==
  * The DATA never leaves the cluster: one exact Gram-matrix aggregate
  * ([[LinAlg.gramUpper]], d(d+1)/2 longs over the shuffle) plus one
  * vector-sum pass give the covariance; the eigendecomposition runs on
  * the DRIVER over the d×d summary (d = embedding dim — model
  * geometry, not data size; 64–4096 everywhere in practice), exactly
  * like a k-means centroid set. The rotation broadcasts back as a d²
  * literal and applies as a row-local codegen'd mat-vec.
  *
  * Determinism: covariance comes from exact integer sums; the cyclic
  * Jacobi sweep order is fixed, so the rotation is reproducible
  * run-to-run and partition-to-partition.
  */
object PcaRotate {

  /** Population covariance of an embedding column via the exact
    * micro-unit Gram matrix and mean. */
  def covariance(df: DataFrame, embCol: String,
      scale: Int = 6): Array[Array[Double]] = {
    val unit = math.pow(10, scale)
    val micro = LinAlg.microVec(col(embCol), scale)
    val gram = LinAlg.gramUpper(df, micro)
      .collect().map(r => ((r.getInt(0) - 1, r.getInt(1) - 1), r.getLong(2)))
    val sc = df.agg(ColumnBridge.column(graft.expr.VectorSumCount(
        ColumnBridge.expression(micro)).toAggregateExpression()).as("sc"))
      .select(col("sc.sums"), col("sc.counts")).head()
    val sums = sc.getSeq[Long](0)
    val n = sc.getSeq[Long](1).head.toDouble
    val d = sums.length
    val mu = sums.map(_.toDouble / (n * unit)).toArray
    val cov = Array.ofDim[Double](d, d)
    gram.foreach { case ((i, j), g) =>
      val c = g.toDouble / (n * unit * unit) - mu(i) * mu(j)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    cov
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix
    * (driver-side; deterministic sweep order). Returns eigenvalues
    * descending and the matching eigenvectors as ROWS of the returned
    * matrix (i.e. the PCA rotation `R`: `y = R·x`). */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 50,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    var sweep = 0
    while (sweep < sweeps && off() > tol) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 0.0) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eig = order.map(i => a(i)(i)).toArray
    // rows = eigenvectors (v's columns, transposed into row form)
    val rot = order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray
    (eig, rot)
  }

  /** Fit the PCA rotation of an embedding column. */
  def fit(df: DataFrame, embCol: String): Array[Array[Double]] =
    jacobiEigen(covariance(df, embCol))._2

  /** Apply a fitted rotation as a row-local codegen'd mat-vec
    * (`y = R·x`); `rot` rides the closure as a d² literal. */
  def rotate(emb: Column, rot: Array[Array[Double]]): Column = {
    val d = rot.length
    val flat = rot.flatten
    ColumnBridge.column(graft.expr.MatVecLit(
      ColumnBridge.expression(emb.cast("array<double>")), flat, d))
  }
}
