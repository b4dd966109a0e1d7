package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Dense row-local vector kernels for codegen'd expressions. */
object VectorKernels {

  /** y = M·x for a row-major d×d matrix (`m.length == d*d`). */
  def matVec(m: Array[Double], d: Int, x: ArrayData): ArrayData = {
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var acc = 0.0
      val base = i * d
      var j = 0
      while (j < d) { acc += m(base + j) * x.getDouble(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
