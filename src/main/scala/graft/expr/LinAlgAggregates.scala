package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed Gram matrix (Xᵀ·X) over a vector column — the building
  * block for covariance/PCA/whitening of embedding corpora (the offline
  * counterpart of the reference's vector math surface, `numerix`
  * `fp32_ops.rs`: elementwise kernels there, corpus-level linear
  * algebra here).
  *
  * Input is a pre-quantized `array<long>` of fixed-point micro-units
  * (e.g. `floor(x * 1e6)`), so every product and every sum is EXACT
  * integer arithmetic — associative, order-independent, and bit-equal
  * in any engine, which makes the result oracle-checkable and immune
  * to float summation-order drift. The caller picks the scale to bound
  * magnitude: with |micro| ≤ 1e6 (unit-range embeddings at 6 dp),
  * partial sums stay inside Int64 up to ~9e6 rows per GROUP; beyond
  * that, quantize at a coarser scale or pre-aggregate per shard.
  *
  * == Scale design ==
  * State is the upper triangle only — d(d+1)/2 longs per group,
  * independent of input size (d=64 → 16 KB). `update` is a tight
  * primitive multiply-add loop (d²/2 ops/row, JIT-vectorizable);
  * Spark runs partial → final aggregation, so each map task ships ONE
  * triangle across the shuffle instead of d² exploded rows per input
  * row (the declarative explode+groupBy equivalent inflates each input
  * row 2080× before map-side combine absorbs it — this kernel skips
  * the inflation entirely). Output is the full row-major d×d matrix
  * (mirrored from the triangle) for downstream convenience.
  */
case class GramMatrix(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramMatrix.Buffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import GramMatrix.Buffer

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): Buffer = new Buffer(0, null)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (buf.d == 0) { buf.d = d; buf.tri = new Array[Long](d * (d + 1) / 2) }
    require(d == buf.d, s"gram_matrix: dim mismatch ($d vs ${buf.d})")
    val tri = buf.tri
    var hasNull = false
    var p = 0
    while (p < d && !hasNull) { hasNull = arr.isNullAt(p); p += 1 }
    if (!hasNull) {
      val x = arr.toLongArray()
      var i = 0
      var k = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) { tri(k) += xi * x(j); j += 1; k += 1 }
        i += 1
      }
    } else {
      // SQL SUM-skip parity: a product involving a null element is null
      // and contributes nothing to that cell; the row's other cells
      // still accumulate (matches the oracle's SUM(v[i]*v[j]))
      var i = 0
      var k = 0
      while (i < d) {
        if (arr.isNullAt(i)) k += d - i
        else {
          val xi = arr.getLong(i)
          var j = i
          while (j < d) {
            if (!arr.isNullAt(j)) tri(k) += xi * arr.getLong(j)
            j += 1; k += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.d == 0) return buf
    if (buf.d == 0) { buf.d = other.d; buf.tri = other.tri.clone(); return buf }
    require(buf.d == other.d, "gram_matrix: dim mismatch in merge")
    var k = 0
    while (k < buf.tri.length) { buf.tri(k) += other.tri(k); k += 1 }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val d = buf.d
    val out = new Array[Long](d * d)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = buf.tri(k)
        out(i * d + j) = v
        out(j * d + i) = v
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val n = if (buf.d == 0) 0 else buf.tri.length
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(buf.d)
    var k = 0
    while (k < n) { bb.putLong(buf.tri(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d == 0) return new Buffer(0, null)
    val tri = new Array[Long](d * (d + 1) / 2)
    var k = 0
    while (k < tri.length) { tri(k) = bb.getLong; k += 1 }
    new Buffer(d, tri)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrix =
    copy(child = newChild)
}

object GramMatrix {
  /** Mutable aggregation state: dimension + upper-triangle sums
    * (row-major over j ≥ i). d == 0 ⇒ no input seen yet. */
  final class Buffer(var d: Int, var tri: Array[Long])
}

/** Elementwise (sum, count) of a fixed-point vector column — the exact
  * accumulator behind group mean-pooling of embeddings
  * ([[graft.operators.LinAlg.meanPool]]: user profile = mean of item
  * vectors, doc vector = mean of chunk vectors). Same design choice as
  * [[GramMatrix]]: inputs are `array<long>` micro-units, so sums are
  * exact integer math — associative, order-independent, bit-equal in
  * any engine (float sums would drift with partition order and could
  * never hash-match an oracle). Per-position counts carry SQL AVG
  * null-skip parity: a null element contributes to neither the sum nor
  * the count of its position.
  *
  * == Scale design ==
  * State is 2·d longs per group regardless of input size; update is a
  * primitive add loop. Spark runs partial → final aggregation, so each
  * map task ships one (sums, counts) pair per group across the shuffle
  * — the declarative posexplode+groupBy equivalent inflates every row
  * d× before map-side combine absorbs it.
  */
case class VectorSumCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSumCount.Buffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import VectorSumCount.Buffer

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vector_sum_count"

  override def createAggregationBuffer(): Buffer = new Buffer(0, null, null)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (buf.d == 0) {
      buf.d = d; buf.sums = new Array[Long](d); buf.counts = new Array[Long](d)
    }
    require(d == buf.d, s"vector_sum_count: dim mismatch ($d vs ${buf.d})")
    var i = 0
    while (i < d) {
      if (!arr.isNullAt(i)) {
        buf.sums(i) += arr.getLong(i)
        buf.counts(i) += 1L
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.d == 0) return buf
    if (buf.d == 0) {
      buf.d = other.d
      buf.sums = other.sums.clone(); buf.counts = other.counts.clone()
      return buf
    }
    require(buf.d == other.d, "vector_sum_count: dim mismatch in merge")
    var i = 0
    while (i < buf.d) {
      buf.sums(i) += other.sums(i); buf.counts(i) += other.counts(i); i += 1
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val d = buf.d
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.update(0, new GenericArrayData(
      if (d == 0) Array.empty[Long] else buf.sums))
    row.update(1, new GenericArrayData(
      if (d == 0) Array.empty[Long] else buf.counts))
    row
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.d)
    bb.putInt(buf.d)
    var i = 0
    while (i < buf.d) { bb.putLong(buf.sums(i)); bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d == 0) return new Buffer(0, null, null)
    val sums = new Array[Long](d)
    val counts = new Array[Long](d)
    var i = 0
    while (i < d) { sums(i) = bb.getLong; counts(i) = bb.getLong; i += 1 }
    new Buffer(d, sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumCount =
    copy(child = newChild)
}

object VectorSumCount {
  /** Mutable state: dimension + per-position exact sums and non-null
    * counts. d == 0 ⇒ no input seen yet. */
  final class Buffer(var d: Int, var sums: Array[Long], var counts: Array[Long])
}
