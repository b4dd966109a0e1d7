package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch aggregate: keeps the k
  * smallest DISTINCT hash values seen, emitting them as a sorted
  * ascending `array<long>` (size ≤ k).
  *
  * The distinct estimate derives downstream as `(k-1) / u_k` with
  * `u_k = kth_min / 2^32` (Bar-Yossef et al., "Counting Distinct
  * Elements in a Data Stream", RANDOM 2002); when fewer than k distinct
  * hashes exist the sketch IS the exact distinct set. Returning the
  * minima rather than the estimate keeps the aggregate domain-agnostic
  * (any hash width) and makes sketches mergeable downstream —
  * `union`-ing two groups' minima arrays and re-taking the k smallest
  * is the KMV set-union, the property that lets rollups reuse
  * finer-grained sketches without rescanning data.
  *
  * == Scale design ==
  * This is the shape a 100 TB distinct-count wants: state is O(k) longs
  * per group regardless of input size, `update` is O(log k) against a
  * bounded ordered set, and Spark runs it as partial → final
  * aggregation, so each map task ships one ≤k-element buffer per group
  * across the shuffle instead of the full value set (vs exact
  * `count(distinct)`, which shuffles every distinct value). The input
  * is a pre-hashed long column — pair with an engine-portable
  * md5-derived hash for cross-engine reproducibility or `xxhash64` for
  * the production path (the estimator only needs hash uniformity).
  *
  * Reference anchor: the reference keeps no sketches (SURVEY §2.4 "no
  * HLL"); this is part of the training-pipeline surface layered on top.
  * KMV chosen over HLL because its output is exactly reproducible in
  * portable SQL (order statistics of md5 hashes), so the driver's
  * DuckDB oracle can check it bit-for-bit.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit = {
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last) {
      // strictly smaller than the current kth minimum: admit, then
      // evict the largest — unless x was already present (set add
      // returns false), in which case the buffer is unchanged
      if (buf.add(x)) buf.pollLast()
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val res = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res) // TreeSet iterates ascending
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
