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

/** Misra–Gries frequent-items summary aggregate: at most `k` counters
  * over a string column, emitted as `map<string,long>` of surviving
  * items → lower-bound counts.
  *
  * Update is the classic algorithm (Misra & Gries, "Finding Repeated
  * Elements", 1982): resident items increment; a non-resident item
  * claims a free counter, or — when all k are taken — decrements every
  * counter, evicting zeros. Merge sums matching counters, then restores
  * the k-bound by subtracting the (k+1)-th largest count from all and
  * dropping non-positives (Agarwal et al., "Mergeable Summaries",
  * PODS 2012 §3.1 — the merge that makes the summary safe for Spark's
  * partial → final aggregation in ANY grouping/combining order).
  *
  * Guarantee carried through both paths: every item with true frequency
  * > n/(k+1) is present in the final map, and each reported count
  * undercounts by at most n/(k+1). The map is therefore a candidate
  * SUPERSET for any heavy-hitter threshold above 1/(k+1) — pair with an
  * exact confirmation pass over just the candidates
  * ([[graft.operators.Sketches.heavyHitters]]) for exact results.
  *
  * == Scale design ==
  * State is ≤ k (string, long) pairs per group no matter the input
  * size, so a 100 TB scan ships one bounded map per map task across the
  * shuffle instead of the full value domain (the exact plan's
  * explode → groupBy shuffles every distinct value). Reference anchor:
  * none — the reference has no sketch surface (SURVEY §2.4); this is
  * training-pipeline surface layered on top.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"misra-gries needs k >= 1, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  private type Buf = java.util.HashMap[String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        // all counters taken: decrement everyone, evict zeros — the
        // O(k) step that amortizes to O(1) per admitted increment
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all, drop non-positive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey)
      vals(i) = e.getValue.longValue()
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buf.size)
    var bytes = 4
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      entries += ((kb, e.getValue.longValue()))
      bytes += 4 + kb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.put(new String(kb, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
