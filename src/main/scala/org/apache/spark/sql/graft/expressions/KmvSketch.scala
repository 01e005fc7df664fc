package org.apache.spark.sql.graft.expressions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** K-minimum-values distinct-count sketch (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002): keep the `k`
  * smallest DISTINCT hash values seen; if fewer than `k` survive, the
  * count is exact, otherwise `(k-1) * hashSpace / kthSmallest` estimates
  * the cardinality.
  *
  * This is the aggregate the built-ins cannot express at scale: a
  * `count(DISTINCT h)` shuffles every distinct value, and the
  * window/row_number formulation shuffles the whole vocabulary before
  * discarding all but `k` rows per group. Here the aggregation state is
  * a bounded `k`-element ordered set, map-side partials fold locally,
  * and the exchange carries one `<= k`-element array per group —
  * mergeable sketch semantics (merge = union, re-take k smallest),
  * exactly the HLL trade but with a DETERMINISTIC value: the k smallest
  * md5-derived hashes are a pure set function of the input, so a DuckDB
  * oracle reproduces the sketch byte-for-byte (unlike HLL, whose
  * register layout is engine-private — the reason approx_count_distinct
  * could never pass this repo's hash-strict correctness gate).
  *
  * Returns the ascending array of the `<= k` minimum distinct hashes;
  * the caller derives `kth` via `element_at(arr, k)` and the estimate
  * in plain column arithmetic (kept outside the aggregate so the oracle
  * shares the same final-math expressions).
  *
  * Duplicates are absorbed by the set (a re-seen hash neither grows nor
  * biases the state) — the KMV requirement that makes the sketch a
  * function of the distinct SET rather than the multiset.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"kmv_sketch needs k >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def add(buf: JTreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) {
      buf.add(h)
    } else if (h < buf.last()) {
      // evict the current max only if h was genuinely new
      if (buf.add(h)) buf.pollLast()
    }
  }

  override def update(
      buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: JTreeSet[java.lang.Long], b2: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
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

  override def prettyName: String = "kmv_sketch"
}
