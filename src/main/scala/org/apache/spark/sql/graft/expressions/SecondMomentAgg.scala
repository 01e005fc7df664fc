package org.apache.spark.sql.graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** One-pass upper-triangle second-moment aggregate over a float-vector
  * column: state is the d(d+1)/2 pair sums plus per-pair counts
  * (~33 KB at d=64), map-side partials merge elementwise, and the
  * exchange carries ONE buffer per group instead of the
  * n·d(d+1)/2 exploded pair rows the
  * `posexplode × posexplode(slice) → groupBy(i,j).avg` plan shuffles
  * (the [[KmvSketch]] argument applied to moment collection — the
  * aggregate the built-ins can't express without materializing the
  * pair stream; ChainScale measured the exploded plan at ~0.5 ms/row
  * — 102 cpu-s over the 200k-vector 100× tier —
  * the pair-row overhead, not the arithmetic).
  *
  * Returns the upper triangle row-major as `array<double>`:
  * element (i,j), j ≥ i, at index `i*d − i(i−1)/2 + (j−i)`, each the
  * pair's mean rounded at 6 dp with Spark's own `round` semantics
  * (BigDecimal HALF_UP — the cross-engine determinism seam the
  * exploded plan used; per-partition accumulation order differs from
  * the hash-aggregate's, which is exactly what the 6 dp rounding
  * absorbs). Pairs with no observations evaluate to 0.0 — the exploded
  * plan's GROUP BY simply never produced those rows and the driver
  * left the matrix cell at its 0.0 default. NULL vectors contribute
  * nothing; a NULL ELEMENT voids only the pairs it touches (avg over
  * the others is unchanged), matching `avg`'s null-skipping over the
  * exploded `xi·xj` products. Vectors shorter than `dim` contribute
  * the pairs they have; vectors LONGER than `dim` throw (a malformed
  * fixture the exploded plan would have surfaced as out-of-range
  * (i,j) rows must not pass silently).
  */
case class SecondMomentAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(dim >= 1, s"second_moment needs dim >= 1, got $dim")

  private val nPairs = dim * (dim + 1) / 2

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  /** sums in [0, nPairs), counts in [nPairs, 2·nPairs). */
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](2 * nPairs)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // OVER-long vectors throw rather than silently clamp: the
      // retired exploded plan surfaced such malformed fixtures as
      // out-of-range (i,j) rows, and a silent min() here would let a
      // bad fixture pass unnoticed (r18 ADVICE). Shorter vectors still
      // contribute the pairs they have (documented above).
      if (a.numElements() > dim)
        throw new IllegalArgumentException(
          s"second_moment(dim=$dim) got a vector of ${a.numElements()} elements")
      val n = a.numElements()
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val xi = a.getFloat(i).toDouble
          val rowBase = i * dim - i * (i - 1) / 2 - i
          var j = i
          while (j < n) {
            if (!a.isNullAt(j)) {
              val idx = rowBase + j
              buf(idx) += xi * a.getFloat(j).toDouble
              buf(nPairs + idx) += 1.0
            }
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    val out = new Array[Double](nPairs)
    var i = 0
    while (i < nPairs) {
      val c = buf(nPairs + i)
      out(i) =
        if (c == 0.0) 0.0
        else java.math.BigDecimal.valueOf(buf(i) / c)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SecondMomentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SecondMomentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SecondMomentAgg =
    copy(child = newChild)

  override def prettyName: String = "second_moment"
}
