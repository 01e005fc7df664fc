package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType}

/** Fused constant-matrix × float-vector product: the whole OPQ
  * rotation as ONE expression evaluating ONE loop nest per row.
  *
  * Numerically identical, element for element, to the
  * `array(rows.map(r => DotProductFD(e, lit(r)).cast(float)))`
  * spelling it replaces (each output dim is the same left-to-right
  * double fold, cast to float at the end; length mismatch or a NULL
  * input element yields an array of NULL elements, a NULL input array
  * likewise — the per-kernel null results the array() spelling
  * produced). The difference is mechanical: the 64-kernel array()
  * projection inlines 64 separate loop bodies into one generated
  * method, which blows past JIT compilation budgets and runs at
  * bytecode-interpreter speed — measured ~1 ms/row at sf0.1·10x
  * (R18ChainProbe: the 64-kernel map costs ~15× MORE than 64× a
  * single kernel). This expression routes each row through one
  * reference-object method small enough to stay JIT-hot, while the
  * surrounding projection stays inside whole-stage codegen.
  */
case class MatVecFD(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  private val m = matrix.length
  private val dim = if (m == 0) 0 else matrix(0).length
  require(m > 0 && matrix.forall(_.length == dim),
    s"matrix must be rectangular and non-empty; got $m rows")

  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](m * dim)
    var j = 0
    while (j < m) {
      System.arraycopy(matrix(j), 0, f, j * dim, dim)
      j += 1
    }
    f
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def nullable: Boolean = false

  /** The all-NULL-elements result every degenerate input maps to —
    * exactly what 64 individually-nulled kernels inside array()
    * produced.
    */
  def allNulls(): ArrayData = new GenericArrayData(new Array[Any](m))

  /** One row: copy the floats out (bailing to [[allNulls]] on length
    * mismatch or a NULL element), then the m × dim fold — each output
    * dim accumulated in double, left to right, cast to float last,
    * matching DotProductFD + cast(float) bit for bit.
    */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n != dim) return allNulls()
    val in = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return allNulls()
      in(i) = a.getFloat(i)
      i += 1
    }
    val out = new Array[Float](m)
    val f = flat
    var j = 0
    while (j < m) {
      var acc = 0.0
      val base = j * dim
      var k = 0
      while (k < dim) {
        acc += in(k).toDouble * f(base + k)
        k += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) allNulls() else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("matvec", this, classOf[MatVecFD].getName)
    val code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${childGen.isNull} ? $ref.allNulls() : $ref.compute(${childGen.value});
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override def prettyName: String = "matvec_fd"

  // An Array field leaves the synthesized case-class equals/hashCode
  // reference-based, so two semantically identical rotations never
  // compare equal — defeating Catalyst canonicalization and
  // common-subexpression elimination (r18 ADVICE). Deep-compare the
  // matrix instead; the JVM identity fast path keeps the common
  // self-compare cheap.
  override def equals(other: Any): Boolean = other match {
    case that: MatVecFD =>
      (this eq that) || (child == that.child &&
        matrix.length == that.matrix.length &&
        matrix.indices.forall(j =>
          java.util.Arrays.equals(matrix(j), that.matrix(j))))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    var j = 0
    while (j < matrix.length) {
      h = h * 31 + java.util.Arrays.hashCode(matrix(j)); j += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecFD =
    copy(child = newChild)
}
