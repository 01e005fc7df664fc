package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Whole-stage-codegen dot product of a float array against a DOUBLE
  * array, accumulated in double, left to right. The double side exists
  * for constant plane vectors (LSH random hyperplanes): plane
  * coefficients like k/500 − 1 are not exactly representable as
  * floats, so a float-only dot product would drift from the DuckDB
  * oracle's `CAST(e[i] AS DOUBLE) * plane` fold. Numerically identical
  * to the unrolled
  * `Σ element_at(e, i).cast(double) * lit(plane(i))` chain it replaces
  * (same left-to-right order, same NULL-on-length-mismatch), but a
  * 64-iteration loop instead of a 256-node expression tree — the tree
  * form cost ~3 s of driver plan/codegen time per query.
  */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        // a NULL element poisons the whole sum, matching the
        // element_at-cast chain (element_at null * plane = null) and
        // the DuckDB oracle fold
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "dot_product_fd"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFD =
    copy(left = newLeft, right = newRight)
}
