package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Whole-stage-codegen dot product of two DOUBLE arrays, accumulated
  * left to right — the double-side sibling of [[DotProductF]] /
  * [[DotProductFD]], used where BOTH operands are derived double
  * vectors (e.g. the SQ8 dequantized reconstruction scoring its own
  * norm). Numerically identical to the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, +)` chain
  * (including NULL on length mismatch or a NULL element), but stays
  * inside whole-stage codegen, which matters because the SQ8 candidate
  * scan evaluates it once per (query, corpus-row) pair.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
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
        // zip_with/aggregate spelling and the DuckDB list_reduce fold
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i)
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
         |      ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "dot_product_d"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
