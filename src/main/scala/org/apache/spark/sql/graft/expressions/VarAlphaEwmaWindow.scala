package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponential smoothing with a PER-ROW smoothing factor — the
  * primitive behind adaptive moving averages (KAMA's
  * `ewm_mean(alpha=expr)`, reference dead code indicators.py:1410):
  *
  *   y_t = y_{t-1} + alpha_t * (x_t - y_{t-1})
  *
  * seeded with y = x at the first row where both inputs are non-null;
  * rows with a null x or alpha leave the state (and output) unchanged,
  * null until seeded. Evaluated over ROWS UNBOUNDED PRECEDING ..
  * CURRENT ROW, O(n) per partition, no UDF.
  */
case class VarAlphaEwmaWindow(input: Expression, alpha: Expression)
    extends AggregateWindowFunction
    with BinaryLike[Expression] {

  override def left: Expression = input
  override def right: Expression = alpha
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val y = AttributeReference("y", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(y)

  override val initialValues: Seq[Expression] = Seq(Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = Seq(
    If(
      Or(IsNull(input), IsNull(alpha)),
      y,
      If(
        IsNull(y),
        input,
        Add(y, Multiply(alpha, Subtract(input, y))))))

  override lazy val evaluateExpression: Expression = y

  override def prettyName: String = "var_alpha_ewma"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VarAlphaEwmaWindow =
    copy(input = newLeft, alpha = newRight)
}
