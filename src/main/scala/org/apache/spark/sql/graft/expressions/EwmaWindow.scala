package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average as a running-frame window
  * aggregate (the one primitive Spark SQL lacks publicly; the reference
  * uses polars `ewm_mean`, /root/reference/indicators.py:179 and :885).
  *
  * Declarative (pure-expression) recursion evaluated over
  * `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`, so `WindowExec`
  * updates the buffer once per row in row order — O(n) per partition,
  * bit-reproducible, no UDF.
  *
  * Semantics follow polars `ewm_mean(..., min_periods=1,
  * ignore_nulls=False)`:
  *
  *  - `adjust = false` (reference `ema`, indicators.py:175-179):
  *    y_0 = x_0; y_t = alpha*x_t + (1-alpha)*y_{t-1}.
  *    Null inputs keep the previous state; output is null until the
  *    first non-null input.
  *
  *  - `adjust = true` (polars default, used at indicators.py:885, :1159,
  *    :1262): y_t = num_t / den_t with
  *    num_t = (1-alpha)*num_{t-1} + x_t  (x_t treated as 0 when null)
  *    den_t = (1-alpha)*den_{t-1} + [x_t non-null]
  *    i.e. weights keep decaying across null rows (`ignore_nulls=False`).
  *
  * `input` must already be DoubleType (callers cast; see
  * `graft.functions.ewma`).
  */
case class EwmaWindow(input: Expression, alpha: Double, adjust: Boolean)
    extends AggregateWindowFunction
    with UnaryLike[Expression] {

  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

  private val beta = 1.0 - alpha

  override def child: Expression = input
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val num = AttributeReference("num", DoubleType, nullable = false)()
  private lazy val den = AttributeReference("den", DoubleType, nullable = false)()
  private lazy val y = AttributeReference("y", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    if (adjust) Seq(num, den) else Seq(y)

  override val initialValues: Seq[Expression] =
    if (adjust) Seq(Literal(0.0), Literal(0.0))
    else Seq(Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] =
    if (adjust) {
      Seq(
        Add(Multiply(Literal(beta), num), If(IsNull(input), Literal(0.0), input)),
        Add(Multiply(Literal(beta), den), If(IsNull(input), Literal(0.0), Literal(1.0)))
      )
    } else {
      Seq(
        If(
          IsNull(input),
          y,
          If(
            IsNull(y),
            input,
            Add(Multiply(Literal(alpha), input), Multiply(Literal(beta), y))))
      )
    }

  override lazy val evaluateExpression: Expression =
    if (adjust) {
      If(
        EqualTo(den, Literal(0.0)),
        Literal.create(null, DoubleType),
        Divide(num, den, EvalMode.LEGACY))
    } else y

  override def prettyName: String = "ewma"

  override protected def withNewChildInternal(newChild: Expression): EwmaWindow =
    copy(input = newChild)
}
