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
  * ignore_nulls=False)` (pandas-equivalent weighted forms):
  *
  *  - `adjust = false` (reference `ema`, indicators.py:175-179):
  *    y_0 = x_0; y_t = (beta*w*y_{t-1} + alpha*x_t) / (beta*w + alpha)
  *    where `w` is the weight accumulated since the last non-null input
  *    (w = 1 when the previous input was non-null; each null row decays
  *    w by beta and leaves y unchanged). With no nulls this reduces to
  *    the familiar y_t = (beta*y + alpha*x)/(beta + alpha); across a
  *    null gap it yields the documented ignore_nulls=False weights,
  *    e.g. [x0, null, x2] -> (beta^2*x0 + alpha*x2)/(beta^2 + alpha).
  *    Output is null until the first non-null input.
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
  private def alphaL = Literal(alpha)
  private def betaL = Literal(beta)

  override def child: Expression = input
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val num = AttributeReference("num", DoubleType, nullable = false)()
  private lazy val den = AttributeReference("den", DoubleType, nullable = false)()
  private lazy val y = AttributeReference("y", DoubleType, nullable = true)()
  private lazy val w = AttributeReference("w", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    if (adjust) Seq(num, den) else Seq(y, w)

  override val initialValues: Seq[Expression] =
    if (adjust) Seq(Literal(0.0), Literal(0.0))
    else Seq(Literal.create(null, DoubleType), Literal(1.0))

  override val updateExpressions: Seq[Expression] =
    if (adjust) {
      Seq(
        Add(Multiply(betaL, num), If(IsNull(input), Literal(0.0), input)),
        Add(Multiply(betaL, den), If(IsNull(input), Literal(0.0), Literal(1.0)))
      )
    } else {
      // Normalized weighted update (pandas/polars ignore_nulls=False):
      // null input  -> y unchanged, w *= beta (only once a y exists);
      // first value -> y = x, w = 1;
      // later value -> y = (beta*w*y + alpha*x)/(beta*w + alpha), w = 1.
      val bw = Multiply(betaL, w)
      Seq(
        If(
          IsNull(input),
          y,
          If(
            IsNull(y),
            input,
            Divide(
              Add(Multiply(bw, y), Multiply(alphaL, input)),
              Add(bw, alphaL),
              EvalMode.LEGACY))),
        If(IsNull(input), If(IsNull(y), w, Multiply(betaL, w)), Literal(1.0))
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
