package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Parabolic SAR (Wilder) as a declarative window aggregate — the
  * reference stubs `psar` with NotImplementedError
  * (indicators.py:900-907); this is the standard trend-flipping
  * recursion its signature names, as a 4-attribute state machine
  * evaluated over ROWS UNBOUNDED PRECEDING .. CURRENT ROW.
  *
  * Inputs per row: (high, low, prevHigh, prevLow) — the lagged values
  * are staged as columns by the caller so the state machine stays a
  * pure per-row expression.
  *
  * State: trend (+1 up / −1 down), sar, ep (extreme point), af
  * (acceleration factor). Initialization at the first row with
  * non-null previous values: trend = high >= prevHigh, sar = the
  * opposite extreme, ep = the trend extreme, af = afStart. Per step:
  *   cand = sar + af·(ep − sar), clamped to not cross the previous
  *   bar's range; price crossing cand flips the trend (sar := ep,
  *   af := afStart), otherwise a new extreme advances ep and
  *   af := min(af + afInc, afMax).
  */
case class PsarWindow(
    high: Expression,
    low: Expression,
    prevHigh: Expression,
    prevLow: Expression,
    afStart: Double,
    afInc: Double,
    afMax: Double)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(high, low, prevHigh, prevLow)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val trend = AttributeReference("trend", DoubleType, nullable = true)()
  private lazy val sar = AttributeReference("sar", DoubleType, nullable = true)()
  private lazy val ep = AttributeReference("ep", DoubleType, nullable = true)()
  private lazy val af = AttributeReference("af", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(trend, sar, ep, af)

  override val initialValues: Seq[Expression] =
    Seq.fill(4)(Literal.create(null, DoubleType))

  private def d(v: Double) = Literal(v)

  override val updateExpressions: Seq[Expression] = {
    val uninit = IsNull(sar)
    val canInit = IsNotNull(prevHigh)
    val initUp = GreaterThanOrEqual(high, prevHigh)

    val up = EqualTo(trend, d(1.0))
    val cand = Add(sar, Multiply(af, Subtract(ep, sar)))
    val clampedUp = Least(Seq(cand, prevLow))
    val clampedDown = Greatest(Seq(cand, prevHigh))
    val revUp = LessThan(low, clampedUp) // uptrend pierced from below
    val revDown = GreaterThan(high, clampedDown) // downtrend pierced from above

    val newTrend = If(
      uninit,
      If(canInit, If(initUp, d(1.0), d(-1.0)), trend),
      If(up, If(revUp, d(-1.0), d(1.0)), If(revDown, d(1.0), d(-1.0))))

    val newSar = If(
      uninit,
      If(canInit, If(initUp, prevLow, prevHigh), sar),
      If(up, If(revUp, ep, clampedUp), If(revDown, ep, clampedDown)))

    val newEp = If(
      uninit,
      If(canInit, If(initUp, high, low), ep),
      If(
        up,
        If(revUp, low, Greatest(Seq(ep, high))),
        If(revDown, high, Least(Seq(ep, low)))))

    val grown = Least(Seq(Add(af, d(afInc)), d(afMax)))
    val newAf = If(
      uninit,
      If(canInit, d(afStart), af),
      If(
        up,
        If(revUp, d(afStart), If(GreaterThan(high, ep), grown, af)),
        If(revDown, d(afStart), If(LessThan(low, ep), grown, af))))

    Seq(newTrend, newSar, newEp, newAf)
  }

  override lazy val evaluateExpression: Expression = sar

  override def prettyName: String = "psar"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PsarWindow =
    copy(high = newChildren(0), low = newChildren(1),
      prevHigh = newChildren(2), prevLow = newChildren(3))
}
