package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, SortOrder, SpecifiedWindowFrame, RowFrame, UnboundedPreceding,
  CurrentRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.expressions.{DotProductD, DotProductF, DotProductFD, EwmaWindow, KmvSketch, MatVecFD, PsarWindow, SecondMomentAgg, SimhashBitsF, VarAlphaEwmaWindow}
import org.apache.spark.sql.types.DoubleType

/** Custom column functions built on catalyst expressions (zero UDFs). */
package object functions {

  /** Exponentially-weighted moving average over an ordered (optionally
    * partitioned) frame, pinned to `ROWS UNBOUNDED PRECEDING .. CURRENT
    * ROW`.
    *
    * The catalyst `WindowExpression` is built directly (rather than via
    * `Column.over`) because the public `.over` path wraps any
    * `AggregateFunction` — including an `AggregateWindowFunction` — in
    * an `AggregateExpression`, which the analyzer then rejects
    * (WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE).
    *
    * `ema(span)` of the reference = alpha 2/(span+1), adjust=false
    * (indicators.py:175-179); bare `ewm_mean(span=s)` of the reference =
    * same alpha, adjust=true (indicators.py:885).
    */
  def ewmaOver(
      c: Column,
      alpha: Double,
      adjust: Boolean,
      partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(
      WindowExpression(
        EwmaWindow(ColumnBridge.expression(c.cast(DoubleType)), alpha, adjust),
        spec))
  }

  /** K-minimum-values distinct-count sketch aggregate: the ascending
    * array of the `k` smallest distinct values of a LONG column, with
    * bounded O(k) state and map-side partial merging — see
    * [[org.apache.spark.sql.graft.expressions.KmvSketch]].
    */
  def kmvSketch(h: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(h), k).toAggregateExpression())

  /** Codegen'd float-array dot product in double (see
    * [[org.apache.spark.sql.graft.expressions.DotProductF]]).
    */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd dot product of a float array against a double array —
    * for constant (plane-vector) right sides; see
    * [[org.apache.spark.sql.graft.expressions.DotProductFD]].
    */
  def dotFD(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductFD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd dot product of two double arrays — for derived double
    * vectors such as SQ8 dequantized reconstructions; see
    * [[org.apache.spark.sql.graft.expressions.DotProductD]].
    */
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused constant-matrix × float-vector product (the OPQ rotation
    * apply) — one JIT-hot loop nest per row instead of `m` inlined
    * dot kernels; see
    * [[org.apache.spark.sql.graft.expressions.MatVecFD]].
    */
  def matvecFD(v: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(MatVecFD(ColumnBridge.expression(v), matrix))

  /** One-pass upper-triangle second-moment aggregate over a
    * float-vector column — d(d+1)/2 bounded state, map-side combined;
    * see [[org.apache.spark.sql.graft.expressions.SecondMomentAgg]].
    */
  def secondMomentAgg(v: Column, dim: Int): Column =
    ColumnBridge.column(
      SecondMomentAgg(ColumnBridge.expression(v), dim).toAggregateExpression())

  /** Fused 32-bit SimHash majority vote over a token-hash array, bits
    * placed at `offset`..`offset+31` — see
    * [[org.apache.spark.sql.graft.expressions.SimhashBitsF]].
    */
  def simhashBits(tokenHashes: Column, offset: Int = 0): Column =
    ColumnBridge.column(
      SimhashBitsF(ColumnBridge.expression(tokenHashes), offset))

  /** Parabolic SAR state machine over an ordered frame — see
    * [[org.apache.spark.sql.graft.expressions.PsarWindow]].
    */
  def psarOver(
      high: Column, low: Column, prevHigh: Column, prevLow: Column,
      afStart: Double, afInc: Double, afMax: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(
      WindowExpression(
        PsarWindow(
          ColumnBridge.expression(high.cast(DoubleType)),
          ColumnBridge.expression(low.cast(DoubleType)),
          ColumnBridge.expression(prevHigh.cast(DoubleType)),
          ColumnBridge.expression(prevLow.cast(DoubleType)),
          afStart, afInc, afMax),
        spec))
  }

  /** Variable-alpha EWM (adaptive smoothing, e.g. KAMA) over an
    * ordered frame — see
    * [[org.apache.spark.sql.graft.expressions.VarAlphaEwmaWindow]].
    */
  def varAlphaEwmaOver(
      x: Column,
      alpha: Column,
      partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(
      WindowExpression(
        VarAlphaEwmaWindow(
          ColumnBridge.expression(x.cast(DoubleType)),
          ColumnBridge.expression(alpha.cast(DoubleType))),
        spec))
  }
}
