package graft.indicators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-kernel primitives (SURVEY.md §2.1). Every indicator is a
  * composition of these over exactly two partitioning classes
  * (SURVEY.md §2.5):
  *
  *  - [[bySymbol]] — polars `.over("symbol")` call sites;
  *  - [[global]]   — reference ops with no `.over` (window spans the
  *    whole timestamp-sorted frame, mixing symbols — replicated
  *    verbatim for parity).
  *
  * Reusing the same `WindowSpec` shapes everywhere lets Catalyst's
  * `CollapseWindow`/`TransposeWindow` merge the 2-8 window passes each
  * indicator emits into a handful of `WindowExec` nodes.
  *
  * Scale note (100 TB): [[bySymbol]] windows hash-partition on symbol
  * and scale horizontally. [[global]] windows are single-partition by
  * construction — the price of reference parity. The distributed
  * escape hatch is the two-pass prefix-aggregation sketch in
  * SURVEY.md §7.7; at bench scale (<=1e5 rows) single-partition is
  * optimal (no exchange).
  */
object Kernel {
  val Symbol = "symbol"
  val Ts = "timestamp"

  /** Per-symbol ordered window (indicators.py:95 `.over("symbol")`). */
  def bySymbol: WindowSpec = Window.partitionBy(Symbol).orderBy(Ts)

  /** Global ordered window (reference ops without `.over`). The symbol
    * tiebreak makes multi-symbol frames with equal timestamps
    * deterministic — the reference's unstable `sort("timestamp")`
    * leaves tie order unspecified, so any stable refinement is within
    * its semantics, and a reproducible answer beats a run-dependent
    * one.
    */
  def global: WindowSpec = Window.partitionBy().orderBy(Ts, Symbol)

  /** Whole-partition (unordered) per-symbol window — fill_null min/max/mean. */
  def bySymbolAll: WindowSpec = Window.partitionBy(Symbol)

  /** Trailing n-row frame (polars `rolling_*(window_size=n)`). */
  def trailing(spec: WindowSpec, n: Int): WindowSpec =
    spec.rowsBetween(-(n - 1L), 0L)

  /** Running frame (polars `cum_*` / `ewm_*`). */
  def running(spec: WindowSpec): WindowSpec =
    spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** polars rolling aggregate with the default `min_periods=window_size`
    * (indicators.py:94): NULL until the trailing n-row frame holds n
    * non-null values. The `count === n` gate reproduces both the
    * too-few-rows head and the non-null requirement exactly.
    */
  def rolling(agg: Column => Column)(c: Column, n: Int, spec: WindowSpec): Column = {
    val f = trailing(spec, n)
    when(count(c).over(f) === n, agg(c).over(f))
  }

  def rollMean(c: Column, n: Int, spec: WindowSpec): Column = rolling(avg)(c, n, spec)
  def rollSum(c: Column, n: Int, spec: WindowSpec): Column = rolling(sum)(c, n, spec)
  def rollMin(c: Column, n: Int, spec: WindowSpec): Column = rolling(min)(c, n, spec)
  def rollMax(c: Column, n: Int, spec: WindowSpec): Column = rolling(max)(c, n, spec)

  /** polars rolling_std: sample std, ddof=1 (indicators.py:267-270). */
  def rollStd(c: Column, n: Int, spec: WindowSpec): Column =
    rolling(stddev_samp)(c, n, spec)

  /** polars shift(k): lag for k>=0, lead for k<0 (indicators.py:197, :816). */
  def shift(c: Column, k: Int, spec: WindowSpec): Column =
    if (k >= 0) lag(c, k).over(spec) else lead(c, -k).over(spec)

  /** polars cum_sum (indicators.py:722): skips nulls in the running
    * total but emits null AT each null position (Spark's bare
    * sum-over-window would emit the running total there instead).
    */
  def cumSum(c: Column, spec: WindowSpec): Column =
    when(c.isNotNull, sum(c).over(running(spec)))

  /** polars cum_prod (indicators.py:571); same null placement as cumSum. */
  def cumProd(c: Column, spec: WindowSpec): Column =
    when(c.isNotNull, product(c).over(running(spec)))

  /** polars pct_change(n) == (c - shift(n)) / shift(n) (indicators.py:743). */
  def pctChange(c: Column, n: Int, spec: WindowSpec): Column = {
    val s = lag(c, n).over(spec)
    (c - s) / s
  }

  /** polars sum_horizontal (indicators.py:1240): nulls treated as 0,
    * including the all-null row (current polars ignore_nulls=True
    * default returns 0 there, not null).
    */
  def sumHorizontal(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0.0))).reduce(_ + _)

  /** EWM over the per-symbol ordered frame (polars
    * `ewm_mean(...).over("symbol")`, indicators.py:179).
    */
  def ewmaSym(c: Column, alpha: Double, adjust: Boolean): Column =
    graft.functions.ewmaOver(c, alpha, adjust, Seq(col(Symbol)), Seq(col(Ts)))

  /** EWM over the global ordered frame (reference `ewm_mean` call sites
    * without `.over`, e.g. indicators.py:885); symbol tiebreak as in
    * [[global]].
    */
  def ewmaGlobal(c: Column, alpha: Double, adjust: Boolean): Column =
    graft.functions.ewmaOver(c, alpha, adjust, Nil, Seq(col(Ts), col(Symbol)))

  /** Python f-string rendering of numeric params in output column names:
    * ints render bare, whole floats keep python's int default (the
    * reference's default args are ints, e.g. `multiplyer: float = 2`
    * renders as "2", indicators.py:1269).
    */
  def fmtNum(d: Double): String =
    if (d == d.toLong) d.toLong.toString else d.toString
}
