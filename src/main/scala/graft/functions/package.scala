package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.expressions.EwmaWindow
import org.apache.spark.sql.types.DoubleType

/** Custom column functions built on catalyst expressions (zero UDFs). */
package object functions {

  /** Exponentially-weighted moving average window function — evaluate
    * with `.over(spec)` where `spec` has partition/order but no frame
    * (the function pins `ROWS UNBOUNDED PRECEDING .. CURRENT ROW`).
    *
    * `ema(span)` of the reference = `ewma(c, 2.0 / (span + 1), adjust = false)`
    * (indicators.py:175-179); bare `ewm_mean(span=s)` of the reference =
    * `ewma(c, 2.0 / (s + 1), adjust = true)` (indicators.py:885).
    */
  def ewma(c: Column, alpha: Double, adjust: Boolean): Column =
    ColumnBridge.column(EwmaWindow(ColumnBridge.expression(c.cast(DoubleType)), alpha, adjust))
}
