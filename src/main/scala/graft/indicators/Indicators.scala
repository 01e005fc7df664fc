package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


import Kernel._

/** Fluent, lazily-evaluated indicator algebra over ordered, optionally
  * symbol-partitioned OHLCV tables — the Spark-native counterpart of the
  * reference `Indicators` class (/root/reference/indicators.py:9).
  *
  * Differences from the reference, by design (SURVEY.md §2.6):
  *  - immutable: every method returns a new wrapper (fixes the
  *    reference's `show_graph` mutation bug, indicators.py:51-52);
  *  - no eager sort at construction: in Spark every window spec carries
  *    its own `ORDER BY timestamp`, so row order cannot influence
  *    results; [[toDF]] sorts by timestamp for presentation parity with
  *    the reference's constructor sort (indicators.py:28);
  *  - `stochastic_rsi` uses the corrected rollmax−rollmin denominator
  *    (the reference's is identically zero, indicators.py:510-518);
  *  - `donchian_channel` / `unlcer_index` implement the evident intent
  *    (the reference versions crash at collect/build,
  *    indicators.py:993-999, :1074);
  *  - methods the reference stubs with NotImplementedError (`wma`,
  *    `aroon`, `kst`, `adi`, `mfi`) are implemented natively from their
  *    dead-code intent (indicators.py:958-978, :1005-1039, :1280-1328,
  *    :1416-1488).
  *
  * Deliberately-replicated reference quirks (parity is observable
  * behavior, SURVEY.md §2.6): `upprsier` Bollinger name typo (:277),
  * MACD emitting only its signal line (:330-340), `cumulative_returns`
  * compounding percent+1 (:569), stochastic-oscillator numerator
  * `rolling_min(close−low)` (:377-379), ADX true-range first term
  * `high−close` (:610), ultimate-oscillator `max−max` true range
  * (:1210-1213) and 4/2/2 weights, unscaled ease-of-movement (:1129),
  * ichimoku hard-coded shift 26 + future-looking chikou (:814-816), NVI
  * gated global cum_sum (:948-954), SMA (not Wilder) smoothing in
  * RSI/ATR/ADX, and the per-symbol vs global partitioning split of
  * SURVEY.md §2.5 (e.g. `sma` is per-symbol, `atr` spans symbols).
  */
final class Indicators private (
    private val df: DataFrame,
    private val syntheticSymbol: Boolean,
    private val partitionAll: Boolean) {

  import Indicators.validateColumns

  /** The "global" window of the reference (no `.over`, spans the whole
    * timestamp-sorted frame). In [[Indicators.scaled]] mode it is
    * rerouted per-symbol: reference parity keeps the single-partition
    * window (exact on one symbol, quirky-but-faithful on many), while
    * the scaled mode hash-partitions every window on symbol so all ~40
    * operators parallelize across executors at 100 TB. On single-symbol
    * frames the two are equivalent (SURVEY.md §2.5).
    */
  private val g: org.apache.spark.sql.expressions.WindowSpec =
    if (partitionAll) bySymbol else global

  private def ewmaG(c: Column, alpha: Double, adjust: Boolean): Column =
    if (partitionAll) ewmaSym(c, alpha, adjust)
    else Kernel.ewmaGlobal(c, alpha, adjust)

  /** Reference `collect()` (indicators.py:30-39): drop the synthetic
    * symbol and hand back the frame, timestamp-sorted like the
    * reference's constructor sort. Caller picks the action.
    */
  def toDF: DataFrame = {
    if (syntheticSymbol)
      df.orderBy(col(Ts).asc_nulls_first).drop(Symbol)
    else
      df.orderBy(col(Ts).asc_nulls_first, col(Symbol))
  }

  /** Reference `get_lazyframe()` (indicators.py:56-63): internal frame,
    * synthetic symbol still present.
    */
  def dataframe: DataFrame = df

  /** Reference `show_graph(optimized)` (indicators.py:41-54): render
    * the query plan of the chained operations. Polars draws the
    * LazyFrame graph; the Spark-native spelling is the Catalyst plan —
    * `optimized = true` shows the optimized logical plan (the polars
    * default's analogue), `false` the analyzed (pre-optimization)
    * plan. Returns the string AND prints it, so the fluent chain can
    * keep flowing exactly like the reference (which returns the
    * display object). When the symbol column is synthetic, the
    * rendered plan excludes it (indicators.py:51-52
    * `pl.exclude('symbol')`) — the graph a symbol-less caller sees
    * never mentions the injected column; unlike the reference, the
    * exclusion does NOT mutate the wrapped frame (the immutability
    * stance of `collect`, SURVEY.md §2.5 Q1).
    */
  def showGraph(optimized: Boolean = true): String = {
    val qe = (if (syntheticSymbol) df.drop(Symbol) else df).queryExecution
    val s = if (optimized) qe.optimizedPlan.toString else qe.analyzed.toString
    // scalastyle:off println
    println(s)
    // scalastyle:on println
    s
  }

  private def chain(d: DataFrame): Indicators =
    new Indicators(d, syntheticSymbol, partitionAll)

  private def require_(cols: Seq[String]): Unit = validateColumns(cols, df.columns)

  private def withCols(d: DataFrame, cols: Seq[(String, Column)]): DataFrame =
    d.withColumns(cols.toMap)

  // ---------------------------------------------------------------- sma

  /** Simple moving average, per symbol (indicators.py:78-100). */
  def sma(columns: Seq[String], window_size: Int, _suffix: String = ""): Indicators = {
    require_(columns)
    chain(withCols(df, columns.map { c =>
      s"${_suffix}${c}_sma_$window_size" -> rollMean(col(c), window_size, bySymbol)
    }))
  }

  // --------------------------------------------- awesome_oscillator

  /** Awesome oscillator: SMA(mid, short) − SMA(mid, long) of the bar
    * midpoint, per symbol (indicators.py:102-135).
    */
  def awesome_oscillator(
      short_window: Int = 5,
      long_window: Int = 34,
      _suffix: String = ""): Indicators = {
    require_(Seq("high", "low"))
    val mid = (col("high") + col("low")) / 2
    val ao = rollMean(mid, short_window, bySymbol) - rollMean(mid, long_window, bySymbol)
    chain(df.withColumn(s"${_suffix}ao_${short_window}_$long_window", ao))
  }

  // ---------------------------------------------------------- fill_null

  /** Constant- or strategy-fill of nulls (indicators.py:137-167).
    * Exactly one of `value` / `method` must be given; strategy fills are
    * per symbol, value fills global — reference behavior.
    */
  def fill_null(
      columns: Seq[String],
      value: Option[Double] = None,
      method: Option[String] = None): Indicators = {
    if (value.isDefined && method.isDefined)
      throw new IllegalArgumentException("Either Value or Method can be given")
    if (value.isEmpty && method.isEmpty)
      throw new IllegalArgumentException("Either Value or Method needs to be given")
    require_(columns)
    val filled: String => Column = value match {
      case Some(v) => c => coalesce(col(c), lit(v))
      case None =>
        method.get match {
          case "forward" =>
            c => last(col(c), ignoreNulls = true).over(running(bySymbol))
          case "backward" =>
            c =>
              first(col(c), ignoreNulls = true)
                .over(bySymbol.rowsBetween(0, Long.MaxValue))
          case "min" => c => coalesce(col(c), min(col(c)).over(bySymbolAll))
          case "max" => c => coalesce(col(c), max(col(c)).over(bySymbolAll))
          case "mean" => c => coalesce(col(c), avg(col(c)).over(bySymbolAll))
          case "zero" => c => coalesce(col(c), lit(0))
          case "one" => c => coalesce(col(c), lit(1))
          case other =>
            throw new IllegalArgumentException(s"unknown fill_null method: $other")
        }
    }
    chain(withCols(df, columns.map(c => c -> filled(c))))
  }

  // ---------------------------------------------------------------- ema

  /** Exponential moving average, polars `ewm_mean(alpha=2/(span+1),
    * adjust=False)` per symbol (indicators.py:169-185).
    */
  def ema(columns: Seq[String], span: Int, _suffix: String = ""): Indicators = {
    require_(columns)
    val alpha = 2.0 / (span + 1)
    chain(withCols(df, columns.map { c =>
      s"${_suffix}${c}_ema_$span" -> ewmaSym(col(c), alpha, adjust = false)
    }))
  }

  // ---------------------------------------------------------------- rsi

  /** RSI with SMA-smoothed gains/losses — reference formula, not Wilder
    * (indicators.py:187-249). Delta is a GLOBAL shift (:197); the
    * rolling means are per symbol (:214-227).
    */
  def rsi(columns: Seq[String], period: Int = 14, _suffix: String = ""): Indicators = {
    require_(columns)
    // No bare .otherwise(0): polars when/then/otherwise is Kleene —
    // a null condition yields null, not the otherwise branch, so the
    // head row's gain/loss must stay null (delaying the rolling gate
    // by one row exactly like the reference).
    val staged = withCols(df, columns.flatMap { c =>
      val delta = col(c) - lag(col(c), 1).over(g)
      Seq(
        s"_${c}_gain" -> when(delta > 0, delta).when(delta <= 0, lit(0)),
        s"_${c}_loss" -> when(delta < 0, abs(delta)).when(delta >= 0, lit(0)))
    })
    val out = withCols(staged, columns.map { c =>
      val avgGain = rollMean(col(s"_${c}_gain"), period, bySymbol)
      val avgLoss = rollMean(col(s"_${c}_loss"), period, bySymbol)
      s"${_suffix}${c}_rsi_$period" -> (lit(100) - lit(100) / (lit(1) + avgGain / avgLoss))
    })
    chain(out.drop(columns.flatMap(c => Seq(s"_${c}_gain", s"_${c}_loss")): _*))
  }

  // ---------------------------------------------------- bollinger_bands

  /** Bollinger bands, per symbol; sample std (ddof=1). The `upprsier`
    * output name replicates the reference's typo verbatim
    * (indicators.py:251-298).
    */
  def bollinger_bands(
      columns: Seq[String],
      window_size: Int = 20,
      num_std_dev: Double = 2,
      _suffix: String = ""): Indicators = {
    require_(columns)
    val k = fmtNum(num_std_dev)
    chain(withCols(df, columns.flatMap { c =>
      val mid = rollMean(col(c), window_size, bySymbol)
      val dev = lit(num_std_dev) * rollStd(col(c), window_size, bySymbol)
      Seq(
        s"${_suffix}${c}_upprsier_band_${window_size}_$k" -> (mid + dev),
        s"${_suffix}${c}_lower_band_${window_size}_$k" -> (mid - dev))
    }))
  }

  // --------------------------------------------------------------- macd

  /** MACD — the reference drops the MACD line itself and keeps ONLY the
    * signal line (indicators.py:300-342); replicated.
    */
  def macd(
      columns: Seq[String],
      short_span: Int = 12,
      long_span: Int = 26,
      signal_span: Int = 9): Indicators = {
    require_(columns)
    val aS = 2.0 / (short_span + 1)
    val aL = 2.0 / (long_span + 1)
    val aSig = 2.0 / (signal_span + 1)
    val staged = withCols(df, columns.map { c =>
      s"_${c}_macd" ->
        (ewmaSym(col(c), aS, adjust = false) -
          ewmaSym(col(c), aL, adjust = false))
    })
    val out = withCols(staged, columns.map { c =>
      s"${c}_signal_line" ->
        ewmaSym(col(s"_${c}_macd"), aSig, adjust = false)
    })
    chain(out.drop(columns.map(c => s"_${c}_macd"): _*))
  }

  // ---------------------------------------------------------------- atr

  /** ATR with SMA smoothing, global window; TR first term is high−low
    * here (unlike adx) (indicators.py:344-368).
    */
  def atr(period: Int = 14, _suffix: String = ""): Indicators = {
    require_(Seq("high", "low", "close"))
    val prevClose = lag(col("close"), 1).over(g)
    val staged = df.withColumn(
      "_true_range",
      greatest(
        col("high") - col("low"),
        abs(col("high") - prevClose),
        abs(col("low") - prevClose)))
    val out = staged.withColumn(
      s"${_suffix}atr",
      rollMean(col("_true_range"), period, g))
    chain(out.drop("_true_range"))
  }

  // ------------------------------------------------ stochastic_oscillator

  /** Stochastic oscillator — numerator is `rolling_min(close − low)`
    * exactly as the reference computes it (indicators.py:370-393), not
    * the standard `close − rolling_min(low)`. Global window.
    */
  def stochastic_oscillator(period: Int = 14, _suffix: String = ""): Indicators = {
    require_(Seq("high", "low", "close"))
    val num = rollMin(col("close") - col("low"), period, g)
    val den = rollMax(col("high"), period, g) - rollMin(col("low"), period, g)
    chain(df.withColumn(s"${_suffix}stochastic_oscillator_$period", num / den * 100))
  }

  // ----------------------------------------------------------- ppo / pvo

  private def helperPvoPpo(
      c: String,
      short_window: Int,
      long_window: Int,
      signal_window: Int): Indicators = {
    require_(Seq(c))
    val o = if (c == "close") "ppo" else "pvo"
    val aS = 2.0 / (short_window + 1)
    val aL = 2.0 / (long_window + 1)
    val aSig = 2.0 / (signal_window + 1)
    val eS = ewmaSym(col(c), aS, adjust = false)
    val eL = ewmaSym(col(c), aL, adjust = false)
    val line = s"${o}_${short_window}_$long_window"
    val signal = s"${o}_signal_${short_window}_$long_window"
    val hist = s"${o}_histogram_${short_window}_$long_window"
    val d1 = df.withColumn(line, (eS - eL) / eL * 100)
    val d2 = d1.withColumn(signal, ewmaSym(col(line), aSig, adjust = false))
    chain(d2.withColumn(hist, col(line) - col(signal)))
  }

  /** Percentage price oscillator (+ signal + histogram), per symbol
    * (indicators.py:395-460).
    */
  def ppo(short_window: Int = 12, long_window: Int = 26, signal_window: Int = 9): Indicators =
    helperPvoPpo("close", short_window, long_window, signal_window)

  /** Percentage volume oscillator (indicators.py:462-470). */
  def pvo(short_window: Int = 12, long_window: Int = 26, signal_window: Int = 9): Indicators =
    helperPvoPpo("volume", short_window, long_window, signal_window)

  // ---------------------------------------------------------------- roc

  /** Rate of change ×100, global shift (indicators.py:472-486). */
  def roc(columns: Seq[String], period: Int = 10): Indicators = {
    require_(columns)
    chain(withCols(df, columns.map { c =>
      s"${c}_roc_$period" -> (pctChange(col(c), period, g) * 100)
    }))
  }

  // ------------------------------------------------------ stochastic_rsi

  /** Stochastic RSI. The reference's denominator is identically zero
    * (`rolling_max − rolling_max`, indicators.py:510-518) making every
    * output ±Inf/NaN; this implements the evident intent
    * (rolling_max − rolling_min). Rolling min/max are global (no
    * `.over` in the reference); the inner RSI keeps its mixed
    * partitioning.
    */
  def stochastic_rsi(
      columns: Seq[String],
      rsi_period: Int = 14,
      stoch_period: Int = 14): Indicators = {
    require_(columns)
    val withRsi = rsi(columns, rsi_period, _suffix = "_")
    val d = withRsi.df
    val out = withCols(d, columns.map { c =>
      val r = col(s"_${c}_rsi_$rsi_period")
      val lo = rollMin(r, stoch_period, g)
      val hi = rollMax(r, stoch_period, g)
      s"${c}_stoch_rsi_${rsi_period}_$stoch_period" -> ((r - lo) / (hi - lo))
    })
    chain(out.drop(columns.map(c => s"_${c}_rsi_$rsi_period"): _*))
  }

  // -------------------------------------------------------- daily_return

  /** Percent daily return, per symbol (indicators.py:525-541). */
  def daily_return(columns: Seq[String], _suffix: String = ""): Indicators = {
    require_(columns)
    chain(withCols(df, columns.map { c =>
      s"${_suffix}${c}_daily_return" -> (pctChange(col(c), 1, bySymbol) * 100)
    }))
  }

  /** Natural-log daily return, per symbol (indicators.py:543-558). */
  def daily_log_return(columns: Seq[String]): Indicators = {
    require_(columns)
    chain(withCols(df, columns.map { c =>
      s"${c}_daily_log_return" -> log(col(c) / lag(col(c), 1).over(bySymbol))
    }))
  }

  /** Cumulative "returns" — the reference compounds the PERCENT return
    * plus one, i.e. Π(1 + 100·r), replicated verbatim
    * (indicators.py:560-576).
    */
  def cumulative_returns(columns: Seq[String]): Indicators = {
    require_(columns)
    val staged = withCols(df, columns.map { c =>
      s"_${c}_daily_return" -> (pctChange(col(c), 1, bySymbol) * 100)
    })
    val out = withCols(staged, columns.map { c =>
      s"${c}_cumulative_return" ->
        cumProd(col(s"_${c}_daily_return") + 1, bySymbol)
    })
    chain(out.drop(columns.map(c => s"_${c}_daily_return"): _*))
  }

  // ---------------------------------------------------------------- adx

  /** ADX — reference variant: TR first term is `high − close` (same
    * row), all smoothing is SMA; global windows (indicators.py:602-663).
    */
  def adx(period: Int = 14): Indicators = {
    require_(Seq("high", "low", "close"))
    val prevClose = lag(col("close"), 1).over(g)
    val upMove = col("high") - lag(col("high"), 1).over(g)
    val downMove = lag(col("low"), 1).over(g) - col("low")
    val staged = withCols(
      df,
      Seq(
        "_tr" -> greatest(
          col("high") - col("close"),
          abs(col("high") - prevClose),
          abs(col("low") - prevClose)),
        "_pdm" -> when(upMove > 0, upMove).when(upMove <= 0, lit(0)),
        "_ndm" -> when(downMove > 0, downMove).when(downMove <= 0, lit(0))))
    val smoothTr = rollMean(col("_tr"), period, g)
    val pdi = rollMean(col("_pdm"), period, g) / smoothTr * 100
    val ndi = rollMean(col("_ndm"), period, g) / smoothTr * 100
    val staged2 = staged.withColumn("_dx", abs(pdi - ndi) / (pdi + ndi) * 100)
    val out = staged2.withColumn("adx", rollMean(col("_dx"), period, g))
    chain(out.drop("_tr", "_pdm", "_ndm", "_dx"))
  }

  // ---------------------------------------------------------------- cci

  /** Commodity channel index, global windows (indicators.py:672-703). */
  def cci(period: Int = 14): Indicators = {
    require_(Seq("high", "low", "close"))
    val staged = df.withColumn("_typical_price", (col("high") + col("low") + col("close")) / 3)
    val staged2 = staged.withColumn("_sma_tp", rollMean(col("_typical_price"), period, g))
    val meanDev = rollMean(abs(col("_typical_price") - col("_sma_tp")), period, g)
    val out = staged2.withColumn(
      "CCI",
      (col("_typical_price") - col("_sma_tp")) / (lit(0.015) * meanDev))
    chain(out.drop("_typical_price", "_sma_tp"))
  }

  // --------------------------------------------------------------- vwap

  /** VWAP anchored at the start of the frame — never resets, not per
    * symbol; reference behavior (indicators.py:705-735).
    */
  def vwap(): Indicators = {
    require_(Seq("high", "low", "close", "volume"))
    val tpVol = (col("high") + col("low") + col("close")) / 3 * col("volume")
    chain(df.withColumn("vwap", cumSum(tpVol, g) / cumSum(col("volume"), g)))
  }

  // ---------------------------------------------------------------- vpt

  /** Volume price trend, global (indicators.py:737-751). */
  def vpt(): Indicators = {
    require_(Seq("close", "volume"))
    val staged = df.withColumn("_vpt_change", pctChange(col("close"), 1, g) * col("volume"))
    val out = staged.withColumn("vpt", cumSum(col("_vpt_change"), g))
    chain(out.drop("_vpt_change"))
  }

  // ---------------------------------------------------------------- obv

  /** On-balance volume, global (indicators.py:753-772). */
  def obv(): Indicators = {
    require_(Seq("close", "volume"))
    val diff = col("close") - lag(col("close"), 1).over(g)
    // Kleene: null diff (head row) -> null direction, like polars.
    val direction = when(diff > 0, 1).when(diff < 0, -1).when(diff === 0, 0)
    val staged = df.withColumn("_obv_change", direction * col("volume"))
    val out = staged.withColumn("obv", cumSum(col("_obv_change"), g))
    chain(out.drop("_obv_change"))
  }

  // ----------------------------------------------------------- ichimoku

  /** Ichimoku cloud — global windows; senkou span B's shift is
    * hard-coded 26 (not `window_two`) and chikou is the FUTURE close
    * (`shift(−window_two)`), both replicated (indicators.py:785-823).
    */
  def ichimoku(window_one: Int = 9, window_two: Int = 26, window_three: Int = 52): Indicators = {
    require_(Seq("high", "low", "close"))
    def channel(n: Int): Column =
      (rollMax(col("high"), n, g) + rollMin(col("low"), n, g)) / 2
    val staged = withCols(
      df,
      Seq(
        "tenkan_sen" -> channel(window_one),
        "kijun_sen" -> channel(window_two),
        "_sb_raw" -> channel(window_three),
        "chikou_span" -> lead(col("close"), window_two).over(g)))
    val out = withCols(
      staged,
      Seq(
        "senkou_span_b" -> lag(col("_sb_raw"), 26).over(g),
        "senkou_span_a" ->
          lag((col("tenkan_sen") + col("kijun_sen")) / 2, window_two).over(g)))
    chain(out.drop("_sb_raw"))
  }

  // ------------------------------------------------------------- vortex

  /** Vortex indicator, global windows (indicators.py:825-854). */
  def vortex(period: Int = 14): Indicators = {
    require_(Seq("high", "low", "close"))
    val prevClose = lag(col("close"), 1).over(g)
    val staged = withCols(
      df,
      Seq(
        "_tr" -> greatest(
          col("high") - col("low"),
          abs(col("high") - prevClose),
          abs(col("low") - prevClose)),
        "_vm_plus" -> abs(col("high") - lag(col("low"), 1).over(g)),
        "_vm_minus" -> abs(col("low") - lag(col("high"), 1).over(g))))
    val trSum = rollSum(col("_tr"), period, g)
    val out = withCols(
      staged,
      Seq(
        "+VI" -> (rollSum(col("_vm_plus"), period, g) / trSum),
        "-VI" -> (rollSum(col("_vm_minus"), period, g) / trSum)))
    chain(out.drop("_tr", "_vm_plus", "_vm_minus"))
  }

  // --------------------------------------------------------------- trix

  /** TRIX — triple per-symbol EMA (adjust=False), then a GLOBAL
    * pct_change (indicators.py:856-875).
    */
  def trix(period: Int = 15): Indicators = {
    require_(Seq("close"))
    val alpha = 2.0 / (period + 1)
    def e(c: Column): Column = ewmaSym(c, alpha, adjust = false)
    val d1 = df.withColumn("_ema1", e(col("close")))
    val d2 = d1.withColumn("_ema2", e(col("_ema1")))
    val d3 = d2.withColumn("_ema3", e(col("_ema2")))
    val out = d3.withColumn(s"trix_$period", pctChange(col("_ema3"), 1, g))
    chain(out.drop("_ema1", "_ema2", "_ema3"))
  }

  // ---------------------------------------------------------- mass_index

  /** Mass index — GLOBAL `ewm_mean(span=…)` with polars' default
    * adjust=True (indicators.py:877-898).
    */
  def mass_index(ema_period: Int = 9, mi_period: Int = 26): Indicators = {
    require_(Seq("high", "low"))
    val alpha = 2.0 / (ema_period + 1)
    val d1 = df.withColumn(
      "_ema1",
      ewmaG(col("high") - col("low"), alpha, adjust = true))
    val d2 = d1.withColumn("_ema2", ewmaG(col("_ema1"), alpha, adjust = true))
    val out = d2.withColumn(
      s"mass_index_${ema_period}_$mi_period",
      rollSum(col("_ema1") / col("_ema2"), mi_period, g))
    chain(out.drop("_ema1", "_ema2"))
  }

  // --------------------------------------------------------- williams_ri

  /** Williams %R, global windows (indicators.py:909-926). */
  def williams_ri(lookback: Int = 14): Indicators = {
    require_(Seq("high", "low", "close"))
    val hh = rollMax(col("high"), lookback, g)
    val ll = rollMin(col("low"), lookback, g)
    chain(df.withColumn(s"williams_%r_$lookback", (hh - col("close")) / (hh - ll) * -100))
  }

  // --------------------------------------------------------- force_index

  /** Force index (indicators.py:928-941). */
  def force_index(): Indicators = {
    require_(Seq("close", "volume"))
    chain(df.withColumn(
      "force_index",
      (col("close") - lag(col("close"), 1).over(g)) * col("volume")))
  }

  // ------------------------------------------- negative_volume_index

  /** Reference NVI variant: a GLOBAL cum_sum of the return series,
    * gated per-row on declining volume — not the standard recursive NVI
    * (indicators.py:943-956).
    */
  def negative_volume_index(): Indicators = {
    require_(Seq("close", "volume"))
    val staged = df.withColumn("_r", col("close") / lag(col("close"), 1).over(g) - 1)
    val prevVol = lag(col("volume"), 1).over(g)
    val out = staged.withColumn(
      "nvi",
      when(col("volume") < prevVol, cumSum(col("_r"), g))
        .when(col("volume") >= prevVol, lit(0)))
    chain(out.drop("_r"))
  }

  // ---------------------------------------------------- donchian_channel

  /** Donchian channel — the reference crashes at collect (mid references
    * same-projection columns, indicators.py:993-999); staged here.
    */
  def donchian_channel(look_back: Int = 20): Indicators = {
    require_(Seq("high", "low"))
    val staged = withCols(
      df,
      Seq(
        s"donchian_upper_$look_back" -> rollMax(col("high"), look_back, g),
        s"donchian_lower_$look_back" -> rollMin(col("low"), look_back, g)))
    chain(staged.withColumn(
      s"donchian_mid_$look_back",
      (col(s"donchian_upper_$look_back") + col(s"donchian_lower_$look_back")) / 2))
  }

  // ------------------------------------------------- chaikin_money_flow

  /** Chaikin money flow, global windows (indicators.py:1041-1059). */
  def chaikin_money_flow(look_back: Int = 14): Indicators = {
    require_(Seq("high", "low", "close", "volume"))
    val mfv = (col("close") - col("low") - (col("high") - col("close"))) /
      (col("high") - col("low")) * col("volume")
    chain(df.withColumn(
      s"cmf_$look_back",
      rollSum(mfv, look_back, g) / rollSum(col("volume"), look_back, g)))
  }

  // -------------------------------------------------------- unlcer_index

  /** Ulcer index (reference method name kept verbatim, incl. typo; its
    * body crashes at query build, indicators.py:1074 — intent
    * implemented: sqrt(rolling_mean((c/rolling_max(c,n) − 1)², n))).
    */
  def unlcer_index(columns: Seq[String], look_back: Int = 14): Indicators = {
    require_(columns)
    val staged = withCols(df, columns.map { c =>
      s"_${c}_dd" -> pow(col(c) / rollMax(col(c), look_back, g) - 1, 2)
    })
    val out = withCols(staged, columns.map { c =>
      s"${c}_ulcer_index_$look_back" -> sqrt(rollMean(col(s"_${c}_dd"), look_back, g))
    })
    chain(out.drop(columns.map(c => s"_${c}_dd"): _*))
  }

  /** Alias with the intended spelling (extension; the reference only has
    * the misspelled method).
    */
  def ulcer_index(columns: Seq[String], look_back: Int = 14): Indicators =
    unlcer_index(columns, look_back)

  // ---------------------------------------------------------------- dpo

  /** Detrended price oscillator, global (indicators.py:1086-1104). */
  def dpo(columns: Seq[String], look_back: Int = 20): Indicators = {
    require_(columns)
    val offset = look_back / 2 + 1
    val staged = withCols(df, columns.map { c =>
      s"_${c}_ma" -> rollMean(col(c), look_back, g)
    })
    val out = withCols(staged, columns.map { c =>
      s"${c}_dpo_$look_back" -> (col(c) - lag(col(s"_${c}_ma"), offset).over(g))
    })
    chain(out.drop(columns.map(c => s"_${c}_ma"): _*))
  }

  // ---------------------------------------------------- ease_of_movement

  /** Simplified EOM — the reference omits the distance/box-ratio scaling
    * (indicators.py:1124-1141).
    */
  def ease_of_movement(): Indicators = {
    require_(Seq("high", "low", "volume"))
    chain(df.withColumn(
      "ease_of_movement",
      (col("high") + col("low") -
        lag(col("high"), 1).over(g) - lag(col("low"), 1).over(g)) / col("volume")))
  }

  // ---------------------------------------------- true_strength_index

  /** TSI — double GLOBAL `ewm_mean(span=…)` (adjust=True), smoothing
    * short-period-then-long-period exactly as the reference does
    * (standard is long-then-short) (indicators.py:1143-1189). Temps are
    * fully dropped (the reference leaks `_…_delta_price`, SURVEY.md
    * §2.6 Q10).
    */
  def true_strength_index(
      columns: Seq[String],
      short_period: Int,
      long_preiod: Int): Indicators = {
    require_(columns)
    val aS = 2.0 / (short_period + 1)
    val aL = 2.0 / (long_preiod + 1)
    val staged = withCols(df, columns.map { c =>
      s"_${c}_delta" -> (col(c) - lag(col(c), 1).over(g))
    })
    val staged2 = withCols(staged, columns.flatMap { c =>
      Seq(
        s"_${c}_sm1" -> ewmaG(col(s"_${c}_delta"), aS, adjust = true),
        s"_${c}_sm1abs" -> ewmaG(abs(col(s"_${c}_delta")), aS, adjust = true))
    })
    val staged3 = withCols(staged2, columns.flatMap { c =>
      Seq(
        s"_${c}_sm2" -> ewmaG(col(s"_${c}_sm1"), aL, adjust = true),
        s"_${c}_sm2abs" -> ewmaG(col(s"_${c}_sm1abs"), aL, adjust = true))
    })
    val out = withCols(staged3, columns.map { c =>
      s"${c}_tsi_${short_period}_$long_preiod" ->
        (lit(100) * col(s"_${c}_sm2") / col(s"_${c}_sm2abs"))
    })
    chain(out.drop(columns.flatMap(c =>
      Seq(s"_${c}_delta", s"_${c}_sm1", s"_${c}_sm1abs", s"_${c}_sm2", s"_${c}_sm2abs")): _*))
  }

  // ------------------------------------------------ ultimate_oscillator

  /** Ultimate oscillator — reference variant: TR is `max(h,c₋₁) −
    * max(l,c₋₁)` (second term should be min) and default weights are
    * 4/2/2 (standard 4/2/1); null horizon components sum as 0
    * (indicators.py:1191-1247).
    */
  def ultimate_oscillator(
      short: Int = 7,
      medium: Int = 14,
      long: Int = 28,
      short_wt: Int = 4,
      medium_wt: Int = 2,
      long_wt: Int = 2): Indicators = {
    require_(Seq("high", "low", "close"))
    val prevClose = lag(col("close"), 1).over(g)
    val staged = withCols(
      df,
      Seq(
        "_bp" -> (col("close") - least(col("low"), prevClose)),
        "_tr" -> (greatest(col("high"), prevClose) - greatest(col("low"), prevClose))))
    def horizon(n: Int, wt: Int): Column =
      rollMean(col("_bp"), n, g) / rollMean(col("_tr"), n, g) * wt
    val uo = sumHorizontal(
      Seq(horizon(short, short_wt), horizon(medium, medium_wt), horizon(long, long_wt))) *
      100 / (short_wt + medium_wt + long_wt)
    val name = s"UO_${short}_${medium}_${long}_${short_wt}_${medium_wt}_$long_wt"
    chain(staged.withColumn(name, uo).drop("_bp", "_tr"))
  }

  // ----------------------------------------------------- keltner_channel

  /** Keltner channel — GLOBAL ewm middle band (adjust=True), SMA "ATR"
    * (indicators.py:1249-1278).
    */
  def keltner_channel(
      ema_period: Int = 20,
      atr_period: Int = 14,
      multiplyer: Double = 2): Indicators = {
    require_(Seq("high", "low", "close"))
    val alpha = 2.0 / (ema_period + 1)
    val prevClose = lag(col("close"), 1).over(g)
    val staged = withCols(
      df,
      Seq(
        "_tr" -> (greatest(col("high"), prevClose) - least(col("low"), prevClose)),
        "_middle_band" -> ewmaG(col("close"), alpha, adjust = true)))
    val atrCol = rollMean(col("_tr"), atr_period, g)
    val m = fmtNum(multiplyer)
    val out = withCols(
      staged,
      Seq(
        s"KC_Upper_Band_${ema_period}_${atr_period}_$m" ->
          (col("_middle_band") + atrCol * multiplyer),
        s"KC_Lower_Band_${ema_period}_${atr_period}_$m" ->
          (col("_middle_band") - atrCol * multiplyer)))
    chain(out.drop("_tr", "_middle_band"))
  }

  // ====================================================================
  // Natively-implemented methods the reference stubs with
  // NotImplementedError — semantics follow its dead code (SURVEY §7.7).
  // ====================================================================

  /** Weighted moving average with linear weights 1..n (newest row
    * weight n), per symbol — dead-code intent at indicators.py:958-978.
    * Computed as a closed-form dot product over k lags (no UDF).
    */
  def wma(columns: Seq[String], window_size: Int): Indicators = {
    require_(columns)
    val wSum = window_size * (window_size + 1) / 2.0
    chain(withCols(df, columns.map { c =>
      val dot = (0 until window_size)
        .map(i => lag(col(c), i).over(bySymbol) * (window_size - i))
        .reduce(_ + _)
      s"${c}_wma_$window_size" ->
        when(count(col(c)).over(trailing(bySymbol, window_size)) === window_size, dot / wSum)
    }))
  }

  /** Aroon up/down — dead-code intent at indicators.py:1005-1039:
    * `100·(n − (len − arg_extreme))/n` over a trailing n-row window;
    * ties resolve to the most recent extreme. Global (the dead code has
    * no `.over`). Uses `max_by`/`min_by` over a row-number struct — no
    * UDF.
    */
  def aroon(look_back: Int = 14): Indicators = {
    require_(Seq("high", "low"))
    val rn = row_number().over(g)
    val staged = df.withColumn("_rn", rn)
    val frame = trailing(g, look_back)
    val gate = count(col("_rn")).over(frame) === look_back
    val sinceMax = col("_rn") - max_by(col("_rn"), struct(col("high"), col("_rn"))).over(frame) + 1
    val sinceMin = col("_rn") - max_by(col("_rn"), struct(-col("low"), col("_rn"))).over(frame) + 1
    val out = withCols(
      staged,
      Seq(
        s"aroon_up_$look_back" -> when(gate, lit(100) * (lit(look_back) - sinceMax) / look_back),
        s"aroon_down_$look_back" -> when(gate, lit(100) * (lit(look_back) - sinceMin) / look_back)))
    chain(out.drop("_rn"))
  }

  /** KST — Σ wᵢ·SMA(ROCᵢ(col), smaᵢ), dead-code intent at
    * indicators.py:1280-1328. Global windows.
    */
  def kst(
      columns: Seq[String],
      roc_periods: Seq[Int] = Seq(10, 15, 20, 30),
      sma_periods: Seq[Int] = Seq(10, 10, 10, 15),
      weights: Seq[Int] = Seq(1, 2, 3, 4)): Indicators = {
    require(
      roc_periods.length == sma_periods.length && sma_periods.length == weights.length,
      "roc_periods, sma_periods and weights must align")
    require_(columns)
    val staged = withCols(df, columns.flatMap { c =>
      roc_periods.zipWithIndex.map { case (p, i) =>
        s"_${c}_roc_$i" -> (pctChange(col(c), p, g) * 100)
      }
    })
    val out = withCols(staged, columns.map { c =>
      val terms = sma_periods.zip(weights).zipWithIndex.map { case ((sp, w), i) =>
        rollMean(col(s"_${c}_roc_$i"), sp, g) * w
      }
      s"${c}_kst" -> terms.reduce(_ + _)
    })
    chain(out.drop(columns.flatMap(c => roc_periods.indices.map(i => s"_${c}_roc_$i")): _*))
  }

  /** Accumulation/distribution index — dead-code intent at
    * indicators.py:1416-1439: global cum_sum of CLV·volume.
    */
  def adi(): Indicators = {
    require_(Seq("high", "low", "close", "volume"))
    val mfv = (col("close") - col("low") - (col("high") - col("close"))) /
      (col("high") - col("low")) * col("volume")
    val staged = df.withColumn("_mfv", mfv)
    chain(staged.withColumn("ADI", cumSum(col("_mfv"), g)).drop("_mfv"))
  }

  /** Parabolic stop-and-reverse — the reference stubs this outright
    * (indicators.py:900-907, NotImplementedError, no dead code); the
    * standard Wilder recursion its signature names is implemented as
    * the custom state-machine window aggregate
    * [[org.apache.spark.sql.graft.expressions.PsarWindow]]. The
    * reference's default `af_max = 0.02` (evidently a typo for 0.2) is
    * kept verbatim. Global window like its neighbors.
    */
  def psar(
      af_start: Double = 0.02,
      af_increment: Double = 0.02,
      af_max: Double = 0.02): Indicators = {
    require_(Seq("high", "low"))
    val staged = withCols(
      df,
      Seq(
        "_ph" -> lag(col("high"), 1).over(g),
        "_pl" -> lag(col("low"), 1).over(g)))
    val (part, ord) =
      if (partitionAll) (Seq(col(Symbol)), Seq(col(Ts)))
      else (Seq.empty[Column], Seq(col(Ts), col(Symbol)))
    val out = staged.withColumn(
      "psar",
      graft.functions.psarOver(
        col("high"), col("low"), col("_ph"), col("_pl"),
        af_start, af_increment, af_max, part, ord))
    chain(out.drop("_ph", "_pl"))
  }

  /** Schaff trend cycle core — dead-code intent at
    * indicators.py:1330-1380: MACD line from GLOBAL adjust=true EWMs,
    * then a stochastic of the MACD line over `stoch_period`. The dead
    * code also computes a signal line it never uses; not emitted.
    */
  def stc(
      columns: Seq[String],
      fast_period: Int = 12,
      slow_period: Int = 26,
      signal_period: Int = 9,
      stoch_period: Int = 10): Indicators = {
    require_(columns)
    val aF = 2.0 / (fast_period + 1)
    val aS = 2.0 / (slow_period + 1)
    val staged = withCols(df, columns.map { c =>
      s"_${c}_ml" ->
        (ewmaG(col(c), aF, adjust = true) - ewmaG(col(c), aS, adjust = true))
    })
    val out = withCols(staged, columns.map { c =>
      val ml = col(s"_${c}_ml")
      val lo = rollMin(ml, stoch_period, g)
      val hi = rollMax(ml, stoch_period, g)
      s"${c}_stc_${fast_period}_${slow_period}_$stoch_period" ->
        ((ml - lo) / (hi - lo) * 100)
    })
    chain(out.drop(columns.map(c => s"_${c}_ml"): _*))
  }

  /** Kaufman adaptive moving average — the reference's dead code
    * (indicators.py:1382-1414) divides by a nonsensical quantity and
    * could never run; this implements the standard KAMA its constants
    * point at: efficiency ratio |Δn| / Σ|Δ1| over `window`, smoothing
    * constant (ER·(2/3 − 2/31) + 2/31)², then the variable-alpha
    * recursion y_t = y_{t-1} + SC_t·(x_t − y_{t-1}) via the custom
    * [[org.apache.spark.sql.graft.expressions.VarAlphaEwmaWindow]].
    * Global window like the dead code (no `.over`).
    */
  def kama(price_col: String = "close", window: Int = 10): Indicators = {
    require_(Seq(price_col))
    val fastSc = 2.0 / (2 + 1)
    val slowSc = 2.0 / (30 + 1)
    val c = col(price_col)
    val staged = df.withColumn(
      s"_${price_col}_er",
      abs(c - lag(c, window).over(g)) / rollSum(abs(c - lag(c, 1).over(g)), window, g))
    // Self-multiplication, not pow(x, 2): libm pow is only 1-ulp
    // accurate and may differ from DuckDB's, which would desync the
    // oracle recursion; IEEE multiply is exact-rounded everywhere.
    val scBase = col(s"_${price_col}_er") * (fastSc - slowSc) + slowSc
    val staged2 = staged.withColumn(s"_${price_col}_sc", scBase * scBase)
    val out = staged2.withColumn(
      s"KAMA_$price_col",
      if (partitionAll)
        graft.functions.varAlphaEwmaOver(
          c, col(s"_${price_col}_sc"), Seq(col(Symbol)), Seq(col(Ts)))
      else
        graft.functions.varAlphaEwmaOver(
          c, col(s"_${price_col}_sc"), Nil, Seq(col(Ts), col(Symbol))))
    chain(out.drop(s"_${price_col}_er", s"_${price_col}_sc"))
  }

  /** Money flow index — dead-code intent at indicators.py:1441-1488;
    * global windows.
    */
  def mfi(window: Int = 14): Indicators = {
    require_(Seq("high", "low", "close", "volume"))
    val staged = df.withColumn("_tp", (col("high") + col("low") + col("close")) / 3)
    val prevTp = lag(col("_tp"), 1).over(g)
    val rmf = col("_tp") * col("volume")
    val staged2 = withCols(
      staged,
      Seq(
        "_pmf" -> when(col("_tp") > prevTp, rmf).when(col("_tp") <= prevTp, lit(0)),
        "_nmf" -> when(col("_tp") <= prevTp, rmf).when(col("_tp") > prevTp, lit(0))))
    val out = staged2.withColumn(
      "MFI",
      lit(100) - lit(100) / (lit(1) +
        rollSum(col("_pmf"), window, g) / rollSum(col("_nmf"), window, g)))
    chain(out.drop("_tp", "_pmf", "_nmf"))
  }

  // --------------------------------------------- Column-selector overloads

  /** Reference `_get_column_names` (indicators.py:65-76): resolve
    * Column selectors/expressions to concrete output names with a
    * plan-only select — no job; Spark's eager analyzer is the analog
    * of polars' collect_schema(). Lets the fluent API accept the
    * reference's actual call shapes (`pl.col("close")`,
    * `pl.col("close").alias(...)`) alongside bare strings.
    */
  private def resolve(columns: Seq[Column]): Seq[String] =
    df.select(columns: _*).schema.fieldNames.toSeq

  // Scala forbids default arguments on more than one overloaded
  // alternative, so these selector overloads spell every scalar
  // parameter; the Seq[String] originals keep the reference defaults.
  // The DummyImplicit disambiguates post-erasure Seq[Column] vs
  // Seq[String].

  def sma(columns: Seq[Column], window_size: Int)(implicit d: DummyImplicit): Indicators =
    sma(resolve(columns), window_size)

  def ema(columns: Seq[Column], span: Int)(implicit d: DummyImplicit): Indicators =
    ema(resolve(columns), span)

  def rsi(columns: Seq[Column], period: Int)(implicit d: DummyImplicit): Indicators =
    rsi(resolve(columns), period)

  def roc(columns: Seq[Column], period: Int)(implicit d: DummyImplicit): Indicators =
    roc(resolve(columns), period)

  def wma(columns: Seq[Column], window_size: Int)(implicit d: DummyImplicit): Indicators =
    wma(resolve(columns), window_size)

  def dpo(columns: Seq[Column], look_back: Int)(implicit d: DummyImplicit): Indicators =
    dpo(resolve(columns), look_back)

  def unlcer_index(columns: Seq[Column], look_back: Int)(implicit d: DummyImplicit): Indicators =
    unlcer_index(resolve(columns), look_back)

  def ulcer_index(columns: Seq[Column], look_back: Int)(implicit d: DummyImplicit): Indicators =
    ulcer_index(resolve(columns), look_back)

  def bollinger_bands(
      columns: Seq[Column],
      window_size: Int,
      num_std_dev: Double)(implicit d: DummyImplicit): Indicators =
    bollinger_bands(resolve(columns), window_size, num_std_dev)

  def macd(
      columns: Seq[Column],
      short_span: Int,
      long_span: Int,
      signal_span: Int)(implicit d: DummyImplicit): Indicators =
    macd(resolve(columns), short_span, long_span, signal_span)

  def stochastic_rsi(
      columns: Seq[Column],
      rsi_period: Int,
      stoch_period: Int)(implicit d: DummyImplicit): Indicators =
    stochastic_rsi(resolve(columns), rsi_period, stoch_period)

  def true_strength_index(
      columns: Seq[Column],
      short_period: Int,
      long_preiod: Int)(implicit d: DummyImplicit): Indicators =
    true_strength_index(resolve(columns), short_period, long_preiod)

  def kst(
      columns: Seq[Column],
      roc_periods: Seq[Int],
      sma_periods: Seq[Int],
      weights: Seq[Int])(implicit d: DummyImplicit): Indicators =
    kst(resolve(columns), roc_periods, sma_periods, weights)

  def stc(
      columns: Seq[Column],
      fast_period: Int,
      slow_period: Int,
      signal_period: Int,
      stoch_period: Int)(implicit d: DummyImplicit): Indicators =
    stc(resolve(columns), fast_period, slow_period, signal_period, stoch_period)

  def fill_null(
      columns: Seq[Column],
      value: Option[Double],
      method: Option[String])(implicit d: DummyImplicit): Indicators =
    fill_null(resolve(columns), value, method)

  def kama(price_col: Column, window: Int): Indicators =
    kama(resolve(Seq(price_col)).head, window)

  def daily_return(columns: Column*): Indicators =
    daily_return(resolve(columns))

  def daily_log_return(columns: Column*)(implicit d: DummyImplicit): Indicators =
    daily_log_return(resolve(columns))

  def cumulative_returns(columns: Column*)(implicit d: DummyImplicit): Indicators =
    cumulative_returns(resolve(columns))
}

object Indicators {

  /** Wrap a frame; inject the synthetic constant symbol when absent
    * (indicators.py:25-27). No eager sort — see class doc.
    */
  def apply(df: DataFrame): Indicators = build(df, partitionAll = false)

  /** Scale mode: every window is partitioned by symbol, so all
    * operators parallelize across executors instead of funnelling the
    * reference's global windows through one partition. Semantics are
    * identical on single-symbol frames and saner (no cross-symbol
    * leakage) on multi-symbol ones.
    */
  def scaled(df: DataFrame): Indicators = build(df, partitionAll = true)

  private def build(df: DataFrame, partitionAll: Boolean): Indicators = {
    require(df.columns.contains(Kernel.Ts), s"required column '${Kernel.Ts}' is missing")
    if (df.columns.contains(Kernel.Symbol)) new Indicators(df, false, partitionAll)
    else new Indicators(df.withColumn(Kernel.Symbol, lit("x")), true, partitionAll)
  }

  /** Reference `validate_columns` (utils.py:4-8). */
  def validateColumns(required: Seq[String], available: Seq[String]): Unit = {
    val missing = required.filterNot(available.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing required columns: ${missing.mkString(", ")}")
  }
}
