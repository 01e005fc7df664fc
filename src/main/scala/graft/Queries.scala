package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.indicators.Indicators
import graft.sources.Bars

/** Declared driver queries + their DuckDB oracle SQL (SURVEY.md §7.5).
  *
  * Conventions that make the hash compare work:
  *  - both sides derive bars from `events` with the identical CTE
  *    (FIXTURES.md §2); global-window operators additionally restrict
  *    to ONE symbol so the global ordering has no timestamp ties;
  *  - output = symbol, "timestamp", then round(x, 6) per float column,
  *    aliased identically on both sides (snake_case, no `%`/`+`);
  *  - ORDER BY symbol, "timestamp" on both sides;
  *  - null head rows are KEPT (they round-trip fine); fixtures avoid
  *    0-denominator ±Inf paths (verified at sf0.01).
  */
object Queries {

  /** The single symbol used for global-window queries. */
  private val OneSym = "click"

  private def bars(s: SparkSession, dir: String): DataFrame = Bars.fromEvents(s, dir)

  /** Single-symbol fixture for global-window ops. Degenerate bars
    * (high == low, i.e. single-event buckets) are excluded: Spark float
    * division by zero yields NaN/Inf (polars parity, ANSI off) while
    * DuckDB yields NULL, so any 0-denominator row would hash-mismatch
    * by construction. The exclusion is textually identical on both
    * sides (Bars1Cte).
    */
  private def bars1(s: SparkSession, dir: String): DataFrame =
    bars(s, dir).where(col("symbol") === OneSym && col("high") =!= col("low"))

  /** Shared DuckDB bars CTE (FIXTURES.md §2). */
  val BarsCte: String =
    """WITH bars AS (
      |  SELECT event_type AS symbol,
      |         date_trunc('hour', ts) AS "timestamp",
      |         min(value) AS low,
      |         max(value) AS high,
      |         arg_min(value, event_id) AS open,
      |         arg_max(value, event_id) AS close,
      |         CAST(count(*) AS BIGINT) AS volume
      |  FROM events
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** Bars restricted to the single-symbol fixture (see [[bars1]]). */
  val Bars1Cte: String =
    BarsCte + ",\nb1 AS (SELECT * FROM bars WHERE symbol = 'click' AND high <> low)"

  /** TWO-symbol fixture for the cross-symbol global-window quirk
    * (SURVEY.md §2.5): global ops mix symbols in one
    * timestamp-ordered window. Both symbols share every hour bucket,
    * so the (timestamp, symbol) tiebreak is exercised on every row.
    * Only used with operators that have no division (atr), so
    * degenerate bars need no exclusion.
    */
  val Bars2Cte: String =
    BarsCte + ",\nb2 AS (SELECT * FROM bars WHERE symbol IN ('click', 'view'))"

  /** Recursive-CTE variant: DuckDB computes window aggregates with a
    * segment tree, whose non-sequential association drifts from Spark's
    * sequential running-frame accumulation by ulps — visible after
    * round(6) on large magnitudes. Cumulative oracles therefore use an
    * explicit row-by-row recursion, which IS bit-identical.
    */
  // MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, so a
  // recursion referencing an un-materialized CTE re-evaluates it every
  // iteration — for the chained EWM recursions (macd r1 -> m -> r2)
  // that is O(n^2) whole recursions and ran for minutes-to-forever.
  val Bars1CteRec: String =
    ("WITH RECURSIVE" + Bars1Cte.stripPrefix("WITH"))
      .replace("bars AS (", "bars AS MATERIALIZED (")
      .replace("b1 AS (", "b1 AS MATERIALIZED (")
  val BarsCteRec: String =
    ("WITH RECURSIVE" + BarsCte.stripPrefix("WITH"))
      .replace("bars AS (", "bars AS MATERIALIZED (")

  private val Tail = "ORDER BY symbol, \"timestamp\""

  /** Shared fill_null fixture: every 7th-volume bar's close nulled,
    * then filled with the given strategy/value (same CASE on the
    * oracle side).
    */
  private def fillNullQuery(
      s: SparkSession,
      dir: String,
      value: Option[Double] = None,
      method: Option[String] = None): DataFrame = {
    val withNulls = bars(s, dir).withColumn(
      "close",
      when(col("volume") % 7 === 0, lit(null)).otherwise(col("close")))
    Indicators(withNulls)
      .fill_null(Seq("close"), value = value, method = method)
      .dataframe
      .select(col("symbol"), col("timestamp"), round(col("close"), 6).as("close_filled"))
      .orderBy("symbol", "timestamp")
  }

  /** Query result shaper: symbol, timestamp, rounded outputs. */
  private def shape(df: DataFrame, outs: (String, String)*): DataFrame =
    df.select(
      col("symbol") +: col("timestamp") +:
        outs.map { case (src, alias) => round(col(src), 6).as(alias) }: _*)
      .orderBy("symbol", "timestamp")

  // ------------------------------------------------------------------
  // Rolling family (per-symbol ops run multi-symbol; global ops on b1)
  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sma" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).sma(Seq("close"), 20).dataframe,
        "close_sma_20" -> "close_sma_20")),

    "awesome_oscillator" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).awesome_oscillator().dataframe,
        "ao_5_34" -> "ao_5_34")),

    "bollinger_bands" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).bollinger_bands(Seq("close")).dataframe,
        "close_upprsier_band_20_2" -> "close_upper_band_20_2",
        "close_lower_band_20_2" -> "close_lower_band_20_2")),

    "wma" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).wma(Seq("close"), 10).dataframe,
        "close_wma_10" -> "close_wma_10")),

    "roc" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).roc(Seq("close")).dataframe,
        "close_roc_10" -> "close_roc_10")),

    "atr" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).atr().dataframe, "atr" -> "atr")),

    // Cross-symbol global-window semantics under oracle: the same atr,
    // but on a TWO-symbol frame, where the reference's global windows
    // mix symbols in one timestamp-ordered pass (engine tiebreak:
    // timestamp, symbol — Kernel.global).
    "atr_multisym" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir).where(col("symbol").isin("click", "view")))
          .atr().dataframe,
        "atr" -> "atr")),

    "stochastic_oscillator" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).stochastic_oscillator().dataframe,
        "stochastic_oscillator_14" -> "stochastic_oscillator_14")),

    "williams_ri" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).williams_ri().dataframe,
        "williams_%r_14" -> "williams_r_14")),

    "donchian_channel" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).donchian_channel().dataframe,
        "donchian_upper_20" -> "donchian_upper_20",
        "donchian_lower_20" -> "donchian_lower_20",
        "donchian_mid_20" -> "donchian_mid_20")),

    "dpo" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).dpo(Seq("close")).dataframe,
        "close_dpo_20" -> "close_dpo_20")),

    "cci" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).cci().dataframe, "CCI" -> "cci")),

    "rsi" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).rsi(Seq("close")).dataframe,
        "close_rsi_14" -> "close_rsi_14")),

    "vortex" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).vortex().dataframe,
        "+VI" -> "vi_plus",
        "-VI" -> "vi_minus")),

    "chaikin_money_flow" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).chaikin_money_flow().dataframe,
        "cmf_14" -> "cmf_14")),

    "ichimoku" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).ichimoku().dataframe,
        "tenkan_sen" -> "tenkan_sen",
        "kijun_sen" -> "kijun_sen",
        "senkou_span_a" -> "senkou_span_a",
        "senkou_span_b" -> "senkou_span_b",
        "chikou_span" -> "chikou_span")),

    "adx" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).adx().dataframe, "adx" -> "adx")),

    "ultimate_oscillator" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).ultimate_oscillator().dataframe,
        "UO_7_14_28_4_2_2" -> "uo_7_14_28_4_2_2")),

    "unlcer_index" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).unlcer_index(Seq("close")).dataframe,
        "close_ulcer_index_14" -> "close_ulcer_index_14")),

    "aroon" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).aroon().dataframe,
        "aroon_up_14" -> "aroon_up_14",
        "aroon_down_14" -> "aroon_down_14")),

    "kst" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).kst(Seq("close")).dataframe,
        "close_kst" -> "close_kst")),

    "mfi" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).mfi().dataframe, "MFI" -> "mfi")),

    // ---------------------------------------------------- cumulative

    "vwap" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).vwap().dataframe, "vwap" -> "vwap")),

    // Distributed-plan twins: the same arithmetic as vwap/ema, but
    // executed through the two-pass prefix plans (graft.plans.Scale)
    // instead of a single-partition global window — the 100 TB path
    // itself under the DuckDB oracle. Same oracle SQL as the parity
    // twin: round(6) absorbs the two-pass association drift (ulps).
    "vwap_distributed" -> ((s, dir) => {
      val b = bars1(s, dir).withColumn(
        "_tpv", (col("high") + col("low") + col("close")) / 3 * col("volume"))
      // Both running sums share ONE staged range partitioning (the
      // multi-column prefix plan) — one repartition shuffle, one
      // offsets job, one window pass, instead of the full two-job
      // plan per cumulative.
      graft.plans.Scale.cumSumsDistributed(
          b, Seq("_tpv" -> "_cum_pv", "volume" -> "_cum_vol"), "timestamp")
        .select(
          col("symbol"), col("timestamp"),
          round(col("_cum_pv") / col("_cum_vol"), 6).as("vwap"))
        .orderBy("symbol", "timestamp")
    }),

    "ema_distributed" -> ((s, dir) =>
      graft.plans.Scale.ewmaDistributed(
          bars1(s, dir), "close", "timestamp", 2.0 / 10, "close_ema_9")
        .select(
          col("symbol"), col("timestamp"),
          round(col("close_ema_9"), 6).as("close_ema_9"))
        .orderBy("symbol", "timestamp")),

    // The third P12-family distributed witness (alongside vwap/ema):
    // ADI's CLV·volume term is per-row (no lag), so the global cum_sum
    // maps directly onto Scale.cumSumDistributed — obv/vpt/nvi differ
    // only in needing a boundary-composed lag for their per-row term,
    // not in the prefix plan itself.
    "adi_distributed" -> ((s, dir) => {
      val b = bars1(s, dir).withColumn(
        "_mfv", (col("close") - col("low") - (col("high") - col("close"))) /
          (col("high") - col("low")) * col("volume"))
      graft.plans.Scale.cumSumDistributed(b, "_mfv", "timestamp", "_cum_mfv")
        .select(
          col("symbol"), col("timestamp"),
          round(col("_cum_mfv"), 6).as("adi"))
        .orderBy("symbol", "timestamp")
    }),

    // The LAG-dependent P12 witness: OBV's per-row term needs the
    // previous close, supplied by Scale.lagDistributed's boundary-
    // composed partition lag, then the running sum rides
    // cumSumDistributed — the full obv on distributed plans end to
    // end (vpt/nvi compose from the same two primitives). The sum
    // stays integer-valued in double (volumes << 2^53), so the BIGINT
    // cast is exact; the globally-first row's NULL direction
    // propagates through the prefix sum exactly as in parity mode.
    "obv_distributed" -> ((s, dir) => {
      val lagged = graft.plans.Scale.lagDistributed(
        bars1(s, dir), "close", "timestamp", "_prev_close")
      val diff = col("close") - col("_prev_close")
      val change = (when(diff > 0, 1).when(diff < 0, -1).when(diff === 0, 0)
        * col("volume")).cast("double")
      graft.plans.Scale.cumSumDistributed(
          lagged.withColumn("_obv_change", change),
          "_obv_change", "timestamp", "_obv")
        .select(
          col("symbol"), col("timestamp"),
          col("_obv").cast("bigint").as("obv"))
        .orderBy("symbol", "timestamp")
    }),

    "vpt" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).vpt().dataframe, "vpt" -> "vpt")),

    // vpt and nvi complete the P12 family on distributed plans: their
    // per-row terms need the previous close (nvi also the previous
    // volume — both lags share ONE staged partitioning via
    // lagsDistributed), then the running sum rides cumSumDistributed.
    // Every global cumulative in the reference (vwap vpt obv adi nvi)
    // plus the global EWMs now has a declared distributed witness.
    "vpt_distributed" -> ((s, dir) => {
      val lagged = graft.plans.Scale.lagDistributed(
        bars1(s, dir), "close", "timestamp", "_prev_close")
      val vc = (col("close") - col("_prev_close")) / col("_prev_close") * col("volume")
      graft.plans.Scale.cumSumDistributed(
          lagged.withColumn("_vc", vc), "_vc", "timestamp", "_vpt")
        .select(
          col("symbol"), col("timestamp"),
          round(col("_vpt"), 6).as("vpt"))
        .orderBy("symbol", "timestamp")
    }),

    "nvi_distributed" -> ((s, dir) => {
      val lagged = graft.plans.Scale.lagsDistributed(
        bars1(s, dir),
        Seq("close" -> "_prev_close", "volume" -> "_prev_vol"), "timestamp")
      val r = col("close") / col("_prev_close") - 1
      graft.plans.Scale.cumSumDistributed(
          lagged.withColumn("_r", r), "_r", "timestamp", "_cum_r")
        .select(
          col("symbol"), col("timestamp"),
          round(
            when(col("volume") < col("_prev_vol"), col("_cum_r"))
              .when(col("volume") >= col("_prev_vol"), lit(0)), 6).as("nvi"))
        .orderBy("symbol", "timestamp")
    }),

    "obv" -> ((s, dir) =>
      Indicators(bars1(s, dir)).obv().dataframe
        .select(col("symbol"), col("timestamp"), col("obv").cast("bigint").as("obv"))
        .orderBy("symbol", "timestamp")),

    "adi" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).adi().dataframe, "ADI" -> "adi")),

    "negative_volume_index" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).negative_volume_index().dataframe,
        "nvi" -> "nvi")),

    "force_index" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).force_index().dataframe,
        "force_index" -> "force_index")),

    "ease_of_movement" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).ease_of_movement().dataframe,
        "ease_of_movement" -> "ease_of_movement")),

    "daily_return" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).daily_return(Seq("close")).dataframe,
        "close_daily_return" -> "close_daily_return")),

    "daily_log_return" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).daily_log_return(Seq("close")).dataframe,
        "close_daily_log_return" -> "close_daily_log_return")),

    // No round(6): the compounded product reaches 1e9+ magnitudes where
    // DuckDB's scale-by-1e6 round() and Spark's BigDecimal round()
    // disagree by a final digit; the raw sequential product is
    // bit-identical on both sides, so compare unrounded.
    "cumulative_returns" -> ((s, dir) =>
      Indicators(bars(s, dir)).cumulative_returns(Seq("close")).dataframe
        .select(col("symbol"), col("timestamp"), col("close_cumulative_return"))
        .orderBy("symbol", "timestamp")),

    "fill_null_forward" -> ((s, dir) => fillNullQuery(s, dir, method = Some("forward"))),

    // The remaining fill_null strategies (indicators.py:141-165), one
    // declared query per distinct implementation shape: constant fill
    // (zero/one share this code path with other literals), backward
    // running window, and the whole-partition min/max/mean fills.
    "fill_null_value" -> ((s, dir) => fillNullQuery(s, dir, value = Some(-1.0))),
    "fill_null_zero" -> ((s, dir) => fillNullQuery(s, dir, method = Some("zero"))),
    "fill_null_one" -> ((s, dir) => fillNullQuery(s, dir, method = Some("one"))),
    "fill_null_backward" -> ((s, dir) => fillNullQuery(s, dir, method = Some("backward"))),
    "fill_null_mean" -> ((s, dir) => fillNullQuery(s, dir, method = Some("mean"))),
    "fill_null_min" -> ((s, dir) => fillNullQuery(s, dir, method = Some("min"))),
    "fill_null_max" -> ((s, dir) => fillNullQuery(s, dir, method = Some("max"))),

    // ------------------------------------------------------- EWM family

    "ema" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).ema(Seq("close"), 9).dataframe,
        "close_ema_9" -> "close_ema_9")),

    // The registered-SQL surface of the custom EWM window function:
    // the same adjust=false recursion driven entirely through
    // spark.sql over a temp view, proving the GraftExtensions
    // function-registration path end-to-end (not just the fluent
    // Column API the other queries use). alpha 0.2 == span 9.
    "sql_ewma" -> ((s, dir) => {
      GraftExtensions.register(s)
      bars(s, dir).createOrReplaceTempView("bars_sql")
      s.sql(
        """SELECT symbol, timestamp,
          |  round(ewma(close, CAST(0.2 AS DOUBLE), false) OVER (
          |    PARTITION BY symbol ORDER BY timestamp
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ema_sql
          |FROM bars_sql ORDER BY symbol, timestamp""".stripMargin)
    }),

    "macd" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).macd(Seq("close")).dataframe,
        "close_signal_line" -> "close_signal_line")),

    "ppo" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).ppo().dataframe,
        "ppo_12_26" -> "ppo_12_26",
        "ppo_signal_12_26" -> "ppo_signal_12_26",
        "ppo_histogram_12_26" -> "ppo_histogram_12_26")),

    "pvo" -> ((s, dir) =>
      shape(
        Indicators(bars(s, dir)).pvo().dataframe,
        "pvo_12_26" -> "pvo_12_26",
        "pvo_signal_12_26" -> "pvo_signal_12_26",
        "pvo_histogram_12_26" -> "pvo_histogram_12_26")),

    "trix" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).trix().dataframe, "trix_15" -> "trix_15")),

    "mass_index" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).mass_index().dataframe,
        "mass_index_9_26" -> "mass_index_9_26")),

    "keltner_channel" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).keltner_channel().dataframe,
        "KC_Upper_Band_20_14_2" -> "kc_upper_band_20_14_2",
        "KC_Lower_Band_20_14_2" -> "kc_lower_band_20_14_2")),

    "true_strength_index" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).true_strength_index(Seq("close"), 13, 25).dataframe,
        "close_tsi_13_25" -> "close_tsi_13_25")),

    "stochastic_rsi" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).stochastic_rsi(Seq("close")).dataframe,
        "close_stoch_rsi_14_14" -> "close_stoch_rsi_14_14")),

    "stc" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).stc(Seq("close")).dataframe,
        "close_stc_12_26_10" -> "close_stc_12_26_10")),

    "kama" -> ((s, dir) =>
      shape(
        Indicators(bars1(s, dir)).kama().dataframe,
        "KAMA_close" -> "kama_close")),

    "psar" -> ((s, dir) =>
      shape(Indicators(bars1(s, dir)).psar().dataframe, "psar" -> "psar"))
  )

  // ------------------------------------------------------------------
  // Oracle SQL — DuckDB, same bars CTE, same arithmetic order.
  // ------------------------------------------------------------------

  private def q(body: String, cte: String = BarsCte): String = s"$cte\n$body"

  /** min_periods gate + aggregate over a trailing n-row frame. */
  private def gated(
      agg: String, c: String, n: Int, part: String,
      ord: String = "\"timestamp\""): String = {
    val w = s"(${part}ORDER BY $ord ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
    s"CASE WHEN count($c) OVER $w = $n THEN $agg($c) OVER $w END"
  }
  private def gS(agg: String, c: String, n: Int) = gated(agg, c, n, "PARTITION BY symbol ")
  private def gG(agg: String, c: String, n: Int) = gated(agg, c, n, "")
  /** Global gated agg with the multi-symbol (timestamp, symbol) tiebreak. */
  private def gGm(agg: String, c: String, n: Int) =
    gated(agg, c, n, "", "\"timestamp\", symbol")

  // EWM recursion building blocks. Alpha/beta are spelled so DuckDB
  // computes the IDENTICAL doubles as the Scala engine (all-DOUBLE
  // casts — bare 2.0/26 would be DECIMAL arithmetic in DuckDB), and
  // each recursion step mirrors EwmaWindow's expression tree
  // operation-for-operation, making the oracle bit-exact rather than
  // merely close.
  private def A(span: Int) = s"(CAST(2 AS DOUBLE) / CAST(${span + 1} AS DOUBLE))"
  private def B(span: Int) = s"(CAST(1 AS DOUBLE) - ${A(span)})"

  /** adjust=false step: y' = (B*y + A*x) / (B + A). */
  private def ef(span: Int, y: String, x: String) =
    s"((${B(span)} * $y + ${A(span)} * $x) / (${B(span)} + ${A(span)}))"

  /** adjust=true numerator/denominator steps. */
  private def etN(span: Int, num: String, x: String) = s"(${B(span)} * $num + $x)"
  private def etD(span: Int, den: String) = s"(${B(span)} * $den + CAST(1 AS DOUBLE))"

  val oracleSql: Map[String, String] = Map(
    "sma" -> q(s"""SELECT symbol, "timestamp", round(${gS("avg", "close", 20)}, 6) AS close_sma_20 FROM bars $Tail"""),

    "awesome_oscillator" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gS("avg", "(high + low) / 2", 5)} - ${gS("avg", "(high + low) / 2", 34)}, 6) AS ao_5_34
         |FROM bars $Tail""".stripMargin),

    "bollinger_bands" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gS("avg", "close", 20)} + 2 * ${gS("stddev_samp", "close", 20)}, 6) AS close_upper_band_20_2,
         |round(${gS("avg", "close", 20)} - 2 * ${gS("stddev_samp", "close", 20)}, 6) AS close_lower_band_20_2
         |FROM bars $Tail""".stripMargin),

    "wma" -> q(
      s"""SELECT symbol, "timestamp",
         |round(CASE WHEN count(close) OVER (PARTITION BY symbol ORDER BY "timestamp" ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) = 10 THEN
         |(${(0 until 10).map(i => s"lag(close, $i) OVER (PARTITION BY symbol ORDER BY \"timestamp\") * ${10 - i}").mkString(" + ")}) / 55.0
         |END, 6) AS close_wma_10
         |FROM bars $Tail""".stripMargin),

    "roc" -> q(
      s"""SELECT symbol, "timestamp",
         |round((close - lag(close, 10) OVER w) / lag(close, 10) OVER w * 100, 6) AS close_roc_10
         |FROM b1 WINDOW w AS (ORDER BY "timestamp") $Tail""".stripMargin,
      Bars1Cte),

    "atr" -> q(
      s"""SELECT symbol, "timestamp", round(${gG("avg", "tr", 14)}, 6) AS atr
         |FROM (SELECT symbol, "timestamp",
         |        greatest(high - low,
         |                 abs(high - lag(close, 1) OVER (ORDER BY "timestamp")),
         |                 abs(low - lag(close, 1) OVER (ORDER BY "timestamp"))) AS tr
         |      FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "atr_multisym" -> q(
      s"""SELECT symbol, "timestamp", round(${gGm("avg", "tr", 14)}, 6) AS atr
         |FROM (SELECT symbol, "timestamp",
         |        greatest(high - low,
         |                 abs(high - lag(close, 1) OVER (ORDER BY "timestamp", symbol)),
         |                 abs(low - lag(close, 1) OVER (ORDER BY "timestamp", symbol))) AS tr
         |      FROM b2) $Tail""".stripMargin,
      Bars2Cte),

    "stochastic_oscillator" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gG("min", "close - low", 14)} / (${gG("max", "high", 14)} - ${gG("min", "low", 14)}) * 100, 6) AS stochastic_oscillator_14
         |FROM b1 $Tail""".stripMargin,
      Bars1Cte),

    "williams_ri" -> q(
      s"""SELECT symbol, "timestamp",
         |round((${gG("max", "high", 14)} - close) / (${gG("max", "high", 14)} - ${gG("min", "low", 14)}) * -100, 6) AS williams_r_14
         |FROM b1 $Tail""".stripMargin,
      Bars1Cte),

    "donchian_channel" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gG("max", "high", 20)}, 6) AS donchian_upper_20,
         |round(${gG("min", "low", 20)}, 6) AS donchian_lower_20,
         |round((${gG("max", "high", 20)} + ${gG("min", "low", 20)}) / 2, 6) AS donchian_mid_20
         |FROM b1 $Tail""".stripMargin,
      Bars1Cte),

    "dpo" -> q(
      s"""SELECT symbol, "timestamp",
         |round(close - lag(ma, 11) OVER (ORDER BY "timestamp"), 6) AS close_dpo_20
         |FROM (SELECT symbol, "timestamp", close, ${gG("avg", "close", 20)} AS ma FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "cci" -> q(
      s"""SELECT symbol, "timestamp",
         |round((tp - sma_tp) / (0.015 * ${gG("avg", "abs(tp - sma_tp)", 14)}), 6) AS cci
         |FROM (SELECT symbol, "timestamp", tp, ${gG("avg", "tp", 14)} AS sma_tp
         |      FROM (SELECT symbol, "timestamp", (high + low + close) / 3 AS tp FROM b1)) $Tail""".stripMargin,
      Bars1Cte),

    "rsi" -> q(
      s"""SELECT symbol, "timestamp",
         |round(100 - (100 / (1 + ${gG("avg", "gain", 14)} / ${gG("avg", "loss", 14)})), 6) AS close_rsi_14
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN close - lag(close, 1) OVER (ORDER BY "timestamp") > 0 THEN close - lag(close, 1) OVER (ORDER BY "timestamp") WHEN close - lag(close, 1) OVER (ORDER BY "timestamp") <= 0 THEN 0 END AS gain,
         |        CASE WHEN close - lag(close, 1) OVER (ORDER BY "timestamp") < 0 THEN abs(close - lag(close, 1) OVER (ORDER BY "timestamp")) WHEN close - lag(close, 1) OVER (ORDER BY "timestamp") >= 0 THEN 0 END AS loss
         |      FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "vortex" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gG("sum", "vmp", 14)} / ${gG("sum", "tr", 14)}, 6) AS vi_plus,
         |round(${gG("sum", "vmn", 14)} / ${gG("sum", "tr", 14)}, 6) AS vi_minus
         |FROM (SELECT symbol, "timestamp",
         |        greatest(high - low,
         |                 abs(high - lag(close, 1) OVER (ORDER BY "timestamp")),
         |                 abs(low - lag(close, 1) OVER (ORDER BY "timestamp"))) AS tr,
         |        abs(high - lag(low, 1) OVER (ORDER BY "timestamp")) AS vmp,
         |        abs(low - lag(high, 1) OVER (ORDER BY "timestamp")) AS vmn
         |      FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "chaikin_money_flow" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gG("sum", "(close - low - (high - close)) / (high - low) * volume", 14)} / ${gG("sum", "volume", 14)}, 6) AS cmf_14
         |FROM b1 $Tail""".stripMargin,
      Bars1Cte),

    "ichimoku" -> q(
      s"""SELECT symbol, "timestamp",
         |round(tenkan_sen, 6) AS tenkan_sen,
         |round(kijun_sen, 6) AS kijun_sen,
         |round(lag((tenkan_sen + kijun_sen) / 2, 26) OVER (ORDER BY "timestamp"), 6) AS senkou_span_a,
         |round(lag(sb_raw, 26) OVER (ORDER BY "timestamp"), 6) AS senkou_span_b,
         |round(chikou_span, 6) AS chikou_span
         |FROM (SELECT symbol, "timestamp",
         |        (${gG("max", "high", 9)} + ${gG("min", "low", 9)}) / 2 AS tenkan_sen,
         |        (${gG("max", "high", 26)} + ${gG("min", "low", 26)}) / 2 AS kijun_sen,
         |        (${gG("max", "high", 52)} + ${gG("min", "low", 52)}) / 2 AS sb_raw,
         |        lead(close, 26) OVER (ORDER BY "timestamp") AS chikou_span
         |      FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "adx" -> q(
      s"""SELECT symbol, "timestamp", round(${gG("avg", "dx", 14)}, 6) AS adx
         |FROM (
         |  SELECT symbol, "timestamp",
         |         abs(pdi - ndi) / (pdi + ndi) * 100 AS dx
         |  FROM (
         |    SELECT symbol, "timestamp",
         |           ${gG("avg", "pdm", 14)} / ${gG("avg", "tr", 14)} * 100 AS pdi,
         |           ${gG("avg", "ndm", 14)} / ${gG("avg", "tr", 14)} * 100 AS ndi
         |    FROM (
         |      SELECT symbol, "timestamp",
         |             greatest(high - close,
         |                      abs(high - lag(close, 1) OVER (ORDER BY "timestamp")),
         |                      abs(low - lag(close, 1) OVER (ORDER BY "timestamp"))) AS tr,
         |             CASE WHEN high - lag(high, 1) OVER (ORDER BY "timestamp") > 0 THEN high - lag(high, 1) OVER (ORDER BY "timestamp") WHEN high - lag(high, 1) OVER (ORDER BY "timestamp") <= 0 THEN 0 END AS pdm,
         |             CASE WHEN lag(low, 1) OVER (ORDER BY "timestamp") - low > 0 THEN lag(low, 1) OVER (ORDER BY "timestamp") - low WHEN lag(low, 1) OVER (ORDER BY "timestamp") - low <= 0 THEN 0 END AS ndm
         |      FROM b1))) $Tail""".stripMargin,
      Bars1Cte),

    "ultimate_oscillator" -> q(
      s"""SELECT symbol, "timestamp",
         |round((coalesce(${gG("avg", "bp", 7)} / ${gG("avg", "tr", 7)} * 4, 0)
         |     + coalesce(${gG("avg", "bp", 14)} / ${gG("avg", "tr", 14)} * 2, 0)
         |     + coalesce(${gG("avg", "bp", 28)} / ${gG("avg", "tr", 28)} * 2, 0)) * 100 / 8, 6) AS uo_7_14_28_4_2_2
         |FROM (SELECT symbol, "timestamp",
         |        close - least(low, lag(close, 1) OVER (ORDER BY "timestamp")) AS bp,
         |        greatest(high, lag(close, 1) OVER (ORDER BY "timestamp"))
         |          - greatest(low, lag(close, 1) OVER (ORDER BY "timestamp")) AS tr
         |      FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "unlcer_index" -> q(
      s"""SELECT symbol, "timestamp",
         |round(sqrt(${gG("avg", "dd", 14)}), 6) AS close_ulcer_index_14
         |FROM (SELECT symbol, "timestamp",
         |        pow(close / ${gG("max", "close", 14)} - 1, 2) AS dd
         |      FROM b1) $Tail""".stripMargin,
      Bars1Cte),

    "aroon" -> q(
      s"""SELECT symbol, "timestamp",
         |round(CASE WHEN cnt = 14 THEN 100.0 * (14 - (rn - mx + 1)) / 14 END, 6) AS aroon_up_14,
         |round(CASE WHEN cnt = 14 THEN 100.0 * (14 - (rn - mn + 1)) / 14 END, 6) AS aroon_down_14
         |FROM (SELECT symbol, "timestamp", rn,
         |        count(rn) OVER wf AS cnt,
         |        (max({'h': high, 'r': rn}) OVER wf).r AS mx,
         |        (max({'h': -low, 'r': rn}) OVER wf).r AS mn
         |      FROM (SELECT symbol, "timestamp", high, low,
         |              row_number() OVER (ORDER BY "timestamp") AS rn FROM b1)
         |      WINDOW wf AS (ORDER BY "timestamp" ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) $Tail""".stripMargin,
      Bars1Cte),

    "kst" -> q(
      s"""SELECT symbol, "timestamp",
         |round(${gG("avg", "roc0", 10)} * 1 + ${gG("avg", "roc1", 10)} * 2 + ${gG("avg", "roc2", 10)} * 3 + ${gG("avg", "roc3", 15)} * 4, 6) AS close_kst
         |FROM (SELECT symbol, "timestamp",
         |        (close - lag(close, 10) OVER w) / lag(close, 10) OVER w * 100 AS roc0,
         |        (close - lag(close, 15) OVER w) / lag(close, 15) OVER w * 100 AS roc1,
         |        (close - lag(close, 20) OVER w) / lag(close, 20) OVER w * 100 AS roc2,
         |        (close - lag(close, 30) OVER w) / lag(close, 30) OVER w * 100 AS roc3
         |      FROM b1 WINDOW w AS (ORDER BY "timestamp")) $Tail""".stripMargin,
      Bars1Cte),

    "mfi" -> q(
      s"""SELECT symbol, "timestamp",
         |round(100 - (100 / (1 + ${gG("sum", "pmf", 14)} / ${gG("sum", "nmf", 14)})), 6) AS mfi
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN tp > lag(tp, 1) OVER (ORDER BY "timestamp") THEN tp * volume WHEN tp <= lag(tp, 1) OVER (ORDER BY "timestamp") THEN 0 END AS pmf,
         |        CASE WHEN tp <= lag(tp, 1) OVER (ORDER BY "timestamp") THEN tp * volume WHEN tp > lag(tp, 1) OVER (ORDER BY "timestamp") THEN 0 END AS nmf
         |      FROM (SELECT symbol, "timestamp", volume, (high + low + close) / 3 AS tp FROM b1)) $Tail""".stripMargin,
      Bars1Cte),

    "vwap" -> q(
      s"""SELECT symbol, "timestamp", round(stpv / sv, 6) AS vwap FROM r $Tail""",
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (high + low + close) / 3 * volume AS tpv, volume AS v,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT rn, symbol, "timestamp", tpv AS stpv, v AS sv FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.symbol, b."timestamp", r.stpv + b.tpv, r.sv + b.v
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    // Same oracle as "vwap": the distributed plan must agree with the
    // sequential recursion after round(6).
    "vwap_distributed" -> q(
      s"""SELECT symbol, "timestamp", round(stpv / sv, 6) AS vwap FROM r $Tail""",
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (high + low + close) / 3 * volume AS tpv, volume AS v,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT rn, symbol, "timestamp", tpv AS stpv, v AS sv FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.symbol, b."timestamp", r.stpv + b.tpv, r.sv + b.v
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "ema_distributed" -> q(
      s"""SELECT symbol, "timestamp", round(y, 6) AS close_ema_9 FROM r $Tail""",
      Bars1CteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT symbol, rn, "timestamp", close AS y FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp", ${ef(9, "r.y", "b.close")}
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "vpt" -> q(
      s"""SELECT b.symbol, b."timestamp", round(r.s, 6) AS vpt
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (close - lag(close, 1) OVER w) / lag(close, 1) OVER w * volume AS vc,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT rn, vc AS s FROM b WHERE rn = 2
        |  UNION ALL
        |  SELECT b.rn, r.s + b.vc FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "obv" -> q(
      s"""SELECT symbol, "timestamp",
         |CAST(sum(oc) OVER (ORDER BY "timestamp" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
         |FROM (SELECT symbol, "timestamp",
         |        (CASE WHEN close - lag(close, 1) OVER w > 0 THEN 1
         |              WHEN close - lag(close, 1) OVER w < 0 THEN -1 WHEN close - lag(close, 1) OVER w = 0 THEN 0 END) * volume AS oc
         |      FROM b1 WINDOW w AS (ORDER BY "timestamp")) $Tail""".stripMargin,
      Bars1Cte),

    // Same oracle as "vpt": the lag+prefix distributed plan must agree
    // with the sequential recursion after round(6).
    "vpt_distributed" -> q(
      s"""SELECT b.symbol, b."timestamp", round(r.s, 6) AS vpt
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (close - lag(close, 1) OVER w) / lag(close, 1) OVER w * volume AS vc,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT rn, vc AS s FROM b WHERE rn = 2
        |  UNION ALL
        |  SELECT b.rn, r.s + b.vc FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    // Same oracle as "negative_volume_index".
    "nvi_distributed" -> q(
      s"""SELECT b.symbol, b."timestamp",
         |round(CASE WHEN b.volume < b.pv THEN r.s WHEN b.volume >= b.pv THEN 0 END, 6) AS nvi
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp", volume,
        |        lag(volume, 1) OVER w AS pv,
        |        close / lag(close, 1) OVER w - 1 AS ret,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT rn, CAST(0.0 AS DOUBLE) AS s FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, r.s + b.ret FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "adi" -> q(
      s"""SELECT symbol, "timestamp", round(s, 6) AS adi FROM r $Tail""",
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (close - low - (high - close)) / (high - low) * volume AS mfv,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT rn, symbol, "timestamp", mfv AS s FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.symbol, b."timestamp", r.s + b.mfv
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    // Same oracle as "obv": lagDistributed + cumSumDistributed must
    // reproduce the sequential window sum exactly (integer values).
    "obv_distributed" -> q(
      s"""SELECT symbol, "timestamp",
         |CAST(sum(oc) OVER (ORDER BY "timestamp" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
         |FROM (SELECT symbol, "timestamp",
         |        (CASE WHEN close - lag(close, 1) OVER w > 0 THEN 1
         |              WHEN close - lag(close, 1) OVER w < 0 THEN -1 WHEN close - lag(close, 1) OVER w = 0 THEN 0 END) * volume AS oc
         |      FROM b1 WINDOW w AS (ORDER BY "timestamp")) $Tail""".stripMargin,
      Bars1Cte),

    // Same oracle as "adi": the distributed prefix plan must agree
    // with the sequential recursion after round(6).
    "adi_distributed" -> q(
      s"""SELECT symbol, "timestamp", round(s, 6) AS adi FROM r $Tail""",
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (close - low - (high - close)) / (high - low) * volume AS mfv,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT rn, symbol, "timestamp", mfv AS s FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.symbol, b."timestamp", r.s + b.mfv
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "negative_volume_index" -> q(
      s"""SELECT b.symbol, b."timestamp",
         |round(CASE WHEN b.volume < b.pv THEN r.s WHEN b.volume >= b.pv THEN 0 END, 6) AS nvi
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp", volume,
        |        lag(volume, 1) OVER w AS pv,
        |        close / lag(close, 1) OVER w - 1 AS ret,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT rn, CAST(0.0 AS DOUBLE) AS s FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, r.s + b.ret FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "force_index" -> q(
      s"""SELECT symbol, "timestamp",
         |round((close - lag(close, 1) OVER (ORDER BY "timestamp")) * volume, 6) AS force_index
         |FROM b1 $Tail""".stripMargin,
      Bars1Cte),

    "ease_of_movement" -> q(
      s"""SELECT symbol, "timestamp",
         |round((high + low - lag(high, 1) OVER (ORDER BY "timestamp") - lag(low, 1) OVER (ORDER BY "timestamp")) / volume, 6) AS ease_of_movement
         |FROM b1 $Tail""".stripMargin,
      Bars1Cte),

    "daily_return" -> q(
      s"""SELECT symbol, "timestamp",
         |round((close - lag(close, 1) OVER w) / lag(close, 1) OVER w * 100, 6) AS close_daily_return
         |FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY "timestamp") $Tail""".stripMargin),

    "daily_log_return" -> q(
      s"""SELECT symbol, "timestamp",
         |round(ln(close / lag(close, 1) OVER (PARTITION BY symbol ORDER BY "timestamp")), 6) AS close_daily_log_return
         |FROM bars $Tail""".stripMargin),

    "cumulative_returns" -> q(
      s"""SELECT b.symbol, b."timestamp", r.s AS close_cumulative_return
         |FROM b LEFT JOIN r ON b.symbol = r.symbol AND b.rn = r.rn
         |ORDER BY b.symbol, b."timestamp"""".stripMargin,
      BarsCteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        (close - lag(close, 1) OVER w) / lag(close, 1) OVER w * 100 AS dr,
        |        row_number() OVER w AS rn
        |      FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY "timestamp")),
        |r AS (
        |  SELECT symbol, rn, dr + 1 AS s FROM b WHERE rn = 2
        |  UNION ALL
        |  SELECT b.symbol, b.rn, r.s * (b.dr + 1)
        |  FROM b JOIN r ON b.symbol = r.symbol AND b.rn = r.rn + 1)""".stripMargin),

    "fill_null_forward" -> q(
      s"""SELECT symbol, "timestamp",
         |round(last_value(c IGNORE NULLS) OVER (PARTITION BY symbol ORDER BY "timestamp" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_value" -> q(
      s"""SELECT symbol, "timestamp",
         |round(coalesce(c, CAST(-1 AS DOUBLE)), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_zero" -> q(
      s"""SELECT symbol, "timestamp",
         |round(coalesce(c, CAST(0 AS DOUBLE)), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_one" -> q(
      s"""SELECT symbol, "timestamp",
         |round(coalesce(c, CAST(1 AS DOUBLE)), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_backward" -> q(
      s"""SELECT symbol, "timestamp",
         |round(first_value(c IGNORE NULLS) OVER (PARTITION BY symbol ORDER BY "timestamp" ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_mean" -> q(
      s"""SELECT symbol, "timestamp",
         |round(coalesce(c, avg(c) OVER (PARTITION BY symbol)), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_min" -> q(
      s"""SELECT symbol, "timestamp",
         |round(coalesce(c, min(c) OVER (PARTITION BY symbol)), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    "fill_null_max" -> q(
      s"""SELECT symbol, "timestamp",
         |round(coalesce(c, max(c) OVER (PARTITION BY symbol)), 6) AS close_filled
         |FROM (SELECT symbol, "timestamp",
         |        CASE WHEN volume % 7 = 0 THEN NULL ELSE close END AS c
         |      FROM bars) $Tail""".stripMargin),

    // ------------------------------------------------------- EWM family

    "ema" -> q(
      s"""SELECT symbol, "timestamp", round(y, 6) AS close_ema_9 FROM r $Tail""",
      BarsCteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn FROM bars),
        |r AS (
        |  SELECT symbol, rn, "timestamp", close AS y FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp", ${ef(9, "r.y", "b.close")}
        |  FROM b JOIN r ON b.symbol = r.symbol AND b.rn = r.rn + 1)""".stripMargin),

    // Same recursion as `ema` (alpha 0.2 == span 9); only the alias
    // differs — the Spark side goes through the registered SQL
    // function instead of the fluent API.
    "sql_ewma" -> q(
      s"""SELECT symbol, "timestamp", round(y, 6) AS ema_sql FROM r $Tail""",
      BarsCteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn FROM bars),
        |r AS (
        |  SELECT symbol, rn, "timestamp", close AS y FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp", ${ef(9, "r.y", "b.close")}
        |  FROM b JOIN r ON b.symbol = r.symbol AND b.rn = r.rn + 1)""".stripMargin),

    "macd" -> q(
      s"""SELECT symbol, "timestamp", round(sig, 6) AS close_signal_line FROM r2 $Tail""",
      BarsCteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn FROM bars),
        |r1 AS (
        |  SELECT symbol, rn, "timestamp", close AS e12, close AS e26 FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp",
        |         ${ef(12, "r1.e12", "b.close")}, ${ef(26, "r1.e26", "b.close")}
        |  FROM b JOIN r1 ON b.symbol = r1.symbol AND b.rn = r1.rn + 1),
        |m AS MATERIALIZED (SELECT symbol, rn, "timestamp", e12 - e26 AS macd FROM r1),
        |r2 AS (
        |  SELECT symbol, rn, "timestamp", macd AS sig FROM m WHERE rn = 1
        |  UNION ALL
        |  SELECT m.symbol, m.rn, m."timestamp", ${ef(9, "r2.sig", "m.macd")}
        |  FROM m JOIN r2 ON m.symbol = r2.symbol AND m.rn = r2.rn + 1)""".stripMargin),

    "ppo" -> q(
      s"""SELECT symbol, "timestamp",
         |round(line, 6) AS ppo_12_26,
         |round(sig, 6) AS ppo_signal_12_26,
         |round(line - sig, 6) AS ppo_histogram_12_26
         |FROM r2 $Tail""".stripMargin,
      BarsCteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn FROM bars),
        |r1 AS (
        |  SELECT symbol, rn, "timestamp", close AS e12, close AS e26 FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp",
        |         ${ef(12, "r1.e12", "b.close")}, ${ef(26, "r1.e26", "b.close")}
        |  FROM b JOIN r1 ON b.symbol = r1.symbol AND b.rn = r1.rn + 1),
        |m AS MATERIALIZED (SELECT symbol, rn, "timestamp", (e12 - e26) / e26 * 100 AS line FROM r1),
        |r2 AS (
        |  SELECT symbol, rn, "timestamp", line, line AS sig FROM m WHERE rn = 1
        |  UNION ALL
        |  SELECT m.symbol, m.rn, m."timestamp", m.line, ${ef(9, "r2.sig", "m.line")}
        |  FROM m JOIN r2 ON m.symbol = r2.symbol AND m.rn = r2.rn + 1)""".stripMargin),

    "pvo" -> q(
      s"""SELECT symbol, "timestamp",
         |round(line, 6) AS pvo_12_26,
         |round(sig, 6) AS pvo_signal_12_26,
         |round(line - sig, 6) AS pvo_histogram_12_26
         |FROM r2 $Tail""".stripMargin,
      BarsCteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", CAST(volume AS DOUBLE) AS v,
        |        row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn FROM bars),
        |r1 AS (
        |  SELECT symbol, rn, "timestamp", v AS e12, v AS e26 FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp",
        |         ${ef(12, "r1.e12", "b.v")}, ${ef(26, "r1.e26", "b.v")}
        |  FROM b JOIN r1 ON b.symbol = r1.symbol AND b.rn = r1.rn + 1),
        |m AS MATERIALIZED (SELECT symbol, rn, "timestamp", (e12 - e26) / e26 * 100 AS line FROM r1),
        |r2 AS (
        |  SELECT symbol, rn, "timestamp", line, line AS sig FROM m WHERE rn = 1
        |  UNION ALL
        |  SELECT m.symbol, m.rn, m."timestamp", m.line, ${ef(9, "r2.sig", "m.line")}
        |  FROM m JOIN r2 ON m.symbol = r2.symbol AND m.rn = r2.rn + 1)""".stripMargin),

    "trix" -> q(
      s"""SELECT symbol, "timestamp",
         |round((e3 - lag(e3, 1) OVER (ORDER BY "timestamp")) / lag(e3, 1) OVER (ORDER BY "timestamp"), 6) AS trix_15
         |FROM r $Tail""".stripMargin,
      Bars1CteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT symbol, rn, "timestamp", close AS e1, close AS e2, close AS e3 FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT symbol, rn, "timestamp", ne1, ne2, ${ef(15, "e3", "ne2")} FROM (
        |    SELECT t1.*, ${ef(15, "t1.e2", "t1.ne1")} AS ne2 FROM (
        |      SELECT b.symbol, b.rn, b."timestamp", r.e2, r.e3, ${ef(15, "r.e1", "b.close")} AS ne1
        |      FROM b JOIN r ON b.rn = r.rn + 1) t1) t2)""".stripMargin),

    "mass_index" -> q(
      s"""SELECT symbol, "timestamp",
         |round(CASE WHEN count(ratio) OVER wf = 26 THEN sum(ratio) OVER wf END, 6) AS mass_index_9_26
         |FROM (SELECT symbol, "timestamp", (n1 / d1) / (n2 / d2) AS ratio FROM r)
         |WINDOW wf AS (ORDER BY "timestamp" ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) $Tail""".stripMargin,
      Bars1CteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", high - low AS hl,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT symbol, rn, "timestamp",
        |         hl AS n1, CAST(1 AS DOUBLE) AS d1, hl AS n2, CAST(1 AS DOUBLE) AS d2
        |  FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT symbol, rn, "timestamp", nn1, nd1,
        |         ${etN(9, "n2", "(nn1 / nd1)")}, ${etD(9, "d2")}
        |  FROM (
        |    SELECT b.symbol, b.rn, b."timestamp", r.n2, r.d2,
        |           ${etN(9, "r.n1", "b.hl")} AS nn1, ${etD(9, "r.d1")} AS nd1
        |    FROM b JOIN r ON b.rn = r.rn + 1) t)""".stripMargin),

    "keltner_channel" -> q(
      s"""SELECT symbol, "timestamp",
         |round(n / d + (CASE WHEN count(tr) OVER wf = 14 THEN avg(tr) OVER wf END) * 2, 6) AS kc_upper_band_20_14_2,
         |round(n / d - (CASE WHEN count(tr) OVER wf = 14 THEN avg(tr) OVER wf END) * 2, 6) AS kc_lower_band_20_14_2
         |FROM r WINDOW wf AS (ORDER BY "timestamp" ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) $Tail""".stripMargin,
      Bars1CteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        greatest(high, lag(close, 1) OVER w) - least(low, lag(close, 1) OVER w) AS tr,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT symbol, rn, "timestamp", tr, close AS n, CAST(1 AS DOUBLE) AS d FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp", b.tr,
        |         ${etN(20, "r.n", "b.close")}, ${etD(20, "r.d")}
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "true_strength_index" -> q(
      s"""SELECT b.symbol, b."timestamp",
         |round(100 * (r.n2 / r.d2) / (r.n2a / r.d2a), 6) AS close_tsi_13_25
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp",
        |        close - lag(close, 1) OVER w AS delta,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT symbol, rn, "timestamp",
        |         delta AS n1, CAST(1 AS DOUBLE) AS d1,
        |         abs(delta) AS n1a, CAST(1 AS DOUBLE) AS d1a,
        |         delta AS n2, CAST(1 AS DOUBLE) AS d2,
        |         abs(delta) AS n2a, CAST(1 AS DOUBLE) AS d2a
        |  FROM b WHERE rn = 2
        |  UNION ALL
        |  SELECT symbol, rn, "timestamp", nn1, nd1, nn1a, nd1a,
        |         ${etN(25, "n2", "(nn1 / nd1)")}, ${etD(25, "d2")},
        |         ${etN(25, "n2a", "(nn1a / nd1a)")}, ${etD(25, "d2a")}
        |  FROM (
        |    SELECT b.symbol, b.rn, b."timestamp", r.n2, r.d2, r.n2a, r.d2a,
        |           ${etN(13, "r.n1", "b.delta")} AS nn1, ${etD(13, "r.d1")} AS nd1,
        |           ${etN(13, "r.n1a", "abs(b.delta)")} AS nn1a, ${etD(13, "r.d1a")} AS nd1a
        |    FROM b JOIN r ON b.rn = r.rn + 1) t)""".stripMargin),

    "stc" -> q(
      s"""SELECT symbol, "timestamp",
         |round((ml - (CASE WHEN count(ml) OVER wf = 10 THEN min(ml) OVER wf END)) /
         |      ((CASE WHEN count(ml) OVER wf = 10 THEN max(ml) OVER wf END) -
         |       (CASE WHEN count(ml) OVER wf = 10 THEN min(ml) OVER wf END)) * 100, 6) AS close_stc_12_26_10
         |FROM (SELECT symbol, "timestamp", n12 / d12 - n26 / d26 AS ml FROM r)
         |WINDOW wf AS (ORDER BY "timestamp" ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) $Tail""".stripMargin,
      Bars1CteRec + s""",
        |b AS MATERIALIZED (SELECT symbol, "timestamp", close,
        |        row_number() OVER (ORDER BY "timestamp") AS rn FROM b1),
        |r AS (
        |  SELECT symbol, rn, "timestamp",
        |         close AS n12, CAST(1 AS DOUBLE) AS d12,
        |         close AS n26, CAST(1 AS DOUBLE) AS d26
        |  FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.symbol, b.rn, b."timestamp",
        |         ${etN(12, "r.n12", "b.close")}, ${etD(12, "r.d12")},
        |         ${etN(26, "r.n26", "b.close")}, ${etD(26, "r.d26")}
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "kama" -> q(
      s"""SELECT b."symbol", b."timestamp", round(r.y, 6) AS kama_close
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + """,
        |b0 AS (SELECT symbol, "timestamp", close,
        |         abs(close - lag(close, 1) OVER w) AS ad,
        |         abs(close - lag(close, 10) OVER w) AS nm,
        |         row_number() OVER w AS rn
        |       FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |b AS MATERIALIZED (
        |  SELECT symbol, "timestamp", close, rn,
        |    (CASE WHEN scb IS NULL THEN NULL ELSE scb * scb END) AS sc
        |  FROM (SELECT symbol, "timestamp", close, rn,
        |          (nm / (CASE WHEN count(ad) OVER wf = 10 THEN sum(ad) OVER wf END))
        |            * (CAST(2 AS DOUBLE) / CAST(3 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(31 AS DOUBLE))
        |            + CAST(2 AS DOUBLE) / CAST(31 AS DOUBLE) AS scb
        |        FROM b0
        |        WINDOW wf AS (ORDER BY "timestamp" ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))),
        |r AS (
        |  SELECT rn, close AS y FROM b WHERE rn = 11
        |  UNION ALL
        |  SELECT b.rn, r.y + b.sc * (b.close - r.y)
        |  FROM b JOIN r ON b.rn = r.rn + 1)""".stripMargin),

    "psar" -> q(
      s"""SELECT b."symbol", b."timestamp", round(r.sar, 6) AS psar
         |FROM b LEFT JOIN r ON b.rn = r.rn ORDER BY b.symbol, b."timestamp"""".stripMargin,
      Bars1CteRec + """,
        |b AS MATERIALIZED (SELECT symbol, "timestamp", high AS h, low AS l,
        |        lag(high, 1) OVER w AS ph, lag(low, 1) OVER w AS pl,
        |        row_number() OVER w AS rn
        |      FROM b1 WINDOW w AS (ORDER BY "timestamp")),
        |r AS (
        |  SELECT rn,
        |         CASE WHEN h >= ph THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS trend,
        |         CASE WHEN h >= ph THEN pl ELSE ph END AS sar,
        |         CASE WHEN h >= ph THEN h ELSE l END AS ep,
        |         CAST(0.02 AS DOUBLE) AS af
        |  FROM b WHERE rn = 2
        |  UNION ALL
        |  SELECT rn,
        |    CASE WHEN up THEN (CASE WHEN revup THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)
        |         ELSE (CASE WHEN revdn THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) END,
        |    CASE WHEN up THEN (CASE WHEN revup THEN oep ELSE cup END)
        |         ELSE (CASE WHEN revdn THEN oep ELSE cdn END) END,
        |    CASE WHEN up THEN (CASE WHEN revup THEN l ELSE greatest(oep, h) END)
        |         ELSE (CASE WHEN revdn THEN h ELSE least(oep, l) END) END,
        |    CASE WHEN up THEN (CASE WHEN revup THEN CAST(0.02 AS DOUBLE)
        |                            WHEN h > oep THEN least(oaf + 0.02, 0.02) ELSE oaf END)
        |         ELSE (CASE WHEN revdn THEN CAST(0.02 AS DOUBLE)
        |                    WHEN l < oep THEN least(oaf + 0.02, 0.02) ELSE oaf END) END
        |  FROM (
        |    SELECT t1.*, l < cup AS revup, h > cdn AS revdn FROM (
        |      SELECT b.rn, b.h, b.l, b.ph, b.pl,
        |             r.trend = CAST(1 AS DOUBLE) AS up,
        |             r.ep AS oep, r.af AS oaf,
        |             least(r.sar + r.af * (r.ep - r.sar), b.pl) AS cup,
        |             greatest(r.sar + r.af * (r.ep - r.sar), b.ph) AS cdn
        |      FROM b JOIN r ON b.rn = r.rn + 1) t1) t2)""".stripMargin),

    "stochastic_rsi" -> q(
      s"""SELECT symbol, "timestamp",
         |round((r - gmin) / (gmax - gmin), 6) AS close_stoch_rsi_14_14
         |FROM (SELECT symbol, "timestamp", r,
         |        CASE WHEN count(r) OVER wf = 14 THEN min(r) OVER wf END AS gmin,
         |        CASE WHEN count(r) OVER wf = 14 THEN max(r) OVER wf END AS gmax
         |      FROM (SELECT symbol, "timestamp",
         |              100 - (100 / (1 + ${gG("avg", "gain", 14)} / ${gG("avg", "loss", 14)})) AS r
         |            FROM (SELECT symbol, "timestamp",
         |                    CASE WHEN close - lag(close, 1) OVER wl > 0 THEN close - lag(close, 1) OVER wl WHEN close - lag(close, 1) OVER wl <= 0 THEN 0 END AS gain,
         |                    CASE WHEN close - lag(close, 1) OVER wl < 0 THEN abs(close - lag(close, 1) OVER wl) WHEN close - lag(close, 1) OVER wl >= 0 THEN 0 END AS loss
         |                  FROM b1 WINDOW wl AS (ORDER BY "timestamp")))
         |      WINDOW wf AS (ORDER BY "timestamp" ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) $Tail""".stripMargin,
      Bars1Cte)
  )
}
