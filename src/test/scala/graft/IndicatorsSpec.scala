package graft

import graft.indicators.Indicators

/** Operator-level golden and shape tests on the hand fixtures of
  * FIXTURES.md §3.
  */
class IndicatorsSpec extends SparkSpec {

  private val closes = Seq[java.lang.Double](10.0, 11.0, 12.0, 11.0, 10.0, 12.0, 14.0, 13.0)
  private def tiny = bars("x", closes)

  test("sma golden incl. NULL head") {
    val out = Indicators(tiny).sma(Seq("close"), 3).toDF
    assertSeq(doubles(out, "close_sma_3"),
      Seq(None, None, Some(11.0), Some(34.0 / 3), Some(11.0), Some(11.0), Some(12.0), Some(13.0)))
  }

  test("synthetic symbol is injected and dropped") {
    val noSym = tiny.drop("symbol")
    val out = Indicators(noSym).sma(Seq("close"), 2).toDF
    assert(!out.columns.contains("symbol"))
    assert(out.count() == 8)
  }

  test("force_index golden") {
    val out = Indicators(tiny).force_index().toDF
    // (close - prev_close) * volume, volume = 100*(i+1)
    assertSeq(doubles(out, "force_index"),
      Seq(None, Some(200.0), Some(300.0), Some(-400.0), Some(-500.0), Some(1200.0),
        Some(1400.0), Some(-800.0)))
  }

  test("obv golden") {
    val out = Indicators(tiny).obv().toDF
    // direction: null (Kleene head),+1,+1,-1,-1,+1,+1,-1 ; vol 100..800
    assertSeq(doubles(out.selectExpr("symbol", "timestamp", "CAST(obv AS DOUBLE) AS obv"), "obv"),
      Seq(None, Some(200.0), Some(500.0), Some(100.0), Some(-400.0), Some(200.0),
        Some(900.0), Some(100.0)))
  }

  test("donchian channel fixed staging") {
    val out = Indicators(tiny).donchian_channel(3).toDF
    // high = close+1, low = close-1; window 3
    assertSeq(doubles(out, "donchian_upper_3"),
      Seq(None, None, Some(13.0), Some(13.0), Some(13.0), Some(13.0), Some(15.0), Some(15.0)))
    assertSeq(doubles(out, "donchian_mid_3"),
      Seq(None, None, Some(11.0), Some(11.5), Some(11.0), Some(11.0), Some(12.0), Some(13.0)))
  }

  test("macd keeps ONLY the signal line (reference quirk)") {
    val out = Indicators(tiny).macd(Seq("close")).toDF
    assert(out.columns.contains("close_signal_line"))
    assert(!out.columns.exists(_.contains("_macd")))
    assert(!out.columns.exists(c => c.contains("ema_12") || c.contains("ema_26")))
  }

  test("bollinger replicates the upprsier name typo") {
    val out = Indicators(tiny).bollinger_bands(Seq("close"), 3, 2).toDF
    assert(out.columns.contains("close_upprsier_band_3_2"))
    assert(out.columns.contains("close_lower_band_3_2"))
  }

  test("rsi bounded and SMA-smoothed") {
    val out = Indicators(tiny).rsi(Seq("close"), 3).toDF
    val vals = doubles(out, "close_rsi_3").flatten
    assert(vals.nonEmpty)
    vals.foreach(v => assert(v >= 0.0 && v <= 100.0, s"rsi out of range: $v"))
    // rows 1..3 deltas: +1,+1,-1 -> gain mean 2/3, loss mean 1/3 -> rs=2 -> rsi=66.67
    assertSeq(Seq(doubles(out, "close_rsi_3")(3)), Seq(Some(100.0 - 100.0 / 3)))
    // Kleene head: gain/loss at row 0 are null (not 0), so the rolling
    // gate is not satisfied until row 3 — row 2 must still be null
    assert(doubles(out, "close_rsi_3")(2).isEmpty)
  }

  test("per-symbol vs global partitioning (sma vs atr)") {
    val two = bars("a", Seq(10.0, 11.0, 12.0)).union(bars("b", Seq(20.0, 22.0, 24.0)))
    val out = Indicators(two).sma(Seq("close"), 2).atr(2).toDF
    // sma must not leak across symbols
    val smaB = doubles(out.where("symbol = 'b'"), "close_sma_2")
    assert(smaB == Seq(None, Some(21.0), Some(23.0)))
    // atr is global: spans symbols in timestamp order (ties broken arbitrarily,
    // but count gate needs 2 rows -> row 2 of the interleaved frame is non-null)
    val atrAll = doubles(out, "atr")
    assert(atrAll.count(_.isDefined) >= 4)
  }

  test("cumulative_returns compounds percent+1 (reference quirk)") {
    val out = Indicators(bars("x", Seq(10.0, 11.0))).cumulative_returns(Seq("close")).toDF
    // daily_return pct = 10 -> cum_prod(1 + 10) = 11
    assertSeq(doubles(out, "close_cumulative_return"), Seq(None, Some(11.0)))
  }

  test("wma extension golden") {
    val out = Indicators(bars("x", Seq(1.0, 2.0, 3.0))).wma(Seq("close"), 2).toDF
    // weights newest=2: (1*1 + 2*2)/3, (2*1 + 3*2)/3
    assertSeq(doubles(out, "close_wma_2"), Seq(None, Some(5.0 / 3), Some(8.0 / 3)))
  }

  test("aroon extension golden") {
    val out = Indicators(tiny).aroon(3).toDF
    // closes 10,11,12,11,10,12,14,13; high=close+1
    // row 2 (win 10,11,12): max at current -> since=1 -> 100*(3-1)/3
    // row 4 (win 12,11,10): max 2 back -> since=3 -> 0
    val up = doubles(out, "aroon_up_3")
    assert(up(2) == Some(100.0 * 2 / 3))
    assert(up(4) == Some(0.0))
  }

  test("every runnable operator executes and appends its columns") {
    val base = bars("x", (1 to 80).map(i => java.lang.Double.valueOf(50 + 10 * math.sin(i / 5.0))))
    val out = Indicators(base)
      .sma(Seq("close"), 5)
      .awesome_oscillator()
      .ema(Seq("close"), 9)
      .rsi(Seq("close"))
      .bollinger_bands(Seq("close"))
      .macd(Seq("close"))
      .atr()
      .stochastic_oscillator()
      .ppo()
      .pvo()
      .roc(Seq("close"))
      .stochastic_rsi(Seq("close"))
      .daily_return(Seq("close"))
      .daily_log_return(Seq("close"))
      .cumulative_returns(Seq("close"))
      .adx()
      .cci()
      .vwap()
      .vpt()
      .obv()
      .ichimoku()
      .vortex()
      .trix()
      .mass_index()
      .williams_ri()
      .force_index()
      .negative_volume_index()
      .donchian_channel()
      .chaikin_money_flow()
      .unlcer_index(Seq("close"))
      .dpo(Seq("close"))
      .ease_of_movement()
      .true_strength_index(Seq("close"), 13, 25)
      .ultimate_oscillator()
      .keltner_channel()
      .wma(Seq("close"), 5)
      .aroon()
      .kst(Seq("close"))
      .adi()
      .mfi()
      .stc(Seq("close"))
      .kama()
      .psar()
      .fill_null(Seq("close"), method = Some("forward"))
      .toDF
    val expected = Seq(
      "close_sma_5", "ao_5_34", "close_ema_9", "close_rsi_14",
      "close_upprsier_band_20_2", "close_lower_band_20_2", "close_signal_line",
      "atr", "stochastic_oscillator_14", "ppo_12_26", "ppo_signal_12_26",
      "ppo_histogram_12_26", "pvo_12_26", "close_roc_10",
      "close_stoch_rsi_14_14", "close_daily_return", "close_daily_log_return",
      "close_cumulative_return", "adx", "CCI", "vwap", "vpt", "obv",
      "tenkan_sen", "kijun_sen", "senkou_span_a", "senkou_span_b", "chikou_span",
      "+VI", "-VI", "trix_15", "mass_index_9_26", "williams_%r_14",
      "force_index", "nvi", "donchian_upper_20", "donchian_mid_20", "cmf_14",
      "close_ulcer_index_14", "close_dpo_20", "ease_of_movement",
      "close_tsi_13_25", "UO_7_14_28_4_2_2", "KC_Upper_Band_20_14_2",
      "KC_Lower_Band_20_14_2", "close_wma_5", "aroon_up_14", "aroon_down_14",
      "close_kst", "ADI", "MFI", "close_stc_12_26_10", "KAMA_close", "psar")
    val cols = out.columns.toSet
    val missing = expected.filterNot(cols.contains)
    assert(missing.isEmpty, s"missing output columns: $missing")
    assert(!cols.exists(_.startsWith("_")), s"leaked temp columns: ${cols.filter(_.startsWith("_"))}")
    assert(out.count() == 80)
    // spot-check: long-window ops produce non-null tails
    Seq("close_sma_5", "atr", "UO_7_14_28_4_2_2", "close_tsi_13_25", "MFI").foreach { c =>
      assert(doubles(out, c).last.isDefined, s"$c all-null tail")
    }
  }

  test("multi-column operator calls append one output per input column") {
    val out = Indicators(tiny)
      .sma(Seq("close", "open"), 3)
      .rsi(Seq("close", "open"), 3)
      .bollinger_bands(Seq("close", "open"), 3, 2)
      .dpo(Seq("close", "open"), 4)
      .toDF
    val cols = out.columns.toSet
    Seq(
      "close_sma_3", "open_sma_3", "close_rsi_3", "open_rsi_3",
      "close_upprsier_band_3_2", "open_upprsier_band_3_2",
      "close_dpo_4", "open_dpo_4").foreach(c => assert(cols.contains(c), c))
    assert(!cols.exists(_.startsWith("_")))
    // open = close in the fixture, so paired outputs agree
    assert(doubles(out, "close_sma_3") == doubles(out, "open_sma_3"))
    assert(doubles(out, "close_rsi_3") == doubles(out, "open_rsi_3"))
  }

  test("show_graph renders the chained plan, optimized and analyzed") {
    val ind = Indicators(tiny).sma(Seq("close"), 3).ema(Seq("close"), 3)
    val opt = ind.showGraph()
    val raw = ind.showGraph(optimized = false)
    // both plans must mention the chained output columns; the
    // optimized plan collapses the chained projections the analyzed
    // plan still stacks
    assert(opt.contains("close_sma_3") && opt.contains("close_ema_3"))
    assert(raw.contains("close_sma_3") && raw.contains("close_ema_3"))
    assert(raw.linesIterator.count(_.contains("Project")) >=
      opt.linesIterator.count(_.contains("Project")))
    // reference parity (indicators.py:51-52): with a SYNTHETIC symbol
    // the rendered graph excludes it from the OUTPUT
    // (pl.exclude('symbol') — the injected column may still appear in
    // inner nodes, e.g. the window partition spec, exactly as polars'
    // graph still shows the with_columns node) while a caller-supplied
    // symbol stays in the output; rendering does NOT mutate the
    // wrapped frame (Q1 immutability: toDF still works after)
    val synth = Indicators(tiny.drop("symbol")).sma(Seq("close"), 3)
    val synthTop = synth.showGraph().linesIterator.next()
    assert(synthTop.startsWith("Project") && !synthTop.contains("symbol"))
    assert(opt.linesIterator.next().contains("symbol"))
    assert(synth.toDF.count() == 8)
  }

  test("validate_columns raises on missing") {
    intercept[IllegalArgumentException] {
      Indicators(tiny.drop("volume")).vwap()
    }
    intercept[IllegalArgumentException] {
      Indicators(tiny).sma(Seq("nope"), 3)
    }
  }

  test("fill_null XOR validation") {
    intercept[IllegalArgumentException] { Indicators(tiny).fill_null(Seq("close")) }
    intercept[IllegalArgumentException] {
      Indicators(tiny).fill_null(Seq("close"), Some(1.0), Some("forward"))
    }
  }

  test("fill_null strategies") {
    val withNulls = bars("x", Seq(null, 2.0, null, 4.0, null))
    def vals(m: String) =
      doubles(Indicators(withNulls).fill_null(Seq("close"), method = Some(m)).toDF, "close")
    assert(vals("forward") == Seq(None, Some(2.0), Some(2.0), Some(4.0), Some(4.0)))
    assert(vals("backward") == Seq(Some(2.0), Some(2.0), Some(4.0), Some(4.0), None))
    assert(vals("min") == Seq(Some(2.0), Some(2.0), Some(2.0), Some(4.0), Some(2.0)))
    assert(vals("max") == Seq(Some(4.0), Some(2.0), Some(4.0), Some(4.0), Some(4.0)))
    assert(vals("mean") == Seq(Some(3.0), Some(2.0), Some(3.0), Some(4.0), Some(3.0)))
    assert(vals("zero") == Seq(Some(0.0), Some(2.0), Some(0.0), Some(4.0), Some(0.0)))
    val v = doubles(Indicators(withNulls).fill_null(Seq("close"), value = Some(9.0)).toDF, "close")
    assert(v == Seq(Some(9.0), Some(2.0), Some(9.0), Some(4.0), Some(9.0)))
  }
}
