package graft.tools

import graft.indicators.Indicators
import graft.sources.Bars

/** Manual end-to-end smoke: real testdata parquet -> bars -> a chain of
  * indicators through the public API -> show. Run with
  * `sbt "runMain graft.tools.Demo [sfDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.sources.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bars = Bars.fromEvents(spark, sfDir)
    val out = Indicators(bars)
      .sma(Seq("close"), 5)
      .ema(Seq("close"), 9)
      .rsi(Seq("close"), 14)
      .bollinger_bands(Seq("close"))
      .macd(Seq("close"))
      .vwap()
      .obv()
      .ultimate_oscillator()
      .keltner_channel()
      .toDF
    out.select(
      "symbol", "timestamp", "close", "close_sma_5", "close_ema_9",
      "close_rsi_14", "close_signal_line", "vwap", "obv", "UO_7_14_28_4_2_2",
      "KC_Upper_Band_20_14_2")
      .where("close_rsi_14 IS NOT NULL")
      .show(12, truncate = false)
    println(s"rows=${out.count()} cols=${out.columns.length}")
    out.explain("formatted")
    spark.stop()
  }
}
