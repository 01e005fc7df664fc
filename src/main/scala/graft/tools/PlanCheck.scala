package graft.tools
import graft.indicators.Indicators
import graft.sources.{Bars, Sessions}
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bars = Bars.fromEvents(spark, "/root/testdata/sf0.001")
    // chain of per-symbol ops: should collapse into FEW Window nodes
    val perSym = Indicators(bars)
      .sma(Seq("close"), 5).sma(Seq("close"), 20)
      .bollinger_bands(Seq("close")).awesome_oscillator()
      .daily_return(Seq("close")).daily_log_return(Seq("close"))
      .ema(Seq("close"), 9).ema(Seq("close"), 26)
      .dataframe
    val plan = perSym.queryExecution.executedPlan.toString
    println("=== per-symbol chain ===")
    println("Window nodes: " + "\\bWindow\\b".r.findAllIn(plan).length)
    println("Exchange nodes: " + "Exchange".r.findAllIn(plan).length)
    println("Sort nodes: " + "\\bSort\\b".r.findAllIn(plan).length)
    // filter pushdown check on a filtered scan
    val filtered = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .where(col("event_type") === "click").select("event_id", "value")
    val scanPlan = filtered.queryExecution.executedPlan.toString
    println("=== filtered scan ===")
    println(scanPlan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).mkString("\n").take(600))
    // scaled-mode chain with global ops: exchanges should be symbol-hash only
    val scaled = Indicators.scaled(bars).atr().vwap().obv().cci().dataframe
    val sp = scaled.queryExecution.executedPlan.toString
    println("=== scaled-mode global ops ===")
    println("Window nodes: " + "\\bWindow\\b".r.findAllIn(sp).length)
    println("SinglePartition exchanges: " + "SinglePartition".r.findAllIn(sp).length)
    val parity = Indicators(bars).atr().vwap().obv().cci().dataframe
    val pp = parity.queryExecution.executedPlan.toString
    println("=== parity-mode global ops ===")
    println("SinglePartition exchanges: " + "SinglePartition".r.findAllIn(pp).length)
    spark.stop()
  }
}
