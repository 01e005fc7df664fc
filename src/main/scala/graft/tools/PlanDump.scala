package graft.tools
import graft.indicators.Indicators
import graft.sources.{Bars, Sessions}
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bars = Bars.fromEvents(spark, "/root/testdata/sf0.001")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"@@@ $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.replaceAll("#\\d+[L]?", "").replaceAll(", \\[plan_id=\\d+\\]", ""))
        .take(40).mkString("\n"))
    }
    dump("per-symbol-chain", Indicators(bars)
      .sma(Seq("close"), 20).ema(Seq("close"), 9).bollinger_bands(Seq("close"))
      .daily_return(Seq("close")).dataframe)
    dump("scaled-global-ops", Indicators.scaled(bars).atr().vwap().obv().dataframe)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dump("ann-topk", Similarity.topK(e))
    val ev = Bars.readEvents(spark, "/root/testdata/sf0.001")
    val left = ev.select(col("event_id"), col("event_type").as("symbol"),
      Bars.eventTimeMicros(ev).as("ts_us"), col("value"))
    val barCloses = bars.select(col("symbol"),
      unix_micros(col("timestamp")).as("bar_us"), col("close").as("bar_close"))
    dump("asof-join", graft.operators.TimeJoins.asof(
      left, barCloses, "symbol", "ts_us", "bar_us", Seq("bar_close")))
    val pts = ev.select(col("event_id"), Bars.eventTimeMicros(ev).as("ts_us"))
    val ivs = bars.where(col("symbol") === "click").select(
      unix_micros(col("timestamp")).as("w_start"),
      (unix_micros(col("timestamp")) + 3600000000L).as("w_end"))
    dump("range-join", graft.operators.TimeJoins.rangeJoin(
      pts, "ts_us", ivs, "w_start", "w_end", 1800000000L))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dump("simhash-pairs", graft.pipeline.Dedup.simhashPairs(docs))
    spark.stop()
  }
}
