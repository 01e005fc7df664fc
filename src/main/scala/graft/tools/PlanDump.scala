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
    spark.stop()
  }
}
