package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.indicators.Indicators
import graft.sources.Bars

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * events -> canonical bars -> SMA + EMA + RSI + daily return, non-null
    * window rows only.
    */
  def entry(spark: SparkSession): DataFrame = {
    val bars = Bars.fromEvents(spark, "/root/testdata/sf0.001")
    Indicators(bars)
      .sma(Seq("close"), 20)
      .ema(Seq("close"), 9)
      .rsi(Seq("close"), 14)
      .daily_return(Seq("close"))
      .dataframe
      .where(col("close_sma_20").isNotNull && col("close_rsi_14").isNotNull)
      .orderBy("symbol", "timestamp")
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * beyond-reference pipeline operators (QueriesPipeline).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ QueriesPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.oracleSql ++ QueriesPipeline.oracleSql
}
