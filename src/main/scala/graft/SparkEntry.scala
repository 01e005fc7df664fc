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
    // The driver smoke-checks entry from a session it builds (not
    // Sessions.builder), so the engine-semantic conf is set at THIS
    // entry point: float division by zero must yield ±Inf/NaN like
    // polars (SURVEY.md §2.6 Q12), not Spark 4's default ANSI error.
    spark.conf.set("spark.sql.ansi.enabled", "false")
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
    Queries.queries ++ QueriesPipeline.queries ++ QueriesJoins.queries

  /** DuckDB `round` preserves IEEE −0.0 (and yields −0.0 for tiny
    * negatives that round to zero at 6dp); Spark's BigDecimal-based
    * `round` always returns +0.0 — so any rounded output reaching zero
    * from below hash-mismatches byte-wise even though the values compare
    * numerically equal (seen on williams_ri, where close == 14-bar
    * rolling max ⇒ 0.0 × −100 = −0.0). `x + 0` maps −0.0 → +0.0 and is
    * the identity on every other double (NULL/NaN/±Inf included), so it
    * is appended to every outer `round(..., 6) AS alias` in the oracle
    * SQL. All such closings in Queries/QueriesPipeline are spelled
    * exactly ", 6) AS " (single-line or as the last line of a
    * multi-line round), which makes the rewrite total.
    */
  private def normNegZero(sql: String): String =
    sql.replace(", 6) AS ", ", 6) + 0 AS ")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Pre-normNegZero oracle text — exposed so OracleInvariantSpec can
    * mechanically prove every rewrite site is a round() closing.
    */
  private[graft] def rawOracleSql: Map[String, String] =
    Queries.oracleSql ++ QueriesPipeline.oracleSql ++ QueriesJoins.oracleSql

  def oracleSql: Map[String, String] =
    rawOracleSql.view.mapValues(normNegZero).toMap
}
