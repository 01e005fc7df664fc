package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical OHLCV bar derivation from the `events` table
  * (FIXTURES.md §2). One bar per (symbol = event_type, 1-hour tumbling
  * bucket); (symbol, timestamp) is unique, removing sort-tie
  * nondeterminism. `min_by`/`max_by` on the unique event_id give
  * deterministic open/close.
  *
  * Scale note: a single hash-aggregate on (symbol, hour) — partial
  * map-side combine then one shuffle on the group keys; no windows, no
  * sort. At 100 TB this parallelizes linearly with input splits.
  */
object Bars {
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEventsDF(spark.read.parquet(s"$sfDir/events.parquet"))

  def fromEventsDF(events: DataFrame): DataFrame =
    events
      .groupBy(
        col("event_type").as("symbol"),
        date_trunc("hour", col("ts")).as("timestamp"))
      .agg(
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        min_by(col("value"), col("event_id")).as("open"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))
}
