package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Canonical OHLCV bar derivation from the `events` table
  * (FIXTURES.md §2). One bar per (symbol = event_type, 1-hour tumbling
  * bucket); (symbol, timestamp) is unique, removing sort-tie
  * nondeterminism. `min_by`/`max_by` on the unique event_id give
  * deterministic open/close.
  *
  * The events parquet carries TIMESTAMP(NANOS), which Spark's parquet
  * reader rejects outright; sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]), and
  * the long nanos are converted here via integer µs division — exact
  * for the µs-precision generated data, and sub-hour precision is
  * erased by the bucket anyway.
  *
  * Scale note: a single hash-aggregate on (symbol, hour) — partial
  * map-side combine then one shuffle on the group keys; no windows, no
  * sort. At 100 TB this parallelizes linearly with input splits.
  */
object Bars {
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEventsDF(readEvents(spark, sfDir))

  /** Events reader that works in ANY session: nanosAsLong is a runtime
    * SQL conf, so set it here defensively — the driver smoke-checks
    * `SparkEntry.entry` from a session we don't configure, and a bare
    * session would otherwise throw PARQUET_TYPE_ILLEGAL on the
    * TIMESTAMP(NANOS) events parquet.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Engine contract (SURVEY.md §2.6 Q12): float division by zero must
    // yield ±Inf/NaN like polars, not ANSI errors (Spark 4 default).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def fromEventsDF(events: DataFrame): DataFrame = {
    // Integer `div`, not `/`: nano longs (~1.7e18) exceed double's
    // 53-bit mantissa, so float division would round by ±hundreds of ns.
    val ts: Column = events.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    events
      .groupBy(
        col("event_type").as("symbol"),
        date_trunc("hour", ts).as("timestamp"))
      .agg(
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        min_by(col("value"), col("event_id")).as("open"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))
  }
}

/** One place for the SparkSession settings every graft entry point
  * needs (Verify/Bench/Demo/tests): ANSI off for polars float
  * div-by-zero parity (SURVEY.md §2.6 Q12), UTC, nanos-as-long for the
  * events table.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
