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

  /** Events reader that works in ANY session. nanosAsLong is a runtime
    * SQL conf and strictly required for this table's footer — the
    * driver smoke-checks `SparkEntry.entry` from a session we don't
    * configure, and a bare session would otherwise throw
    * PARQUET_TYPE_ILLEGAL on the TIMESTAMP(NANOS) events parquet.
    * NOTE: this mutates the caller's session conf (unavoidable — there
    * is no per-read form of this option). It is the ONLY conf touched
    * here; engine-semantic confs (ANSI off etc.) belong to
    * [[Sessions.builder]] / the entry point, not to a table reader.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Event-time in LONG microseconds for either encoding of `ts`: the
    * repo-canonical long-of-NANOS (nanosAsLong parquet reading) via
    * integer `div` — exact where float division of ~1.7e18 nanos would
    * round by ±hundreds of ns (past double's 53-bit mantissa) — or a
    * native timestamp via unix_micros. Shared by the batch bars
    * derivation, batch sessionization and the streaming twins so every
    * surface accepts the same inputs.
    */
  def eventTimeMicros(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  /** FLOOR-division time bucket of a LONG-micros column by a positive
    * width. Spark's `div` truncates toward zero, so for a pre-1970
    * (negative-micros) event `t div w` lands one bucket HIGH and a
    * bucketed window join would silently miss it; subtracting the
    * always-non-negative `pmod` first makes the dividend exactly
    * divisible, where truncation and floor coincide — correct for
    * either sign, in pure integer arithmetic (no doubles near bucket
    * edges).
    */
  def timeBucket(microsCol: String, widthMicros: Long): Column = {
    require(widthMicros > 0, s"bucket width must be positive: $widthMicros")
    expr(s"($microsCol - pmod($microsCol, $widthMicros)) div $widthMicros")
  }

  def fromEventsDF(events: DataFrame): DataFrame = {
    val ts: Column = timestamp_micros(eventTimeMicros(events))
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Runtime Bloom-filter injection OFF (r21, measured): every join
      // in this engine is already explicitly shaped (broadcast hints,
      // banded equi-joins, staged-frame probes), and the injector
      // misfires on the session-staged localCheckpoint frames — an RDD
      // scan has no size estimate, so it passes the application-side
      // threshold and Spark adds a WHOLE EXTRA CORPUS SCAN per query
      // to build a bloom over the big side's ids just to pre-filter a
      // label frame of a few hundred rows (seen live in the
      // corpus_prepare* plans). At cluster scale the same joins have
      // both sides over the creation threshold, so the filter would
      // not fire there either — the conf removes a local-mode planner
      // artifact, not a scale lever. Parameterised (env) so the big-tier
      // probes can A/B it: ChainScale's 100x amplified fixtures live in
      // a different size regime than the declared queries.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        sys.env.getOrElse("SPARK_GRAFT_RUNTIME_BLOOM", "false"))
      .config("spark.ui.enabled", "false")
}
