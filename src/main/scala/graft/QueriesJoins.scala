package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TimeJoins
import graft.sources.Bars

/** Declared queries + DuckDB oracles for the time-series join
  * operators (graft.operators.TimeJoins). Both oracles mirror the
  * Spark plan's semantics in portable SQL: the as-of oracle uses the
  * identical union-merge construction (so tie semantics are spelled
  * out, not engine-dependent), and the range oracle is the plain
  * theta-join the bucketed plan is equivalent to.
  */
object QueriesJoins {

  private val HourUs = 3600000000L

  /** Shared probe shape for the three asof_join_* queries: every raw
    * event against its own symbol's hourly bar closes. One definition
    * so the three oracle-gated directions can never diverge on the
    * probe side.
    */
  private def asofQuery(
      s: SparkSession,
      dir: String,
      direction: String,
      tolerance: Option[Long]): DataFrame = {
    val ev = Bars.readEvents(s, dir)
    val left = ev.select(
      col("event_id"),
      col("event_type").as("symbol"),
      Bars.eventTimeMicros(ev).as("ts_us"),
      col("value"))
    val barCloses = Bars.fromEvents(s, dir).select(
      col("symbol"),
      unix_micros(col("timestamp")).as("bar_us"),
      col("close").as("bar_close"))
    TimeJoins.asof(left, barCloses, "symbol", "ts_us", "bar_us", Seq("bar_close"),
      direction = direction, tolerance = tolerance)
      .select(
        col("event_id"), col("symbol"), col("ts_us"),
        round(col("value"), 6).as("value"),
        round(col("bar_close"), 6).as("bar_close"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Every raw event joined to the most recent hourly bar (bar start
    // <= event time) of ITS OWN symbol — the canonical point-in-time
    // enrichment.
    "asof_join" -> ((s, dir) => asofQuery(s, dir, "backward", None)),

    // The forward direction (earliest bar at-or-after the event) with
    // a one-hour tolerance — the other half of the merge_asof surface,
    // oracle-gated separately because the tie/tolerance rules are the
    // subtle part.
    "asof_join_forward" -> ((s, dir) => asofQuery(s, dir, "forward", Some(HourUs))),

    // The nearest direction (closer of the two candidates, exact tie ->
    // backward) with the same one-hour tolerance — pins down the
    // pick-then-tolerance order: the nearer bar is chosen first, and
    // only then nulled if it is out of tolerance.
    "asof_join_nearest" -> ((s, dir) => asofQuery(s, dir, "nearest", Some(HourUs))),

    // Composite-key as-of through the TimestampType overload: every
    // event enriched with the most recent "checkpoint" (every 5th
    // event, max value per (user, type, ts) for right-side (key, time)
    // uniqueness) of the SAME (user_id, event_type) — the
    // stream-to-last-snapshot pattern. Gates both asofMulti's tuple
    // partitioning and asofTs's micros conversion end-to-end.
    "asof_join_multikey" -> ((s, dir) => {
      val ev = Bars.readEvents(s, dir)
      val tsUs = Bars.eventTimeMicros(ev)
      val left = ev.select(
        col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(tsUs).as("ts"), col("value"))
      val ckpts = ev
        .where(col("event_id") % 5 === 0)
        .groupBy(col("user_id"), col("event_type"), timestamp_micros(tsUs).as("ckpt_ts"))
        .agg(max(col("value")).as("ckpt_value"))
      TimeJoins.asofTs(left, ckpts, Seq("user_id", "event_type"), "ts", "ckpt_ts",
        Seq("ckpt_value"), toleranceUs = Some(HourUs))
        .select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value"), 6).as("value"),
          round(col("ckpt_value"), 6).as("ckpt_value"))
        .orderBy("event_id")
    }),

    // Events of ANY type landing inside the 20 busiest 'click' hours —
    // an interval join with no equi-key (the interval set comes from
    // one symbol, the probe side spans all of them). The top-k interval
    // derivation is a TakeOrderedAndProject (per-partition top-k +
    // merge), not a global sort.
    "range_join" -> ((s, dir) => {
      val ev = Bars.readEvents(s, dir)
      val pts = ev.select(
        col("event_id"),
        col("event_type"),
        Bars.eventTimeMicros(ev).as("ts_us"))
      val topWindows = Bars.fromEvents(s, dir)
        .where(col("symbol") === "click")
        .select(
          unix_micros(col("timestamp")).as("w_start"),
          (unix_micros(col("timestamp")) + HourUs).as("w_end"),
          col("volume"))
        .orderBy(col("volume").desc, col("w_start").asc)
        .limit(20)
        .select("w_start", "w_end")
      TimeJoins.rangeJoin(pts, "ts_us", topWindows, "w_start", "w_end", HourUs / 2)
        .select(col("event_id"), col("event_type"), col("ts_us"), col("w_start"))
        .orderBy("event_id", "w_start")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "asof_join" ->
      s"""${Queries.BarsCte},
         |l AS (SELECT event_id, event_type AS symbol, epoch_us(ts) AS ts_us, value FROM events),
         |r AS (SELECT symbol, epoch_us("timestamp") AS t, close AS bar_close FROM bars),
         |u AS (
         |  SELECT symbol, ts_us AS t, 1 AS side, event_id, value, CAST(NULL AS DOUBLE) AS bar_close FROM l
         |  UNION ALL
         |  SELECT symbol, t, 0, NULL, NULL, bar_close FROM r),
         |f AS (
         |  SELECT symbol, t, side, event_id, value,
         |    last_value(bar_close IGNORE NULLS) OVER (
         |      PARTITION BY symbol ORDER BY t, side
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bar_close
         |  FROM u)
         |SELECT event_id, symbol, t AS ts_us,
         |  round(value, 6) AS value, round(bar_close, 6) AS bar_close
         |FROM f WHERE side = 1 ORDER BY event_id""".stripMargin,

    "asof_join_forward" ->
      s"""${Queries.BarsCte},
         |l AS (SELECT event_id, event_type AS symbol, epoch_us(ts) AS ts_us, value FROM events),
         |r AS (SELECT symbol, epoch_us("timestamp") AS t, close AS bar_close FROM bars),
         |u AS (
         |  SELECT symbol, ts_us AS t, 1 AS side, event_id, value, CAST(NULL AS DOUBLE) AS bar_close FROM l
         |  UNION ALL
         |  SELECT symbol, t, 0, NULL, NULL, bar_close FROM r),
         |f AS (
         |  SELECT symbol, t, side, event_id, value,
         |    last_value(bar_close IGNORE NULLS) OVER w AS bar_close,
         |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER w AS rt
         |  FROM u
         |  WINDOW w AS (PARTITION BY symbol ORDER BY t DESC, side ASC
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_id, symbol, t AS ts_us, round(value, 6) AS value,
         |  round(CASE WHEN abs(t - rt) <= ${3600000000L} THEN bar_close END, 6) AS bar_close
         |FROM f WHERE side = 1 ORDER BY event_id""".stripMargin,

    "asof_join_nearest" ->
      s"""${Queries.BarsCte},
         |l AS (SELECT event_id, event_type AS symbol, epoch_us(ts) AS ts_us, value FROM events),
         |r AS (SELECT symbol, epoch_us("timestamp") AS t, close AS bar_close FROM bars),
         |u AS (
         |  SELECT symbol, ts_us AS t, 1 AS side, event_id, value, CAST(NULL AS DOUBLE) AS bar_close FROM l
         |  UNION ALL
         |  SELECT symbol, t, 0, NULL, NULL, bar_close FROM r),
         |f AS (
         |  SELECT symbol, t, side, event_id, value,
         |    last_value(bar_close IGNORE NULLS) OVER wb AS pb,
         |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER wb AS rtb,
         |    last_value(bar_close IGNORE NULLS) OVER wf AS pf,
         |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER wf AS rtf
         |  FROM u
         |  WINDOW wb AS (PARTITION BY symbol ORDER BY t ASC, side ASC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wf AS (PARTITION BY symbol ORDER BY t DESC, side ASC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_id, symbol, t AS ts_us, round(value, 6) AS value,
         |  round(CASE WHEN rtf IS NULL OR (rtb IS NOT NULL AND t - rtb <= rtf - t)
         |             THEN CASE WHEN abs(t - rtb) <= $HourUs THEN pb END
         |             ELSE CASE WHEN abs(t - rtf) <= $HourUs THEN pf END END, 6) AS bar_close
         |FROM f WHERE side = 1 ORDER BY event_id""".stripMargin,

    "asof_join_multikey" ->
      s"""WITH l AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value FROM events),
         |r AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS t, max(value) AS ckpt_value
         |  FROM events WHERE event_id % 5 = 0
         |  GROUP BY user_id, event_type, epoch_us(ts)),
         |u AS (
         |  SELECT user_id, event_type, ts_us AS t, 1 AS side, event_id, value,
         |         CAST(NULL AS DOUBLE) AS ckpt_value
         |  FROM l
         |  UNION ALL
         |  SELECT user_id, event_type, t, 0, NULL, NULL, ckpt_value FROM r),
         |f AS (
         |  SELECT user_id, event_type, t, side, event_id, value,
         |    last_value(ckpt_value IGNORE NULLS) OVER w AS ckpt_value,
         |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER w AS rt
         |  FROM u
         |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t, side
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, event_type, t AS ts_us,
         |  round(value, 6) AS value,
         |  round(CASE WHEN abs(t - rt) <= $HourUs THEN ckpt_value END, 6) AS ckpt_value
         |FROM f WHERE side = 1 ORDER BY event_id""".stripMargin,

    "range_join" ->
      s"""${Queries.BarsCte},
         |topw AS (
         |  SELECT epoch_us("timestamp") AS w_start,
         |         epoch_us("timestamp") + $HourUs AS w_end
         |  FROM bars WHERE symbol = 'click'
         |  ORDER BY volume DESC, "timestamp" ASC LIMIT 20)
         |SELECT e.event_id, e.event_type, epoch_us(e.ts) AS ts_us, t.w_start
         |FROM events e JOIN topw t
         |  ON epoch_us(e.ts) >= t.w_start AND epoch_us(e.ts) < t.w_end
         |ORDER BY event_id, w_start""".stripMargin
  )
}
