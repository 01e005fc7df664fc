package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators the reference's bar data model implies
  * but neither Polars-as-used (reference has zero joins —
  * SURVEY.md §2.4.3) nor Spark offers as a single scale-safe operator:
  * the point-in-time (as-of) join and the interval-containment (range)
  * join. Both are implemented as shuffle-friendly compositions of
  * existing relational operators — no theta-join, no
  * BroadcastNestedLoopJoin, no per-row subquery — so the plans hold at
  * 100 TB.
  */
object TimeJoins {

  /** As-of join: for every left row, attach the payload of the most
    * recent right row with `rightTime` &lt;= `leftTime` in the same
    * `key` group (inclusive match; left rows before any right row get
    * NULL payloads).
    *
    * Implemented with the union-merge trick: tag each side, union them
    * into one stream, and run a single running
    * `last(payload, ignoreNulls)` window per key ordered by
    * (time, side) — right rows sort BEFORE left rows on time ties,
    * which is exactly the inclusive (&lt;=) semantic. One shuffle on
    * the key, then a linear per-partition pass: cost is
    * O((|L|+|R|) log) with NO range explosion, unlike the
    * `l.ts >= r.ts` theta-join Spark would execute as a nested-loop
    * join. This is the canonical distributed as-of plan.
    *
    * Requirements: `payload` column names must not collide with left
    * columns; right rows with NULL payload are treated as missing
    * (skipped over); if several right rows share (key, time) the
    * latest in the union order wins — give the right side a unique
    * (key, time) or pre-aggregate to make that deterministic.
    */
  /** `direction`: "backward" (default) matches the most recent right
    * row with rightTime &lt;= leftTime; "forward" matches the earliest
    * right row with rightTime &gt;= leftTime (both inclusive);
    * "nearest" picks whichever of the two is closer in time (exact tie
    * -&gt; the backward match, like pandas merge_asof).
    * `tolerance`: maximum |leftTime − rightTime| in the times' own
    * unit; matches farther away yield NULL payloads. Same single
    * shuffle either way — forward is the descending-time ordering of
    * the same union-merge plan, nearest evaluates both orderings as
    * two Window passes over the one exchange.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame =
    asofMulti(left, right, Seq(key), leftTime, rightTime, payload, direction, tolerance)

  /** [[asof]] with a composite key: the match group is the tuple of
    * `keys` columns (same names on both sides). Same single shuffle —
    * the exchange and the in-partition window both hash/order on the
    * whole tuple.
    */
  def asofMulti(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asof needs at least one key column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    // A TimestampType here would silently cast to epoch SECONDS,
    // collapsing sub-second order (and letting a later-in-the-second
    // right row enrich an earlier probe). Demand integral epochs; the
    // caller picks the unit (cf. Bars.eventTimeMicros).
    def requireIntegral(df: DataFrame, c: String): Unit = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"asof time column `$c` must be an integral epoch (got $other); " +
            "convert timestamps explicitly, e.g. unix_micros(col)")
      }
    }
    requireIntegral(left, leftTime)
    requireIntegral(right, rightTime)
    val othersL = left.columns.toSeq.filterNot(keys.contains)
    val keyCols = keys.map(col)
    // Identical union schema: keys, _t, _side, left passthroughs
    // (NULL-typed on right rows), payloads (NULL-typed on left rows).
    val l = left.select(
      keyCols ++ (left.col(leftTime).cast("long").as("_t") +: lit(1).as("_side") +:
        (othersL.map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)))): _*)
    val r = right.select(
      keyCols ++ (right.col(rightTime).cast("long").as("_t") +: lit(0).as("_side") +:
        (othersL.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col))): _*)
    // Backward scans time ascending (last right seen = latest <= t);
    // forward scans descending (last right seen = earliest >= t). In
    // both, right (_side 0) sorts before left on ties => inclusive.
    def spec(asc: Boolean) = Window.partitionBy(keyCols: _*)
      .orderBy(if (asc) col("_t").asc else col("_t").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = spec(asc = true)
    val wF = spec(asc = false)
    // Matched time PER PAYLOAD COLUMN, from right rows where that
    // payload is non-null — NULL-payload rows are "skipped over"
    // (Scaladoc), so the tolerance (and the nearest pick) must be
    // measured against the row the payload actually comes from, not
    // the latest right row of any kind. With a shared rt, a recent
    // NULL-payload row would let a stale out-of-tolerance payload
    // through.
    def rtP(p: String, w: org.apache.spark.sql.expressions.WindowSpec) =
      last(when(col("_side") === 0 && col(p).isNotNull, col("_t")),
        ignoreNulls = true).over(w)
    def inTol(matchedRt: Column) =
      tolerance.fold(lit(true))(tol => abs(col("_t") - matchedRt) <= tol)
    val unioned = l.unionByName(r)
    val enriched = direction match {
      case "backward" | "forward" =>
        val w = if (direction == "backward") wB else wF
        unioned.select(
          keyCols ++ (col("_side") +:
            (othersL.map(col) ++
              payload.map(p =>
                when(inTol(rtP(p, w)), last(col(p), ignoreNulls = true).over(w)).as(p)))): _*)
      case "nearest" =>
        // nearer of the two candidates wins; exact tie -> backward.
        // Both windows share the key partitioning: one exchange, two
        // in-partition sort+scan passes. The pick is per payload
        // column (each column's candidates are its own non-null rows).
        unioned.select(
          keyCols ++ (col("_side") +:
            (othersL.map(col) ++
              payload.map { p =>
                val rb = rtP(p, wB)
                val rf = rtP(p, wF)
                val pickB = rf.isNull || (rb.isNotNull && (col("_t") - rb) <= (rf - col("_t")))
                val pb = when(inTol(rb), last(col(p), ignoreNulls = true).over(wB))
                val pf = when(inTol(rf), last(col(p), ignoreNulls = true).over(wF))
                when(pickB, pb).otherwise(pf).as(p)
              })): _*)
    }
    enriched.where(col("_side") === 1).drop("_side")
  }

  /** TimestampType convenience for [[asofMulti]]: both time columns
    * are native timestamps, converted to MICROSECOND epochs (Spark's
    * own timestamp resolution — `unix_micros`, exact, no truncation)
    * before the integral-epoch core runs; `toleranceUs` is in
    * microseconds. The left timestamp column passes through unchanged.
    * This removes the sharpest edge of the integral-epoch guard — a
    * caller with plain timestamp frames no longer writes the
    * conversion (and cannot accidentally `cast("long")` to seconds).
    */
  def asofTs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    def requireTs(df: DataFrame, c: String): Unit =
      df.schema(c).dataType match {
        case TimestampType => ()
        case other => throw new IllegalArgumentException(
          s"asofTs time column `$c` must be TimestampType (got $other); " +
            "for integral epochs use asof/asofMulti")
      }
    requireTs(left, leftTime)
    requireTs(right, rightTime)
    val lt = "_asof_l_us"
    require(
      !left.columns.contains(lt) && !left.columns.contains("_asof_r_us") &&
        !right.columns.contains(lt) && !right.columns.contains("_asof_r_us"),
      "asofTs reserves helper columns _asof_l_us/_asof_r_us; rename them " +
        "on the inputs (they would be silently overwritten otherwise)")
    asofMulti(
      left.withColumn(lt, unix_micros(col(leftTime))),
      right.withColumn("_asof_r_us", unix_micros(col(rightTime))),
      keys, lt, "_asof_r_us", payload, direction, toleranceUs)
      .drop(lt)
  }

  /** Interval-containment (range) join WITHOUT an equi-key, made
    * shuffle-friendly by time bucketing: each interval is exploded onto
    * every fixed-width bucket it overlaps, each point maps to its
    * single bucket, the two sides equi-join on the bucket id, and the
    * precise half-open containment `start <= t < end` filters within
    * the bucket. A match appears exactly once (the point's bucket is
    * unique), so no post-dedup is needed.
    *
    * Scale: work is |points| + |intervals| x (span/bucketWidth) +
    * |matches| — linear, one hash shuffle on the bucket id, versus the
    * nested-loop join Spark picks for a bare `t >= start AND t < end`
    * predicate. Pick `bucketWidth` near the typical interval span so
    * the explosion factor stays small; skewed hot buckets fall under
    * AQE skew-join handling like any other equi-join.
    *
    * `pointTime`, `startCol`, `endCol` are LONG epochs in the same
    * unit; intervals must be non-empty (`end > start`). Column names
    * must be disjoint between the two sides.
    */
  def rangeJoin(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    // Integer `div`, not floor(x / w): double division is ulp-fragile
    // exactly at bucket boundaries for epoch-scale longs (~1e15 us),
    // where a misrounded quotient would silently drop a boundary
    // match. `div` is exact for the required nonnegative epochs.
    val ivb = intervals.withColumn(
      "_bucket",
      explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"(`$endCol` - 1) div $bucketWidth"))))
    val pb = points.withColumn(
      "_bucket",
      expr(s"`$pointTime` div $bucketWidth"))
    pb.join(ivb, Seq("_bucket"))
      .where(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("_bucket")
  }
}
