package graft

import org.apache.spark.sql.functions._

import graft.plans.Scale

class SaltSpec extends SparkSpec {

  test("salted aggregation equals the direct aggregation") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("s"), max("value").as("mx"))
      .orderBy("event_type").collect()
    val salted = Scale.saltedAgg(
      events,
      "event_type",
      col("event_id"),
      salts = 8,
      phase1 = Seq(count(lit(1)).as("pn"), sum("value").as("ps"), max("value").as("pm")),
      phase2 = Seq(sum("pn").as("n"), sum("ps").as("s"), max("pm").as("mx")))
      .orderBy("event_type").collect()
    assert(direct.length == salted.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getAs[String]("event_type") == s.getAs[String]("event_type"))
      assert(d.getAs[Long]("n") == s.getAs[Long]("n"))
      assert(math.abs(d.getAs[Double]("s") - s.getAs[Double]("s")) < 1e-6)
      assert(d.getAs[Double]("mx") == s.getAs[Double]("mx"))
    }
  }

  test("keySkewPlan: hand-computed skew math flags the hot key and sizes the salt") {
    import spark.implicits._
    // key 'hot' holds 12 of 16 rows over 5 keys: avg 3.2, skew 3.75x
    val df = (Seq.fill(12)("hot") ++ Seq("a", "b", "c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val row = Scale.keySkewPlan(df, Seq("k")).collect().head
    assert(row.getAs[Long]("n_rows") == 16L && row.getAs[Long]("n_keys") == 5L)
    assert(row.getAs[Long]("max_count") == 12L && row.getAs[String]("top_key") == "hot")
    assert(row.getAs[Long]("avg_per_key_milli") == 3200L)
    assert(row.getAs[Long]("skew_milli") == 3750L) // 12*5*1000/16
    assert(row.getAs[Long]("salt_factor") == 4L)   // ceil(12/3.2)
    assert(!row.getAs[Boolean]("needs_salt"))      // 3.75x < 4x gate
    // one more hot row tips the gate: 13*5*1000/17 = 3823 < 4000 still;
    // quadruple instead: 48 hot of 52 -> 48*5*1000/52 = 4615 > 4000
    val df2 = (Seq.fill(48)("hot") ++ Seq("a", "b", "c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val row2 = Scale.keySkewPlan(df2, Seq("k")).collect().head
    assert(row2.getAs[Long]("skew_milli") == 4615L && row2.getAs[Boolean]("needs_salt"))
    assert(row2.getAs[Long]("salt_factor") == 5L)  // ceil(48/10.4)
  }

  test("salted aggregation plan: two hash-partitioned phases, salt pruned from output") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val salted = Scale.saltedAgg(
      events, "user_id", col("event_id"), salts = 8,
      phase1 = Seq(count(lit(1)).as("pn")),
      phase2 = Seq(sum("pn").as("n")))
    val plan = salted.queryExecution.executedPlan.toString
    // phase 1 shuffles on (key, salt), phase 2 on key alone — the
    // skew spread exists only between the two aggregations
    assert("hashpartitioning\\(user_id.*_salt".r.findFirstIn(plan).isDefined,
      s"phase-1 exchange must partition on (key, salt):\n$plan")
    assert("hashpartitioning\\(user_id#\\d+L, \\d+\\)".r.findFirstIn(plan).isDefined,
      s"phase-2 exchange must partition on the key alone:\n$plan")
    assert(!salted.columns.contains("_salt"), "salt must not leak into the result")
  }

  test("declared skewed-key salted query keeps the two-stage shape through optimization") {
    // The oracle-gated witness (events_hotkey_stats_salted) must
    // actually EXECUTE the salted plan, not collapse to a one-stage
    // groupBy: assert on the DECLARED query's physical plan that the
    // partial exchange partitions on (event_type, _salt) and the final
    // on event_type alone — the skew spread lives between the two.
    val df = QueriesPipeline.queries("events_hotkey_stats_salted")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(event_type#\\d+, _salt".r.findFirstIn(plan).isDefined,
      s"phase-1 exchange must partition on (event_type, _salt):\n$plan")
    assert("hashpartitioning\\(event_type#\\d+, \\d+\\)".r.findFirstIn(plan).isDefined,
      s"phase-2 exchange must partition on event_type alone:\n$plan")
    assert(!df.columns.contains("_salt"), "salt must not leak into the result")
    // and the salt count honors the floor even on this near-uniform
    // fixture (keySkewPlan alone would recommend 1-2 here, which
    // would never spread the witness)
    assert("pmod\\(hash\\(event_id#\\d+L, 42\\), 8\\)".r.findFirstIn(plan).isDefined,
      s"salt modulus must be the floored 8:\n$plan")
  }
}
