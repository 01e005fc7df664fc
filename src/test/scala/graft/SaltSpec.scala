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
}
