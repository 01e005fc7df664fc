package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

import graft.operators.TimeJoins
import graft.pipeline.Dedup

import scala.jdk.CollectionConverters._

class TimeJoinsSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val leftSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("t", LongType),
    StructField("x", LongType)))
  private val rightSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("rt", LongType),
    StructField("p", DoubleType)))

  test("asof: inclusive match, per-key, null before first right row") {
    val left = df(leftSchema,
      Row("a", 5L, 1L), Row("a", 10L, 2L), Row("a", 15L, 3L), Row("a", 30L, 4L),
      Row("b", 10L, 5L),
      Row("c", 7L, 6L))
    val right = df(rightSchema,
      Row("a", 10L, 1.0), Row("a", 20L, 2.0),
      Row("b", 9L, 3.0))
    val out = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"))
      .orderBy("x").collect()
    // t=5: before any right -> null; t=10: inclusive tie -> 1.0;
    // t=15: still 1.0; t=30: 2.0; key b: 3.0; key c: no right rows -> null
    assert(out.map(r => if (r.isNullAt(r.fieldIndex("p"))) None
      else Some(r.getDouble(r.fieldIndex("p")))).toSeq ==
      Seq(None, Some(1.0), Some(1.0), Some(2.0), Some(3.0), None))
    // left columns pass through
    assert(out.map(_.getLong(out.head.fieldIndex("t"))).toSeq ==
      Seq(5L, 10L, 15L, 30L, 10L, 7L))
  }

  test("asofMulti partitions on the whole key tuple") {
    val ls = StructType(Seq(
      StructField("k1", StringType), StructField("k2", LongType),
      StructField("t", LongType), StructField("x", LongType)))
    val rs = StructType(Seq(
      StructField("k1", StringType), StructField("k2", LongType),
      StructField("rt", LongType), StructField("p", DoubleType)))
    val left = df(ls,
      Row("a", 1L, 10L, 1L), Row("a", 2L, 10L, 2L), Row("b", 1L, 10L, 3L))
    val right = df(rs,
      Row("a", 1L, 5L, 1.0), Row("a", 2L, 7L, 2.0), Row("b", 2L, 3L, 9.0))
    val out = TimeJoins.asofMulti(left, right, Seq("k1", "k2"), "t", "rt", Seq("p"))
      .orderBy("x").collect()
    // (a,1)->1.0, (a,2)->2.0, (b,1): right has only (b,2) -> null —
    // a single-column key on either k1 or k2 would wrongly match
    assert(out.map(r => if (r.isNullAt(r.fieldIndex("p"))) None
      else Some(r.getDouble(r.fieldIndex("p")))).toSeq ==
      Seq(Some(1.0), Some(2.0), None))
  }

  test("asofTs converts timestamps to micros and matches the integral-epoch asof") {
    val left = df(leftSchema,
      Row("a", 5L, 1L), Row("a", 10L, 2L), Row("a", 15L, 3L))
    val right = df(rightSchema,
      Row("a", 10L, 1.0), Row("a", 14L, 2.0))
    val viaLong = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"),
        tolerance = Some(4L))
      .orderBy("x").collect().map(r =>
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p"))))
    val viaTs = TimeJoins.asofTs(
        left.withColumn("t", timestamp_micros(col("t"))),
        right.withColumn("rt", timestamp_micros(col("rt"))),
        Seq("k"), "t", "rt", Seq("p"), toleranceUs = Some(4L))
      .orderBy("x").collect().map(r =>
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p"))))
    assert(viaTs.toSeq == viaLong.toSeq)
    assert(viaTs.toSeq == Seq(None, Some(1.0), Some(2.0)))
    // the left timestamp column passes through as a timestamp
    val outSchema = TimeJoins.asofTs(
      left.withColumn("t", timestamp_micros(col("t"))),
      right.withColumn("rt", timestamp_micros(col("rt"))),
      Seq("k"), "t", "rt", Seq("p")).schema
    assert(outSchema("t").dataType == TimestampType)
    assert(!outSchema.fieldNames.contains("_asof_l_us"))
  }

  test("asofTs rejects non-timestamp time columns") {
    val left = df(leftSchema, Row("a", 5L, 1L))
    val right = df(rightSchema, Row("a", 10L, 1.0))
    val e = intercept[IllegalArgumentException] {
      TimeJoins.asofTs(left, right, Seq("k"), "t", "rt", Seq("p"))
    }
    assert(e.getMessage.contains("TimestampType"))
  }

  test("asofTs rejects inputs that already carry its reserved helper columns") {
    val left = df(leftSchema, Row("a", 5L, 1L))
      .withColumn("t", timestamp_micros(col("t")))
    val right = df(rightSchema, Row("a", 10L, 1.0))
      .withColumn("rt", timestamp_micros(col("rt")))
    val e = intercept[IllegalArgumentException] {
      TimeJoins.asofTs(
        left.withColumn("_asof_l_us", lit(0L)), right,
        Seq("k"), "t", "rt", Seq("p"))
    }
    assert(e.getMessage.contains("_asof_l_us"))
    intercept[IllegalArgumentException] {
      TimeJoins.asofTs(
        left, right.withColumn("_asof_r_us", lit(0L)),
        Seq("k"), "t", "rt", Seq("p"))
    }
  }

  test("asof plan has no nested-loop / cartesian join") {
    val left = df(leftSchema, Row("a", 5L, 1L))
    val right = df(rightSchema, Row("a", 10L, 1.0))
    val plan = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  private val ptsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("t", LongType)))
  private val ivSchema = StructType(Seq(
    StructField("s", LongType),
    StructField("e", LongType),
    StructField("w", StringType)))

  test("rangeJoin: half-open containment, multi-bucket intervals, no dup matches") {
    val pts = df(ptsSchema,
      Row(1L, 0L), Row(2L, 10L), Row(3L, 19L), Row(4L, 20L), Row(5L, 35L), Row(6L, 100L))
    // [10, 20) spans buckets 1..1 at width 10; [5, 36) spans 0..3
    val ivs = df(ivSchema, Row(10L, 20L, "w1"), Row(5L, 36L, "w2"))
    val out = TimeJoins.rangeJoin(pts, "t", ivs, "s", "e", 10L)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (2L, "w1"), (3L, "w1"),            // 10,19 in [10,20); 20 excluded
      (2L, "w2"), (3L, "w2"), (4L, "w2"), (5L, "w2")))  // 10..35 in [5,36)
  }

  test("rangeJoin executes as an equi-join on the bucket (no nested loop)") {
    val pts = df(ptsSchema, Row(1L, 0L))
    val ivs = df(ivSchema, Row(0L, 5L, "w"))
    val plan = TimeJoins.rangeJoin(pts, "t", ivs, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  private val edgeSchema = StructType(Seq(
    StructField("doc_a", LongType),
    StructField("doc_b", LongType)))

  test("clusters: connected components with min-id labels and canonical flags") {
    // components: {1,2,3,9} (chain 9-1, 1-2, 2-3), {5,6}, {7,8}
    val edges = df(edgeSchema,
      Row(1L, 2L), Row(2L, 3L), Row(9L, 1L), Row(5L, 6L), Row(7L, 8L))
    val out = Dedup.clusters(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (9L, 1L, false),
      (5L, 5L, true), (6L, 5L, false),
      (7L, 7L, true), (8L, 7L, false)))
  }

  test("representatives: longest member wins, ties break to lowest doc_id") {
    // components: {1,2,3} (3 longest), {5,6} (equal length -> keep 5)
    val edges = df(edgeSchema, Row(1L, 2L), Row(2L, 3L), Row(5L, 6L))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val d = df(docSchema,
      Row(1L, 10L), Row(2L, 20L), Row(3L, 30L), Row(5L, 7L), Row(6L, 7L))
    val out = Dedup.representatives(Dedup.clusters(edges), d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 3L, 30L, 3L), (5L, 5L, 7L, 2L)))
  }

  test("clusters: empty edge list yields empty result (no NPE on null sum)") {
    val edges = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), edgeSchema)
    assert(Dedup.clusters(edges).count() == 0)
  }

  test("asof rejects non-integral time columns instead of silently truncating") {
    import spark.implicits._
    val left = Seq(("a", new java.sql.Timestamp(1200L), 1L)).toDF("k", "t", "x")
    val right = Seq(("a", 1000L, 1.0)).toDF("k", "rt", "p")
    val e = intercept[IllegalArgumentException] {
      TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"))
    }
    assert(e.getMessage.contains("integral epoch"))
  }

  test("clusters: long path converges (pointer jumping)") {
    // a 12-node path: diameter 11, must converge well within maxIter
    val edges = df(edgeSchema, (0L until 11L).map(i => Row(i + 1, i + 2)): _*)
    val out = Dedup.clusters(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("clusters: folded-init boundaries — star already at fixpoint, reversed ids, singleton edge") {
    // r22 pin for the folded round-1 init: a min-centered star is at
    // the fixpoint after the init itself (the loop's one remaining
    // round only WITNESSES convergence), labels and canonical flags
    // must still be exact — including when edges arrive max-first so
    // the fold's least(src, min(dst)) matters on both directions.
    val star = df(edgeSchema, Row(7L, 1L), Row(7L, 3L), Row(7L, 5L))
    val got = Dedup.clusters(star).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (3L, 1L, false), (5L, 1L, false),
      (7L, 1L, false)))
    // single edge, both orientations label to the min
    val one = df(edgeSchema, Row(9L, 4L))
    val got1 = Dedup.clusters(one).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got1 == Map(4L -> 4L, 9L -> 4L))
  }

  test("asof forward direction and tolerance") {
    val left = df(leftSchema,
      Row("a", 5L, 1L), Row("a", 10L, 2L), Row("a", 25L, 3L))
    val right = df(rightSchema,
      Row("a", 10L, 1.0), Row("a", 20L, 2.0))
    def payloads(out: Array[org.apache.spark.sql.Row]) =
      out.sortBy(_.getLong(out.head.fieldIndex("x")))
        .map(r => if (r.isNullAt(r.fieldIndex("p"))) None
          else Some(r.getDouble(r.fieldIndex("p")))).toSeq
    // forward: first right at-or-after t
    val fwd = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"), direction = "forward")
    assert(payloads(fwd.collect()) == Seq(Some(1.0), Some(1.0), None))
    // backward with tolerance 3: t=5 no match; t=10 exact; t=25 has rt=20 at distance 5 > 3 -> null
    val tol = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"), tolerance = Some(3L))
    assert(payloads(tol.collect()) == Seq(None, Some(1.0), None))
    // forward with tolerance 5: t=5 -> rt=10 at distance 5 (inclusive); t=25 -> none
    val ft = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"),
      direction = "forward", tolerance = Some(5L))
    assert(payloads(ft.collect()) == Seq(Some(1.0), Some(1.0), None))
  }

  test("asof tolerance is measured against the skipped-to non-null payload row") {
    import spark.implicits._
    // Latest right row (t=95) has a NULL payload and is skipped; the
    // payload would come from t=10, which is OUTSIDE tolerance 20 even
    // though t=95 is inside — the match must be NULL.
    val right = Seq(("k", 10L, Some(1.0)), ("k", 95L, Option.empty[Double]))
      .toDF("k", "rt", "p")
    val left = Seq(("k", 100L, 7L)).toDF("k", "t", "x")
    val tol = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"), tolerance = Some(20L))
      .collect().head
    assert(tol.isNullAt(tol.fieldIndex("p")))
    // Without tolerance the same probe skips over to 1.0.
    val noTol = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"))
      .collect().head
    assert(noTol.getDouble(noTol.fieldIndex("p")) == 1.0)
  }

  test("asof with NULL payloads matches skip-over brute force (backward + nearest, tolerance)") {
    val rnd = new scala.util.Random(321)
    val keys = Seq("a", "b")
    val lrows = (1 to 120).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(40).toLong, i.toLong))
    // ~25% NULL payloads; unique (key, time) on the right side
    val rrows = (1 to 40).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(40).toLong,
        if (rnd.nextInt(4) == 0) None else Some(i * 1.0)))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    import spark.implicits._
    val rdf = rrows.toDF("k", "rt", "p")
    val ldf = lrows.toDF("k", "t", "x")
    def run(direction: String) = TimeJoins.asof(
      ldf, rdf, "k", "t", "rt", Seq("p"), direction = direction, tolerance = Some(5L))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("x")),
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p")))))
      .toMap
    // Brute force over NON-NULL-payload rows only (skip-over), with
    // the tolerance measured against the row the payload comes from.
    val cands = rrows.collect { case (k, rt, Some(p)) => (k, rt, p) }
    def backOf(k: String, t: Long) = cands.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
    def fwdOf(k: String, t: Long) = cands.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
    def tolOk(t: Long)(r: (String, Long, Double)) = math.abs(t - r._2) <= 5
    val expB = lrows.map { case (k, t, x) => x -> backOf(k, t).filter(tolOk(t)).map(_._3) }.toMap
    val expN = lrows.map { case (k, t, x) =>
      val pick = (backOf(k, t), fwdOf(k, t)) match {
        case (Some(b), Some(f)) => if (t - b._2 <= f._2 - t) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
      x -> pick.filter(tolOk(t)).map(_._3)
    }.toMap
    assert(run("backward") == expB)
    assert(run("nearest") == expN)
  }

  test("asof nearest matches brute-force semantics on randomized data (tie -> backward)") {
    val rnd = new scala.util.Random(123)
    val keys = Seq("a", "b")
    val lrows = (1 to 150).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(50).toLong, i.toLong))
    val rrows = (1 to 40).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(50).toLong, i * 1.0))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    import spark.implicits._
    val got = TimeJoins.asof(
      lrows.toDF("k", "t", "x"), rrows.toDF("k", "rt", "p"), "k", "t", "rt", Seq("p"),
      direction = "nearest", tolerance = Some(6L))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("x")),
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p")))))
      .toMap
    val expected = lrows.map { case (k, t, x) =>
      val back = rrows.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
      val fwd = rrows.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) => if (t - b._2 <= f._2 - t) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
      x -> pick.collect { case (_, rt, p) if math.abs(t - rt) <= 6 => p }
    }.toMap
    assert(got == expected)
  }

  test("asof forward matches brute-force semantics on randomized data") {
    val rnd = new scala.util.Random(99)
    val keys = Seq("a", "b")
    val lrows = (1 to 150).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(50).toLong, i.toLong))
    val rrows = (1 to 40).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(50).toLong, i * 1.0))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    import spark.implicits._
    val got = TimeJoins.asof(
      lrows.toDF("k", "t", "x"), rrows.toDF("k", "rt", "p"), "k", "t", "rt", Seq("p"),
      direction = "forward", tolerance = Some(7L))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("x")),
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p")))))
      .toMap
    val expected = lrows.map { case (k, t, x) =>
      val cand = rrows.filter(r => r._1 == k && r._2 >= t)
      x -> cand.sortBy(_._2).headOption.collect { case (_, rt, p) if rt - t <= 7 => p }
    }.toMap
    assert(got == expected)
  }

  test("asof matches brute-force semantics on randomized data") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c")
    val lrows = (1 to 200).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, i.toLong))
    val rrows = (1 to 60).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, i * 1.0))
      // unique (key, time) required for deterministic asof
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    import spark.implicits._
    val left = lrows.toDF("k", "t", "x")
    val right = rrows.toDF("k", "rt", "p")
    val got = TimeJoins.asof(left, right, "k", "t", "rt", Seq("p"))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("x")),
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p")))))
      .toMap
    val expected = lrows.map { case (k, t, x) =>
      val cand = rrows.filter(r => r._1 == k && r._2 <= t)
      x -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toMap
    assert(got == expected)
  }

  test("rangeJoin matches brute-force theta join on randomized data") {
    val rnd = new scala.util.Random(7)
    val prows = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val irows = (1 to 40).map { i =>
      val s = rnd.nextInt(950).toLong
      (s, s + 1 + rnd.nextInt(120), i.toLong)
    }
    import spark.implicits._
    val pts = prows.toDF("id", "t")
    val ivs = irows.toDF("s", "e", "w")
    // bucket width deliberately NOT dividing the interval spans
    val got = TimeJoins.rangeJoin(pts, "t", ivs, "s", "e", 37L)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (id, t) <- prows
      (s, e, w) <- irows
      if t >= s && t < e
    } yield (id, w)).toSet
    assert(got == expected)
  }

  test("streaming asof twin equals the batch asof") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val lrows = (1 to 50).map(i => ("s" + rnd.nextInt(2), rnd.nextInt(30).toLong, i.toLong))
    val rrows = (1 to 20).map(i => ("s" + rnd.nextInt(2), rnd.nextInt(30).toLong, i * 1.0))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val tagged =
      lrows.map { case (k, t, id) => Streaming.AsofIn(k, t, 1, Some(id), Some(id * 0.5), None) } ++
      rrows.map { case (k, t, p) => Streaming.AsofIn(k, t, 0, None, None, Some(p)) }
    val input = MemoryStream[Streaming.AsofIn]
    input.addData(tagged: _*) // one micro-batch: in-batch (t, side) ordering applies
    val q = Streaming.asofStream(input.toDS()).writeStream
      .format("memory").queryName("sasof").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sasof").collect()
      .map(r => (r.getLong(r.fieldIndex("event_id")),
        if (r.isNullAt(r.fieldIndex("payload"))) None
        else Some(r.getDouble(r.fieldIndex("payload"))))).toMap
    val batch = TimeJoins.asof(
      lrows.toDF("k", "t", "x"), rrows.toDF("k", "rt", "p"), "k", "t", "rt", Seq("p"))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("x")),
        if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getDouble(r.fieldIndex("p")))))
      .toMap
    assert(got == batch)
  }

  test("streaming exact dedup keeps one doc per content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    import spark.implicits._
    val input = MemoryStream[Streaming.DocIn]
    val q = Streaming.dedupStream(input.toDS()).writeStream
      .format("memory").queryName("sdedup").outputMode("append").start()
    // batch 1: h1 appears twice (doc 5, 2 -> doc 2 kept), h2 once
    input.addData(
      Streaming.DocIn(5, "h1"), Streaming.DocIn(2, "h1"), Streaming.DocIn(3, "h2"))
    q.processAllAvailable()
    // batch 2: h1 again (dup of earlier batch), h3 new
    input.addData(Streaming.DocIn(1, "h1"), Streaming.DocIn(4, "h3"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup").collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L)) // first arrival wins; in-batch tie -> min doc_id
  }

  test("simhashPairs finds perturbed near-dups within banded hamming") {
    val docs = {
      import spark.implicits._
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and again today"),
        (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
        (3L, "completely unrelated text about distributed query engines and columnar io"))
        .toDF("doc_id", "text")
    }
    val pairs = Dedup.simhashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1-2 differ in one token -> tiny hamming; doc 3 should not pair
    // with either at hamming <= 3 unless hashes collide (deterministic
    // fixture: verified stable)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
