package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Scale

/** The distributed prefix-aggregation plans must agree with the
  * single-partition sequential plans to ulps (1e-9 relative).
  */
class ScaleSpec extends SparkSpec {

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    .select(col("event_id"), col("value"))

  test("distributed cum_sum holds at 10k rows / 13 partitions (sampled boundaries)") {
    val big = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), col("value"))
    val seq = big.withColumn(
      "cs",
      sum(col("value")).over(
        Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = Scale.cumSumDistributed(big, "value", "event_id", "cs", numParts = 13)
    val a = seq.orderBy("event_id").select("cs").collect().map(_.getDouble(0))
    val b = dist.orderBy("event_id").select("cs").collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length == 10000)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)), s"$x != $y")
    }
  }

  test("distributed cum_sum equals the global-window cum_sum") {
    val seq = events.withColumn(
      "cs",
      sum(col("value")).over(
        Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = Scale.cumSumDistributed(events, "value", "event_id", "cs", numParts = 7)
    val a = seq.orderBy("event_id").select("cs").collect().map(_.getDouble(0))
    val b = dist.orderBy("event_id").select("cs").collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length == 1000)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)), s"$x != $y")
    }
  }

  test("distributed ewma equals the global-window ewma") {
    val alpha = 0.2
    val seq = events.withColumn(
      "e",
      graft.functions.ewmaOver(col("value"), alpha, adjust = false, Nil, Seq(col("event_id"))))
    val dist = Scale.ewmaDistributed(events, "value", "event_id", alpha, "e", numParts = 7)
    val a = seq.orderBy("event_id").select("e").collect().map(_.getDouble(0))
    val b = dist.orderBy("event_id").select("e").collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length == 1000)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)), s"$x != $y")
    }
  }

  test("distributed ewma holds at 10k rows / 13 sampled partitions") {
    val alpha = 0.1
    val big = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), col("value"))
    val seq = big.withColumn(
      "e",
      graft.functions.ewmaOver(col("value"), alpha, adjust = false, Nil, Seq(col("event_id"))))
    val dist = Scale.ewmaDistributed(big, "value", "event_id", alpha, "e", numParts = 13)
    val a = seq.orderBy("event_id").select("e").collect().map(_.getDouble(0))
    val b = dist.orderBy("event_id").select("e").collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length == 10000)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)), s"$x != $y")
    }
  }

  test("distributed ewma runs ONE ewma window pass (no plain-EWM second pass)") {
    // The former plain adjust=false pass ran over every partition but
    // served only the first partition's rows; the seed now rides the
    // broadcast state table (round-6 verdict item #4).
    val dist = Scale.ewmaDistributed(events, "value", "event_id", 0.2, "e", numParts = 7)
    dist.count()
    // AQE prints the pre-adaptive plan again under "== Initial Plan =="
    // — count only the executed (final) section, or one real window
    // would tally as two.
    val plan = dist.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val nEwma = "ewma\\(".r.findAllIn(plan).length
    assert(nEwma == 1, s"expected exactly one ewma window aggregate, saw $nEwma:\n$plan")
  }

  test("multi-column cum_sum equals per-column runs and the global window") {
    val two = events.withColumn("v2", col("value") * 2 + 1)
    val fused = Scale.cumSumsDistributed(
      two, Seq("value" -> "cs", "v2" -> "cs2"), "event_id", numParts = 7)
    val w = Window.orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = two
      .withColumn("cs", sum(col("value")).over(w))
      .withColumn("cs2", sum(col("v2")).over(w))
    val a = seq.orderBy("event_id").select("cs", "cs2").collect()
    val b = fused.orderBy("event_id").select("cs", "cs2").collect()
    assert(a.length == b.length && a.length == 1000)
    a.zip(b).foreach { case (x, y) =>
      Seq(0, 1).foreach { i =>
        assert(math.abs(x.getDouble(i) - y.getDouble(i)) <=
          1e-9 * math.max(1.0, math.abs(x.getDouble(i))))
      }
    }
    // and the fused plan stages exactly ONE range repartition
    fused.count()
    val plan = fused.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val nRange = "rangepartitioning".r.findAllIn(plan.toLowerCase).length
    assert(nRange <= 1, s"expected one staged range partitioning:\n$plan")
  }

  test("distributed lag equals the global-window lag (incl. the head NULL)") {
    val seq = events.withColumn(
      "lg", lag(col("value"), 1).over(Window.orderBy("event_id")))
    val dist = Scale.lagDistributed(events, "value", "event_id", "lg", numParts = 7)
    val a = seq.orderBy("event_id").select("lg").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val b = dist.orderBy("event_id").select("lg").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(a.length == b.length && a.length == 1000)
    assert(a.head.isEmpty && b.head.isEmpty) // globally-first row lags to NULL
    assert(a.toSeq == b.toSeq) // exact: values are moved, never combined
  }

  test("distributed lag holds when partitions outnumber rows") {
    val tiny = events.orderBy("event_id").limit(5)
    val seq = tiny.withColumn(
      "lg", lag(col("value"), 1).over(Window.orderBy("event_id")))
      .orderBy("event_id").select("event_id", "lg").collect()
    val dist = Scale.lagDistributed(tiny, "value", "event_id", "lg", numParts = 32)
      .orderBy("event_id").select("event_id", "lg").collect()
    assert(seq.map(_.toString).toSeq == dist.map(_.toString).toSeq)
  }

  test("multi-column lags equal per-column global lags, one range stage") {
    val two = events.withColumn("v2", col("value") * 3 - 1)
    val fused = Scale.lagsDistributed(
      two, Seq("value" -> "lg", "v2" -> "lg2"), "event_id", numParts = 7)
    val gw = Window.orderBy("event_id")
    val seq = two
      .withColumn("lg", lag(col("value"), 1).over(gw))
      .withColumn("lg2", lag(col("v2"), 1).over(gw))
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").select("lg", "lg2").collect()
        .map(r => (0 to 1).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i))))
    assert(dump(seq).toSeq == dump(fused).toSeq) // exact, incl. head NULLs
    fused.count()
    val plan = fused.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).length <= 1)
  }

  test("vpt_ and nvi_distributed declared plans have no single-partition exchange") {
    Seq("vpt_distributed", "nvi_distributed").foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"$name must run on the distributed lag + prefix plans:\n$plan")
    }
  }

  test("obv_distributed declared plan has no single-partition exchange") {
    val df = SparkEntry.queries("obv_distributed")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"obv_distributed must run on the distributed lag + prefix plans:\n$plan")
  }

  test("adi_distributed declared plan has no single-partition exchange") {
    val df = SparkEntry.queries("adi_distributed")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"adi_distributed must run on the distributed prefix plan:\n$plan")
  }

  test("distributed row_number equals the global-window row_number, desc + tie-break") {
    val d = events.limit(5000)
    val got = Scale.rowNumberDistributed(
        d, Seq(col("value").desc, col("event_id").asc), "rank", numParts = 13)
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("rank")))
    val want = d.withColumn("rank",
        row_number().over(Window.orderBy(col("value").desc, col("event_id").asc)).cast("long"))
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("rank")))
    assert(got.toSeq == want.toSeq)
  }

  test("pack_materialize declared plans have no single-partition exchange") {
    Seq("pack_materialize", "pack_materialize_bpe").foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"$name must inherit the distributed prefix plan:\n$plan")
    }
  }

  test("shard_assign and pack_curriculum windows all run partitioned (no global window)") {
    // The blanket no-SinglePartition assertion is too strict here: the
    // broadcast 1-row TOTAL aggregate legitimately reduces through a
    // single partition (O(partitions) partial rows, not corpus rows).
    // The actual scale hazard is an UNPARTITIONED window over corpus
    // rows — assert every window node keys on the prefix plan's _pid.
    Seq("shard_assign", "pack_curriculum").foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
        assert(l.contains("_pid"),
          s"$name: window not keyed on the distributed plan's partition id: $l")
      }
      assert(plan.contains("windowspecdefinition"),
        s"$name expected to carry the prefix/rank window at all")
    }
  }

  test("quality_model_score declared plan is map-only (no Exchange at all)") {
    val df = SparkEntry.queries("quality_model_score")(spark, "/root/testdata/sf0.001")
    df.count()
    // the trailing orderBy is presentation; assert on the plan BEFORE
    // it: score+keep must be a pure projection over the scan
    val scored = graft.pipeline.Corpus.qualityModelScore(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    scored.count()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier scoring must not shuffle:\n$plan")
  }

  test("quality_deciles declared plan has no single-partition exchange") {
    val df = SparkEntry.queries("quality_deciles")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"quality_deciles must rank on the two-pass range-partition plan:\n$plan")
  }

  test("distributed cum_sum and ewma hold at numParts=256 (broadcast offset join)") {
    val big = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), col("value"))
    val seqCs = big.withColumn(
      "cs",
      sum(col("value")).over(
        Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val distCs = Scale.cumSumDistributed(big, "value", "event_id", "cs", numParts = 256)
    val a = seqCs.orderBy("event_id").select("cs").collect().map(_.getDouble(0))
    val b = distCs.orderBy("event_id").select("cs").collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length == 10000)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)), s"$x != $y")
    }
    val alpha = 0.1
    val seqE = big.withColumn(
      "e",
      graft.functions.ewmaOver(col("value"), alpha, adjust = false, Nil, Seq(col("event_id"))))
    val distE = Scale.ewmaDistributed(big, "value", "event_id", alpha, "e", numParts = 256)
    val c = seqE.orderBy("event_id").select("e").collect().map(_.getDouble(0))
    val d = distE.orderBy("event_id").select("e").collect().map(_.getDouble(0))
    assert(c.length == d.length && c.length == 10000)
    c.zip(d).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)), s"$x != $y")
    }
  }

  test("scaled-mode Indicators equal parity mode on a single symbol") {
    val bars1 = graft.sources.Bars.fromEvents(spark, "/root/testdata/sf0.001")
      .where("symbol = 'click' AND high <> low")
    def run(mk: org.apache.spark.sql.DataFrame => graft.indicators.Indicators) =
      mk(bars1).atr().vwap().obv().ema(Seq("close"), 9).kama().psar().toDF
        .select("timestamp", "atr", "vwap", "obv", "close_ema_9", "KAMA_close", "psar")
        .orderBy("timestamp").collect()
    val parity = run(graft.indicators.Indicators.apply)
    val scaled = run(graft.indicators.Indicators.scaled)
    assert(parity.sameElements(scaled))
  }

  test("scaled mode keeps windows inside symbol partitions on multi-symbol frames") {
    val bars = graft.sources.Bars.fromEvents(spark, "/root/testdata/sf0.001")
    val out = graft.indicators.Indicators.scaled(bars).vwap().obv().toDF
    // per-symbol anchored vwap: first row of EVERY symbol equals its own
    // typical price (global mode would mix symbols after the first)
    val firsts = out.withColumn(
        "rn",
        row_number().over(Window.partitionBy("symbol").orderBy("timestamp")))
      .where("rn = 1")
      .select("symbol", "vwap", "high", "low", "close")
      .collect()
    assert(firsts.length > 1)
    firsts.foreach { r =>
      val tp = (r.getAs[Double]("high") + r.getAs[Double]("low") + r.getAs[Double]("close")) / 3
      assert(math.abs(r.getAs[Double]("vwap") - tp) < 1e-9)
    }
  }

  test("distributed long cum_sum is BIT-identical to the global-window sum") {
    val big = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), (col("value") * 100).cast("bigint").as("v"))
    val seq = big.withColumn(
      "cs",
      sum(col("v")).over(
        Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = Scale.cumSumDistributedLong(big, "v", "event_id", "cs", numParts = 13)
    val a = seq.orderBy("event_id").select("cs").collect().map(_.getLong(0))
    val b = dist.orderBy("event_id").select("cs").collect().map(_.getLong(0))
    assert(a.length == 10000)
    // integer arithmetic: exact equality, not ulp tolerance
    assert(a.sameElements(b))
  }

  // The 100 TB handoff bar_quantiles/source_robust_stats document in
  // their scaladocs, made executable: approx_percentile (t-digest-style
  // mergeable sketch) lands within tolerance of the exact interpolated
  // percentile, and its physical plan is a two-phase mergeable
  // aggregation (partial sketches map-side, merged after one hash
  // shuffle) — never a single-node percentile buffer.
  test("approx_percentile handoff: within tolerance of exact, mergeable partial plan") {
    val bars = graft.sources.Bars.fromEvents(spark, "/root/testdata/sf0.01")
    val exact = bars.groupBy("symbol")
      .agg(
        expr("percentile(close, 0.25)").as("p25"),
        expr("percentile(close, 0.5)").as("p50"),
        expr("percentile(close, 0.9)").as("p90"))
      .orderBy("symbol").collect()
    val approxDf = bars.groupBy("symbol")
      .agg(
        expr("approx_percentile(close, 0.25, 10000)").as("p25"),
        expr("approx_percentile(close, 0.5, 10000)").as("p50"),
        expr("approx_percentile(close, 0.9, 10000)").as("p90"))
    val approx = approxDf.orderBy("symbol").collect()
    assert(exact.length == approx.length && exact.nonEmpty)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      Seq(1, 2, 3).foreach { i =>
        val ev = e.getDouble(i)
        val av = a.getDouble(i)
        // approx returns a member value (no interpolation): allow the
        // local gap between adjacent samples, generous at this density
        assert(math.abs(ev - av) <= math.max(1.0, math.abs(ev)) * 0.05,
          s"${e.getString(0)} q$i: exact=$ev approx=$av")
      }
    }
    approxDf.collect() // materialize so the AQE-final plan is inspectable
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"approx_percentile should run as a mergeable ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_"),
      s"expected a map-side partial aggregation phase:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"the sketch must merge after a hash shuffle, not on one node:\n$plan")
  }

  test("topKSq8 plan: partial top-k before the exchange, broadcasts everywhere it matters") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.pipeline.Similarity.topKSq8(e)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // Spark 4's rank-limit pushdown: each partition keeps only its own
    // top-C/top-k rows before anything moves
    assert(plan.contains("WindowGroupLimit"),
      s"expected partial top-k (WindowGroupLimit) in:\n$plan")
    // the 1-row quantizer params and the C-row shortlist both broadcast
    assert(plan.contains("BroadcastExchange"), s"expected broadcasts in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join belongs in the SQ8 path:\n$plan")
  }

  test("zorder skippingStats plan: no window operator anywhere (agg-only layout math)") {
    val ev = graft.sources.Bars.readEvents(spark, "/root/testdata/sf0.001")
    val df = graft.sources.Zorder.skippingStats(ev, col("user_id"), col("value"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the deliberate design point: equal-width binning instead of
    // rank/ntile means NO Window operator — nothing that would need a
    // global sort at 100 TB
    assert(!plan.contains("Window"),
      s"zorder layout math must stay rank-free:\n$plan")
  }
}
