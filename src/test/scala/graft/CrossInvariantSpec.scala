package graft

import org.apache.spark.sql.functions._

/** Cross-operator invariants on the real sf0.001 corpus — relations
  * BETWEEN declared operators that no single-query oracle can check
  * (each oracle mirrors one query; these pin that the family agrees
  * with itself).
  */
class CrossInvariantSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("events_attribution: last touch wins, window excludes, unattributed priced at -1") {
    import spark.implicits._
    // user 1: clicks ch 7 @t10, ch 9 @t20; purchase @t25 -> ch 9 (last touch)
    // user 2: click ch 3 @t0; purchase @t0 + 7h -> outside 6h window -> -1
    // user 3: purchase, no clicks at all -> -1
    val h = 3600000000L
    val rows = Seq(
      (1L, 1L, "click", 0.0, 10L * h, "{\"k\": 7}"),
      (2L, 1L, "click", 0.0, 20L * h, "{\"k\": 9}"),
      (3L, 1L, "purchase", 10.0, 25L * h, "{\"k\": 1}"),
      (4L, 2L, "click", 0.0, 0L, "{\"k\": 3}"),
      (5L, 2L, "purchase", 20.5, 7L * h, "{\"k\": 1}"),
      (6L, 3L, "purchase", 5.25, 50L * h, "{\"k\": 1}"))
      .toDF("event_id", "user_id", "event_type", "value", "us", "props")
    // inline the query body against a pre-computed micros column
    val e = rows.withColumn("channel",
      regexp_extract(col("props"), "(\\d+)", 1).cast("int"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("us").as("pus"),
        floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"), col("event_id").as("cid"),
        col("channel"))
    val best = p.join(c, Seq("user_id"))
      .where(col("cus") < col("pus") && col("pus") - col("cus") <= lit(6L * h))
      .groupBy("pid")
      .agg(max(struct(col("cus"), col("cid"), col("channel"))).as("b"))
      .select(col("pid"), col("b.channel").as("channel"))
    val out = p.join(best, Seq("pid"), "left")
      .select(coalesce(col("channel"), lit(-1)).as("channel"), col("cents"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .orderBy("channel").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((-1, 2L, 2575L), (9, 1L, 1000L)))
  }

  test("datasheet sketch card: witnesses equal the exact card, estimator inside its error band") {
    // the sketch card's exact-witness columns must be THE SAME figures
    // the exact card publishes (one source of truth), and the KMV
    // estimate must sit inside a generous k=256 error band (stderr
    // ~1/sqrt(k) ≈ 6.3%; band 20% — catches a broken estimator, not
    // sketch noise)
    val dir = "/root/testdata/sf0.001"
    val exact = QueriesPipeline.queries("corpus_datasheet")(spark, dir).head
    val sk = QueriesPipeline.queries("corpus_datasheet_sketch")(spark, dir).head
    Seq("n_docs", "n_sources", "n_langs", "n_tokens", "n_chars").foreach { c =>
      assert(sk.getAs[Long](c) == exact.getAs[Long](c), c)
    }
    assert(sk.getAs[Long]("exact_dup_pm") == exact.getAs[Long]("exact_dup_pm"))
    assert(sk.getAs[Double]("p50_tokens_exact") == exact.getAs[Double]("p50_tokens"))
    assert(sk.getAs[Double]("p90_tokens_exact") == exact.getAs[Double]("p90_tokens"))
    val nDocs = exact.getAs[Long]("n_docs").toDouble
    val exactDistinct = nDocs * (1000L - exact.getAs[Long]("exact_dup_pm")) / 1000.0
    val est = sk.getAs[Double]("est_distinct_docs")
    assert(math.abs(est - exactDistinct) / exactDistinct < 0.20,
      s"KMV estimate $est vs ~$exactDistinct distinct docs")
  }

  test("pure sketch card equals the witnessed card's sketch figures") {
    // corpus_datasheet_sketch_pure is the witnessed card minus the
    // witnesses — its counters and sketch estimates must be the SAME
    // numbers (one estimator, one sample), and the below-k KMV source/
    // lang estimates must equal the exact cardinalities the witnessed
    // card still countDistincts.
    val dir = "/root/testdata/sf0.001"
    val w = QueriesPipeline.queries("corpus_datasheet_sketch")(spark, dir).head
    val p = QueriesPipeline.queries("corpus_datasheet_sketch_pure")(spark, dir).head
    Seq("n_docs", "n_tokens", "n_chars").foreach(c =>
      assert(p.getAs[Long](c) == w.getAs[Long](c), c))
    Seq("est_distinct_docs", "est_dup_pm", "p50_tokens_est", "p90_tokens_est")
      .foreach(c => assert(p.getAs[Double](c) == w.getAs[Double](c), c))
    val exact = QueriesPipeline.queries("corpus_datasheet")(spark, dir).head
    assert(p.getAs[Double]("est_sources") == exact.getAs[Long]("n_sources").toDouble)
    assert(p.getAs[Double]("est_langs") == exact.getAs[Long]("n_langs").toDouble)
  }

  test("pure sketch card plan: no distinct aggregate, no Expand, percentile only above a bounded limit") {
    // THE gate the sketch tier exists for (r17 verdict What's-missing
    // #1): the witnessed card deliberately carries exact witnesses, so
    // its declared plan still pays the full-width distinct shuffle and
    // the exact-percentile buffer. The pure card is the 100 TB
    // spelling — assert structurally that nothing unbounded survived
    // optimization.
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, GlobalLimit}
    val df = QueriesPipeline
      .queries("corpus_datasheet_sketch_pure")(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan
    // 1. no exact distinct aggregation anywhere — the full-width
    //    distinct shuffle is exactly what the KMV sketch replaces
    val distincts = opt.collect { case a: Aggregate =>
      a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression if ae.isDistinct => ae })
    }.flatten
    assert(distincts.isEmpty, s"distinct aggregates survived: $distincts")
    // 2. no Expand — the multi-distinct rewrite that multiplies the scan
    assert(opt.collect { case e: Expand => e }.isEmpty, "Expand in plan")
    // 3. every Percentile aggregate sits above a bounded limit (the
    //    256-row sample), never over the full corpus; and the sample
    //    percentiles are actually present (the gate can't pass vacuously)
    val percAggs = opt.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
        case ae: AggregateExpression =>
          ae.aggregateFunction.isInstanceOf[Percentile]
        case _ => false
      }) => a
    }
    assert(percAggs.nonEmpty, "sample percentiles missing from the plan")
    percAggs.foreach(a =>
      assert(a.exists { case _: GlobalLimit => true; case _ => false },
        s"percentile over an unbounded input:\n$a"))
    // 4. physical double-check: the sample executes as a partial top-k
    val exec = df.queryExecution.executedPlan.toString
    assert(!exec.contains("Expand") && !exec.contains("(distinct"))
    assert(exec.contains("TakeOrderedAndProject"),
      "sample must execute as per-partition top-k")
  }

  test("per-source sampled quantiles: WindowGroupLimit bounds group state; below-k groups are exact") {
    // source_robust_stats_sketch closes the "approx_percentile at
    // 100 TB" commentary: the per-source rank must execute as a
    // WindowGroupLimit partial top-k (128 rows per group before the
    // shuffle, never a full-group percentile buffer), and wherever the
    // sample covers the whole source (sf0.001: 25 docs/source < 128)
    // the estimate IS the exact figure — the below-k exactness the
    // KMV tier also relies on. Real sampling error is measured at
    // sf0.1 (250 docs/source; recorded in SURVEY §8).
    val df = QueriesPipeline
      .queries("source_robust_stats_sketch")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-source sample must rank-limit before the shuffle:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sample") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("median_rel_err") == 0.0, r.getAs[String]("source"))
      assert(r.getAs[Double]("mad_rel_err") == 0.0, r.getAs[String]("source"))
    }
  }

  test("timeBucket is true floor division for either timestamp sign") {
    import spark.implicits._
    // truncating div would put -1us in bucket 0 (one high); floor puts
    // it in bucket -1 — the wrong-bucket silent-drop the r16 advice
    // flagged. Pin the algebra across the sign boundary and bucket edges.
    val w = 21600000000L
    val got = Seq(-w - 1L, -w, -1L, 0L, 1L, w - 1L, w, 2L * w)
      .toDF("us")
      .select(graft.sources.Bars.timeBucket("us", w).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 0L, 1L, 2L))
  }

  test("corpus_sample_fixed_n plan is partial top-k (TakeOrdered), never a global sort") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = QueriesPipeline.queries("corpus_sample_fixed_n")
    val df = q(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"fixed-N sample must be a partial top-k:\n$plan")
    assert(df.count() == math.min(100L, d.count()))
  }

  test("exact duplicates land in one winnow cluster (long docs)") {
    // Any two identical documents of >= w+n-1 tokens share every
    // fingerprint, so winnow clustering must put them in the same
    // component — the cross-check between the exact-dedup and
    // winnow-dedup families.
    // sf0.001 has no exact dups among long docs — plant verbatim
    // copies of five REAL long documents under fresh ids
    val base = docs.select(col("doc_id"), col("text"))
    val sources = base
      .where(size(split(col("text"), " ")) >= 11)
      .orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val copies = sources.zipWithIndex.map { case ((_, t), i) =>
      (100000L + i, t)
    }
    import spark.implicits._
    val d = base.union(copies.toSeq.toDF("doc_id", "text"))
    val dupGroups = sources.zipWithIndex.map { case ((id, _), i) =>
      Seq(id, 100000L + i)
    }.toSeq
    val clusters = graft.pipeline.Dedup.clusters(
        graft.pipeline.Corpus.winnowCandidatePairs(d).select("doc_a", "doc_b"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    dupGroups.foreach { ids =>
      val cs = ids.flatMap(clusters.get).distinct
      assert(cs.length == 1 && ids.forall(clusters.contains),
        s"exact-dup group $ids split across winnow clusters $cs")
    }
  }

  test("vocab coverage is monotone in K and bounded by 1") {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occ"))
    val (ranked, _) = graft.plans.Scale.rowNumberDistributedWithTotal(
      counts, Seq(col("n_occ").desc, col("token").asc), "rank")
    val tot = counts.agg(sum("n_occ")).head.getLong(0)
    val cov = Seq(100L, 1000L, 10000L).map { k =>
      ranked.where(col("rank") <= k)
        .agg(coalesce(sum("n_occ"), lit(0L))).head.getLong(0).toDouble / tot
    }
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c >= 0.0 && c <= 1.0))
    spark.catalog.clearCache()
  }

  test("curriculum cumulative tokens end at the corpus total") {
    val scored = graft.pipeline.Corpus.qualityModelScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("logit"))
    val ranked = graft.plans.Scale.rowNumberDistributed(
      scored, Seq(col("logit").desc, col("doc_id").asc), "curriculum_pos")
    val cum = graft.plans.Scale
      .cumSumDistributedLong(ranked, "n_tokens", "curriculum_pos", "cum_tokens")
    val last = cum.agg(max("cum_tokens")).head.getLong(0)
    val tot = scored.agg(sum("n_tokens")).head.getLong(0)
    assert(last == tot && tot > 0)
    spark.catalog.clearCache()
  }

  test("shard stats cover every doc and the full token mass") {
    val a = graft.pipeline.Corpus.shardAssign(docs)
    val byShard = a.groupBy("shard")
      .agg(count(lit(1)).as("nd"), sum("n_tokens").as("nt"))
      .agg(sum("nd"), sum("nt")).head
    val total = a.agg(count(lit(1)), sum("n_tokens")).head
    assert(byShard.getLong(0) == total.getLong(0))
    assert(byShard.getLong(1) == total.getLong(1))
  }

  test("dsir feature count is exactly 2n-1 of the text-stats token count") {
    // unigrams + bigrams of an n-token doc = n + (n-1); the DSIR
    // hashed-feature explode and the text_stats tokenizer must agree
    // on n — the cross-check between the two families' tokenization.
    val w = graft.pipeline.Corpus
      .dsirWeights(docs, col("source") === "src1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == n.keySet)
    w.foreach { case (id, feats) =>
      assert(feats == 2 * n(id) - 1, s"doc $id: $feats vs 2*${n(id)}-1")
    }
  }

  test("equal perceptual hashes appear as hamming-0 pairs in the band graph") {
    // every same-ahash pair the exact tier groups must surface in the
    // banded pair graph with hamming 0 (all 8 bands collide) — the
    // cross-check between the two phash consumers of AHashChain.
    val h = graft.pipeline.AHashChain
      .imageHashes(spark, "/root/testdata/sf0.001", docs)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = h.groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    assert(expected.nonEmpty, "fixture must contain exact perceptual dups")
    val pairs = graft.pipeline.Multimodal.aHashPairs(
        graft.pipeline.AHashChain.imageHashes(spark, "/root/testdata/sf0.001", docs))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    expected.foreach { p =>
      assert(pairs.get(p).contains(0L), s"pair $p missing or hamming != 0")
    }
  }

  test("singleton docs get the same split from the plain and leakage-safe splitters") {
    // docs outside every near-dup cluster key by their own id, so the
    // two splitters must agree on them exactly — and disagree only
    // inside clusters.
    val dir = "/root/testdata/sf0.001"
    val clustered = graft.pipeline.DedupChain.clusterLabels(spark, dir, docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val safe = SparkEntry.queries("corpus_split_leakage_safe")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val plain = SparkEntry.queries("corpus_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    safe.keys.filterNot(clustered).foreach { id =>
      assert(safe(id) == plain(id), s"singleton $id: ${safe(id)} vs ${plain(id)}")
    }
  }

  test("yield funnel: monotone, drops reconcile, stage 0 is the corpus, gates agree") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("corpus_yield_report")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0 until 7), "seven ordered stages")
    // stage 0 = raw corpus totals
    val d = docs
    assert(rows(0)._2 == d.count())
    // monotone survivors + drop columns reconcile with the diffs
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 <= p._2 && c._3 <= p._3, s"funnel must be monotone: $p -> $c")
      assert(c._4 == p._2 - c._2 && c._5 == p._3 - c._3,
        s"drop accounting broken: $p -> $c")
    }
    // stage agreement with the declared component gates: exact-dedup
    // survivors = distinct texts; near-dup stage drops exactly the
    // staged non-canonicals among them
    import org.apache.spark.sql.functions.{col, md5}
    assert(rows(1)._2 == d.select(md5(col("text"))).distinct().count())
    // badwords stage (final) never drops a doc the badwords gate keeps
    val bwDropped = rows(4)._2 - rows(5)._2
    val bwFails = graft.pipeline.TextOps.badwordsStats(d)
      .where(!col("keep")).count()
    assert(bwDropped <= bwFails,
      "funnel cannot drop more badwords failures than exist corpus-wide")
  }

  test("cluster-safe shards: members co-sharded, all shards populated and bounded") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("shard_assign_cluster_safe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one shard per key — a near-dup cluster can never straddle shards
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._4).distinct.length == 1, s"cluster split across shards: $g")
    }
    // the invariant is non-vacuous: some cluster has >1 member
    assert(rows.groupBy(_._2).values.exists(_.length > 1))
    // every shard id in range and populated (token-balanced prefix)
    val shards = rows.map(_._4).distinct.sorted
    assert(shards.forall(s => s >= 0 && s < 8) && shards.length == 8)
    // token balance: no shard above 2x the ideal share (clusters are
    // small relative to the corpus, so the prefix plan stays tight)
    val tok = rows.groupBy(_._4).map { case (s, g) => s -> g.map(_._3).sum }
    val ideal = rows.map(_._3).sum / 8.0
    tok.values.foreach(t => assert(t < 2 * ideal, s"shard imbalance: $tok"))
  }

  test("containment bounds Jaccard on every LSH candidate pair; subset docs hit 1.0") {
    import graft.pipeline.Dedup
    import spark.implicits._
    // real corpus: J(A,B) <= min(C(A->B), C(B->A)) <= max <= 1, pairwise
    val pairs = Dedup.lshCandidatePairs(docs)
    val j = Dedup.jaccardPairs(pairs, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val c = Dedup.containmentPairs(pairs, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(c.nonEmpty && c.keySet == j.keySet)
    c.foreach { case (k, (ca, cb)) =>
      assert(j(k) <= math.min(ca, cb) + 1e-12 && math.max(ca, cb) <= 1.0 + 1e-12,
        s"containment/Jaccard ordering violated on $k: j=${j(k)} ca=$ca cb=$cb")
    }
    // hand fixture: doc 1 is a verbatim prefix of doc 2 -> every shingle
    // of 1 appears in 2 -> containment_a = 1.0 while Jaccard < 1
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val sub = Seq(
      (1L, base),
      (2L, base + " " + (13 to 30).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(
        Seq((1L, 2L)).toDF("doc_a", "doc_b"), sub)
      .collect().head
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) < 1.0)
  }
}
