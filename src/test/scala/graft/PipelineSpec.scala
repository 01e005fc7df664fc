package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{Dedup, Multimodal, Sessionize, Similarity, TextOps}

class PipelineSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map { case (id, t) => Row(id, t, s"src$id") }.asJava, docSchema)

  test("hash32 matches the DuckDB formula on a known md5") {
    // md5('hello') = 5d41402a... -> 0x5d41402a = 1564557354
    val out = docs((1L, "hello"))
      .select(TextOps.hash32(col("text")).as("h")).collect()
    assert(out.head.getLong(0) == 1564557354L)
  }

  test("ChainBill bills a build once; the memo never re-bills a served chain") {
    import graft.pipeline.{BigramChain, ChainBill}
    val key = s"chainbill-test-${System.nanoTime()}"
    val d = docs((1L, "a b c d e"), (2L, "b c d e f"))
    val b0 = ChainBill.snapshot.getOrElse("BigramChain", 0L)
    BigramChain.model(spark, key, d).count()
    val b1 = ChainBill.snapshot.getOrElse("BigramChain", 0L)
    assert(b1 >= b0, "build must be billed (>= 0 ms recorded)")
    assert(ChainBill.totalMs >= b1)
    BigramChain.model(spark, key, d).count()
    val b2 = ChainBill.snapshot.getOrElse("BigramChain", 0L)
    assert(b2 == b1, "a memo hit must not re-bill the chain")
    // direct ledger arithmetic: time() adds the elapsed wall
    val t0 = ChainBill.snapshot.getOrElse("TestChain", 0L)
    assert(ChainBill.time("TestChain") { Thread.sleep(15); 42 } == 42)
    assert(ChainBill.snapshot.getOrElse("TestChain", 0L) - t0 >= 10)
  }

  test("hash32Jvm is bit-identical to the hash32 column") {
    // the JVM twin feeds streaming keyed state (quantileSketchStream,
    // fixedNStream) whose batch fixed points use the COLUMN spelling —
    // any divergence silently breaks those equalities. Pins the known
    // value and a spread of shapes (empty, unicode, long, salt-prefixed).
    assert(TextOps.hash32Jvm("hello") == 1564557354L)
    val samples = Seq("", "a", "héllo wörld", "qs_12345", "fixn:999",
      "x" * 1000, "dsq_42")
    val viaCol = spark.createDataFrame(
      samples.zipWithIndex.map { case (s, i) => Row(i.toLong, s, "src") }.asJava,
      docSchema)
      .select(col("doc_id"), TextOps.hash32(col("text")).as("h")).collect()
      .map(r => samples(r.getLong(0).toInt) -> r.getLong(1)).toMap
    samples.foreach(s => assert(TextOps.hash32Jvm(s) == viaCol(s), s"on '$s'"))
  }

  test("shingles are word 3-grams") {
    val out = docs((1L, "a b c d"))
      .select(TextOps.shingles(col("text")).as("sh")).collect()
    assert(out.head.getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("bloom decontamination flags bench overlap, map-only probe") {
    val bench = docs((0L, "alpha beta gamma delta epsilon zeta"))
    val corpus = docs(
      (0L, "alpha beta gamma delta epsilon zeta"), // the bench doc itself
      (1L, "alpha beta gamma delta unrelated tail here"), // shares 4-grams
      (2L, "totally different words with no overlap at all"))
    val bm = Dedup.bloomBitmap(bench)
    // every bench position is set in the bitmap
    assert(bm.exists(_ != 0L))
    val out = Dedup.bloomDecontaminate(corpus, bm).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Boolean]("contaminated")) // shared 4-gram "alpha beta gamma delta"
    assert(!out(2).getAs[Boolean]("contaminated"))
    // doc 0 has all its grams hit; doc 1 exactly one
    assert(out(0).getAs[Long]("n_hit_grams") == 3L)
    assert(out(1).getAs[Long]("n_hit_grams") == 1L)
  }

  test("bloom false positives appear under load and are never false negatives") {
    // An undersized bitmap (32 bits, 1 hash) forces position
    // collisions: a corpus with NO bench overlap must show at least
    // one false-positive gram (deterministic — fixed strings, fixed
    // hashes), while every true bench gram still hits (Bloom filters
    // have no false negatives by construction).
    val bench = docs((0L, "alpha beta gamma delta epsilon zeta"))
    val disjoint = docs((1L,
      (1 to 40).map(i => s"tok$i").mkString(" "))) // 37 distinct 4-grams, zero overlap
    val bm = Dedup.bloomBitmap(bench, mBits = 32, kHash = 1)
    val fp = Dedup.bloomDecontaminate(disjoint, bm, mBits = 32, kHash = 1)
      .collect().head
    assert(fp.getAs[Long]("n_hit_grams") > 0L,
      "expected at least one false-positive gram on a 32-bit bitmap")
    val tp = Dedup.bloomDecontaminate(bench, bm, mBits = 32, kHash = 1)
      .collect().head
    assert(tp.getAs[Long]("n_hit_grams") == 3L, "no false negatives: all 3 bench grams hit")
  }

  test("bloom probe and redactPii plans are map-only: no Exchange of any kind") {
    val d = docs((1L, "alpha beta gamma delta epsilon"), (2L, "other words entirely"))
    val bm = Dedup.bloomBitmap(docs((9L, "alpha beta gamma delta epsilon")))
    Seq(
      "bloom" -> Dedup.bloomDecontaminate(d, bm),
      "redact" -> graft.pipeline.Corpus.redactPii(d)).foreach { case (name, df) =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name claims a shuffle-free map pass but the plan has an Exchange:\n$plan")
    }
  }

  test("canonicalUrl merges www/tracking/param-order/default-port variants, keeps real differences") {
    import spark.implicits._
    val urls = Seq(
      "https://WWW.Example.com/x?utm_source=feed&a=1",
      "https://example.com:443/x?a=1",          // same resource
      "https://example.com/x?a=1&utm_campaign=q#frag", // same again
      "https://example.com/x?b=2&a=1",          // extra real param: DIFFERENT
      "https://example.com/x?a=1&b=2",          // ...but param order collapses
      "https://example.com:8443/x?a=1",         // non-default port: DIFFERENT
      "http://example.com",                     // empty path -> '/'
      "http://example.com/")
    val out = urls.toDF("u")
      .select(pipeline.Corpus.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "https://example.com/x?a=1")
    assert(out(1) == out(0) && out(2) == out(0))
    assert(out(3) == "https://example.com/x?a=1&b=2")
    assert(out(4) == out(3) && out(3) != out(0))
    assert(out(5) == "https://example.com:8443/x?a=1" && out(5) != out(0))
    assert(out(6) == "http://example.com/" && out(7) == out(6))
  }

  test("rateSample: map-only plan, deterministic, and keep-sets NEST across rates") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half = pipeline.Corpus.rateSample(d, Map.empty, defaultPm = 5000)
    half.collect()
    val plan = half.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"rateSample claims a shuffle-free map pass but the plan has an Exchange:\n$plan")
    def keptIds(pm: Int) =
      pipeline.Corpus.rateSample(d, Map.empty, defaultPm = pm)
        .where(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val (q, h, f) = (keptIds(2500), keptIds(5000), keptIds(10000))
    // nesting: raising the rate only ADDS documents
    assert(q.subsetOf(h) && h.subsetOf(f))
    assert(f.size == d.count(), "rate 100% keeps everything")
    // buckets are roughly uniform: 50% rate keeps 35-65% of 500 docs
    assert(h.size > 175 && h.size < 325, s"suspicious 50% keep count ${h.size}")
    // per-source override beats the default
    val overridden = pipeline.Corpus.rateSample(d, Map("src0" -> 0), defaultPm = 10000)
      .where(col("source") === "src0" && col("kept")).count()
    assert(overridden == 0L)
  }

  test("redactPii replaces email, ip, phone in order with exact counts") {
    val d = docs((1L, "mail me at a.b@x.co or 10.1.2.3 tel +44 20-7946 0958 end"))
    val out = graft.pipeline.Corpus.redactPii(d).collect().head
    assert(out.getAs[Long]("n_emails") == 1L)
    assert(out.getAs[Long]("n_ips") == 1L)
    assert(out.getAs[Long]("n_phones") == 1L)
    val expected = "mail me at <EMAIL> or <IP> tel <PHONE> end"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getAs[String]("redacted_md5") == md)
  }

  test("packSemanticOrder groups cells contiguously; packSemanticGain closed form") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // ingest order interleaves cells A/B; semantic order must regroup
    val d = docs((1L, words(10)), (2L, words(20)), (3L, words(30)), (4L, words(40)))
    val cells = Seq((1L, 7), (2L, 3), (3L, 7), (4L, 3)).toDF("doc_id", "cid")
    val out = graft.pipeline.Corpus.packSemanticOrder(d, cells, ctx = 32L)
      .orderBy("start_offset").collect()
    // cell 3 docs (2, 4) pack before cell 7 docs (1, 3), id-ordered within
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 4L, 1L, 3L))
    assert(out.map(_.getAs[Long]("start_offset")).toSeq == Seq(0L, 20L, 60L, 70L))
    val g = graft.pipeline.Corpus.packSemanticGain(d, cells).collect().head
    // semantic adjacency: 4 docs - 2 cells = 2 of 3 pairs; ingest: 0
    assert(g.getAs[Long]("sem_same") == 2L && g.getAs[Long]("id_same") == 0L)
    assert(g.getAs[Long]("sem_milli") == 666L && g.getAs[Long]("gain_milli") == 666L)
  }

  test("packPaddingAudit: closed-form strategy math on hand-computed lengths") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = docs((1L, words(5)), (2L, words(40)), (3L, words(600)))
    val out = graft.pipeline.Corpus.packPaddingAudit(d).collect()
      .map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_sequences"), r.getAs[Long]("padded_tokens"),
         r.getAs[Long]("docs_split"), r.getAs[Long]("waste_micro"))).toMap
    // T = 645; concat: 2 windows, 1024-645=379 pad, doc3 straddles
    assert(out("concat_split") == ((2L, 379L, 1L, 370117L)))
    // per-doc: 1+1+2 seqs, 507+472+424 pad, doc3 over ctx
    assert(out("per_doc_pad") == ((4L, 1403L, 1L, 685059L)))
    // buckets: 5->32 (27), 40->64 (24), 600 = 512 + r 88 -> 128 (40)
    assert(out("bucket_pad") == ((4L, 91L, 1L, 123641L)))
  }

  test("piiReport aggregates the staged redactPii counts by source") {
    val rows = Seq(
      Row(1L, "mail a.b@x.co and c.d@y.org here", "sa"),
      Row(2L, "clean words only", "sa"),
      Row(3L, "node 10.1.2.3 tel +44 20-7946 0958", "sb")).asJava
    val out = graft.pipeline.Corpus.piiReport(
        spark.createDataFrame(rows, docSchema))
      .orderBy("source").collect()
    assert(out.length == 2)
    val sa = out(0)
    assert(sa.getAs[Long]("n_docs") == 2L && sa.getAs[Long]("docs_with_pii") == 1L)
    assert(sa.getAs[Long]("emails") == 2L && sa.getAs[Long]("pii_total") == 2L)
    assert(sa.getAs[Long]("pii_doc_micro") == 500000L)
    val sb = out(1)
    assert(sb.getAs[Long]("ips") == 1L && sb.getAs[Long]("phones") == 1L)
    assert(sb.getAs[Long]("pii_doc_micro") == 1000000L)
  }

  test("exact dedup groups identical texts") {
    val d = docs((1L, "same text here"), (2L, "same text here"), (3L, "different"))
    val g = Dedup.exactGroups(d).orderBy("canonical_doc_id").collect()
    assert(g.length == 2)
    assert(g.head.getAs[Long]("n_docs") == 2 && g.head.getAs[Long]("canonical_doc_id") == 1)
  }

  test("LSH candidates include identical docs; jaccard is 1 for them") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated words that share nothing at all ok"))
    val pairs = Dedup.lshCandidatePairs(d).collect()
    assert(pairs.exists(r => r.getLong(0) == 1 && r.getLong(1) == 2))
    val j = Dedup.jaccardPairs(Dedup.lshCandidatePairs(d), d)
      .where("doc_a = 1 AND doc_b = 2").collect()
    assert(j.head.getAs[Double]("jaccard") == 1.0)
  }

  test("incremental candidates = full pairs filtered to delta; no old×old") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),   // old dup of 1
      (10L, "alpha beta gamma delta epsilon zeta"),  // NEW dup of 1 & 2
      (20L, "alpha beta gamma delta epsilon other"), // NEW near-dup
      (3L, "totally unrelated words that share nothing at all ok"))
    val sigs = Dedup.minhashSignatures(d)
    val isNew = col("doc_id") >= 10
    val inc = Dedup.incrementalCandidatePairs(
        sigs.where(!isNew), sigs.where(isNew))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_new")))
    // equality with the filtered full pair set
    val full = Dedup.lshCandidatePairsFromSigs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a >= 10 || b >= 10 }
      .map { case (a, b) =>
        (a, b, (if (a >= 10) 1L else 0L) + (if (b >= 10) 1L else 0L)) }
    assert(inc.toSet == full.toSet && inc.nonEmpty)
    assert(inc.length == inc.map(p => (p._1, p._2)).distinct.length)
    // the old×old dup pair (1,2) must NOT appear
    assert(!inc.exists(p => p._1 == 1L && p._2 == 2L))
    // the cross pairs carry n_new=1, the new×new pair n_new=2
    assert(inc.filter(p => p._1 < 10 && p._2 >= 10).forall(_._3 == 1L))
    assert(inc.filter(p => p._1 >= 10 && p._2 >= 10).forall(_._3 == 2L))
  }

  test("normalize: case/control/whitespace canonicalized, md5 keys dedup") {
    val d = docs(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello\tworld"),
      (4L, "already clean"))
    val out = graft.pipeline.Corpus.normalize(d).orderBy("doc_id").collect()
    val norm = out.map(_.getAs[String]("text_norm"))
    assert(norm.take(3).forall(_ == "hello world"))
    val md5s = out.map(_.getAs[String]("norm_md5"))
    assert(md5s(0) == md5s(1) && md5s(1) == md5s(2))
    assert(out.map(_.getAs[Boolean]("changed")).toSeq ==
      Seq(true, false, true, false))
    assert(out.forall(r =>
      r.getAs[Long]("n_chars_norm") <= r.getAs[Long]("n_chars_raw")))
    // composes with exact dedup: the three normalized dups group
    val g = Dedup.exactGroups(
      graft.pipeline.Corpus.normalize(d)
        .select(col("doc_id"), col("text_norm").as("text")))
      .orderBy(col("n_docs").desc).collect()
    assert(g.head.getAs[Long]("n_docs") == 3L)
  }

  test("count-min sketch: est >= exact always; exact when w has no collisions") {
    val d = docs(
      (1L, "a a a a b b c"),
      (2L, "a b c d e f g"))
    val out = graft.pipeline.Corpus.cmsCounts(d, d = 4, w = 64, k = 10)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("est_cnt"), r.getAs[Long]("overcount")))
      .toMap
    assert(out("a")._1 == 5L)
    out.values.foreach { case (cnt, est, over) =>
      assert(est >= cnt && over == est - cnt && over >= 0)
    }
    // 7 distinct tokens in 4x64 buckets: with 4 independent rows a
    // token keeps at least one collision-free row w.h.p. — est exact
    assert(out.values.forall { case (cnt, est, _) => est == cnt })
    // tiny w forces collisions: total mass conservation still holds
    val crowded = graft.pipeline.Corpus.cmsCounts(d, d = 2, w = 2, k = 10)
      .collect()
    crowded.foreach(r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("cnt")))
    assert(crowded.exists(r => r.getAs[Long]("overcount") > 0),
      "2 buckets for 7 tokens must collide somewhere")
  }

  test("budget sample: exclusive prefix fits budget, crossing doc kept, deterministic") {
    val rows = (1L to 20L).map { i =>
      val src = if (i <= 15) "big" else "small"
      Row(i, (1 to 10).map(j => s"w${i}_$j").mkString(" "), src)
    }
    val d = spark.createDataFrame(rows.asJava, docSchema)
    val out = graft.pipeline.Corpus.budgetSample(d, 60L)
      .orderBy("source", "cum_tokens").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, cum, budget) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("budget_tokens"))
      assert(cum - n < budget, "tokens before a kept doc must fit the budget")
    }
    // per source: the kept set is a prefix — max cum >= budget means the
    // crossing doc was kept (each source here has plenty of tokens)
    val bySrc = out.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("cum_tokens")).max >=
        rs.head.getAs[Long]("budget_tokens"))
    }
    // budgets split per sqrt-temperature weights over a 60-token total
    assert(bySrc.keySet == Set("big", "small"))
    // deterministic: second run identical
    val again = graft.pipeline.Corpus.budgetSample(d, 60L)
      .orderBy("source", "cum_tokens").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("minhash estimate: 8/8 agreement for identical docs, monotone with overlap") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon different tail words here"),
      (4L, "totally unrelated words that share nothing at all ok"))
    val sigs = Dedup.minhashSignatures(d)
    val est = Dedup.minhashEstimate(Dedup.lshCandidatePairs(d), sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard"))).toMap
    assert(est((1L, 2L)) == (8L, 1.0))
    // every estimate is n/8 for integer n in [0, 8]
    est.values.foreach { case (n, e) =>
      assert(n >= 0 && n <= 8 && e == n / 8.0)
    }
    // the partial-overlap pair (if banded together) agrees on fewer
    // components than the identical pair
    est.get((1L, 3L)).foreach { case (n, _) => assert(n < 8) }
  }

  test("fuzzyContamination flags near-dups of bench docs, excludes self, covers all docs") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),   // bench doc (1 % 1 scheme below)
      (2L, "alpha beta gamma delta epsilon zeta"),   // identical to bench -> flagged, est 1.0
      (3L, "totally unrelated words that share nothing at all ok"),
      (4L, "more disjoint content with zero shingle overlap anywhere"))
    val sigs = Dedup.minhashSignatures(d)
    val out = Dedup.fuzzyContamination(d, sigs, sigs.where(col("doc_id") === 1))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_bench_candidates"),
        r.getAs[Double]("max_est_jaccard"), r.getAs[Boolean]("contaminated")))
    // every input doc appears exactly once, including the bench doc itself
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // the bench doc does NOT flag on its self-pair
    assert(out(0) == (1L, 0L, 0.0, false))
    // the verbatim copy is flagged with a perfect signature estimate
    assert(out(1) == (2L, 1L, 1.0, true))
    // disjoint docs are clean
    assert(out(2)._4 == false && out(3)._4 == false)
  }

  test("simhash identical for identical docs, int32 range") {
    val d = docs((1L, "one two three four"), (2L, "one two three four"), (3L, "five six seven"))
    val out = Dedup.simhashes(d).orderBy("doc_id").collect().map(_.getLong(1))
    assert(out(0) == out(1))
    assert(out.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("simhashBits matches the per-bit vote formula and its null quirks") {
    val schema = StructType(Seq(
      StructField("th", ArrayType(LongType, containsNull = true))))
    val rows = Seq(
      Row(Seq(0b1011L, 0b1001L, 0b0001L)), // bit0: 3-0, bit1: 1-2, bit3: 2-1
      Row(Seq.empty[Long]),                // no votes -> 0
      Row(null),                           // NULL array -> 0 (quirk)
      Row(Seq(3L, null, null))             // nulls vote -1 everywhere -> 1-2 on bits 0,1
    ).asJava
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(graft.functions.simhashBits(col("th")).as("s"))
      .collect().map(_.getLong(0))
    assert(out(0) == (1L | (1L << 3)))
    assert(out(1) == 0L)
    assert(out(2) == 0L)
    assert(out(3) == 0L)
    // offset shifts the bit positions into the high half
    val hi = df.select(graft.functions.simhashBits(col("th"), 32).as("s"))
      .collect().map(_.getLong(0))
    assert(hi(0) == ((1L << 32) | (1L << 35)))
    // interpreted eval (e.g. under a non-codegen parent) agrees
    val filtered = df.where(graft.functions.simhashBits(col("th")) === (1L | (1L << 3)))
    assert(filtered.count() == 1)
  }

  test("simhash64 splits halves by hash stream and simhashPairs64 finds near-dups") {
    // 40-token docs: one changed token shifts each bit's vote margin
    // by at most 2, so the near-dup lands at hamming 6 (computed with
    // an independent python md5 mirror) while the unrelated doc sits at
    // 33 — deterministic, since every vote is md5-derived.
    val base = (0 until 40).map(i => s"tok$i")
    val d = docs(
      (1L, base.mkString(" ")),
      (2L, (base.dropRight(1) :+ "changed").mkString(" ")),
      (3L, (0 until 40).map(i => s"other$i").mkString(" ")))
    val sh = Dedup.simhashes64(d).orderBy("doc_id").collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0), sh(1)) == 6)
    assert(ham(sh(0), sh(2)) == 33)
    val pairs = Dedup.simhashPairs64(d, maxHamming = 6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // banding config is validated
    intercept[IllegalArgumentException](Dedup.simhashPairs64(d, maxHamming = 9, bands = 8))
    intercept[IllegalArgumentException](Dedup.simhashPairs64(d, bands = 7))
  }

  test("dotFD matches element_at cast chain bit-for-bit") {
    val schema = StructType(Seq(StructField("e", ArrayType(FloatType))))
    val rows = Seq(Row(Seq(1.5f, -2.25f, 0.125f)), Row(Seq(0.1f, 0.2f, 0.3f))).asJava
    val df = spark.createDataFrame(rows, schema)
    val plane = Array(0.002, -0.754, 1.0)
    val viaChain = df.select(
      (0 until 3).map(d => element_at(col("e"), d + 1).cast("double") * lit(plane(d)))
        .reduce(_ + _).as("dot")).collect().map(_.getDouble(0))
    val viaF = df.select(graft.functions.dotFD(col("e"), typedlit(plane)).as("dot"))
      .collect().map(_.getDouble(0))
    assert(viaChain.toSeq == viaF.toSeq) // exact, not approximate
    // length mismatch -> NULL
    val mism = df.select(graft.functions.dotFD(col("e"), typedlit(Array(1.0, 2.0))).as("d"))
      .collect()
    assert(mism.forall(_.isNullAt(0)))
  }

  test("cosine is 1 for identical vectors and 0 for orthogonal") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val rows = Seq(
      Row(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      Row(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).asJava
    val out = spark.createDataFrame(rows, schema)
      .select(Similarity.cosine(col("a"), col("b")).as("c")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) == 0.0)
  }

  test("topK returns k ranked neighbors per query on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.topK(e, numQueries = 3, k = 4).collect()
    assert(out.length == 12)
    val perQuery = out.groupBy(_.getAs[Long]("query_id"))
    perQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val cosines = sorted.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("dotD matches the interpreted zip_with/aggregate fold exactly") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)), StructField("b", ArrayType(DoubleType))))
    val rows = Seq(
      Row(Seq(0.1, -2.5, 3.75, 1e-9), Seq(4.0, 0.25, -1.5, 1e9)),
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0))).asJava
    val out = spark.createDataFrame(rows, schema)
      .select(
        graft.functions.dotD(col("a"), col("b")).as("k"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("f"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("sq8Params: mins/spans are per-dimension min and max-min") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(0f, 10f, 7f)),
      Row(1L, Seq(5f, 20f, 7f))).asJava
    val p = Similarity.sq8Params(spark.createDataFrame(rows, schema)).collect()(0)
    assert(p.getSeq[Double](0) == Seq(0.0, 10.0, 7.0))
    // constant dimension -> span 0 (encode guards the division)
    assert(p.getSeq[Double](1) == Seq(5.0, 10.0, 0.0))
  }

  test("topKSq8: constant dimensions don't divide by zero; output ranked") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = (0L until 8L).map(i =>
      Row(i, Seq(i.toFloat, 1f, (i % 3).toFloat))).asJava
    val out = Similarity.topKSq8(
      spark.createDataFrame(rows, schema), numQueries = 2, k = 3, nCandidates = 5).collect()
    assert(out.length == 6)
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val cosines = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("topKSq8 recovers the exact top-k on real embeddings (recall 1 at C=20)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))
    val exact = Similarity.topK(e).collect().map(key).toSet
    val sq8 = Similarity.topKSq8(e).collect().map(key).toSet
    // 8-bit quantization is candidate-gen only; the exact re-rank of a
    // C=20 shortlist reproduces brute-force top-5 bit-for-bit here
    assert(sq8 == exact)
  }

  test("topKMrl: re-rank cosines are FULL-dim (match brute-force values on shared pairs)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pair(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")
    val exact = Similarity.topK(e, k = 20).collect().map(pair).toMap
    val mrl = Similarity.topKMrl(e).collect().map(pair).toMap
    // every mrl pair that brute-force also ranks must carry the IDENTICAL
    // full-dimension cosine — the re-rank is not a prefix approximation
    val shared = mrl.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(mrl(k) == exact(k)))
  }

  test("signBits: Horner packing puts dim 1 in the high bit; hamming = sign disagreements") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    // 4-dim hand case: (+,-,+,-) -> 1010b = 10; (+,+,-,-) -> 1100b = 12
    val rows = Seq(
      Row(0L, Seq(1f, -1f, 2f, -3f)), Row(1L, Seq(1f, 4f, -2f, -1f))).asJava
    val bits = spark.createDataFrame(rows, schema)
      .select(Similarity.signBits(col("embedding"))).collect().map(_.getLong(0))
    assert(bits.toSeq == Seq(10L, 12L))
    // xor = 0110b -> hamming 2 = the two dims whose signs disagree
    assert(java.lang.Long.bitCount(bits(0) ^ bits(1)) == 2)
  }

  test("topKBinary: re-rank cosines are exact; hamming shortlist keeps high recall at C=20") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pair(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")
    val exact = Similarity.topK(e, k = 20).collect().map(pair).toMap
    val bin = Similarity.topKBinary(e).collect().map(pair).toMap
    // shared pairs carry the IDENTICAL float cosine — binary quantization
    // is candidate generation only, never the served score
    val shared = bin.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(bin(k) == exact(k)))
    // 1-bit recall floor vs brute top-5: 64 sign bits retain enough
    // angular signal on the isotropic fixture to recover most of top-5
    val top5 = Similarity.topK(e).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = bin.keySet.count(top5)
    assert(hits >= (top5.size * 0.5).toInt,
      s"binary recall collapsed: $hits of ${top5.size}")
  }

  test("knnGraph: shape (n·k rows, no self-edges, ranked) and NN-descent recall vs brute") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = e.count()
    val out = Similarity.knnGraph(e).collect()
    assert(out.length == n * 4)
    out.foreach(r => assert(r.getAs[Long]("vec_id") != r.getAs[Long]("neighbor_id"),
      "NN-descent candidates must exclude self-edges"))
    out.groupBy(_.getAs[Long]("vec_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 4))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
    // brute-force ground truth: exact top-4 per node over all n² pairs
    val a = e.select(col("vec_id").as("u"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("v"), col("embedding").as("eb"))
    val cos = graft.functions.dotF(col("ea"), col("eb")) /
      (sqrt(graft.functions.dotF(col("ea"), col("ea"))) *
        sqrt(graft.functions.dotF(col("eb"), col("eb"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("cos").desc, col("v").asc)
    val exact = a.crossJoin(b).where(col("u") =!= col("v"))
      .select(col("u"), col("v"), cos.as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    // 3 neighbor-of-neighbor rounds on the searchK=16 working list from
    // the arithmetic seed; RecallSweep (knn mode) measures 0.969 at
    // n=500 with the reverse cap and the r19 binary prefilter in —
    // the bound is an empirical floor with slack, not the measured
    // point value
    assert(recall >= 0.9, s"NN-descent recall vs brute-force graph: $recall")
  }

  test("exact-pass plan: float joins broadcast under the gate, pool never shuffles for scoring") {
    // The r20 float gate's byte argument is a PLAN property: with the
    // vector frames broadcast-hinted, both pool ⋈ vectors joins are
    // BroadcastHashJoin — the ~n·(searchK+candK) pool rows are never
    // exchanged for scoring — and the rank window executes as
    // WindowGroupLimit, so the only pool exchange in the exact pass
    // is the window's own, pre-pruned to searchK rows per partition
    // per node (measured: 6,436 → 3,804 MB shuffle-write at the 100×
    // build tier, −37% wall). knnWorkingList localCheckpoints
    // eagerly, so the gate sits on the factored exactTopK the loop
    // calls (the descentShortlist stance).
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def norm(id: String, v: String, n: String) = e.select(
      col("vec_id").as(id), col("embedding").as(v),
      sqrt(graft.functions.dotF(col("embedding"), col("embedding"))).as(n))
    val us = broadcast(norm("uid", "ue", "un"))
    val vs = broadcast(norm("vid", "ve", "vn"))
    val pool = e.select(col("vec_id").as("u"), ((col("vec_id") + 7) % 500).as("v"))
      .where(col("u") =!= col("v"))
    val df = Similarity.exactTopK(pool, us, vs, 16)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val bcastJoins = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bcastJoins >= 2,
      s"both float vector joins must broadcast under the gate (found $bcastJoins):\n$plan")
    assert("WindowGroupLimit .*row_number\\(.*, 16, Partial".r.findFirstIn(plan).isDefined,
      s"partial (pre-exchange) WindowGroupLimit missing:\n$plan")
    assert(!"Exchange hashpartitioning\\(u#\\d+L, v#\\d+L".r.findFirstIn(plan).isDefined,
      s"pool must not be exchanged for scoring:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"scoring fell back to sort-merge mechanics:\n$plan")
  }

  test("new-flag rounds: round 1 is exactly the full join; repeat runs are deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 120).localCheckpoint(true)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Int]("rank"))).toSet
    // iters=1: no previous round exists, so incremental and full are
    // THE SAME algorithm — the sets must be identical, not just close
    val inc1 = snap(Similarity.knnWorkingList(e, iters = 1, incremental = true))
    val full1 = snap(Similarity.knnWorkingList(e, iters = 1, incremental = false))
    assert(inc1 == full1, "round 1 must be unaffected by the new-flag path")
    // determinism: the anti-join is set logic over checkpointed g's —
    // two builds of the 3-round incremental list agree bit-wise
    val a = snap(Similarity.knnWorkingList(e, incremental = true))
    val b = snap(Similarity.knnWorkingList(e, incremental = true))
    assert(a == b, "incremental descent must be deterministic")
  }

  test("descent releases superseded checkpoints: one persistent RDD per build") {
    // Every round eagerly localCheckpoints its working list (and, on
    // the incremental path, its edge graph); superseded snapshots are
    // released as soon as the next round's list materializes, so a
    // finished build must leave exactly ONE new persisted RDD — the
    // returned list. Without the release a long descent holds
    // O(iters) full snapshots in the block manager for the session.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 120).localCheckpoint(true)
    def leaked(build: => org.apache.spark.sql.DataFrame): Int = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      build.count()
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    }
    for (inc <- Seq(false, true); it <- Seq(1, 3))
      assert(leaked(Similarity.knnWorkingList(e, iters = it, incremental = inc)) == 1,
        s"incremental=$inc iters=$it left more than the returned list persisted")
  }

  test("graphSearch: beam-walk shape, self excluded, and serving recall vs brute") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.graphPrefix(Similarity.knnWorkingList(e), 16)
    val out = Similarity.graphSearch(e, g).collect()
    assert(out.length == 8 * 4, "8 queries x top-4")
    out.foreach(r => assert(r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id"),
      "the query node anchors the beam but never ranks in the answer"))
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 4))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
    // serving recall vs exact brute top-4 for the same queries: on the
    // degree-16 working list the walk recovers brute exactly at n=500
    // (measured; the floor keeps slack for fixture drift)
    val exact = Similarity.topK(e, numQueries = 8, k = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"graph-walk recall vs brute: $recall")
  }

  test("graphSearch plan: corpus probe is a broadcast join, never a shuffled corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.graphPrefix(Similarity.knnWorkingList(e), 16)
    // disable auto-broadcast so only the EXPLICIT hint can produce a
    // broadcast — the shape must hold when statistics misestimate
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // truncate=false keeps the hop joins in the examined plan (the
      // production path checkpoints per hop, hiding them in build jobs)
      val queries = broadcast(e.select(col("vec_id").as("query_id"),
          col("embedding").as("qe"),
          sqrt(graft.functions.dotF(col("embedding"), col("embedding"))).as("qn"))
        .where(col("query_id") < 3))
      val plan = Similarity
        .graphSearchFrom(queries, e, g, k = 4, beam = 8, hops = 1, truncate = false)
        .queryExecution.executedPlan.toString
      // the contract is about the CORPUS side (`nid`): every join that
      // touches it must broadcast the tiny frontier, never shuffle the
      // corpus — joins among the O(queries·beam) frontier frames are
      // free to pick any strategy
      val corpusJoins = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("nid#")).toSeq
      assert(corpusJoins.nonEmpty, plan)
      corpusJoins.foreach(l => assert(l.contains("BroadcastHashJoin"),
        s"corpus probe must be a broadcast join:\n$l\n$plan"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("descent shortlist plan: WindowGroupLimit partial top-k, broadcast fingerprint joins") {
    // The r19 prefilter's byte argument is a PLAN property: the
    // per-node top-candK must execute as WindowGroupLimit (each map
    // partition pruned to its local candK rows per key BEFORE the
    // exchange) and the fingerprint joins must broadcast the n x 16 B
    // bits frames — never shuffle the candidate volume for scoring.
    // knnWorkingList localCheckpoints eagerly, so the gate sits on the
    // factored descentShortlist the loop calls.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ub = broadcast(e.select(col("vec_id").as("ubid"),
      Similarity.signBits(col("embedding")).as("ubits")))
    val vb = broadcast(e.select(col("vec_id").as("vbid"),
      Similarity.signBits(col("embedding")).as("vbits")))
    val g = e.select(col("vec_id").as("u"), (col("vec_id") + 1).as("v"))
    val cand = g.as("a").join(g.as("b"), col("a.v") === col("b.u"))
      .select(col("a.u").as("u"), col("b.v").as("v"))
      .where(col("u") =!= col("v"))
    val df = Similarity.descentShortlist(cand, ub, vb, 128)
    val plan = df.queryExecution.executedPlan.toString
    assert("WindowGroupLimit .*dense_rank\\(.*, 128, Partial".r.findFirstIn(plan).isDefined,
      s"partial (pre-exchange) WindowGroupLimit missing:\n$plan")
    assert("WindowGroupLimit .*dense_rank\\(.*, 128, Final".r.findFirstIn(plan).isDefined,
      s"final WindowGroupLimit missing:\n$plan")
    val bcastJoins = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bcastJoins >= 2,
      s"both fingerprint joins must broadcast (found $bcastJoins):\n$plan")
    // and NO full-candidate-volume exchange ahead of the window: the
    // only hashpartitioning on (u, v) the old pre-distinct spelling
    // added must be gone (the 572 -> ~70 MB measured shuffle cut)
    assert(!"Exchange hashpartitioning\\(u#\\d+L, v#\\d+L".r.findFirstIn(plan).isDefined,
      s"candidate pre-distinct exchange crept back:\n$plan")
    // semantics: dense_rank over raw == row_number over distinct
    // ((hamming, v) is injective on distinct v for fixed u)
    val viaDistinct = cand.distinct()
      .join(ub, col("u") === col("ubid"))
      .join(vb, col("v") === col("vbid"))
      .select(col("u"), col("v"),
        bit_count(col("ubits").bitwiseXOR(col("vbits")))
          .cast(org.apache.spark.sql.types.LongType).as("hamming"))
      .withColumn("hr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("u")
          .orderBy(col("hamming").asc, col("v").asc)))
      .where(col("hr") <= 128).select("u", "v")
    assert(df.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      viaDistinct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("graph delete repair: refills from the wide working list, no tombstones survive") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val wl = Similarity.knnWorkingList(e).localCheckpoint(true)
    val top4 = Similarity.graphPrefix(wl, 4).collect()
    val affected = top4
      .filter(r => r.getAs[Long]("neighbor_id") % 97 == 0 && r.getAs[Long]("vec_id") % 97 != 0)
      .map(_.getAs[Long]("vec_id")).toSet
    assert(affected.nonEmpty, "fixture must contain affected nodes")
    // replay the declared query's spelling
    val repaired = wl
      .where(col("u") % 97 =!= 0 && col("v") % 97 =!= 0)
      .withColumn("new_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("u")
          .orderBy(col("cosine").desc, col("v").asc)))
      .where(col("new_rank") <= 4)
      .join(broadcast(wl.where(col("rank") <= 4 && col("v") % 97 === 0 && col("u") % 97 =!= 0)
        .select(col("u")).distinct()), Seq("u"), "left_semi")
      .collect()
    assert(repaired.map(_.getAs[Long]("u")).toSet == affected,
      "repair must touch exactly the nodes that lost a neighbor")
    repaired.foreach { r =>
      assert(r.getAs[Long]("v") % 97 != 0, "no tombstone survives a repair")
      assert(r.getAs[Long]("u") % 97 != 0)
    }
    // repaired lists are full again (the 16-wide reservoir has >= 4
    // survivors at a ~1% delete rate) with contiguous ranks
    repaired.groupBy(_.getAs[Long]("u")).values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("new_rank")).sorted.toSeq == (1 to 4))
    }
  }

  test("clustersIncremental: star-edge merge equals full rebuild, incl. component fusion") {
    import spark.implicits._
    // two disjoint base components {1,2} and {3,4}; delta doc 10
    // bridges them — the hard case for incremental labeling (labels
    // of BOTH base components must fall to the global min)
    val baseLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_id")
    val deltaEdges = Seq((2L, 10L), (3L, 10L)).toDF("doc_a", "doc_b")
    val got = Dedup.clustersIncremental(baseLabels, deltaEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val full = Dedup.clusters(
      Seq((1L, 2L), (3L, 4L), (2L, 10L), (3L, 10L)).toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == full)
    assert(got == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 1L, false), (10L, 1L, false)))
    // delta extending one component, base labels already non-trivial
    val got2 = Dedup.clustersIncremental(
      Seq((5L, 5L), (7L, 5L)).toDF("doc_id", "cluster_id"),
      Seq((7L, 20L)).toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((5L, 5L), (7L, 5L), (20L, 5L)))
  }

  test("knnGraphAppend: delta rows walk the base, updated rows touch only affected nodes") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = e.where(col("vec_id") % 50 =!= 0)
    val delta = e.where(col("vec_id") % 50 === 0)
    val wl = Similarity.knnWorkingList(base)
    val out = Similarity.knnGraphAppend(base, delta, wl).collect()
    val baseIds = base.select("vec_id").collect().map(_.getLong(0)).toSet
    val deltaIds = delta.select("vec_id").collect().map(_.getLong(0)).toSet
    val (dRows, uRows) = out.partition(_.getAs[String]("part") == "delta")
    // every delta node answered with k base neighbors, ranked
    assert(dRows.map(_.getAs[Long]("vec_id")).toSet == deltaIds)
    dRows.foreach(r => assert(baseIds(r.getAs[Long]("neighbor_id")),
      "delta neighbors must come from the base snapshot"))
    assert(dRows.length == deltaIds.size * 4)
    // updated rows: only base nodes, each with a full re-ranked list
    // that contains at least one delta neighbor (else it wouldn't
    // have been emitted)
    uRows.groupBy(_.getAs[Long]("vec_id")).foreach { case (u, rows) =>
      assert(baseIds(u), "updated rows must be base nodes")
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 4))
      assert(rows.exists(r => deltaIds(r.getAs[Long]("neighbor_id"))),
        s"node $u emitted as updated but its top-4 has no delta neighbor")
    }
    // walk quality: delta answers vs brute-force over the base
    val bn = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val dq = delta.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cosC = graft.functions.dotF(col("qe"), col("ne")) /
      (sqrt(graft.functions.dotF(col("qe"), col("qe"))) *
        sqrt(graft.functions.dotF(col("ne"), col("ne"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val exact = dq.crossJoin(bn).select(col("query_id"), col("neighbor_id"), cosC.as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = dRows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"append walk recall vs brute: $recall")
  }

  test("topKFiltered: every neighbor shares the query's label; pre-filter fills k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.topKFiltered(e, numQueries = 3, k = 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("label") == labels(r.getAs[Long]("query_id")),
        "neighbor label must equal query label")
    }
    // pre-filter semantics: each query with >= 4 same-label peers gets 4 rows
    val peers = labels.groupBy(_._2).view.mapValues(_.size).toMap
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val avail = peers(labels(q)) - 1
      assert(rows.length == math.min(4, avail))
    }
  }

  test("kmeansCentroidsSampled: trains on the hash-sample ONLY, deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.pipeline.Similarity.kmeansCentroidsSampled(e)
      .orderBy("cid").collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Double](1)))
    assert(out.map(_._1).toSeq == (0 until 8), "dense cids 0..7")
    assert(out.forall(_._2.length == 64), "64-dim centroids")
    // deterministic: a rerun is bit-identical
    val again = graft.pipeline.Similarity.kmeansCentroidsSampled(e)
      .orderBy("cid").collect().map(r => (r.getAs[Int]("cid"), r.getSeq[Double](1)))
    assert(out.toSeq == again.toSeq)
    // training-input independence: perturbing every NON-sampled vector
    // must leave the centroids untouched — the proof the trainer never
    // reads outside its sample (the 100 TB cost contract)
    val inSample = pmod(
      graft.pipeline.TextOps.hash32(
        concat(lit("ivfsample_"), col("vec_id").cast("string"))), lit(4L)) === 0
    val perturbed = e.withColumn("embedding",
      when(inSample, col("embedding"))
        .otherwise(transform(col("embedding"), x => x * 2.0f)))
    val fromPerturbed = graft.pipeline.Similarity.kmeansCentroidsSampled(perturbed)
      .orderBy("cid").collect().map(r => (r.getAs[Int]("cid"), r.getSeq[Double](1)))
    assert(out.toSeq == fromPerturbed.toSeq,
      "centroids must be a function of the sampled vectors alone")
  }

  test("kmeansCentroids: rounded-mean update, empty cluster keeps its seed") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // Seeds 0 and 1 are identical, so every vector ties between the
    // two initial centroids and the tie-break sends ALL of them to
    // cid 0 — cluster 1 goes empty and must keep its seed centroid.
    val e = spark.createDataFrame(
      Seq(
        Row(0L, Seq(1.0f, 0.0f)),
        Row(1L, Seq(1.0f, 0.0f)),
        Row(2L, Seq(0.0f, 1.0f))).asJava, schema)
    val out = graft.pipeline.Similarity.kmeansCentroids(e, k = 2, iters = 1)
      .orderBy("cid").collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Double](1)))
    assert(out.toSeq == Seq(
      (0, Seq(0.666667, 0.333333)), // 6dp-rounded mean of all three
      (1, Seq(1.0, 0.0))))          // empty cluster: seed retained
    // iters = 0 is the raw double-cast seed set.
    val seeds = graft.pipeline.Similarity.kmeansCentroids(e, k = 2, iters = 0)
      .orderBy("cid").collect().map(r => (r.getAs[Int]("cid"), r.getSeq[Double](1)))
    assert(seeds.toSeq == Seq((0, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0))))
    // Plan: the k-row centroid side broadcasts (BNLJ fan-out is the
    // intended shape); nothing sort-merges or builds a cartesian.
    val plan = graft.pipeline.Similarity.kmeansCentroids(e, k = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast into the scoring pass:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no corpus-side shuffle join in training:\n$plan")
  }

  test("kmeansCentroidsTrace: snapshot i bit-equals an independent iters=i training (r21)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val trace = graft.pipeline.Similarity.kmeansCentroidsTrace(e, k = 8, iters = 2)
    assert(trace.size == 3)
    trace.zipWithIndex.foreach { case (snap, i) =>
      val direct = graft.pipeline.Similarity.kmeansCentroids(e, k = 8, iters = i)
        .orderBy("cid").collect().map(_.toString).toSeq
      val got = snap.orderBy("cid").collect().map(_.toString).toSeq
      assert(got == direct, s"trace snapshot $i diverged from iters=$i training")
    }
  }

  test("trained IVF returns full ranked top-k per query on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.pipeline.Similarity.kmeansCentroids(e, k = 4, iters = 1)
    val out = graft.pipeline.Similarity
      .topKIvfTrained(e, cents, numQueries = 3, k = 4, nProbe = 2).collect()
    assert(out.length == 12)
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val cosines = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("bucketed ANN neighbors share the query bucket and rank consistently") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.topKBucketed(e, numQueries = 3, k = 4).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("rank") <= 4))
  }

  test("blocked nearDupPairs is exact (matches naive all-pairs) with no cartesian/BNLJ") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val blocked = Similarity.nearDupPairs(e, 0.4, numBlocks = 8)
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "blocked plan must not contain a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "blocked plan must not contain a BNLJ")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Similarity.cosine(col("ea"), col("eb")).as("cosine"))
      .where(col("cosine") >= 0.4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(brute)
    assert(pairs(blocked) == exact)
    // the approximate LSH path returns a deterministic subset
    val lsh = pairs(Similarity.nearDupPairsLsh(e, 0.4))
    assert(lsh.subsetOf(exact) && lsh == pairs(Similarity.nearDupPairsLsh(e, 0.4)))
  }

  test("semanticContamination: identical vec leaks, orthogonal vec gets a zero-leak row") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def v(xs: Float*) = xs.toArray.toSeq
    // corpus: ids 1-3; bench: ids 100 (== vec 1), 200 (orthogonal to all)
    val e = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, v(1f, 0f, 0f, 0f)),
      Row(2L, v(0.9f, 0.1f, 0f, 0f)),
      Row(3L, v(0f, 1f, 0f, 0f)),
      Row(100L, v(1f, 0f, 0f, 0f)),
      Row(200L, v(0f, 0f, 0f, 1f))), schema)
    val out = Similarity.semanticContamination(
        e.where(col("vec_id") < 100), e.where(col("vec_id") >= 100), 0.9)
      .orderBy("bench_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_leaks"),
        r.getAs[Long]("nearest_id"), r.getAs[Boolean]("leaked")))
    // bench 100 sits on corpus vec 1 exactly and near vec 2 (cos ≈ .994)
    assert(out(0) == (100L, 2L, 1L, true))
    // bench 200 is orthogonal to every corpus vec: still reported,
    // with SOME nearest id (all cosines 0 -> tie to the lowest id)
    assert(out(1) == (200L, 0L, 1L, false))
  }

  test("kmeansInertia: micro-exact, and training reduces it on the real fixture") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def inertia(iters: Int) =
      Similarity.kmeansInertia(e, Similarity.kmeansCentroids(e, k = 8, iters = iters))
        .collect().head.getAs[Long]("inertia_micro")
    val (i0, i1, i2) = (inertia(0), inertia(1), inertia(2))
    // empirical pin on the committed fixture (the cosine-assign /
    // mean-update hybrid has no monotonicity theorem; what matters is
    // that the instrument SHOWS the convergence a user tunes by)
    assert(i1 < i0 && i2 <= i1, s"inertia did not fall: $i0 -> $i1 -> $i2")
    assert(inertia(2) == i2, "deterministic replay")
  }

  test("semanticContaminationIvf: counts bounded by brute; equal when bench probes all cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = e.where(col("vec_id") % 50 =!= 0)
    val bench = e.where(col("vec_id") % 50 === 0)
    val cents = Similarity.kmeansCentroids(e, k = 4, iters = 1)
    def leaks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Long]("n_leaks")).toMap
    val brute = leaks(Similarity.semanticContamination(corpus, bench))
    val ivf2 = leaks(Similarity.semanticContaminationIvf(corpus, bench, cents))
    val ivfAll = leaks(
      Similarity.semanticContaminationIvf(corpus, bench, cents, nCellsBench = 4))
    // every bench item emits a row in every variant
    assert(ivf2.keySet == brute.keySet && ivfAll.keySet == brute.keySet)
    // cell bounding can only LOSE leaks, never invent them
    assert(ivf2.forall { case (b, n) => n <= brute(b) })
    // probing every cell makes the candidate set exhaustive
    assert(ivfAll == brute)
  }

  test("semanticDupPairs: subset of exact; equal to exact when nCells = k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.pipeline.Similarity.kmeansCentroids(e, k = 4, iters = 1)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.nearDupPairs(e, 0.4, numBlocks = 8))
    val sem1 = pairs(Similarity.semanticDupPairs(e, cents, 0.4, nCells = 1))
    val sem2 = pairs(Similarity.semanticDupPairs(e, cents, 0.4, nCells = 2))
    assert(sem1.subsetOf(exact) && sem2.subsetOf(exact))
    assert(sem1.subsetOf(sem2), "more probed cells can only add pairs")
    // with every vector assigned to ALL cells, every pair shares a
    // cell — the verification is exhaustive and must equal exact
    val semAll = pairs(Similarity.semanticDupPairs(e, cents, 0.4, nCells = 4))
    assert(semAll == exact)
    // centroid table broadcasts into the assignment; the verify join
    // is a shuffle equi-join on cell, never a cartesian
    val plan = Similarity.semanticDupPairs(e, cents, 0.4, nCells = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cell verify must not be a cartesian:\n$plan")
  }

  test("graphSearchFiltered: results obey the predicate, never beat the unfiltered walk") {
    val fix = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.knnGraph(fix, k = 16, iters = 2, searchK = 16)
      .localCheckpoint(true)
    val lbl = fix.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val filt = Similarity.graphSearchFiltered(
        fix, g, fix.where(col("label") % 2 === 1))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(filt.nonEmpty)
    // every answer satisfies the predicate
    assert(filt.forall { case (_, _, n, _) => lbl(n) % 2 == 1 })
    // the filtered top-1 can never beat the unfiltered top-1 (the
    // filter only removes frontier rows before the final rank)
    val unf = Similarity.graphSearch(fix, g).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    filt.filter(_._2 == 1).foreach { case (q, _, _, c) =>
      assert(c <= unf(q) + 1e-12, s"filtered top-1 beats unfiltered for $q")
    }
    // ranks are contiguous from 1 per query
    filt.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
  }

  test("bitextRecall: mined implies candidate-hit; probing all cells is exhaustive") {
    val fix = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(fix, k = 4, iters = 1)
    val r2 = Similarity.bitextRecall(fix, cents, nCells = 2).collect()
    assert(r2.nonEmpty)
    r2.foreach { r =>
      val (hitCand, minedTgt, hitMined) =
        (r.getBoolean(3), r.getLong(4), r.getBoolean(5))
      // the mined partner is drawn from the candidate frontier, so a
      // mined hit implies the frontier contained the brute top-1
      assert(!hitMined || hitCand, s"mined hit without candidate hit: $r")
      assert(hitMined == (minedTgt == r.getLong(1)), s"flag drift: $r")
    }
    // probing EVERY cell makes the frontier exhaustive: the brute
    // top-1 is always a candidate (the semanticDupPairs nCells = k
    // invariant, bipartite)
    val rAll = Similarity.bitextRecall(fix, cents, nCells = 4).collect()
    assert(rAll.forall(_.getBoolean(3)), "exhaustive probe missed brute top-1")
  }

  test("badwordsStats: exact micro mass, boundary keep, full split on the fixture") {
    import spark.implicits._
    val nineteen = ("dup" +: Seq.fill(18)("fast")).mkString(" ")
    val twenty = ("dup" +: Seq.fill(19)("fast")).mkString(" ")
    val d = Seq(
      (0L, "slow slow fast"), // 2/3 blocked -> 666667 micro, dropped
      (1L, "fast join merge"), // clean -> kept
      (2L, twenty), // exactly 50000 micro -> kept (<= boundary)
      (3L, nineteen) // 52632 micro -> dropped
    ).toDF("doc_id", "text")
    val got = TextOps.badwordsStats(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0L, 3L, 2L, 666667L, false),
      (1L, 3L, 0L, 0L, true),
      (2L, 20L, 1L, 50000L, true),
      (3L, 19L, 1L, 52632L, false)))
    // C4 degenerate mode: maxRatioMicro = 0 drops on ANY hit
    val c4 = TextOps.badwordsStats(d, maxRatioMicro = 0L)
      .orderBy("doc_id").collect().map(_.getBoolean(4))
    assert(c4.toSeq == Seq(false, true, false, false))
    // the fixture splits both ways, and the decision is exactly the
    // integer compare on the reported mass
    val fix = TextOps.badwordsStats(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")).collect()
    assert(fix.exists(_.getBoolean(4)) && fix.exists(!_.getBoolean(4)))
    assert(fix.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(fix.forall(r => r.getBoolean(4) == (r.getLong(3) <= 50000L)))
  }

  test("bitextMine: ratio margin suppresses the hub; mined pairs form a matching") {
    import spark.implicits._
    def v(parts: (Int, Double)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    // two clean counterpart pairs at cosine 0.6 plus one hub at
    // cosine ~0.707 to BOTH side-0 vectors: raw-cosine best for both
    // sources is the hub, but its neighborhood average is equally
    // high, so the ratio margin routes each source to its specific
    // counterpart (hand-replay: margin(a,a') = 0.6/((0.4357+0.3)/2)
    // = 1.63 > margin(a,hub) = 0.7071/((0.4357+0.7071)/2) = 1.24)
    val c = math.sqrt(1 - 0.6 * 0.6)
    val e = Seq(
      (0L, v(0 -> 1.0), 0), // a   (side 0)
      (1L, v(1 -> 1.0), 2), // b   (side 0)
      (10L, v(0 -> 0.6, 2 -> c), 1), // a' (side 1)
      (11L, v(1 -> 0.6, 3 -> c), 3), // b' (side 1)
      (12L, v(0 -> math.sqrt(0.5), 1 -> math.sqrt(0.5)), 5) // hub (side 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.kmeansCentroids(e, k = 1, iters = 1)
    val mined = Similarity.bitextMine(e, cents, nCells = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mined == Map(0L -> 10L, 1L -> 11L), s"hub must lose: $mined")

    // real fixture: mutual-best pairs form a partial matching (each
    // endpoint mined at most once), sides are exactly label parity,
    // every margin clears the threshold, and the candidate join is
    // cell-keyed, never a cartesian
    val fix = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fcents = Similarity.kmeansCentroids(fix, k = 4, iters = 1)
    val out = Similarity.bitextMine(fix, fcents).collect()
    assert(out.nonEmpty)
    val srcs = out.map(_.getLong(0))
    val tgts = out.map(_.getLong(1))
    assert(srcs.distinct.length == srcs.length, "a source mined twice")
    assert(tgts.distinct.length == tgts.length, "a target mined twice")
    assert(out.forall(_.getAs[Long]("margin_micro") >= 1000000L))
    val lbl = fix.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(srcs.forall(s => lbl(s) % 2 == 0) && tgts.forall(t => lbl(t) % 2 == 1))
    val plan = Similarity.bitextMine(fix, fcents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"bipartite candidates must be cell-keyed:\n$plan")
  }

  test("PQ: codebook shape, complete codes in range, ADC top-k ranked and deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = Similarity.pqCodebooks(e)
    val b = books.collect()
    assert(b.length == 8 * 16, "8 subspaces x 16 centroids")
    assert(b.forall(_.getSeq[Double](2).length == 8), "sub-dim centroids")
    val nVec = e.count()
    val codes = Similarity.pqEncode(e, books).collect()
    assert(codes.length == nVec * 8, "one code per (vector, subspace)")
    assert(codes.forall { r =>
      val c = r.getAs[Int]("code"); c >= 0 && c < 16
    })
    val out = Similarity.topKPq(e, books, numQueries = 3, k = 4).collect()
    assert(out.length == 12)
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val d = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adc_dist"))
      assert(d.zip(d.tail).forall { case (x, y) => x <= y }, "ADC ascending")
      assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
    // deterministic end to end (training included)
    val again = Similarity.topKPq(e, Similarity.pqCodebooks(e), numQueries = 3, k = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet)
  }

  test("IVF-PQ: pruned candidates from probed cells, ADC identical to plain PQ") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.pipeline.Similarity.kmeansCentroids(e)
    val books = Similarity.pqCodebooks(e)
    val ivfpq = Similarity.topKIvfPq(e, cents, books, numQueries = 3, k = 4)
      .collect()
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      assert(rows.length <= 4)
      val d = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adc_dist"))
      assert(d.zip(d.tail).forall { case (x, y) => x <= y })
    }
    // the ADC score of a pair is index-independent: wherever IVF-PQ and
    // plain PQ rank the same neighbor, the distances are bit-identical
    val pq = Similarity.topKPq(e, books, numQueries = 3, k = 50)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("adc_dist")).toMap
    ivfpq.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      pq.get(key).foreach(d => assert(d == r.getAs[Double]("adc_dist")))
    }
    // plan shape: codebook + distance table broadcast; no cartesian
    val plan = Similarity.topKIvfPq(e, cents, books, numQueries = 3, k = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"index artifacts must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in IVF-PQ:\n$plan")
  }

  test("recallAtK counts ground-truth hits per variant, missing queries score 0") {
    import spark.implicits._
    val exact = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L))
      .toDF("query_id", "neighbor_id")
    // ivf finds 2 of 3 for q0 and both for q1; lsh finds one wrong
    // neighbor for q0 and nothing at all for q1.
    val ivf = Seq((0L, 1L), (0L, 2L), (0L, 9L), (1L, 4L), (1L, 5L))
      .toDF("query_id", "neighbor_id")
    val lsh = Seq((0L, 9L)).toDF("query_id", "neighbor_id")
    val out = graft.pipeline.Similarity
      .recallAtK(exact, Seq("ivf" -> ivf, "lsh" -> lsh))
      .orderBy("query_id").collect()
    def row(r: Row) = (r.getAs[Long]("query_id"), r.getAs[Long]("n_exact"),
      r.getAs[Long]("ivf_hits"), r.getAs[Double]("ivf_recall"),
      r.getAs[Long]("lsh_hits"), r.getAs[Double]("lsh_recall"))
    assert(out.map(row).toSeq == Seq(
      (0L, 3L, 2L, 0.666667, 0L, 0.0),
      (1L, 2L, 2L, 1.0, 0L, 0.0)))
  }

  test("polyHash is an order-sensitive fold matching the formula") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expected = Seq("a", "b", "c")
      .foldLeft(0L)((acc, t) => (acc * 1000003L + h32(t)) % 1000000007L)
    val out = docs((1L, "a b c"), (2L, "c b a"))
      .select(col("doc_id"), TextOps.polyHash(col("text")).as("h"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == expected)
    // Same bag of tokens, different order -> different fingerprint.
    assert(out(0).getLong(1) != out(1).getLong(1))
  }

  test("repetition stats: dup trigram fraction and top token fraction") {
    // "a b a b a b": trigrams = [aba, bab, aba, bab] -> 2 distinct of 4
    // -> dup frac 0.5; 'a' appears 3 of 6 tokens -> top frac 0.5.
    val out = graft.pipeline.Corpus.repetitionStats(docs((1L, "a b a b a b")))
      .collect().head
    assert(out.getAs[Double]("dup_trigram_frac") == 0.5)
    assert(out.getAs[Double]("top_token_frac") == 0.5)
    // All-distinct text: no repeated trigrams, every token unique.
    val uniq = graft.pipeline.Corpus.repetitionStats(docs((2L, "p q r s t")))
      .collect().head
    assert(uniq.getAs[Double]("dup_trigram_frac") == 0.0)
    assert(uniq.getAs[Double]("top_token_frac") == 0.2)
  }

  test("gopherFilter: per-rule attribution and the keep conjunction") {
    // Doc 1: 32 words, all stopword-bearing English-ish, no repeats ->
    // passes everything. Doc 2: repeats one trigram heavily -> fails
    // only r_rep. Doc 3: 5 words -> fails r_words (and r_stop: no
    // stopwords). Doc 4: long enough but zero stopwords -> fails r_stop.
    // 40 tokens, 3 distinct stopwords, all words distinct (no trigram
    // repeats), mean word length (221 chars / 40) = 5.525.
    val clean = "the of and " + (1 to 37).map(i => s"word$i").mkString(" ")
    val repeaty = "the of and " + Seq.fill(20)("spam spam spam").mkString(" ")
    val d = docs(
      (1L, clean),
      (2L, repeaty),
      (3L, "p q r s t"),
      (4L, (1 to 40).map(i => s"tok$i").mkString(" ")))
    val out = graft.pipeline.Corpus.gopherFilter(d).orderBy("doc_id").collect()
    def b(r: Row, c: String) = r.getAs[Boolean](c)
    val r1 = out(0)
    assert(b(r1, "r_words") && b(r1, "r_word_len") && b(r1, "r_alpha") &&
      b(r1, "r_stop") && b(r1, "r_rep") && b(r1, "keep"))
    assert(r1.getAs[Long]("n_words") == 40L)
    assert(r1.getAs[Long]("n_stop_distinct") == 3L)
    val r2 = out(1)
    assert(!b(r2, "r_rep") && !b(r2, "keep"))
    assert(b(r2, "r_words") && b(r2, "r_stop"),
      "repeaty doc still passes the word-count and stopword rules")
    assert(r2.getAs[Double]("dup_trigram_frac") > 0.9)
    val r3 = out(2)
    assert(!b(r3, "r_words") && !b(r3, "r_stop") && !b(r3, "keep"))
    assert(r3.getAs[Double]("dup_trigram_frac") == 0.0)
    val r4 = out(3)
    assert(b(r4, "r_words") && !b(r4, "r_stop") && !b(r4, "keep"))
    // Map-only projection: no exchange anywhere in the gate's plan.
    val plan = graft.pipeline.Corpus.gopherFilter(d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality gate must not shuffle:\n$plan")
  }

  test("ngram counts rank bigrams by frequency with lexicographic ties") {
    val out = graft.pipeline.Corpus.ngramCounts(
      docs((1L, "x y x y z"), (2L, "x y q")), n = 2, k = 3).collect()
    // bigrams: doc1 = [x y, y x, x y, y z], doc2 = [x y, y q]
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x y", 3L), ("y q", 1L), ("y x", 1L)))
  }

  test("decontaminate flags docs sharing a 4-gram with the benchmark, broadcast semi-join") {
    val corpus = docs(
      (1L, "alpha beta gamma delta rest of text"), // shares "alpha beta gamma delta"
      (2L, "totally unrelated words in this doc"),
      (3L, "alpha beta gamma delta rest of text")) // exact dup of 1
    val bench = docs((100L, "prefix alpha beta gamma delta suffix"))
    val out = Dedup.decontaminate(corpus, bench)
    val rows = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSeq == Seq((1L, 1L, true), (2L, 0L, false), (3L, 1L, true)))
    // The benchmark gram set must broadcast — no shuffle of corpus text.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join, got:\n$plan")
  }

  test("repetition stats invariants on randomized docs; degenerate all-same doc") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("u", "v", "w", "x", "y")
    val rows = (1L to 20L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val out = graft.pipeline.Corpus.repetitionStats(docs(rows: _*)).collect()
    out.foreach { r =>
      val (d, t) = (r.getAs[Double]("dup_trigram_frac"), r.getAs[Double]("top_token_frac"))
      assert(d >= 0.0 && d < 1.0)
      assert(t > 0.0 && t <= 1.0)
    }
    // "z z ... z" (10 tokens): one distinct trigram of 8 -> 7/8; top frac 1.
    val deg = graft.pipeline.Corpus.repetitionStats(
      docs((99L, Seq.fill(10)("z").mkString(" ")))).collect().head
    assert(math.abs(deg.getAs[Double]("dup_trigram_frac") - 7.0 / 8) < 1e-15)
    assert(deg.getAs[Double]("top_token_frac") == 1.0)
    // shorter than a trigram: no repeats (0.0), not NaN from 0/0
    val tiny = graft.pipeline.Corpus.repetitionStats(docs((100L, "a b"))).collect().head
    assert(tiny.getAs[Double]("dup_trigram_frac") == 0.0)
    assert(tiny.getAs[Double]("top_token_frac") == 0.5)
  }

  test("decontaminate flags every benchmark member when the benchmark is a subset") {
    val rows = (1L to 12L).map(i => (i, s"doc $i word alpha beta gamma delta tail $i"))
    val corpus = docs(rows: _*)
    val bench = corpus.where(col("doc_id") % 4 === 0)
    val out = Dedup.decontaminate(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (1L to 12L).foreach { i =>
      if (i % 4 == 0) assert(out(i), s"benchmark doc $i must be contaminated")
    }
  }

  test("ngram counts plan: partial aggregation + top-k, no global sort") {
    val out = graft.pipeline.Corpus.ngramCounts(
      docs((1L, "x y x y z"), (2L, "x y q")), n = 2, k = 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator, got:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "expected partial+final aggregate")
  }

  test("bm25: hand-computed score, probe pruning, and top-k plan") {
    // corpus of 4 docs; query {x, q}: doc 4 has no query term and must
    // not appear (the inverted-probe prune); doc 1 has x twice.
    val corpus = docs(
      (1L, "x a x b"), // tf_x=2, dl=4
      (2L, "x c"), //     tf_x=1, dl=2
      (3L, "q d e"), //   tf_q=1, dl=3
      (4L, "a b c"))
    val out = graft.pipeline.Corpus.bm25TopK(corpus, Seq("x", "q"), k = 10)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!rows.contains(4L), "doc without query terms must be pruned")
    // N=4, sum dl=12, avgdl=3. x: df=2, q: df=1; Lucene idf.
    def contrib(tf: Double, dl: Double, df: Double): Long = {
      val idf = math.log(1 + (4.0 - df + 0.5) / (df + 0.5))
      math.round(idf * (tf * 2.2) / (tf + (0.25 + dl * 0.75 / 3.0) * 1.2) * 1e6)
    }
    assert(rows(1L) == (1L, contrib(2, 4, 2)))
    assert(rows(2L) == (1L, contrib(1, 2, 2)))
    assert(rows(3L) == (1L, contrib(1, 3, 1)))
    // rarer q in doc 3 must outrank the shorter-doc x hit in doc 2
    assert(rows(3L)._2 > rows(2L)._2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected partial top-k, not a global sort:\n$plan")
  }

  test("dsir: target-like docs outrank raw-like docs; sample respects budget") {
    // src1 docs speak "alpha beta", the rest speak "gamma delta"; a
    // held-out probe doc in each dialect must land on the right end of
    // the importance-weight ordering.
    val corpus = spark.createDataFrame(Seq(
      Row(1L, "alpha beta alpha beta", "src1"),
      Row(2L, "alpha beta beta alpha", "src1"),
      Row(3L, "gamma delta gamma delta", "src2"),
      Row(4L, "gamma delta delta gamma", "src2"),
      Row(5L, "alpha beta alpha beta", "src3"), // target-like probe
      Row(6L, "gamma delta gamma delta", "src3") // raw-like probe
    ).asJava, docSchema)
    val isTarget = col("source") === "src1"
    val w = graft.pipeline.Corpus.dsirWeights(corpus, isTarget).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 4 unigrams + 3 bigrams per doc
    assert(w.values.forall(_._1 == 7L))
    // NOTE deliberately no sign assertion: with Laplace smoothing over
    // B=128 buckets and a 6-doc fixture the smoothing mass dominates
    // both models, so absolute signs are meaningless — DSIR's contract
    // is the RELATIVE ordering, which must separate the dialects.
    assert(w(5L)._2 > w(6L)._2, s"target-like probe must outrank: $w")
    // identical texts get identical weights regardless of source label
    assert(w(1L)._2 == w(5L)._2 && w(3L)._2 == w(6L)._2)
    // a 12-token budget admits exactly the three most target-like docs
    val sel = graft.pipeline.Corpus
      .dsirSample(corpus, isTarget, 12L).collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L, 2L, 5L), s"budget fill picked $sel")
  }

  test("temperature mixing: alpha=1 is proportional, alpha<1 upsamples small sources") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val prop = graft.pipeline.Corpus.mixWeightsTemperature(d, 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val tot = prop.values.map(_._1).sum.toDouble
    prop.foreach { case (src, (n, w, up)) =>
      assert(math.abs(w - n / tot) < 1e-5, s"$src: alpha=1 must be proportional")
      assert(math.abs(up - 1.0) < 1e-5, s"$src: alpha=1 upsample must be 1")
    }
    val t = graft.pipeline.Corpus.mixWeightsTemperature(d, 0.3).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val bySize = t.toSeq.sortBy(_._2._1)
    // strictly anti-monotone: the smaller the source, the larger the
    // upsampling factor (n^(alpha-1) is decreasing in n)
    bySize.sliding(2).foreach { case Seq((s1, (n1, u1)), (s2, (n2, u2))) =>
      if (n1 < n2) assert(u1 > u2, s"$s1 ($n1 tok) must upsample more than $s2 ($n2 tok)")
    }
    // alpha=0.5 reproduces the sqrt mixWeights rule
    val sqrtW = graft.pipeline.Corpus.mixWeights(d).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    graft.pipeline.Corpus.mixWeightsTemperature(d, 0.5).collect().foreach { r =>
      assert(math.abs(r.getDouble(3) - sqrtW(r.getString(0))) < 1e-6)
    }
  }

  test("shrunk domain quality contracts toward the global mean, more for small n") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = graft.pipeline.Corpus.domainQualityShrunk(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val gMean = {
      val agg = graft.pipeline.Corpus.domainQualityShrunk(d, priorStrength = 0)
      // prior strength 0 leaves means untouched; weight them back up
      val xs = agg.collect().map(r => (r.getLong(1), r.getDouble(2)))
      xs.map { case (n, m) => n * m }.sum / xs.map(_._1).sum
    }
    rows.foreach { case (dom, n, mean, shrunk) =>
      // shrunk lies between the domain mean and the global mean
      assert((shrunk - mean) * (gMean - mean) >= -1e-9,
        s"$dom: shrunk must move toward the global mean")
      assert(math.abs(shrunk - gMean) <= math.abs(mean - gMean) + 1e-9,
        s"$dom: shrinkage must contract toward the global mean")
      // with k=20 and n docs, the pull is k/(n+k) of the gap
      val want = mean + (gMean - mean) * 20.0 / (n + 20.0)
      assert(math.abs(shrunk - want) < 2e-6, s"$dom: posterior-mean formula")
    }
  }

  test("hard negatives: band excludes near-duplicates, keeps informative neighbors") {
    import spark.implicits._
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f), //   the query
      10L -> Array(0.99f, 0.1f, 0f, 0f), // near-dup (cos ~0.995) — excluded
      11L -> Array(0.4f, 0.9f, 0f, 0f), //  informative negative (cos ~0.41)
      12L -> Array(0f, 0f, 1f, 0f) //       orthogonal (cos 0)
    ).toDF("vec_id", "embedding")
    val out = graft.pipeline.Similarity
      .hardNegatives(vecs, numQueries = 1, k = 5, maxSim = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(11L, 12L),
      s"near-dup must be banded out, got ${out.toSeq}")
    assert(out.forall(_._3 < 0.5))
    // the same query WITHOUT the band ranks the near-dup first —
    // i.e. the band is what separates "hard negative" from "positive"
    val top = graft.pipeline.Similarity.topK(vecs, numQueries = 1, k = 1)
      .collect().head.getLong(1)
    assert(top == 10L)
  }

  test("PMI collocations: exclusive pair outranks frequent independent pair") {
    // "red queen" only ever co-occur (exclusive collocation);
    // "a b" both appear often independently — PMI must rank
    // "red queen" above "a b" even though "a b" is more frequent.
    val rows = (1L to 6L).map(i => (i, "red queen a b a c b a")) :+
      (7L, "a a b b c c a b")
    val out = graft.pipeline.Corpus
      .collocationsPmi(docs(rows: _*), minCount = 2, k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byBg = out.map(x => x._1 -> x._3).toMap
    assert(byBg.contains("red queen"), s"got ${out.toSeq}")
    assert(out.head._1 == "red queen", s"exclusive pair must rank first: ${out.toSeq}")
    assert(byBg("red queen") > byBg("a b"))
    // support filter: bigrams seen once (e.g. 'c c') are gone
    assert(!byBg.contains("c c"))
  }

  test("bm25_chunks: passage keys, probe prune, non-increasing scores") {
    val out = SparkEntry.queries("bm25_chunks")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "top-k must be ordered by score desc")
    // every hit really contains a query term in ITS OWN chunk window
    val terms = Set("spark", "merge", "window")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    out.foreach { r =>
      val toks = d(r.getLong(0)).split(" ")
      val start = (r.getLong(1) * 24).toInt
      val window = toks.slice(start, start + 32)
      assert(window.exists(terms), s"chunk ${r.getLong(0)}/${r.getLong(1)} has no query term")
    }
  }

  test("gate_correlation: a bounded, reproducible Pearson statistic") {
    val rows = SparkEntry.queries("gate_correlation")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 1)
    val r = rows.head.getDouble(1)
    assert(r >= -1.0 && r <= 1.0, s"Pearson out of range: $r")
    assert(rows.head.getLong(0) == 500L)
    // exact integer sums => bit-stable across runs
    val r2 = SparkEntry.queries("gate_correlation")(spark, "/root/testdata/sf0.001")
      .collect().head.getDouble(1)
    assert(r == r2)
  }

  test("zipf slope: ~-1 on a 1/rank corpus, 0 on a flat one") {
    // freq(token r) = floor(120 / r) for r = 1..12 — a Zipfian head
    val zipfText = (1 to 12).flatMap(r => Seq.fill(120 / r)(s"w$r")).mkString(" ")
    val z = graft.pipeline.Corpus.vocabZipfSlope(docs((1L, zipfText)))
      .collect().head
    assert(z.getLong(0) == 12)
    val slope = z.getDouble(1)
    assert(slope < -0.85 && slope > -1.1, s"expected ~-1, got $slope")
    // flat distribution: every type equally frequent -> slope 0
    val flatText = (1 to 10).flatMap(r => Seq.fill(7)(s"w$r")).mkString(" ")
    val f = graft.pipeline.Corpus.vocabZipfSlope(docs((2L, flatText)))
      .collect().head.getDouble(1)
    assert(f == 0.0, s"flat corpus must fit slope 0, got $f")
  }

  test("videoDupPairs: series overlap structure exact, df-cap kills hub frames") {
    import spark.implicits._
    // two complete series (docs 0-7): the sliding-window construction
    // makes the expected pairs pure arithmetic — within a series,
    // variants d apart share 8-d of 8+d union frames (J = 7/9, 3/5 at
    // d = 1, 2; d = 3 gives 5/11 < 0.5 and must be absent); the two
    // series share no (offset, stride) family member, so no
    // cross-series pairs
    val docs = (0L until 8L).map(id => (id, "s")).toDF("doc_id", "source")
    val h = Multimodal.aHash(
      Multimodal.syntheticVideoFrames(spark, docs), Multimodal.PcmDecoder)
    val got = Multimodal.videoDupPairs(h).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val d1 = (6L, 10L, 600000L) // shared 6 of union 10
    val d2 = (7L, 9L, 777778L) // shared 7 of union 9
    assert(got == Map(
      (0L, 1L) -> d2, (1L, 2L) -> d2, (2L, 3L) -> d2,
      (0L, 2L) -> d1, (1L, 3L) -> d1,
      (4L, 5L) -> d2, (5L, 6L) -> d2, (6L, 7L) -> d2,
      (4L, 6L) -> d1, (5L, 7L) -> d1), s"got $got")
    // df-cap: a hub frame present in EVERY video (the black-frame
    // shape) must not create pairs on its own — videos that share
    // nothing else stay unpaired
    val hub = h.select(col("doc_id"), col("ahash"), col("abits"))
      .unionAll(docs.select(
        (col("doc_id") * 16 + 15).as("doc_id"), lit("hubhash").as("ahash"),
        lit(0L).as("abits")))
    val capped = Multimodal.videoDupPairs(hub, dfCap = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == got.keySet,
      "a hub frame above the df-cap must not add or remove pairs")
    // the candidate join is hash-keyed, never a cartesian
    val plan = Multimodal.videoDupPairs(h).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("videoDupPairsIncremental equals the full rebuild restricted to delta pairs") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def check(
        docs: org.apache.spark.sql.DataFrame,
        newCol: org.apache.spark.sql.Column,
        isNew: Long => Boolean) = {
      def hashes(d: org.apache.spark.sql.DataFrame) = Multimodal.aHash(
        Multimodal.syntheticVideoFrames(spark, d), Multimodal.PcmDecoder)
      val baseSets = hashes(docs.where(!newCol))
        .select(expr("doc_id DIV 16").as("video_id"), col("ahash")).distinct()
      val inc = pairs(
        Multimodal.videoDupPairsIncremental(baseSets, hashes(docs.where(newCol))))
      val full = pairs(Multimodal.videoDupPairs(hashes(docs)))
        .filter { case ((a, b), _) => isNew(a) || isNew(b) }
      assert(inc == full, s"inc=$inc\nfull-restricted=$full")
      inc
    }
    // toy: two delta videos in ONE series exercise the delta-delta
    // direction-dedup; docs 0-7, delta = {1, 2} -> the (1,2) pair must
    // surface once with the full-rebuild counts
    val toy = (0L until 8L).map(id => (id, "s")).toDF("doc_id", "source")
    val toyInc = check(
      toy, col("doc_id").isin(1L, 2L), id => id == 1L || id == 2L)
    assert(toyInc.contains((1L, 2L)), "delta-delta pair missing")
    assert(toyInc.keySet.forall { case (a, b) =>
      Set(1L, 2L).contains(a) || Set(1L, 2L).contains(b) })
    // real fixture with the declared every-10th split
    val fix = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fixInc = check(fix, col("doc_id") % 10 === 0, _ % 10 == 0)
    assert(fixInc.nonEmpty)
  }

  test("aHash: brightness-shift invariant, pattern-sensitive, scale-normalized") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    // values bounded <= 199 so the +10 shift never clamps — the
    // invariance being tested is exact uniform shift
    val base = Array.tabulate(128)(i => ((i * 7) % 200).toByte)
    val brighter = base.map(b => ((b & 0xff) + 10).toByte)
    val other = Array.tabulate(128)(i => (199 - (i * 13) % 200).toByte)
    val doubled = Array.tabulate(256)(i => (((i / 2) * 7) % 200).toByte)
    val ds = Seq(
      MediaRecord(1L, "image", base, "s"),
      MediaRecord(2L, "image", brighter, "s"),
      MediaRecord(3L, "image", other, "s"),
      MediaRecord(4L, "image", doubled, "s")).toDS()
    val h = Multimodal.aHash(ds, Multimodal.PcmDecoder)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L).length == 16, "64 bits -> 16 hex chars")
    assert(h(1L) == h(2L), "uniform brightness shift must not change the hash")
    assert(h(1L) != h(3L), "a different pattern must hash differently")
    assert(h(1L) == h(4L), "2x upsampled pattern must normalize to the same hash")
  }

  test("leakage-safe split: clusters never straddle splits; doc-keyed split does") {
    val dir = "/root/testdata/sf0.001"
    val safe = SparkEntry.queries("corpus_split_leakage_safe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(safe.length == 500)
    // every cluster maps to exactly one split
    safe.groupBy(_._2).foreach { case (key, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $key straddles splits: ${members.toSeq}")
    }
    // the hazard is real on this corpus: the PLAIN doc-keyed split
    // puts at least one near-dup cluster on both sides of the fence
    val plain = SparkEntry.queries("corpus_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val clusters = safe.filter(t => t._2 != t._1 ||
      safe.count(_._2 == t._2) > 1).groupBy(_._2)
    val straddled = clusters.count { case (_, members) =>
      members.map(m => plain(m._1)).distinct.length > 1
    }
    assert(straddled > 0,
      "expected the doc-keyed split to straddle at least one cluster")
  }

  test("contrastive triplets: positive outranks negatives, negatives banded") {
    val out = SparkEntry
      .queries("contrastive_triplets")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty && out.length <= 15) // 5 anchors x <= 3 negatives
    out.foreach { case (q, pos, posCos, _, neg, negCos) =>
      assert(pos != q && neg != q && pos != neg)
      assert(negCos < 0.5, "negative must sit below the near-dup band")
      assert(posCos >= negCos, "the positive must outrank every negative")
    }
  }

  test("dsir sample and zipf slope plans: no SinglePartition outside 1-row aggregates") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(
      "dsir sample" -> graft.pipeline.Corpus
        .dsirSample(d, col("source") === "src1", 2000L),
      "zipf slope" -> graft.pipeline.Corpus.vocabZipfSlope(d)
    ).foreach { case (name, out) =>
      out.collect()
      val lines = out.queryExecution.executedPlan.toString.split("\n")
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          val ctx = lines.slice(math.max(0, i - 2), i).mkString("\n")
          assert(ctx.contains("HashAggregate(keys=[]"),
            s"$name: SinglePartition outside a 1-row global aggregate:\n$ctx")
        }
    }
  }

  test("sessionize splits on gaps and aggregates correctly") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", LongType)))
    val h = 3600L * 1000000000L // 1h in nanos
    val rows = Seq(
      Row(1L, 7L, 0L), Row(2L, 7L, 60L * 1000000000L), // same session
      Row(3L, 7L, 2 * h), // new session (gap 2h - 1min)
      Row(4L, 8L, 0L)).asJava
    val out = Sessionize.sessions(spark.createDataFrame(rows, schema))
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 8L)
  }

  test("multimodal feature extraction: schema, determinism, batching") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.fromDocuments(spark, d)
    val f1 = Multimodal.extractFeatures(media, batchSize = 7).collect()
    val f2 = Multimodal.extractFeatures(media, batchSize = 64).collect()
    assert(f1.length == d.count())
    // batch size must not change results (pure per-record featurize)
    val m1 = f1.map(r => r.id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.id -> r.features.toSeq).toMap
    assert(m1 == m2)
    assert(f1.forall(_.features.length == 16))
    assert(f1.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3))
    assert(f1.forall(r => r.width >= 16 && r.width < 32))
  }

  test("frame sampling keeps every k-th index") {
    val d = docs((1L, "x y z"))
    val media = Multimodal.fromDocuments(spark, d)
    val feats = Multimodal.extractFeatures(media).toDF()
      .withColumn("n_frames", lit(6))
    val out = Multimodal.sampleFrameIndexes(feats, 2).collect()
    assert(out.head.getSeq[Int](out.head.fieldIndex("sampled_frames")).toList == List(0, 2, 4))
  }

  // --- Corpus.chunk -----------------------------------------------------

  private def wordsDoc(id: Long, n: Int): (Long, String) =
    id -> (1 to n).map(i => s"w$i").mkString(" ")

  test("chunk: doc at exactly chunkSize tokens yields one full chunk") {
    val out = pipeline.Corpus.chunk(docs(wordsDoc(1L, 32)), 32, 24).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("chunk_id") == 0L)
    assert(out.head.getAs[Long]("n_chunk_tokens") == 32L)
  }

  test("chunk: boundary exact-multiple (size+stride tokens) yields two full chunks") {
    // 56 = 32 + 24: chunk 0 covers tokens 1..32, chunk 1 covers 25..56 —
    // the last chunk ends exactly at the document boundary
    val out = pipeline.Corpus.chunk(docs(wordsDoc(1L, 56)), 32, 24)
      .orderBy("chunk_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(32L, 32L))
    assert(out(1).getAs[String]("chunk_text").startsWith("w25 "))
    assert(out(1).getAs[String]("chunk_text").endsWith(" w56"))
  }

  test("chunk: one token past the boundary adds a short trailing chunk") {
    val out = pipeline.Corpus.chunk(docs(wordsDoc(1L, 57)), 32, 24)
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    // trailing chunk holds tokens 49..57 = 9 tokens
    assert(out(2).getAs[Long]("n_chunk_tokens") == 9L)
  }

  test("chunk: empty and short docs yield exactly one chunk") {
    // "" splits to [""] (Spark split semantics) — still one chunk, and the
    // chunk round-trips the text unchanged
    val out = pipeline.Corpus.chunk(docs((1L, ""), (2L, "a b")), 32, 24)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("chunk_text") == "")
    assert(out(1).getAs[String]("chunk_text") == "a b")
    assert(out.forall(_.getAs[Long]("chunk_id") == 0L))
  }

  test("chunk rejects stride > chunkSize") {
    intercept[IllegalArgumentException] {
      pipeline.Corpus.chunk(docs((1L, "a")), 8, 9)
    }
  }

  // --- Corpus.packOffsets ----------------------------------------------

  test("packOffsets matches the sequential prefix sum and window math") {
    import org.apache.spark.sql.expressions.Window
    val d = docs((1 to 40).map(i => wordsDoc(i.toLong, i * 7 % 23 + 1)): _*)
    val out = pipeline.Corpus.packOffsets(d, ctx = 16L, numParts = 8)
      .orderBy("doc_id").collect()
    // sequential reference: single-partition running sum
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq_ = d
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("bigint").as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .orderBy("doc_id").collect()
    assert(out.length == seq_.length)
    out.zip(seq_).foreach { case (p, s) =>
      val cum = s.getAs[Long]("cum")
      val n = s.getAs[Long]("n")
      assert(p.getAs[Long]("n_tokens") == n)
      assert(p.getAs[Long]("start_offset") == cum - n)
      assert(p.getAs[Long]("first_window") == (cum - n) / 16L)
      assert(p.getAs[Long]("last_window") == (cum - 1) / 16L)
      assert(p.getAs[Boolean]("spans_boundary") == ((cum - n) / 16L != (cum - 1) / 16L))
    }
  }

  test("packWindows is the exact inverted index of packOffsets") {
    val d = docs((1 to 30).map(i => wordsDoc(i.toLong, i * 5 % 17 + 1)): _*)
    val off = pipeline.Corpus.packOffsets(d, ctx = 8L).orderBy("doc_id").collect()
    val idx = pipeline.Corpus.packWindows(d, ctx = 8L)
      .orderBy("doc_id", "window_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("window_id")))
    val want = off.flatMap { r =>
      (r.getAs[Long]("first_window") to r.getAs[Long]("last_window"))
        .map(w => (r.getAs[Long]("doc_id"), w))
    }
    assert(idx.toSeq == want.toSeq)
    // windows are contiguous from 0 to the last one — a sampler can
    // address any window id below total_tokens/ctx
    val windows = idx.map(_._2).distinct.sorted
    assert(windows.head == 0L && windows.toSeq == (0L to windows.last).toSeq)
  }

  test("packOffsets on an empty corpus returns an empty frame") {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), docSchema)
    assert(pipeline.Corpus.packOffsets(empty).collect().isEmpty)
  }

  test("pack_sequences declared plan has no single-partition exchange") {
    val df = SparkEntry.queries("pack_sequences")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"pack_sequences must run on the distributed prefix plan:\n$plan")
  }

  test("paragraphs split on blank lines, keep positions, drop empty units") {
    val d = docs(
      (1L, "first para here\n\nsecond para there\n\n\n\nthird"),
      (2L, "single paragraph"),
      (3L, "lead\n\n   \n\ntail"))
    val p = pipeline.Corpus.paragraphs(d).orderBy("doc_id", "para_idx").collect()
    assert(p.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq == Seq(
      (1L, 0, "first para here"), (1L, 1, "second para there"), (1L, 2, "third"),
      (2L, 0, "single paragraph"),
      // the whitespace-only middle unit of doc 3 is dropped, positions kept
      (3L, 0, "lead"), (3L, 2, "tail")))
  }

  test("paragraphDedupFilter keeps first occurrence, rebuilds docs, attributes drops") {
    import org.apache.spark.sql.types._
    val unitSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("para_idx", LongType),
      StructField("para_text", StringType)))
    val units = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, 0L, "unique opening"), Row(1L, 1L, "shared footer"),
      Row(2L, 0L, "other body"), Row(2L, 1L, "shared footer"),
      Row(3L, 0L, "shared footer"), Row(3L, 1L, "shared footer")), unitSchema)
    val out = pipeline.Corpus.paragraphDedupFilter(units).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_paras"), r.getAs[Long]("n_dropped"),
        r.getAs[String]("text_clean"), r.getAs[Boolean]("changed")))
    // doc 1 holds the first occurrence of the footer: untouched
    assert(out(0) == (1L, 2L, 0L, "unique opening shared footer", false))
    // doc 2's copy is dropped, its own body survives
    assert(out(1) == (2L, 2L, 1L, "other body", true))
    // doc 3 is footer-only twice over: fully emptied
    assert(out(2) == (3L, 2L, 2L, "", true))
  }

  test("decontaminateSpans removes exactly the leaked 4-gram spans, keeps the rest") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val bench = spark.createDataFrame(java.util.Arrays.asList(
      Row(100L, "what is the capital of france")), schema)
    val corpus = spark.createDataFrame(java.util.Arrays.asList(
      // quotes a bench 4-gram mid-document: loses the covered span only
      Row(1L, "intro words what is the capital question outro words here"),
      // verbatim bench copy: fully emptied
      Row(2L, "what is the capital of france"),
      // clean doc: untouched
      Row(3L, "totally unrelated clean document text")), schema)
    val out = pipeline.Corpus.decontaminateSpans(corpus, bench)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_removed"), r.getAs[Boolean]("changed")))
    // doc 1: windows "what is the capital" matches -> span [2, 6) = 4 tokens
    assert(out(0) == (1L, 4L, true))
    // doc 2: every window leaks -> all 6 tokens removed
    assert(out(1) == (2L, 6L, true))
    assert(out(2) == (3L, 0L, false))
  }

  test("intraDocDedupFilter drops only WITHIN-document copies; cross-doc copies stay") {
    import org.apache.spark.sql.types._
    val unitSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("para_idx", LongType),
      StructField("para_text", StringType)))
    val units = spark.createDataFrame(java.util.Arrays.asList(
      // doc 1 repeats its own header at the bottom (nav-bar shape)
      Row(1L, 0L, "site header"), Row(1L, 1L, "real body"), Row(1L, 2L, "site header"),
      // doc 2 carries the SAME header once: cross-doc copy, must survive
      Row(2L, 0L, "site header"), Row(2L, 1L, "other body"),
      // doc 3 is one unit three times over: only the first survives
      Row(3L, 0L, "chorus"), Row(3L, 1L, "chorus"), Row(3L, 2L, "chorus")), unitSchema)
    val out = pipeline.Corpus.intraDocDedupFilter(units).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_paras"), r.getAs[Long]("n_dropped"),
        r.getAs[String]("text_clean"), r.getAs[Boolean]("changed")))
    assert(out(0) == (1L, 3L, 1L, "site header real body", true))
    // unlike paragraphDedupFilter, doc 2's copy of doc 1's header is KEPT
    assert(out(1) == (2L, 2L, 0L, "site header other body", false))
    assert(out(2) == (3L, 3L, 2L, "chorus", true))
  }

  test("paragraphNearDedupFilter collapses exact AND near-dup copies into one survivor") {
    import org.apache.spark.sql.types._
    val unitSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("para_idx", LongType),
      StructField("para_text", StringType)))
    val boiler = "all rights reserved by the original publisher of this very site"
    val near = "all rights reserved by the original publisher of this very page"
    val units = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, 0L, "completely original opening paragraph with its own words"),
      Row(1L, 1L, boiler),
      Row(2L, 0L, "another unrelated document body written differently here"),
      Row(2L, 1L, boiler), // exact copy -> exact star edge
      Row(3L, 0L, near), // paraphrased copy -> fuzzy edge into the same cluster
      Row(4L, 0L, "xy zz"),
      Row(4L, 1L, "xy zz")), // < 3 tokens: invisible to the fuzzy layer
      unitSchema)
    val out = pipeline.Corpus.paragraphNearDedupFilter(units).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_paras"), r.getAs[Long]("n_dropped"),
        r.getAs[String]("text_clean"), r.getAs[Boolean]("changed")))
    assert(out(0) == (1L, 2L, 0L,
      "completely original opening paragraph with its own words " + boiler, false))
    assert(out(1) == (2L, 2L, 1L,
      "another unrelated document body written differently here", true))
    // the paraphrase is dropped too — exact-only dedup would have kept it
    assert(out(2) == (3L, 1L, 1L, "", true))
    // and the short exact dup is caught by the exact layer
    assert(out(3) == (4L, 2L, 1L, "xy zz", true))
  }

  test("paragraphPairs finds a shared paragraph across docs; short units self-exclude") {
    // Unit ids encode (doc, para) as doc*1000+para, like dedup_paragraphs.
    val boiler = "common footer boilerplate repeated verbatim across sites"
    val units = docs(
      (1000L, "completely original opening paragraph with its own words"),
      (1001L, boiler),
      (2000L, "another unrelated document body written differently here"),
      (2001L, boiler),
      (3000L, "xy zz")) // < 3 tokens: no shingles, must never pair
    val pairs = pipeline.Dedup.paragraphPairs(units).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1001L && pairs.head.getLong(1) == 2001L)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("splitAssign buckets are deterministic, in-range, and respect the pcts") {
    val d = docs((1L to 40L).map(i => (i, s"doc $i")): _*)
    val a = pipeline.Corpus.splitAssign(d).orderBy("doc_id").collect()
    val b = pipeline.Corpus.splitAssign(d).orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // no RNG state
    a.foreach { r =>
      val pct = r.getAs[Long]("bucket_pct")
      val split = r.getAs[String]("split")
      assert(pct >= 0 && pct < 100)
      assert(split == (if (pct < 80) "train" else if (pct < 90) "valid" else "test"))
    }
    intercept[IllegalArgumentException] {
      pipeline.Corpus.splitAssign(d, trainPct = 70, validPct = 40)
    }
  }

  test("bigramModel probabilities sum to 1 per conditioning word") {
    val bg = docs((1L, "a b a c a b"), (2L, "a b c"))
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 2)).as("bg"))
    val m = pipeline.Corpus.bigramModel(bg).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // P(w2|w1) sums to 1 over observed w2 for each w1 (micro log-probs)
    m.keys.map(_.split(" ")(0)).toSeq.distinct.foreach { w1 =>
      val total = m.collect { case (k, v) if k.startsWith(w1 + " ") =>
        math.exp(v / 1e6) }.sum
      assert(math.abs(total - 1.0) < 1e-3, s"w1=$w1 sums to $total")
    }
    // and the most frequent continuation scores highest
    assert(m("a b") > m("a c"))
  }

  // --- dot products: NULL element propagation ---------------------------

  test("dotF/dotFD propagate NULL array elements (not silently 0)") {
    val row = spark.sql(
      """SELECT
        |  array(cast(1.0 as float), cast(null as float)) AS af,
        |  array(cast(2.0 as float), cast(3.0 as float)) AS bf,
        |  array(cast(2.0 as double), cast(3.0 as double)) AS bd""".stripMargin)
    val out = row.select(
      graft.functions.dotF(col("af"), col("bf")).as("f"),
      graft.functions.dotFD(col("af"), col("bd")).as("fd")).collect().head
    assert(out.isNullAt(0), "dotF must be NULL when an element is NULL")
    assert(out.isNullAt(1), "dotFD must be NULL when an element is NULL")
    // and non-null inputs still compute
    val ok = row.select(
      graft.functions.dotF(col("bf"), col("bf")).as("f")).collect().head
    assert(ok.getDouble(0) == 13.0)
  }

  test("simhashPairs64 with bands=1 keeps a full-width mask (exact-dup join)") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated words that share nothing at all ok"))
    // bands=1, maxHamming=0: only identical 64-bit fingerprints may pair.
    // Before the mask fix (1L << 64 wraps to 1), EVERY doc landed in one
    // bucket; now the band value is the full fingerprint.
    val pairs = Dedup.simhashPairs64(d, maxHamming = 0, bands = 1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }

  // --- KMV distinct sketch ----------------------------------------------

  test("kmvSketch: k smallest distinct values across partitions, duplicates absorbed") {
    import spark.implicits._
    // values 0..199 each present twice, spread over 7 partitions
    val d = ((0L until 200L) ++ (0L until 200L)).toDF("h").repartition(7)
    val out = d.agg(graft.functions.kmvSketch(col("h"), 16).as("kmv"))
      .collect().head.getSeq[Long](0)
    assert(out == (0L until 16L))
  }

  test("kmvSketch: under-full sketch is the exact distinct set") {
    import spark.implicits._
    val d = Seq(5L, 3L, 5L, 9L, 3L).toDF("h").repartition(3)
    val out = d.agg(graft.functions.kmvSketch(col("h"), 16).as("kmv"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(3L, 5L, 9L))
  }

  test("kmvTypes: exact when a source has fewer than k types; estimate within 2k^-1/2") {
    val small = docs((1L, "a b c a b"))
    val row = pipeline.Corpus.kmvTypes(small, k = 64).collect().head
    assert(row.getAs[Long]("kmv_k") == 3L)
    assert(row.getAs[Long]("n_types") == 3L)
    assert(row.getAs[Double]("est_types") == 3.0)
    assert(row.getAs[Double]("rel_err") == 0.0)
    // over-full: one source, 2000 distinct tokens, k=64 -> KMV's
    // relative standard error is ~k^-1/2 (0.125); 4 sigma bound
    val big = spark.createDataFrame(
      Seq(Row(1L, (1 to 2000).map(i => s"tok$i").mkString(" "), "s")).asJava,
      docSchema)
    val b = pipeline.Corpus.kmvTypes(big, k = 64).collect().head
    assert(b.getAs[Long]("kmv_k") == 64L)
    assert(b.getAs[Double]("rel_err") < 0.5)
  }

  test("kmvTypes witness-free plan: ObjectHashAggregate pair, single k-bounded exchange") {
    val d = docs((1L, "a b c"), (2L, "d e f"))
    val plan = pipeline.Corpus.kmvTypes(d, k = 64, witness = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"witness-free KMV must shuffle only the k-bounded partials, got $exchanges exchanges:\n$plan")
  }

  test("Chains.releaseAll forgets session-staged state: memos rebuild after release") {
    // the teardown contract (round-16 advice): after releaseAll the
    // session must not be served stale staged frames — a fresh request
    // rebuilds. Pinned on PackChain (cheap at sf0.001); the same memo
    // pattern backs every chain the sweep covers.
    val dir = "/root/testdata/sf0.001"
    def d = spark.read.parquet(s"$dir/documents.parquet")
    val (ctx1, m1) = pipeline.PackChain.materialized(spark, dir, d)
    assert(ctx1 == 512L)
    val n1 = m1.count() // before release: an unpersisted localCheckpoint
    //                     has truncated lineage and cannot be recounted
    // same session, same dir: the memo serves the identical frame
    assert(pipeline.PackChain.materialized(spark, dir, d)._2 eq m1)
    pipeline.Chains.releaseAll(spark)
    val (_, m2) = pipeline.PackChain.materialized(spark, dir, d)
    assert(!(m2 eq m1), "release must drop the memo, not serve the dead frame")
    // and the rebuilt frame carries the same content
    assert(m2.count() == n1)
  }

  test("packShuffle: train_pos is a 1..N bijection; epochs permute independently; no SinglePartition") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e0 = pipeline.Corpus.packShuffle(d, ctx = 512L, epoch = 0)
    e0.collect()
    val plan = e0.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global order must come from the distributed rank plan:\n$plan")
    def posMap(epoch: Int) =
      pipeline.Corpus.packShuffle(d, ctx = 512L, epoch = epoch).collect()
        .map(r => r.getAs[Long]("window_id") -> r.getAs[Long]("train_pos")).toMap
    val (p0, p1) = (posMap(0), posMap(1))
    assert(p0.keySet == p1.keySet, "an epoch reshuffles, never drops windows")
    assert(p0.values.toSeq.sorted == (1L to p0.size).toSeq, "positions are a 1..N bijection")
    // different epochs give genuinely different permutations
    assert(p0.keySet.count(w => p0(w) != p1(w)) > p0.size / 2,
      "epoch salt must decorrelate the order")
    // and the order is NOT the corpus order (that is the point)
    assert(p0.keySet.toSeq.sorted.map(p0).zipWithIndex.exists {
      case (pos, i) => pos != i + 1L })
  }

  test("packBatchesEpochs: per-epoch manifests batch in 8s, epoch salt decorrelates, no SinglePartition") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = pipeline.Corpus.packBatchesEpochs(d, ctx = 512L)
    val rows = out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // single-partition exchanges are legitimate ONLY under the 1-row
    // global aggregates (the mix-weight denominator); a corpus-sized
    // sort/window must never run on one partition
    val lines = plan.split("\n")
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val ctx = lines.slice(math.max(0, i - 2), i).mkString("\n")
        assert(ctx.contains("HashAggregate(keys=[]"),
          s"SinglePartition outside a 1-row global aggregate:\n$ctx")
      }
    val epochs = rows.map(_.getAs[Int]("epoch")).distinct.sorted.toSeq
    assert(epochs.head == 0 && epochs.size >= 2, s"epochs seen: $epochs")
    epochs.foreach { e =>
      val b = rows.filter(_.getAs[Int]("epoch") == e)
        .sortBy(_.getAs[Long]("batch_id"))
      assert(b.map(_.getAs[Long]("batch_id")).toSeq == (0L until b.length).toSeq,
        s"epoch $e: batch ids must be dense from 0")
      b.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("n_windows") == 8L, s"epoch $e: non-tail batch not full"))
      assert(b.last.getAs[Long]("n_windows") <= 8L)
    }
    // epoch allocations only shrink: a source participates in epoch e+1
    // only if it participated (at least as fully) in epoch e
    val tok = epochs.map(e => e ->
      rows.filter(_.getAs[Int]("epoch") == e).map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(epochs.sliding(2).forall {
      case Seq(a, b) => tok(b) <= tok(a); case _ => true })
    // the epoch salt must give epoch 1 a different batch composition
    // than epoch 0 even when the doc subsets coincide
    if (epochs.contains(1) && tok(1) == tok(0)) {
      val m0 = rows.filter(_.getAs[Int]("epoch") == 0)
        .sortBy(_.getAs[Long]("batch_id")).map(_.getAs[String]("batch_md5")).toSeq
      val m1 = rows.filter(_.getAs[Int]("epoch") == 1)
        .sortBy(_.getAs[Long]("batch_id")).map(_.getAs[String]("batch_md5")).toSeq
      assert(m0 != m1, "identical doc subsets must still reshuffle per epoch")
    }
  }

  // --- weighted sampling / mix weights ----------------------------------

  test("weightedSample: A-ES key formula and descending deterministic order") {
    val d = docs((1L, "a b c d"), (2L, "a b"), (3L, "a b c d e f g h"))
    val out = pipeline.Corpus.weightedSample(d, 3).collect()
    assert(out.length == 3)
    // recompute each key: u = (hash32("wsample_<id>")+1)/2^32, key = ln(u)/w
    val hs = d.sparkSession.range(1)
    val expected = out.map { r =>
      val id = r.getAs[Long]("doc_id")
      val w = r.getAs[Long]("n_tokens")
      val h = hs.select(
        TextOps.hash32(concat(lit("wsample_"), lit(id).cast("string"))).as("h"))
        .collect().head.getLong(0)
      val key = math.log((h + 1).toDouble / 4294967296.0) / w
      BigDecimal(key).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.map(_.getAs[Double]("sample_key")).zip(expected).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-9)
    }
    // ordering: keys descending
    val keys = out.map(_.getAs[Double]("sample_key")).toSeq
    assert(keys == keys.sorted.reverse)
  }

  test("mixWeights: sqrt-temperature shares over exact token counts") {
    // sources with 9 and 16 tokens -> sqrt weights 3 and 4 -> 3/7, 4/7
    val d = spark.createDataFrame(Seq(
      Row(1L, (1 to 9).map(_ => "w").mkString(" "), "a"),
      Row(2L, (1 to 16).map(_ => "w").mkString(" "), "b")).asJava, docSchema)
    val out = pipeline.Corpus.mixWeights(d).orderBy("source").collect()
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(9L, 16L))
    assert(math.abs(out(0).getAs[Double]("mix_weight") - 3.0 / 7) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("mix_weight") - 4.0 / 7) < 1e-6)
  }

  test("Bpe: Spark replace chain matches a JVM-side String.replace fold") {
    // The cross-engine contract is "chained left-to-right
    // non-overlapping replace"; this pins Spark's StringReplace to
    // java.lang.String.replace on the real committed merge table
    // (DuckDB's replace is pinned by the oracle compare).
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "flower power shower tower",      // heavy 'ow'-family merges
      "aaa sss eee rrr",                // self-overlapping runs
      "short",
      "x")
    val want = samples.map(s =>
      pipeline.Bpe.Merges.foldLeft(s) { case (acc, (p, r)) => acc.replace(p, r) })
    import spark.implicits._
    val got = samples.toDF("text")
      .select(pipeline.Bpe.encode(col("text")).as("e"), pipeline.Bpe.tokenCount(col("text")).as("n"))
      .collect()
    got.map(_.getString(0)).toSeq.zip(want).foreach { case (g, w) => assert(g == w) }
    got.map(_.getLong(1)).toSeq.zip(want).foreach { case (g, w) => assert(g == w.length.toLong) }
    // merges genuinely compress: the first sample must shrink
    assert(want.head.length < samples.head.length)
  }

  test("BpeEncodeF kernel equals the replace-chain fold on random ASCII") {
    // The fused one-buffer kernel must match the committed semantics
    // (chained left-to-right non-overlapping String.replace) on
    // arbitrary input, including self-overlapping runs and strings
    // where no merge fires.
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghij lmnopqrstuvw   " // space-heavy, like text
    val samples = Seq("", "a", "aaa sss eee", "zzz qqq") ++
      (0 until 300).map { _ =>
        val len = rnd.nextInt(150)
        (0 until len).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      }
    samples.foreach { s =>
      val want = pipeline.Bpe.Merges.foldLeft(s) {
        case (acc, (p, r)) => acc.replace(p, r)
      }
      val got = org.apache.spark.sql.graft.expressions.BpeEncodeF.encode(s)
      assert(got == want, s"kernel diverges on ${s.take(40)}...")
      // the rank-capped budget encode equals the fold of the PREFIX
      Seq(0, 1, 64, 256).foreach { b =>
        val wantB = pipeline.Bpe.Merges.take(b).foldLeft(s) {
          case (acc, (p, r)) => acc.replace(p, r)
        }
        assert(org.apache.spark.sql.graft.expressions.BpeEncodeF.encode(s, b) == wantB,
          s"budget-$b kernel diverges on ${s.take(40)}...")
      }
    }
  }

  test("Bpe: char-47 table is the prefix of the byte table; symbols well-formed") {
    // trained to SATURATION on the fixture corpus (training stops when
    // no pair repeats), so the exact count is a property of the data
    assert(pipeline.Bpe.Merges.size == 2400)
    assert(pipeline.Bpe.MergesChar == pipeline.Bpe.Merges.take(47))
    pipeline.Bpe.Merges.zipWithIndex.foreach { case ((p, r), i) =>
      assert(r == (0xE000 + i).toChar.toString, s"rank $i: bad symbol")
      assert(p.length == 2, s"rank $i: pair must be two symbols")
      p.foreach(c => assert(c < 128 || (c >= 0xE000 && c < 0xE000 + i),
        s"rank $i: pair symbol must be ASCII or an EARLIER merge output"))
    }
  }

  test("BpePairsF: left-to-right non-overlapping scan matches replace semantics") {
    import org.apache.spark.sql.graft.expressions.BpePairsF
    // run handling: "aaa" -> one "aa" (the replace consumes both),
    // "aaaa" -> two, "aab" -> "aa" then "ab" (candidate pairs are
    // counted independently, the trainer's approximation)
    assert(BpePairsF.pairsArray("aaa").toSeq == Seq("aa"))
    assert(BpePairsF.pairsArray("aaaa").toSeq == Seq("aa", "aa"))
    assert(BpePairsF.pairsArray("aab").toSeq == Seq("aa", "ab"))
    assert(BpePairsF.pairsArray("a").isEmpty)
    assert(BpePairsF.pairsArray("").isEmpty)
    // for every pair p, its count in the scan equals the number of
    // replacements a left-to-right replace(p, X) performs
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val s = (0 until 1 + rnd.nextInt(30))
        .map(_ => "abc".charAt(rnd.nextInt(3))).mkString
      val counts = BpePairsF.pairsArray(s).groupBy(identity)
        .map { case (k, v) => k -> v.length }
      for (a <- "abc"; b <- "abc") {
        val p = s"$a$b"
        val replaced = s.replace(p, "")
        val fired = (s.length - replaced.length) / 2  // each fire removes 2 chars
        assert(counts.getOrElse(p, 0) == fired,
          s"pair $p in '$s': scan=${counts.getOrElse(p, 0)} replace=$fired")
      }
    }
  }

  test("cross-invariant: winnow candidates cover substring-dedup shared runs >= w+n-1") {
    // Winnowing's guarantee (Schleimer-Wilkerson-Aiken): two documents
    // sharing an aligned contiguous run of >= w+n-1 tokens share at
    // least one SELECTED fingerprint (the rightmost-min pick inside the
    // one full window the run contains depends only on window content).
    // Derive the claimed pairs from the substring-dedup tier's own
    // window attribution on the real corpus — doc B windows whose
    // first occurrence lies in doc A at a constant offset with
    // consecutive positions, runs of >= w windows — and assert every
    // one appears in the UNCAPPED winnow candidate graph (the funnel's
    // df<=16 graph additionally stop-lists boilerplate, a deliberate
    // recall trade the report documents).
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = pipeline.Corpus.SubstringN
    val w = 4
    val wins = d
      .select(col("doc_id"), pipeline.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(when(size(col("t")) < n, array().cast("array<struct<p:int,wkey:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("t")) - n), p =>
            struct(p.cast("int").as("p"),
              md5(concat_ws(" ", slice(col("t"), p + 1, lit(n)))).as("wkey")))))
          .as("win"))
      .select(col("doc_id"), col("win.p").as("p"), col("win.wkey").as("wkey"))
    val firsts = wins.groupBy("wkey")
      .agg(min(struct(col("doc_id"), col("p"))).as("f"))
      .select(col("wkey"), col("f.doc_id").as("a"), col("f.p").as("pa"))
    val rep = wins.join(firsts, "wkey")
      .where(col("doc_id") =!= col("a"))
      .select(col("a"), col("pa"), col("doc_id").as("b"), col("p").as("pb"))
    val byRun = Window
      .partitionBy(col("a"), col("b"), (col("pb") - col("pa")).as("diff"))
      .orderBy("pb")
    val claimed = rep
      .withColumn("island", col("pb") - row_number().over(byRun))
      .groupBy(col("a"), col("b"), (col("pb") - col("pa")).as("diff"), col("island"))
      .agg(count(lit(1)).as("runLen"))
      .where(col("runLen") >= w)
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(claimed.nonEmpty, "vacuous fixture: no long shared runs in corpus")
    val winnow = pipeline.Corpus
      .winnowCandidatePairs(d, maxDf = Int.MaxValue)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = claimed -- winnow
    assert(missed.isEmpty, s"winnow missed guaranteed pairs: ${missed.take(5)}")
  }

  test("winnow gate vs LSH gate: verbatim shared run with low whole-doc Jaccard") {
    // The case that separates corpus_prepare_winnow from
    // corpus_prepare (identical on the synthetic corpus, where
    // near-dups are whole-document mutations): doc 2 embeds an
    // 11-token verbatim run of doc 1 inside otherwise-distinct text.
    // Whole-doc 3-gram Jaccard is far below the 0.5 LSH-verify
    // threshold, but the run is >= w+n-1 tokens, so winnowing
    // GUARANTEES a shared fingerprint — doc 2 is a winnow
    // non-canonical while the Jaccard tier keeps it.
    val run = (5 to 15).map(i => s"w$i").mkString(" ")
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = ((1 to 10).map(i => s"x$i") ++ Seq(run) ++
      (1 to 10).map(i => s"y$i")).mkString(" ")
    val d = docs((1L, a), (2L, b))
    val wPairs = pipeline.Corpus.winnowCandidatePairs(d).collect()
    assert(wPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      "the shared run must produce a winnow candidate pair")
    val nonCanon = pipeline.Dedup.clusters(
        pipeline.Corpus.winnowCandidatePairs(d).select("doc_a", "doc_b"))
      .where(!col("is_canonical")).collect().map(_.getLong(0)).toSeq
    assert(nonCanon == Seq(2L), "doc 2 is the winnow non-canonical")
    // exact whole-doc Jaccard on 3-gram shingles is below the LSH
    // verify threshold, so the Jaccard tier does NOT treat 2 as a dup
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
    assert(j < 0.5, s"fixture must keep whole-doc jaccard low, got $j")
  }

  test("distributed TrainQualityModel reproduces the committed weights exactly") {
    // the distributed pass (map-only QmFeaturesF kernel + hash-capped
    // ordered collect of the bounded feature matrix) must re-derive
    // the committed integer-micro fixture bit for bit
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = tools.TrainQualityModel.trainingMatrix(d)
    val (wh, wd, b, acc) = tools.TrainQualityModel.fit(feats)
    assert(wh.toSeq == pipeline.Corpus.QualityModelWMicro.toSeq)
    assert(wd.toSeq == pipeline.Corpus.QualityModelDenseWMicro.toSeq)
    assert(b == pipeline.Corpus.QualityModelBiasMicro)
    assert(acc >= 0.93)
  }

  test("embedding spectrum: shares close, PR bounded, collapse detected") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rot = pipeline.Opq.trainRotation(e)
    val spec = pipeline.Similarity.embeddingSpectrum(e, rot).collect()
    assert(spec.length == 64)
    // integer-div shares must sum to <= 1000 and within 64 of it
    val shareSum = spec.map(_.getAs[Long]("share_pm")).sum
    assert(shareSum <= 1000 && shareSum >= 1000 - 64)
    assert(spec.map(_.getAs[Long]("cum_share_pm")).max <= 1000)
    val dim = pipeline.Similarity.embeddingIntrinsicDim(e, rot).collect().head
    val pr = dim.getAs[Long]("participation_ratio_micro")
    assert(pr >= 1000000L && pr <= 64000000L)
    // isotropic fixture: PR should be high (near d)
    assert(pr > 40000000L, s"isotropic corpus should read high PR, got $pr")
    // COLLAPSED fixture: energy on one axis -> PR near 1, 90% in 1 dim
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val collapsed = spark.createDataFrame(
      java.util.Arrays.asList((0 until 32).map { i =>
        R(i.toLong, Array.tabulate(64)(j =>
          if (j == 0) (1.0f + i) else 0.001f * ((i + j) % 3)))
      }: _*), schema)
    val ident = Array.tabulate(64, 64)((a, b) => if (a == b) 1.0 else 0.0)
    val cdim = pipeline.Similarity.embeddingIntrinsicDim(collapsed, ident)
      .collect().head
    assert(cdim.getAs[Long]("participation_ratio_micro") < 3000000L)
    assert(cdim.getAs[Long]("dims_for_90pct") == 1L)
  }

  test("events RFM segmentation: quartile arithmetic pinned by hand") {
    import org.apache.spark.sql.{Row => R}
    // 8 users, metrics arranged so user u has recency rank u+1,
    // frequency rank u+1, monetary rank u+1 -> quartile u/2 for all 3
    val rows = (0 until 8).flatMap { u =>
      val nEv = 9 - u // frequency: user 0 most active
      (0 until nEv).map { k =>
        R(u * 100L + k, // event_id
          new java.sql.Timestamp(1700000000000L - u * 3600000L + k),
          u.toLong,
          if (k == 0) "purchase" else "click",
          if (k == 0) (800.0 - u * 100.0) else 1.0)
      }
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val ev = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    import scala.jdk.CollectionConverters._
    val e = ev.select(col("user_id"), col("event_type"), col("value"),
      graft.sources.Bars.eventTimeMicros(ev).as("us"))
    val u = e.groupBy("user_id").agg(
      max(col("us")).as("last_us"),
      count(lit(1)).cast("bigint").as("n_events"),
      sum(when(col("event_type") === "purchase",
        floor(col("value") * 100 + 0.5).cast("bigint")).otherwise(0L)).as("cents"))
    val (r1, n) = plans.Scale.rowNumberDistributedWithTotal(
      u, Seq(col("last_us").desc, col("user_id").asc), "_rr")
    assert(n == 8)
    val got = r1.select(col("user_id"), expr("((_rr - 1) * 4) div 8").as("r_q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user u is the (u+1)-th most recent -> quartile u/2
    (0 until 8).foreach(u => assert(got(u.toLong) == u / 2, s"user $u"))
  }

  test("distributed TrainLangModel reproduces the committed NB weights exactly") {
    // closed-form trainer: one distributed (lang, bucket) count pass,
    // driver-side Laplace log + half-up micro rounding — must
    // re-derive the committed fixture bit for bit
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (cnt, nd) = tools.TrainLangModel.counts(d)
    val fitted = tools.TrainLangModel.fit(cnt, nd)
    assert(fitted.map(_._1) == pipeline.Corpus.LangIdLangs)
    fitted.zipWithIndex.foreach { case ((_, w, b), i) =>
      assert(w.toSeq == pipeline.Corpus.LangIdWMicro(i).toSeq)
      assert(b == pipeline.Corpus.LangIdBiasMicro(i))
    }
  }

  test("char-trigram lang-ID is measurably WORSE than token buckets on this fixture") {
    // the round-17 negative result pinned reproducible (see
    // TrainLangModel scaladoc): fastText's char-n-gram feature space
    // buys orthography signal real multilingual text has — this
    // fixture draws every language from the SAME English vocabulary,
    // so trigrams only dilute the frequency-mixture evidence across
    // boundary grams. Train both on sf0.001, evaluate on held-out
    // sf0.01: token buckets must stay strictly ahead, and both exact
    // accuracies are pinned so a fixture or trainer change that moves
    // the comparison is surfaced, not silently absorbed.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ev = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val (tokCnt, tokNd) = tools.TrainLangModel.counts(d)
    val tok = tools.TrainLangModel.fit(tokCnt, tokNd)
    val (c3Cnt, c3Nd) = tools.TrainLangModel.countsC3(d)
    val c3 = tools.TrainLangModel.fit(c3Cnt, c3Nd, tools.TrainLangModel.BC)
    val (tokC, n) = tools.TrainLangModel.evalAccuracy(
      ev, tok, "li_", tools.TrainLangModel.B, charGrams = false)
    val (c3C, n2) = tools.TrainLangModel.evalAccuracy(
      ev, c3, "lc_", tools.TrainLangModel.BC, charGrams = true)
    assert(n == 500 && n2 == 500)
    assert((tokC, c3C) == (209L, 117L), s"measured ($tokC, $c3C)")
    assert(tokC > c3C)
  }

  test("lang_id_model argmax and tie-break pinned by hand") {
    // per-language scores are exact integer folds of the committed
    // table; the prediction is argmax with ties to the alphabetically
    // first label. Hand fold in the JVM = the independent expected.
    val texts = Seq(7L -> "the hash join order table", 8L -> "x")
    val d = spark.createDataFrame(
      texts.map { case (id, t) => (id, t, "en") }).toDF("doc_id", "text", "lang")
    val got = pipeline.Corpus.langIdModelScore(d).orderBy("doc_id").collect()
    val langs = pipeline.Corpus.LangIdLangs
    texts.zip(got).foreach { case ((_, t), r) =>
      val bkts = t.split(" ").map { tok =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"li_$tok".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        (java.lang.Long.parseLong(md5, 16) % 64).toInt
      }
      val scores = langs.indices.map { i =>
        pipeline.Corpus.LangIdBiasMicro(i) +
          bkts.map(b => pipeline.Corpus.LangIdWMicro(i)(b)).sum
      }
      langs.indices.foreach(i => assert(r.getLong(2 + i) == scores(i)))
      val best = langs.indices.minBy(i => (-scores(i), langs(i))).toInt
      assert(r.getString(2 + langs.size) == langs(best))
    }
  }

  test("Bpe token ids: bijective with symbols, losslessly decodable, vocab-bounded") {
    import org.apache.spark.sql.graft.expressions.{BpeEncodeF, BpeIdsF}
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    texts.foreach { t =>
      val sym = BpeEncodeF.encode(t)
      val ids = BpeIdsF.idsArray(sym)
      assert(ids.length == sym.length, "one id per symbol")
      assert(ids.forall(id => id >= 0 && id < 256 + pipeline.Bpe.Merges.size),
        "ids bounded by the vocab (256 bytes + merge ranks)")
      assert(BpeIdsF.symbols(ids) == sym, "ids -> symbols round-trips")
      assert(pipeline.Bpe.decodeString(BpeIdsF.symbols(ids)) == t,
        "ids decode to byte-exact text")
    }
    intercept[IllegalArgumentException] { BpeIdsF.idsArray("\uF000") }
    intercept[IllegalArgumentException] { BpeIdsF.symbols(Array(99999)) }
  }

  test("BpeTrain resume: training composes across a vocabulary extension") {
    // train(raw, 24) must equal train(raw, 16) ++ train(encoded_16, 8,
    // startRank = 16) — the compositionality that lets a deployment
    // extend its committed table from the stored ENCODED corpus
    // without re-running the first merges over raw text
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("s"))
    val full = tools.BpeTrain.train(corpus, nMerges = 24)
    val head = full.take(16)
    val encoded = head.foldLeft(corpus) { case (df, (p, r, _)) =>
      df.withColumn("s", call_function("replace", col("s"), lit(p), lit(r)))
    }
    val resumed = tools.BpeTrain.train(encoded, nMerges = 8, startRank = 16)
    assert(full.drop(16) == resumed)
    // resume refuses symbols at-or-above startRank in the input
    intercept[IllegalArgumentException] {
      tools.BpeTrain.train(encoded, nMerges = 1, startRank = 8)
    }
  }

  test("distributed BpeTrain reproduces the committed table prefix on the real corpus") {
    // the committed BpeMergesTable (2400 rows, trained to saturation) was generated by this same
    // distributed procedure; re-training the first 16 merges here pins
    // rank, pair, symbol AND frequency against the committed artifact
    // (frequencies hardcoded from the generation run)
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("s"))
    val got = tools.BpeTrain.train(corpus, nMerges = 16)
    assert(got.map(r => (r._1, r._2)) == pipeline.Bpe.Merges.take(16))
    assert(got.map(_._3) == Seq(5505L, 4650L, 3690L, 2880L, 2858L, 2763L,
      2223L, 2163L, 2143L, 1928L, 1873L, 1873L, 1836L, 1806L, 1563L, 1476L))
  }

  test("packMaterialize windows reassemble the global token stream exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d = (0L until 12L).map { id =>
      (id, (0 until 1 + rnd.nextInt(12)).map(i => s"t${id}_$i").mkString(" "))
    }
    val ctx = 7
    val out = pipeline.Corpus.packMaterialize(d.toDF("doc_id", "text"), ctx = ctx)
      .orderBy("window_id").collect()
    // expected: concatenate all docs in id order, slice into ctx-token
    // windows, md5 each joined slice
    val stream = d.flatMap(_._2.split(" ", -1))
    val wins = stream.grouped(ctx).toSeq
    assert(out.length == wins.length)
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.zip(wins).zipWithIndex.foreach { case ((r, w), i) =>
      assert(r.getAs[Long]("window_id") == i.toLong)
      assert(r.getAs[Long]("n_tokens") == w.length.toLong,
        s"window $i token count")
      assert(r.getAs[String]("window_md5") == m(w.mkString(" ")),
        s"window $i content")
    }
    // all but the tail are exactly full
    out.dropRight(1).foreach(r => assert(r.getAs[Long]("n_tokens") == ctx.toLong))
  }

  test("contaminationAttribution: leak counts per bench doc, zero when clean") {
    // bench doc 1 leaks into corpus docs 10 and 20 (shared 4-gram runs);
    // bench doc 2 shares nothing -> explicit zero row
    val corpus = docs(
      (10L, "x a b c d y"),       // contains bench 1's "a b c d"
      (20L, "a b c d e"),          // contains "a b c d" and "b c d e"
      (30L, "q r s t u v"))
    val bench = docs(
      (1L, "a b c d e"),
      (2L, "m n o p"))
    val out = pipeline.Dedup.contaminationAttribution(corpus, bench, n = 4)
      .orderBy("bench_id").collect()
    assert(out.length == 2)
    val r1 = out.head
    assert(r1.getAs[Long]("bench_id") == 1L)
    assert(r1.getAs[Long]("n_leaking_docs") == 2L)
    assert(r1.getAs[Long]("n_shared_grams") == 2L) // "a b c d" + "b c d e"
    val r2 = out(1)
    assert(r2.getAs[Long]("bench_id") == 2L)
    assert(r2.getAs[Long]("n_leaking_docs") == 0L)
    assert(r2.getAs[Long]("n_shared_grams") == 0L)
  }

  test("packPaddingStats: exact ceil-div sequences and waste fraction") {
    import scala.jdk.CollectionConverters._
    // ctx=4: docs of 1 / 4 / 5 tokens -> 1+1+2 sequences, 16 slots for
    // 10 tokens -> padding 6/16 = 0.375
    val d = spark.createDataFrame(Seq(
      Row(1L, "a", "s"),
      Row(2L, "a b c d", "s"),
      Row(3L, "a b c d e", "s")).asJava, docSchema)
    val out = pipeline.Corpus.packPaddingStats(d, ctx = 4L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_tokens") == 10L)
    assert(r.getAs[Long]("n_seqs_padded") == 4L)
    assert(r.getAs[Double]("padding_frac") == 0.375)
  }

  test("packMaterializeBpe windows slice the encoded stream; decode recovers text") {
    import spark.implicits._
    import org.apache.spark.sql.graft.expressions.BpeEncodeF
    val rnd = new scala.util.Random(13)
    val words = Vector("the", "slower", "power", "quick", "juice", "a", "of")
    val d = (0L until 10L).map { id =>
      (id, (0 until 2 + rnd.nextInt(10)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val ctx = 9
    val out = pipeline.Corpus.packMaterializeBpe(d.toDF("doc_id", "text"), ctx = ctx)
      .orderBy("window_id").collect()
    // expected: concatenate the JVM-encoded symbol strings in doc
    // order (symbols ARE tokens, no separator), slice into ctx chunks
    val stream = d.map(x => BpeEncodeF.encode(x._2)).mkString("")
    val wins = stream.grouped(ctx).toSeq
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.length == wins.length)
    out.zip(wins).foreach { case (r, w) =>
      assert(r.getAs[Long]("n_tokens") == w.length.toLong)
      assert(r.getAs[String]("window_md5") == m(w))
    }
    // the stream is decodable back to the concatenated original texts
    // (decode is per-symbol context-free, so it distributes over the
    // doc concatenation)
    assert(pipeline.Bpe.decodeString(stream) == d.map(_._2).mkString(""))
  }

  test("TextCountsF matches the higher-order Column spelling incl. edge cases") {
    import spark.implicits._
    // hand-picked edges (empty string -> one empty token; double
    // spaces -> empty tokens inside shingles; uppercase-only tokens
    // fail the [a-z] test) plus random stopword-heavy strings
    val samples = Seq(
      "", " ", "a", "a ", " a", "a  b", "the a of to and the",
      "el la de y que", "the quick brown fox the quick brown fox",
      "x y z x y z x y z", "A B C", "the  the  the")
    val rnd = new scala.util.Random(3)
    val vocab = Seq("the", "a", "of", "el", "y", "que", "fox", "dog", "X", "")
    val all = samples ++ (0 until 150).map { _ =>
      (0 until rnd.nextInt(30))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val df = all.toDF("text")
    val t = TextOps.tokens(col("text"))
    val sh = TextOps.shingles(col("text"))
    val want = df.select(
      size(t), size(filter(t, x => x.isin(TextOps.EnStop: _*))),
      size(filter(t, x => x.isin(TextOps.EsStop: _*))),
      size(filter(t, x => x.rlike("[a-z]"))),
      size(array_distinct(filter(t, x => x.isin(TextOps.EnStop: _*)))),
      size(sh), size(array_distinct(sh))).collect().map(_.toSeq)
    val got = df.select(TextOps.textCounts(col("text")).as("tc"))
      .select("tc.*").collect().map(_.toSeq)
    want.zip(got).zip(all).foreach { case ((w, g), s) =>
      assert(w == g, s"TextCountsF diverges on '${s.take(40)}'")
    }
  }

  test("Wordpiece kernel: greedy longest-match, ## discipline, lossless over the corpus") {
    val vocab = pipeline.Wordpiece.Vocab.map(_._1)
    val initV = vocab.filterNot(_.startsWith("##")).toSet
    val contV = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    texts.take(100).foreach { t =>
      val words = t.split(" ").filter(_.nonEmpty).toSeq
      val perWord = words.map(w => (w, pipeline.Wordpiece.encodeString(w)))
      // doc segmentation decomposes into per-word segmentations
      assert(pipeline.Wordpiece.encodeString(t) == perWord.flatMap(_._2))
      perWord.foreach { case (w, ps) =>
        assert(!ps.head.startsWith("##") && ps.tail.forall(_.startsWith("##")),
          s"## discipline violated on '$w': $ps")
        // lossless: pieces concatenate back to the word
        assert(ps.map(p => if (p.startsWith("##")) p.substring(2) else p).mkString == w)
        // greedy: no LONGER vocab piece matches at any emitted position,
        // and any non-vocab piece is a single-char byte fallback
        var pos = 0
        ps.foreach { p =>
          val raw = if (p.startsWith("##")) p.substring(2) else p
          val set = if (pos == 0) initV else contV
          ((raw.length + 1) to (w.length - pos)).foreach { l =>
            assert(!set.contains(w.substring(pos, pos + l)),
              s"greedy violated on '$w' at $pos: '${w.substring(pos, pos + l)}' in vocab")
          }
          if (!set.contains(raw)) assert(raw.length == 1, s"non-vocab piece '$raw' not a fallback char")
          pos += raw.length
        }
      }
    }
  }

  test("Wordpiece budget kernel: prefix semantics, monotone fertility, saturation = full") {
    import org.apache.spark.sql.graft.expressions.WordpieceEncodeF
    def count(s: String, b: Int) = WordpieceEncodeF.encode(s, b).numElements()
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().collect().map(_.getString(0))
    words.foreach { w =>
      // budget 0 = pure char fallback; piece count never increases with budget
      assert(count(w, 0) == w.length)
      val counts = Seq(0, 12, 25, 50, 100).map(b => count(w, b))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"fertility must be monotone in budget on '$w': $counts")
      // the saturated table covers every corpus word; 100 merges = full vocab
      assert(count(w, 100) == 1 && count(w, Int.MaxValue) == 1)
    }
  }

  test("Wordpiece: single-piece words are exactly the word-initial vocab entries") {
    val initV = pipeline.Wordpiece.Vocab.map(_._1).filterNot(_.startsWith("##")).toSet
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert((pipeline.Wordpiece.encodeString(w).size == 1) == initV.contains(w),
        s"coverage predicate diverges on '$w'")
    }
  }

  test("WordpieceTrain: distributed trainer reproduces the committed table prefix") {
    val words = tools.WordpieceTrain.wordFreq(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text"))
    val (singles, merges) = tools.WordpieceTrain.train(words, nMerges = 6)
    // the procedure is deterministic: singles and the first merges
    // (piece AND weighted frequency) must match the committed fixture
    assert(pipeline.Wordpiece.Vocab.take(singles.size) == singles)
    assert(pipeline.Wordpiece.Vocab.slice(singles.size, singles.size + 6) == merges)
  }

  test("Wordpiece saturated table: round-13 48-merge fixture is its exact prefix; full word coverage") {
    // the deterministic trainer means any capped run is a prefix of the
    // saturated run — pin the previously-committed 48-merge table
    // (piece AND weighted frequency) against the deep table's head
    val old48: Seq[(String, Long)] = Seq(
      ("wi", 976L), ("li", 946L), ("qu", 934L), ("win", 976L),
      ("wind", 976L), ("lin", 946L), ("th", 910L), ("##sh", 923L),
      ("##ch", 910L), ("fi", 917L), ("bi", 890L), ("##in", 936L),
      ("big", 890L), ("ag", 953L), ("agg", 953L), ("fil", 917L),
      ("##bl", 903L), ("##up", 963L), ("sp", 910L), ("##us", 889L),
      ("cus", 889L), ("##lu", 1928L), ("##lum", 978L), ("##lumn", 978L),
      ("##ll", 898L), ("sl", 921L), ("sc", 984L), ("##ct", 931L),
      ("filt", 917L), ("##st", 913L), ("##tch", 910L), ("cust", 889L),
      ("##ow", 2763L), ("window", 976L), ("slow", 921L), ("row", 866L),
      ("co", 978L), ("column", 978L), ("jo", 936L), ("join", 936L),
      ("##cto", 931L), ("custo", 889L), ("##oup", 934L), ("dup", 29L),
      ("custom", 889L), ("so", 974L), ("sm", 898L), ("st", 919L))
    val merges = pipeline.Wordpiece.Vocab.filterNot { case (p, _) =>
      p.replace("##", "").length == 1
    }
    assert(merges.take(48) == old48, "48-merge fixture must be a training-order prefix")
    // saturation semantics: the trainer stopped because every distinct
    // corpus word is fully merged, so every word encodes to ONE piece
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(pipeline.Wordpiece.encodeString(w) == Seq(w),
        s"saturated vocab must cover '$w' as a single piece")
    }
  }

  test("Unigram kernel: Viterbi beats greedy, tie-break is lens-lexicographic, fallback lossless") {
    import org.apache.spark.sql.graft.expressions.UnigramEncodeF.segmentWord
    // greedy longest-match would take 'abc' (-2.5); Viterbi finds the
    // higher-scoring split 'ab'+'c' (-2.2)
    val v1 = Map("ab" -> -1000000L, "abc" -> -2500000L, "c" -> -1200000L,
      "a" -> -2000000L, "b" -> -2000000L)
    assert(segmentWord("abc", v1, 3, -30000000L) == Seq("ab", "c"))
    // engineered three-way score tie on 'aaa': 'aa'+'a' (lens "BA"),
    // 'a'+'aa' ("AB"), 'a'+'a'+'a' ("AAA") all sum -3.0; the greatest
    // lens string must win — the rule the oracle's ORDER BY mirrors
    val v2 = Map("aa" -> -2000000L, "a" -> -1000000L)
    assert(segmentWord("aaa", v2, 2, -30000000L) == Seq("aa", "a"))
    // chars outside the committed vocab fall back losslessly
    val oov = pipeline.Unigram.encodeString("xyzzy")
    assert(oov.mkString == "xyzzy" && oov.forall(_.length == 1))
  }

  test("Unigram kernel: corpus segmentations are score-OPTIMAL and lossless") {
    val vocab = pipeline.Unigram.Vocab.toMap
    val fb = pipeline.Unigram.FallbackMicro
    def score(ps: Seq[String]): Long =
      ps.map(p => vocab.getOrElse(p, if (p.length == 1) fb else Long.MinValue)).sum
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to w.length).flatMap { l =>
        val p = w.substring(0, l)
        if (vocab.contains(p) || l == 1) allSegs(w.substring(l)).map(p +: _)
        else Nil
      }
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val got = pipeline.Unigram.encodeString(w)
      assert(got.mkString == w, s"lossy segmentation of '$w': $got")
      val best = allSegs(w).map(score).max
      assert(score(got) == best,
        s"suboptimal segmentation of '$w': $got scores ${score(got)} < $best")
    }
  }

  test("UnigramTrain: distributed hard-EM reproduces the committed table") {
    val words = tools.WordpieceTrain.wordFreq(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text"))
    val rows = tools.UnigramTrain.train(words, budget = 16)
    assert(rows == pipeline.Unigram.Vocab,
      "trainer must be deterministic against the committed fixture")
  }

  test("WordpieceTrain guards: non-printable and '#' words rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      tools.WordpieceTrain.train(Seq(("héllo", 1L)).toDF("w", "freq"), 1)
    }
    intercept[IllegalArgumentException] {
      tools.WordpieceTrain.train(Seq(("a#b", 1L)).toDF("w", "freq"), 1)
    }
  }

  test("Bpe decode inverts encode byte-exactly over the real corpus") {
    // Losslessness is what licenses storing the merged symbol string:
    // decode must recover the original text for every sf0.001 doc
    // (Spark path) and for random ASCII (JVM kernel path).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs
      .select(pipeline.Bpe.decode(pipeline.Bpe.encode(col("text"))).as("rt"),
        col("text"))
      .where(col("rt") =!= col("text")).count()
    assert(bad == 0L)
    val rnd = new scala.util.Random(7)
    (0 until 100).foreach { _ =>
      val s = (0 until rnd.nextInt(200))
        .map(_ => "abcdefghij lmnopqrstuvw ".charAt(rnd.nextInt(24))).mkString
      assert(pipeline.Bpe.decodeString(
        org.apache.spark.sql.graft.expressions.BpeEncodeF.encode(s)) == s)
    }
  }

  test("Bpe contract guard: testdata corpora are ASCII (no private-use chars)") {
    // The byte-level contract: every char is one byte and none sits in
    // the U+E000..U+F8FF merge-output range. One regex covers both --
    // a violation here means Bpe token counts are silently wrong.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val n = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .where(col("text").rlike("[^\\u0000-\\u007F]")).count()
      assert(n == 0, s"$sf: $n docs violate the ASCII byte-level BPE contract")
    }
  }

  test("substringDedupFilter: first occurrence survives, later spans removed, short docs untouched") {
    // n=4 windows. doc 1 carries the canonical run "a b c d e f";
    // doc 2 repeats it mid-text (all 3 duplicated windows' spans
    // union to positions 2..7); doc 3 is shorter than n (no windows);
    // doc 1 also self-repeats its own first window later -> only the
    // SECOND copy inside doc 1 is removed.
    val d = docs(
      (1L, "a b c d e f x y a b c d"),
      (2L, "p q a b c d e f z"),
      (3L, "a b c"))
    val out = pipeline.Corpus.substringDedupFilter(d, n = 4)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: 12 tokens; its tail "a b c d" (positions 8..11) is a
    // repeat of window 0 -> removed; survivors "a b c d e f x y"
    assert(byId(1L).getAs[Long]("n_tokens") == 12L)
    assert(byId(1L).getAs[Long]("n_removed") == 4L)
    assert(byId(1L).getAs[Boolean]("changed"))
    // doc 2: windows at p=2,3,4 duplicate doc 1's run -> span union =
    // positions 2..7 (6 tokens); survivors "p q z"
    assert(byId(2L).getAs[Long]("n_tokens") == 9L)
    assert(byId(2L).getAs[Long]("n_removed") == 6L)
    // doc 3: below window length -> untouched
    assert(byId(3L).getAs[Long]("n_removed") == 0L)
    assert(!byId(3L).getAs[Boolean]("changed"))
    // rebuilt-text hashes: md5 of the exact survivor strings
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(1L).getAs[String]("text_sub_md5") == m("a b c d e f x y"))
    assert(byId(2L).getAs[String]("text_sub_md5") == m("p q z"))
    assert(byId(3L).getAs[String]("text_sub_md5") == m("a b c"))
  }

  test("domainTiers: exclusive-prefix cuts partition domains head/middle/tail") {
    // 40 docs over 4 sources with very different token masses; the
    // invariants (not the exact tiering, which the oracle hash pins):
    // head domains carry the largest counts, prefix-before-cut rule
    // holds exactly, cum of the last domain equals the total.
    val rows = (0L until 40L).map { i =>
      val src = s"s${i % 4}"
      val len = (i % 4) match { case 0 => 200; case 1 => 50; case 2 => 10; case _ => 2 }
      (i, (1 to len).map(_ => "w").mkString(" "), src)
    }
    import scala.jdk.CollectionConverters._
    val d = spark.createDataFrame(
      rows.map { case (id, t, s) => Row(id, t, s) }.asJava, docSchema)
    val out = pipeline.Corpus.domainTiers(d).collect()
    val tot = out.map(_.getAs[Long]("n_tokens")).sum
    assert(out.map(_.getAs[Long]("cum_tokens")).max == tot)
    out.foreach { r =>
      val before = r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens")
      val want =
        if (before * 10 < tot * 5) "head"
        else if (before * 10 < tot * 9) "middle"
        else "tail"
      assert(r.getAs[String]("tier") == want)
    }
    // the token-heaviest domain must be head
    val top = out.maxBy(_.getAs[Long]("n_tokens"))
    assert(top.getAs[String]("tier") == "head")
  }

  test("substringStats: dup-window counts and longest run via islands") {
    // Same fixture as the filter test (n=4): doc 1 has ONE dup window
    // (p=8) -> run = 1 window = 4 tokens; doc 2 has dups at p=2,3,4 ->
    // one island of 3 -> run = 3+3 = 6 tokens; doc 3 has no windows.
    val d = docs(
      (1L, "a b c d e f x y a b c d"),
      (2L, "p q a b c d e f z"),
      (3L, "a b c"))
    val out = pipeline.Corpus.substringStats(d, n = 4).orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_windows") == 9L)
    assert(byId(1L).getAs[Long]("n_dup_windows") == 1L)
    assert(byId(1L).getAs[Long]("longest_dup_run") == 4L)
    assert(byId(2L).getAs[Long]("n_windows") == 6L)
    assert(byId(2L).getAs[Long]("n_dup_windows") == 3L)
    assert(byId(2L).getAs[Long]("longest_dup_run") == 6L)
    assert(byId(3L).getAs[Long]("n_windows") == 0L)
    assert(byId(3L).getAs[Long]("n_dup_windows") == 0L)
    assert(byId(3L).getAs[Long]("longest_dup_run") == 0L)
  }

  test("substringDedupFilterIncremental equals the filtered full recompute") {
    // delta = doc_id % 10 == 0. Ids interleave on purpose: doc 20's
    // run also appears in snapshot doc 21 (20 < 21, so the DELTA
    // occurrence is the global first and survives), while doc 10
    // repeats snapshot doc 1's run (1 < 10, removed) and doc 30
    // repeats delta doc 20's run (removed as new x new).
    val all = docs(
      (1L, "a b c d e f x y"),
      (10L, "p p a b c d e f"),
      (20L, "u v w x y z a o"),
      (21L, "u v w x y z b o"),
      (30L, "u v w x y z c o"))
    val isNew = col("doc_id") % 10 === 0
    val full = pipeline.Corpus.substringDedupFilter(all, n = 4)
      .where(isNew).orderBy("doc_id").collect()
    val inc = pipeline.Corpus.substringDedupFilterIncremental(
        pipeline.Corpus.substringFirstOccurrences(all.where(!isNew), n = 4),
        all.where(isNew), n = 4)
      .orderBy("doc_id").collect()
    assert(inc.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    val byId = inc.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(10L).getAs[Boolean]("changed"))   // snapshot-first dup
    assert(!byId(20L).getAs[Boolean]("changed"))  // delta is global first
    assert(byId(30L).getAs[Boolean]("changed"))   // new x new dup
  }

  test("registeredDomain: PSL longest-match incl. multi-label suffixes") {
    import spark.implicits._
    val cases = Seq(
      // second-level registry: last-two-labels would say "co.uk"
      "www.example.co.uk" -> "example.co.uk",
      "a.b.example.ac.uk" -> "example.ac.uk",
      // plain gTLD unchanged vs the pre-PSL behavior
      "www.example.com" -> "example.com",
      "cdn.src3.org" -> "src3.org",
      // private-section platform suffix
      "project.user.github.io" -> "user.github.io",
      // a host that IS a public suffix has no registrable part
      "co.uk" -> "co.uk",
      // no rule matches -> the PSL implicit `*` rule (last two labels)
      "example.unknowntld" -> "example.unknowntld",
      "localhost" -> "localhost")
    val out = cases.map(_._1).toDF("host")
      .select(col("host"), pipeline.Corpus.registeredDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(out(h) == want, s"host $h: got ${out(h)}, want $want")
    }
  }

  test("withExactCanonical matches the window spelling, no Window on the hash") {
    // Mixed dup groups: ids 1/3/5 share a hash, 2/4 share another, 6 alone.
    val d = docs(
      (1L, "dup a"), (2L, "dup b"), (3L, "dup a"),
      (4L, "dup b"), (5L, "dup a"), (6L, "solo"))
      .select(col("doc_id"), md5(col("text")).as("cmd5"))
    val out = pipeline.Corpus.withExactCanonical(d)
    val got = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_exact_canonical"))
      .toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> false, 6L -> true))
    // The skew contract: the canonical must come from a map-side-
    // combinable aggregate + join-back, never a whole-partition window
    // over the content hash (one task would buffer every copy of a hot
    // document).
    val plan = out.queryExecution.optimizedPlan.toString
    plan.linesIterator.filter(_.contains("Window")).foreach { l =>
      assert(!l.contains("cmd5"), s"Window keyed on content hash: $l")
    }
  }

  test("shardAssign: contiguous, covering, token-balanced shards") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = graft.pipeline.Corpus.shardAssign(d, nShards = 8)
      .orderBy("doc_id").collect()
    // every shard id in range, nondecreasing in doc order (contiguity)
    val shards = got.map(_.getAs[Long]("shard"))
    assert(shards.forall(s => s >= 0 && s <= 7))
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
    assert(shards.distinct.length == 8, "all 8 shards populated")
    // balance: each shard within one max-doc of the ideal S-th
    val tot = got.map(_.getAs[Long]("n_tokens")).sum
    val maxDoc = got.map(_.getAs[Long]("n_tokens")).max
    val perShard = got.groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum)
    perShard.values.foreach { s =>
      assert(math.abs(s - tot / 8.0) <= maxDoc + 1,
        s"shard imbalance: $s vs ideal ${tot / 8.0} (max doc $maxDoc)")
    }
  }

  test("qualityModelScore distills the rule gate with high fidelity") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val teacher = d.select(
      col("doc_id"),
      (graft.pipeline.Corpus.gopherKeep() &&
        TextOps.qualityScore(col("text")) >= 0.5).as("y"))
    val joined = graft.pipeline.Corpus.qualityModelScore(d)
      .join(teacher, "doc_id").collect()
    val agree = joined.count(r =>
      r.getAs[Boolean]("keep") == r.getAs[Boolean]("y"))
    // committed fixture's train fidelity is 0.94; anything far below
    // means the serving expression no longer matches the trainer
    assert(agree >= (joined.length * 0.90).toInt,
      s"distillation fidelity ${agree.toDouble / joined.length}")
    assert(joined.forall(r => !r.getAs[Double]("logit").isNaN))
  }

  test("sourceWindowOverlap counts distinct shared windows per source pair") {
    val phrase = (1 to 8).map(i => s"s$i").mkString(" ")
    val rows = Seq(
      Row(1L, s"$phrase alpha beta gamma delta epsilon zeta eta theta", "srcA"),
      Row(2L, s"$phrase totally different continuation of words here now", "srcB"),
      // the SAME shared phrase twice in srcB must not double-count
      // (distinct windows per source)
      Row(3L, s"prefix tokens then $phrase and more trailing words", "srcB"),
      Row(4L, "no overlap with anything else at all in this one", "srcC"))
    val d = spark.createDataFrame(rows.asJava, docSchema)
    val got = graft.pipeline.Corpus.sourceWindowOverlap(d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // srcA and srcB share exactly the one 8-token phrase window
    assert(got == Map(("srcA", "srcB") -> 1L))
  }

  test("winnowing: long shared runs share a fingerprint; short docs empty") {
    // guarantee: any shared run of >= w+n-1 = 11 tokens shares at
    // least one selected fingerprint (same hash at the same offset
    // within the run)
    val shared = (1 to 16).map(i => s"sh$i").mkString(" ")
    val d = spark.createDataFrame(Seq(
      Row(1L, s"aa bb cc dd $shared ee ff gg", "srcA"),
      Row(2L, s"xx yy $shared zz ww vv uu tt", "srcB"),
      Row(3L, "too short", "srcC")).asJava, docSchema)
    // fingerprint HASHES per doc (recompute with the op's own digest
    // inputs): rerun with the full per-position output via the corpus
    // method on singleton frames and compare hash sets through fp_md5
    // of the shared run alone
    val out = graft.pipeline.Corpus.winnowFingerprints(d)
      .orderBy("doc_id").collect()
    assert(out(2).getAs[Long]("n_grams") == 0L &&
      out(2).getAs[Long]("n_fingerprints") == 0L)
    // density ~ 2/(w+1) = 0.4: loose band, the published expectation
    val dens = out.take(2).map(_.getAs[Double]("density"))
    assert(dens.forall(x => x > 0.2 && x < 0.7), dens.toSeq.toString)
    // the guarantee itself, checked against an independent JVM
    // reference implementation (same md5-derived hash32): the two
    // docs' selected fingerprint HASH sets must intersect, because
    // they share a 16-token run >= w+n-1
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h32(s: String) = java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
    def winnowRef(text: String, n: Int = 8, w: Int = 4): Set[Long] = {
      val tk = text.split(" ")
      val hs = (0 to tk.length - n).map(p => h32(tk.slice(p, p + n).mkString(" ")))
      (0 to math.max(hs.length - w, 0)).flatMap { j =>
        val win = hs.slice(j, math.min(j + w, hs.length)).zipWithIndex
        Some(win.minBy { case (h, i) => (h, -i) }).map { case (h, _) => h }
      }.toSet
    }
    val fpA = winnowRef(s"aa bb cc dd $shared ee ff gg")
    val fpB = winnowRef(s"xx yy $shared zz ww vv uu tt")
    assert((fpA & fpB).nonEmpty, "shared long run must share a fingerprint")
    // and the engine's digest agrees with the reference digest
    def digestRef(text: String, n: Int = 8, w: Int = 4): String = {
      val tk = text.split(" ")
      val hs = (0 to tk.length - n).map(p => h32(tk.slice(p, p + n).mkString(" ")))
      val sel = (0 to math.max(hs.length - w, 0)).map { j =>
        val win = hs.slice(j, math.min(j + w, hs.length)).zipWithIndex
        win.minBy { case (h, i) => (h, -i) }._2 + j
      }.distinct.sorted
      md5hex(sel.map(hs(_)).mkString(" "))
    }
    assert(out(0).getAs[String]("fp_md5") ==
      digestRef(s"aa bb cc dd $shared ee ff gg"))
  }

  test("corpus filter/prepare family plans carry no Window keyed on cmd5") {
    // The full declared queries (DedupChain staging included): the r10
    // verdict's remaining hot-key shape must never reappear. Logical
    // optimized plans only — nothing is executed beyond the chain's
    // own session staging.
    for (q <- Seq("corpus_filter", "corpus_prepare", "corpus_prepare_gated")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan.toString
      plan.linesIterator.filter(_.contains("Window")).foreach { l =>
        assert(!l.contains("cmd5"), s"$q: Window keyed on content hash: $l")
      }
    }
  }
}
