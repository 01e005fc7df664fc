package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming twins vs their batch counterparts, driven through
  * MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def t(minutes: Long) = new java.sql.Timestamp(minutes * 60000L)

  test("streaming bars match the batch bars derivation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(1, t(0), 1, "click", 10.0), Ev(2, t(10), 1, "click", 30.0),
      Ev(3, t(70), 2, "click", 20.0), Ev(4, t(80), 2, "view", 5.0))
    input.addData(events: _*)
    val q = Streaming.bars(input.toDF()).writeStream
      .format("memory").queryName("sbars").outputMode("append").start()
    input.addData(Ev(99, t(600), 1, "click", 1.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbars").orderBy("symbol", "timestamp").collect()
    // finalized bars: click@h0 (2 events), click@h1, view@h1
    assert(got.length == 3)
    val first = got.head
    assert(first.getAs[String]("symbol") == "click")
    assert(first.getAs[Double]("open") == 10.0 && first.getAs[Double]("close") == 30.0)
    assert(first.getAs[Double]("low") == 10.0 && first.getAs[Double]("high") == 30.0)
    assert(first.getAs[Long]("volume") == 2L)
  }

  test("streaming EMA equals the batch EWM recursion") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.BarInput]
    val closes = Seq(10.0, 12.0, 11.0, 15.0)
    input.addData(closes.zipWithIndex.map { case (c, i) =>
      Streaming.BarInput("x", t(i * 60), c)
    }: _*)
    val q = Streaming.emaStream(input.toDS(), span = 3).writeStream
      .format("memory").queryName("sema").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sema").orderBy("timestamp").collect()
      .map(_.getAs[Double]("ema"))
    val alpha = 2.0 / 4
    val expected = closes.tail.scanLeft(closes.head)((y, x) => alpha * x + (1 - alpha) * y)
    assert(got.length == 4)
    got.zip(expected).foreach { case (a, e) => assert(math.abs(a - e) < 1e-12) }
  }

  case class Doc(doc_id: Long, text: String)
  case class HtmlPage(doc_id: Long, html: String)
  case class DocSrc(doc_id: Long, text: String, source: String)
  case class DocSrcT(
      doc_id: Long, text: String, source: String, tombstone: Boolean)
  case class SrcDoc(doc_id: Long, source: String)
  case class LangDoc(doc_id: Long, text: String, lang: String)
  case class Vec(vec_id: Long, embedding: Seq[Float])
  case class EvNanos(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)

  test("streaming BPE token count matches the batch expression bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "flower power shower tower")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, t) => Doc(id, t) }: _*)
    val q = Streaming.bpeTokenCountStream(input.toDF()).writeStream
      .format("memory").queryName("sbpe").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbpe").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // JVM-side fold is the independent expected value (the same pin
    // PipelineSpec uses for the batch expression)
    val want = texts.map { case (id, t) =>
      id -> graft.pipeline.Bpe.Merges
        .foldLeft(t) { case (acc, (p, r)) => acc.replace(p, r) }.length.toLong
    }
    assert(got.toSeq == want)
  }

  test("streaming token ids match the batch kernel bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(1L -> "the quick brown fox", 2L -> "flower power")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, t) => Doc(id, t) }: _*)
    val q = Streaming.tokenIdsStream(input.toDF()).writeStream
      .format("memory").queryName("sids").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sids").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    val want = texts.map { case (id, t) =>
      id -> org.apache.spark.sql.graft.expressions.BpeIdsF.idsArray(
        org.apache.spark.sql.graft.expressions.BpeEncodeF.encode(t)).toSeq
    }
    assert(got.toSeq == want)
  }

  test("streaming sq8 encode matches the batch quantizer bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // frozen quantizer trained on the batch corpus
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = graft.pipeline.Similarity.sq8Params(e).collect().head
    val (mins, spans) = (p.getSeq[Double](0), p.getSeq[Double](1))
    val sample = e.limit(5).collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[Vec]
    input.addData(sample: _*)
    val q = Streaming.sq8EncodeStream(input.toDF(), mins, spans).writeStream
      .format("memory").queryName("ssq8").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssq8").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    // batch spelling on the same rows
    val want = e.crossJoin(broadcast(graft.pipeline.Similarity.sq8Params(e)))
      .where(col("vec_id").isin(sample.map(_.vec_id): _*))
      .select(col("vec_id"),
        graft.pipeline.Similarity.sq8EncodeCol(
          col("embedding"), col("mins"), col("spans")).as("code"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    assert(got == want)
    got.values.foreach(code => assert(code.forall(c => c >= 0 && c <= 255)))
  }

  test("streaming zkey assignment matches the batch layout keys") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Bars.readEvents(spark, "/root/testdata/sf0.001")
    val b = graft.sources.Zorder
      .bounds2(ev, col("user_id"), col("value")).collect().head
    val rows = ev.limit(6).collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), r.getAs[Double]("value")))
    val input = MemoryStream[(Long, Long, Double)]
    input.addData(rows: _*)
    val q = Streaming.zkeyStream(
        input.toDF().toDF("event_id", "user_id", "value"),
        b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
      .writeStream.format("memory").queryName("szkey").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("szkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = graft.sources.Zorder.withZkey(ev, col("user_id"), col("value"))
      .where(col("event_id").isin(rows.map(_._1): _*))
      .select("event_id", "zkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("streaming wordpiece pieces match the batch kernel bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(1L -> "window scan order", 2L -> "custom column join")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, t) => Doc(id, t) }: _*)
    val q = Streaming.wordpieceStream(input.toDF()).writeStream
      .format("memory").queryName("swp").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("swp").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
    val want = texts.map { case (id, t) =>
      id -> graft.pipeline.Wordpiece.encodeString(t)
    }
    assert(got.toSeq == want)
  }

  test("streaming domain gate drops blocklisted domains like batch") {
    implicit val sqlCtx = spark.sqlContext
    // src0 lands on the blocklist (src0.com/.org both blocked); src1
    // survives regardless of subdomain/tld variety.
    val docs = Seq(
      DocSrc(0L, "a", "src0"), DocSrc(1L, "b", "src0"),
      DocSrc(2L, "c", "src1"), DocSrc(3L, "d", "src1"))
    val input = MemoryStream[DocSrc]
    input.addData(docs: _*)
    val q = Streaming.domainGateStream(input.toDF()).writeStream
      .format("memory").queryName("sgate").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sgate").orderBy("doc_id").collect().map(_.getLong(0))
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val batch = graft.pipeline.Corpus
      .domainGate()
    val bdf = spark.createDataFrame(
      docs.map(d => R(d.doc_id, d.text, d.source)).asJava,
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType))))
    val want = bdf.where(batch).orderBy("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == want.toSeq && got.toSeq == Seq(2L, 3L))
  }

  test("streaming badwords gate matches batch stats bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      DocSrc(0L, "slow slow fast", "s"), DocSrc(1L, "fast join merge", "s"),
      DocSrc(2L, "dup fast fast fast", "s"))
    val input = MemoryStream[DocSrc]
    input.addData(docs: _*)
    val q = Streaming.badwordsGateStream(input.toDF()).writeStream
      .format("memory").queryName("sbad").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val got = spark.table("sbad").orderBy("doc_id").collect()
    val want = graft.pipeline.TextOps.badwordsStats(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.map(_.getBoolean(4)).toSeq == Seq(false, true, false))
  }

  test("streaming binary ANN equals the batch topKBinary bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import Streaming.{BinQuery, BinHit}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.pipeline.Similarity.binaryServedIndex(e)
    val qs = e.where(col("vec_id") < 5).collect()
      .map(r => BinQuery(r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val input = MemoryStream[BinQuery]
    input.addData(qs.toIndexedSeq: _*)
    val q = Streaming.binarySearchStream(input.toDS(), index).writeStream
      .format("memory").queryName("sbin").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbin").orderBy("query_id", "rank").collect()
      .map(r => BinHit(r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val want = graft.pipeline.Similarity.topKBinary(e)
      .orderBy("query_id", "rank").collect()
      .map(r => BinHit(r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("hamming"),
        r.getAs[Double]("cosine")))
    assert(got.length == want.length && got.toSeq == want.toSeq)
  }

  test("streaming lang_id_model matches the batch scorer bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      LangDoc(1L, "the hash join order table scan", "en"),
      LangDoc(2L, "el grupo de la tabla y que", "es"),
      LangDoc(3L, "merge sort window batch", "de"))
    val input = MemoryStream[LangDoc]
    input.addData(rows: _*)
    val q = Streaming.langIdModelStream(input.toDF()).writeStream
      .format("memory").queryName("slangid").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("slangid").orderBy("doc_id").collect().map(_.toSeq)
    val want = graft.pipeline.Corpus.langIdModelScore(
        spark.createDataFrame(rows).toDF("doc_id", "text", "lang"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("streaming snapshot changelog classifies arrivals like the batch diff") {
    implicit val sqlCtx = spark.sqlContext
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // base = snapshot A; the stream carries snapshot B's docs (the
    // batch snapshot_diff_report fixture arithmetic)
    val base = d.where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("_ha"))
    val bRows = d.where(col("doc_id") % 10 =!= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        col("source"))
      .collect().map(r => DocSrc(r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[DocSrc]
    input.addData(bRows: _*)
    val q = Streaming.changelogStream(input.toDF(), base).writeStream
      .format("memory").queryName("schange").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("schange").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == bRows.length)
    bRows.foreach { b =>
      val expected =
        if (b.doc_id % 10 == 0) "added"
        else if (b.doc_id % 13 == 0) "modified"
        else "unchanged"
      assert(got(b.doc_id) == expected, s"doc ${b.doc_id}")
    }
  }

  test("tombstone changelog makes removed observable, converging to the batch full-outer diff") {
    implicit val sqlCtx = spark.sqlContext
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // base = snapshot A (doc_id % 10 != 0); delta = snapshot B
    // (doc_id % 10 != 1) → A∖B = docs with doc_id % 10 == 1 arrive as
    // TOMBSTONES; plus one no-op tombstone for a doc in NEITHER
    // snapshot (id % 10 == 1 is in A; pick an id far outside the
    // corpus) that must emit nothing.
    val base = d.where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("_ha"))
    val live = d.where(col("doc_id") % 10 =!= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        col("source"))
      .collect().map(r => DocSrcT(r.getLong(0), r.getString(1), r.getString(2),
        tombstone = false))
    val dead = d.where(col("doc_id") % 10 === 1)
      .select(col("doc_id"), col("source"))
      .collect().map(r => DocSrcT(r.getLong(0), "", r.getString(1),
        tombstone = true))
    val noop = DocSrcT(999999999L, "", "webcrawl", tombstone = true)
    val input = MemoryStream[DocSrcT]
    input.addData((live ++ dead :+ noop): _*)
    // a NULLABLE marker column (field omitted at the source) must read
    // as "not a tombstone" EVERYWHERE — an un-coalesced NULL made the
    // filter drop a new doc's row while the classifier would have said
    // "added". Rewrite the marker to NULL on the live ADDED docs (the
    // base-absent rows the bug dropped) and assert classes unchanged.
    val nullMarked = input.toDF()
      .withColumn("tombstone",
        when(!col("tombstone") && col("doc_id") % 10 === 0,
          lit(null).cast("boolean"))
          .otherwise(col("tombstone")))
    val q = Streaming.changelogTombstoneStream(nullMarked, base).writeStream
      .format("memory").queryName("schangeT").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("schangeT").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // the batch full-outer classification over (A, B): every A∖B doc
    // is removed, B∖A added, changed-hash modified, rest unchanged —
    // and the doc in neither snapshot has NO row
    assert(got.size == live.length + dead.length)
    assert(!got.contains(noop.doc_id), "no-op tombstone must emit nothing")
    dead.foreach(t => assert(got(t.doc_id) == "removed", s"doc ${t.doc_id}"))
    live.foreach { b =>
      val expected =
        if (b.doc_id % 10 == 0) "added"
        else if (b.doc_id % 13 == 0) "modified"
        else "unchanged"
      assert(got(b.doc_id) == expected, s"doc ${b.doc_id}")
    }
  }

  test("streaming embedding spectrum matches the batch instrument bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rot = graft.pipeline.Opq.trainRotation(e)
    val want = graft.pipeline.Similarity.embeddingSpectrum(e, rot)
      .orderBy("rank").collect().map(_.toSeq)
    val vecs = e.collect().map(r => Vec(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[Vec]
    input.addData(vecs.take(vecs.length / 2): _*)
    val q = Streaming.embeddingSpectrumStream(input.toDF(), rot).writeStream
      .format("memory").queryName("sspec").outputMode("complete").start()
    q.processAllAvailable()
    input.addData(vecs.drop(vecs.length / 2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sspec").orderBy("rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("streaming ivf cell drift matches the batch report bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.pipeline.Similarity.kmeansCentroids(e)
    val asg = graft.pipeline.Similarity.cellAssignments(e, cents)
      .withColumn("is_delta", col("vec_id") % 2 === 1)
    // the declared query's exact batch spelling
    val agg = asg.groupBy("cid").agg(
      sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_base"),
      sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
    val tot = broadcast(agg.agg(
      sum("n_base").as("tb"), sum("n_delta").as("td")))
    val want = agg.crossJoin(tot)
      .select(col("cid"), col("n_base"), col("n_delta"),
        expr("n_base * 1000 div tb").as("base_pm"),
        expr("n_delta * 1000 div td").as("delta_pm"))
      .withColumn("drift_pm", abs(col("base_pm") - col("delta_pm")))
      .withColumn("retrain", col("drift_pm") > 100L)
      .orderBy("cid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // frozen monitor artifacts: centroids + base-side per-cell counts
    val cl = cents.collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Double](r.fieldIndex("ce")).toSeq))
      .toSeq
    val baseCounts = asg.where(!col("is_delta")).groupBy("cid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val delta = e.where(col("vec_id") % 2 === 1).collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[Vec]
    input.addData(delta.take(delta.length / 2): _*)
    val q = Streaming.ivfCellDriftStream(input.toDF(), cl, baseCounts)
      .writeStream
      .format("memory").queryName("sivfdrift").outputMode("complete").start()
    q.processAllAvailable()
    input.addData(delta.drop(delta.length / 2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sivfdrift").orderBy("cid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("streaming source drift matches the batch report per touched source") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val want = SparkEntry.queries("source_drift_report")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    // frozen base stats = the batch report's own base columns
    val base = want.map { case (src, w) =>
      Streaming.SourceBase(src, w._1, w._3, w._5)
    }.toSeq
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val delta = d.where(graft.pipeline.TextOps.hash32(
        concat(lit("drift:"), col("doc_id").cast("string"))) % 2 === 1)
      .select("doc_id", "source", "text").collect()
      .map(r => Streaming.DriftDoc(r.getLong(0), r.getString(1), r.getString(2)))
    assert(delta.nonEmpty)
    val input = MemoryStream[Streaming.DriftDoc]
    input.addData(delta: _*)
    val q = Streaming.sourceDriftStream(input.toDS(), base).writeStream
      .format("memory").queryName("ssrcdrift").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssrcdrift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    // every source with delta ingest emits its exact batch row; the
    // stream (by design) stays silent on delta-free sources
    assert(got.nonEmpty)
    got.foreach { case (src, row) => assert(want(src) == row, src) }
    val deltaSources = delta.map(_.source).toSet
    assert(got.keySet == deltaSources)
  }

  test("streaming rate anomaly matches the batch table on closed hours") {
    implicit val sqlCtx = spark.sqlContext
    import Streaming.{RateEvent, RateOut}
    val h = 3600000000L
    def ev(hr: Long, n: Int) = Seq.fill(n)(RateEvent("click", hr * h + 1))
    val input = MemoryStream[RateEvent]
    val q = Streaming.rateAnomalyStream(input.toDS()).writeStream
      .format("memory").queryName("srate").outputMode("append").start()
    // batch 1: hours 0..2 with counts 4, 4, 4 (hour 2 stays open)
    input.addData(ev(0, 4) ++ ev(1, 4) ++ ev(2, 4): _*)
    q.processAllAvailable()
    // batch 2: hour 3 spikes to 9, hour 4 opens (closing hour 3)
    input.addData(ev(3, 9) ++ ev(4, 1): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("srate").orderBy("hour").collect()
      .map(r => RateOut(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // closed hours 0..3; hour 0 has no trailing window (batch NULL ->
    // stream -1); hour 3's 9 vs trailing mean 4 = 2250 pm -> anomaly
    assert(got.toSeq == Seq(
      RateOut("click", 0L, 4L, 0L, 0L, -1L, false),
      RateOut("click", 1L, 4L, 4L, 1L, 1000L, false),
      RateOut("click", 2L, 4L, 8L, 2L, 1000L, false),
      RateOut("click", 3L, 9L, 12L, 3L, 2250L, true)))
    // the closed rows carry the batch query's exact arithmetic
    // (cnt * prev_n * 1000 div prev_sum) — cross-checked by hand above
  }

  test("streaming attribution matches batch last-touch, including cross-batch clicks") {
    implicit val sqlCtx = spark.sqlContext
    import Streaming.{AttrEvent, AttrOut}
    val h = 3600000000L
    val input = MemoryStream[AttrEvent]
    val q = Streaming.attributionStream(input.toDS()).writeStream
      .format("memory").queryName("sattr").outputMode("append").start()
    // batch 1: user 1 clicks ch 7 then ch 9; purchase -> last touch ch 9;
    //          user 2 clicks ch 3 (no purchase yet)
    input.addData(
      AttrEvent(1L, 1L, "click", 0.0, 10 * h, 7),
      AttrEvent(2L, 1L, "click", 0.0, 20 * h, 9),
      AttrEvent(3L, 1L, "purchase", 10.0, 25 * h, 1),
      AttrEvent(4L, 2L, "click", 0.0, 30 * h, 3))
    q.processAllAvailable()
    // batch 2: user 2 purchase within window of the BATCH-1 click (state
    // carries it); user 3 purchase with no click ever -> -1
    input.addData(
      AttrEvent(5L, 2L, "purchase", 20.5, 32 * h, 1),
      AttrEvent(6L, 3L, "purchase", 5.25, 50 * h, 1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sattr").orderBy("pid").collect()
      .map(r => AttrOut(r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      AttrOut(3L, 9, 1000L), AttrOut(5L, 3, 2050L), AttrOut(6L, -1, 525L)))
  }

  test("streaming video dedup matches the batch incremental's delta-base pairs") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val h = Multimodal.aHash(
      Multimodal.syntheticVideoFrames(spark, d), Multimodal.PcmDecoder)
    val isNew = expr("(doc_id DIV 16) % 10 = 0")
    val served = Multimodal.videoServedIndex(h.where(!isNew))
    // whole-video records: each delta video's frame-hash set
    val deltaRecs = h.where(isNew)
      .select(expr("doc_id DIV 16").as("v"), col("ahash")).collect()
      .groupBy(_.getLong(0)).map { case (v, rows) =>
        Streaming.VideoSetRecord(v, rows.map(_.getString(1)).toSeq)
      }.toSeq
    val input = MemoryStream[Streaming.VideoSetRecord]
    input.addData(deltaRecs: _*)
    val q = Streaming.videoDedupStream(input.toDS(), served).writeStream
      .format("memory").queryName("svd").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("svd").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // batch incremental restricted to delta-base pairs (delta-delta is
    // the batch compaction's job, excluded on both sides)
    val deltaIds = deltaRecs.map(_.video_id).toSet
    val baseSets = h.where(!isNew)
      .select(expr("doc_id DIV 16").as("video_id"), col("ahash")).distinct()
    val want = Multimodal.videoDupPairsIncremental(baseSets, h.where(isNew))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .filterNot { case ((a, b), _) => deltaIds(a) && deltaIds(b) }
      .toMap
    assert(want.nonEmpty && got == want,
      s"stream/batch drift: got=${got.size} want=${want.size}")
  }

  test("streaming retention: cohorts persist across batches, each user-week once") {
    implicit val sqlCtx = spark.sqlContext
    val wk = 604800000000L // one epoch-week of micros
    def ev(id: Long, user: Long, week: Long) =
      Ev(id, new java.sql.Timestamp(week * wk / 1000), user, "e", 1.0)
    val input = MemoryStream[Ev]
    val q = Streaming.retentionStream(input.toDF()).writeStream
      .format("memory").queryName("sret").outputMode("append").start()
    // batch 1: users 1 (weeks 100, 101) and 2 (week 100)
    input.addData(ev(0, 1, 100), ev(1, 1, 101), ev(2, 2, 100), ev(3, 1, 100))
    q.processAllAvailable()
    // batch 2: user 1 returns (week 103 + a repeat of 101), user 3 is new
    input.addData(ev(4, 1, 103), ev(5, 1, 101), ev(6, 3, 102))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sret").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    // each (user, week) exactly once despite the cross-batch repeat
    assert(got.map(_._1).distinct.length == got.length, s"dup rows: ${got.toSeq}")
    assert(got.toMap == Map(
      (1L, 100L) -> 100L, (1L, 101L) -> 100L, (1L, 103L) -> 100L,
      (2L, 100L) -> 100L, (3L, 102L) -> 102L), s"got ${got.toSeq}")
  }

  test("streaming bitext scorer matches the batch margin frame exactly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Similarity
    val fix = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(fix, k = 4, iters = 1)
    val served = Similarity.bitextServedIndex(fix, cents, nCells = 2)
    // stream a handful of side-0 vectors as "new" arrivals
    val srcRows = fix.where(col("label") % 2 === 0 && col("vec_id") < 40)
      .select("vec_id", "embedding").collect()
      .map(r => Streaming.BitextQuery(r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[Streaming.BitextQuery]
    input.addData(srcRows: _*)
    val q = Streaming.bitextScoreStream(input.toDS(), served, cents).writeStream
      .format("memory").queryName("sbtx").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbtx").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val streamed = srcRows.map(_.src_id).toSet
    val want = Similarity.bitextMargins(
        Similarity.bitextCandidates(fix, cents, nCells = 2))
      .where(col("src_id").isin(streamed.toSeq: _*))
      .select(col("src_id"), col("fwd_rank"), col("tgt_id"),
        round(col("margin") * 1e6, 0).cast("long").as("mm"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(want.nonEmpty && got == want,
      s"stream/batch margin drift: got=${got.size} want=${want.size}")
  }

  test("streaming media featurize matches batch bit-for-bit (real codec + resize)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    // real PNGs through the real codec, resized — the full seam
    val recs = (0L until 6L).map { id =>
      val w = (8 + id % 4).toInt; val h = (8 + (id / 4) % 4).toInt
      Multimodal.MediaRecord(
        id, "image", Multimodal.encodePng(w, h, i => ((id * 7 + i) % 256).toInt), "s")
    }
    val input = MemoryStream[Multimodal.MediaRecord]
    input.addData(recs: _*)
    val q = Streaming.mediaFeaturesStream(
        input.toDS(), Multimodal.ImageIODecoder, resizeTo = Some((4, 4)))
      .writeStream.format("memory").queryName("smedia").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("smedia").orderBy("id").collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList; case x => x
    })
    val want = Multimodal.extractFeatures(
        spark.createDataset(recs)(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]),
        Multimodal.ImageIODecoder, resizeTo = Some((4, 4)))
      .toDF().orderBy("id").collect().map(_.toSeq.map {
        case a: Seq[_] => a.toList; case x => x
      })
    assert(got.toSeq == want.toSeq && got.length == 6)
  }

  test("streaming bars handle the canonical long-nanos ts like batch Bars") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvNanos]
    def nanos(minutes: Long) = minutes * 60L * 1000000000L
    input.addData(
      EvNanos(1, nanos(0), 1, "click", 10.0),
      EvNanos(2, nanos(10), 1, "click", 30.0))
    val q = Streaming.bars(input.toDF()).writeStream
      .format("memory").queryName("sbars_nanos").outputMode("append").start()
    input.addData(EvNanos(99, nanos(600), 1, "click", 1.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbars_nanos").orderBy("timestamp").collect()
    assert(got.length == 1)
    // a bare cast(long -> timestamp) would have read these as SECONDS
    // (year ~1970+19k); the div-1000 path puts the bar at epoch hour 0
    assert(got.head.getAs[java.sql.Timestamp]("timestamp").getTime == 0L)
    assert(got.head.getAs[Double]("open") == 10.0 && got.head.getAs[Double]("close") == 30.0)
  }

  test("streaming rolling SMA via ring-buffer state matches the batch kernel") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.BarInput]
    val closes = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    // feed in two micro-batches to exercise state carry-over
    input.addData(closes.take(2).zipWithIndex.map { case (c, i) =>
      Streaming.BarInput("x", t(i * 60), c)
    }: _*)
    val q = Streaming.smaStream(input.toDS(), n = 3).writeStream
      .format("memory").queryName("ssma").outputMode("append").start()
    q.processAllAvailable()
    input.addData(closes.drop(2).zipWithIndex.map { case (c, i) =>
      Streaming.BarInput("x", t((i + 2) * 60), c)
    }: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssma").orderBy("timestamp").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("sma"))) None else Some(r.getAs[Double]("sma")))
    assert(got.toSeq == Seq(None, None, Some(2.0), Some(3.0), Some(4.0)))
  }

  test("streaming decontamination matches the batch operator per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val bench = spark.createDataFrame(
      java.util.Arrays.asList(R(100L, "prefix alpha beta gamma delta suffix")), docSchema)
    val grams = graft.pipeline.Dedup.benchmarkGrams(bench)
    val input = MemoryStream[Doc]
    input.addData(
      Doc(1, "alpha beta gamma delta rest of text"),
      Doc(2, "totally unrelated words in this doc"))
    val q = Streaming.decontaminateStream(input.toDF(), grams).writeStream
      .format("memory").queryName("sdecon").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdecon").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, 1L, true), (2L, 0L, false)))
  }

  test("streaming bloom decontamination matches the batch probe bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val bench = spark.createDataFrame(
      java.util.Arrays.asList(R(100L, "prefix alpha beta gamma delta suffix")), docSchema)
    // Sized-bitmap contract (round 16): the production gate derives m
    // from the bench gram count; the twin must match on the sized
    // params, not just the retired fixed width.
    val (bm, m) = graft.pipeline.Dedup.bloomBitmapSized(bench)
    val texts = Seq(
      1L -> "alpha beta gamma delta rest of text",
      2L -> "totally unrelated words in this doc")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, t) => Doc(id, t) }: _*)
    val q = Streaming.bloomDecontaminateStream(
        input.toDF(), bm, mBits = m, kHash = graft.pipeline.Dedup.BloomKSized)
      .writeStream
      .format("memory").queryName("sbloom").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbloom").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val want = graft.pipeline.Dedup.bloomDecontaminate(
        spark.createDataFrame(
          texts.map { case (id, t) => R(id, t) }.asJava, docSchema),
        bm, mBits = m, kHash = graft.pipeline.Dedup.BloomKSized)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == want.toSeq && got(0)._3 && !got(1)._3)
  }

  test("streaming PII redaction matches the batch scrub bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "mail a.b@x.co or 10.1.2.3 tel +44 20-7946 0958 end",
      2L -> "no pii in this document at all")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, t) => Doc(id, t) }: _*)
    val q = Streaming.redactPiiStream(input.toDF()).writeStream
      .format("memory").queryName("spii").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spii").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val want = graft.pipeline.Corpus.redactPii(texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == want.toSeq && got(0)._2 == 1L && got(1)._2 == 0L)
  }

  test("streaming HTML extraction matches the batch front door bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val pages = Seq(
      1L -> ("<html>\n<head><title>doc 1</title></head>\n<body>\n" +
        "<div class=\"nav\"><a href=\"/\">home</a> <a href=\"/b\">b</a> <a href=\"/c\">c</a></div>\n" +
        "<p>spark &#113;uery join &amp; merge</p>\n<script>\ntrack(1);\n</script>\n" +
        "<p>value sort</p>\n</body>\n</html>"),
      2L -> "<html>\n<body>\n<p>lone paragraph</p>\n</body>\n</html>")
    val input = MemoryStream[HtmlPage]
    input.addData(pages.map { case (id, h) => HtmlPage(id, h) }: _*)
    val q = Streaming.htmlExtractStream(input.toDF()).writeStream
      .format("memory").queryName("shtml").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    def snap(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    val got = spark.table("shtml").orderBy("doc_id").collect().map(snap)
    val want = graft.pipeline.Html.extractDocs(pages.toDF("doc_id", "html"))
      .orderBy("doc_id").collect().map(snap)
    assert(got.toSeq == want.toSeq)
    // boilerplate dropped, entities decoded, body script gone
    assert(got(0)._2 == "spark query join & merge\nvalue sort", got(0)._2)
    assert(got(1)._2 == "lone paragraph")
  }

  test("streaming chunking matches the batch Corpus.chunk") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> (1 to 40).map(i => s"w$i").mkString(" "),
      2L -> "short doc",
      3L -> (1 to 56).map(i => s"v$i").mkString(" "))
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.chunkStream(input.toDF()).writeStream
      .format("memory").queryName("schunk").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("schunk").orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = graft.pipeline.Corpus.chunk(texts.toDF("doc_id", "text"))
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("streaming rate sampling matches the batch keep decisions bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 40L).map(i => SrcDoc(i, s"src${i % 4}"))
    val input = MemoryStream[SrcDoc]
    input.addData(rows: _*)
    val q = Streaming.rateSampleStream(
        input.toDF(), Map("src0" -> 0, "src1" -> 5000), defaultPm = 10000)
      .writeStream.format("memory").queryName("srate").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("srate").orderBy("doc_id").collect().map(key)
    val want = graft.pipeline.Corpus.rateSample(
        rows.map(r => (r.doc_id, r.source)).toDF("doc_id", "source"),
        Map("src0" -> 0, "src1" -> 5000))
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("streaming intra-doc dedup matches the batch rebuild bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // doc 1: 40 tokens whose second 32-token chunk repeats nothing;
    // doc 2: the same 32-token unit twice (chunk-aligned repeat);
    // doc 3: shorter than one chunk
    val unit = (1 to 32).map(i => s"u$i").mkString(" ")
    val texts = Seq(
      1L -> (1 to 40).map(i => s"w$i").mkString(" "),
      2L -> s"$unit $unit",
      3L -> "tiny doc")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, t) => Doc(id, t) }: _*)
    val q = Streaming.intraDocDedupStream(input.toDF()).writeStream
      .format("memory").queryName("sintra").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("sintra").orderBy("doc_id").collect().map(key)
    val units = graft.pipeline.Corpus.chunk(
        texts.toDF("doc_id", "text"), chunkSize = 32, stride = 32)
      .select(col("doc_id"), col("chunk_id").as("para_idx"),
        col("chunk_text").as("para_text"))
    val want = graft.pipeline.Corpus.intraDocDedupFilter(units)
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // and the repeat actually dropped
    assert(got(1).contains("true"))
  }

  test("streaming fertility totals converge to the batch per-lang table") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      LangDoc(1L, "the cat sat on the mat", "en"),
      LangDoc(2L, "el gato y la alfombra", "es"),
      LangDoc(3L, "another english document here", "en"))
    val input = MemoryStream[LangDoc]
    input.addData(rows.take(2): _*)
    val q = Streaming.fertilityStream(input.toDF()).writeStream
      .format("memory").queryName("sfert").outputMode("complete").start()
    q.processAllAvailable()
    input.addData(rows.drop(2): _*) // second micro-batch folds in
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("sfert").orderBy("lang").collect().map(key)
    val want = {
      import org.apache.spark.sql.functions._
      rows.map(r => (r.doc_id, r.text, r.lang)).toDF("doc_id", "text", "lang").select(
          col("lang"),
          length(col("text")).cast("bigint").as("nc"),
          size(split(col("text"), " ")).cast("bigint").as("nw"),
          graft.pipeline.Bpe.tokenCount(col("text")).as("nb"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nc").as("n_chars"),
          sum("nw").as("n_words"), sum("nb").as("n_bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("n_chars"), col("n_words"),
          col("n_bpe_tokens"),
          round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6).as("chars_per_bpe"),
          round(col("n_bpe_tokens").cast("double") / col("n_words"), 6).as("bpe_per_word"))
        .orderBy("lang").collect().map(key)
    }
    assert(got.toSeq == want.toSeq && got.length == 2)
  }

  test("streaming URL canonicalization matches batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = (1L to 30L).map(i => SrcDoc(i, s"src${i % 5}"))
    val input = MemoryStream[SrcDoc]
    input.addData(rows: _*)
    val q = Streaming.urlNormalizeStream(input.toDF()).writeStream
      .format("memory").queryName("surl").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("surl").orderBy("doc_id").collect().map(key)
    val want = graft.pipeline.Corpus.urlNormalize(
        rows.map(r => (r.doc_id, r.source)).toDF("doc_id", "source"))
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("streaming semantic decon converges to the batch per-bench leak report") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = all.where(col("vec_id") % 50 === 0)
    val corpusRows = all.where(col("vec_id") % 50 =!= 0)
      .collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[Vec]
    input.addData(corpusRows.take(200): _*)
    val q = Streaming.semanticDeconStream(input.toDF(), bench).writeStream
      .format("memory").queryName("ssemdecon").outputMode("complete").start()
    q.processAllAvailable()
    input.addData(corpusRows.drop(200): _*) // second micro-batch folds in
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("ssemdecon").orderBy("bench_id").collect().map(key)
    val want = graft.pipeline.Similarity.semanticContamination(
        all.where(col("vec_id") % 50 =!= 0), bench)
      .orderBy("bench_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("streaming LSH candidates match batch pairs across micro-batches, no repeats") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta",   // near-dup of 1
      3L -> "totally different words here now")
    val b2 = Seq(
      4L -> "alpha beta gamma delta epsilon", // exact dup of 1, arrives later
      5L -> "unrelated second batch content doc")
    val input = MemoryStream[Doc]
    val q = Streaming.lshCandidateStream(input.toDF()).writeStream
      .format("memory").queryName("slsh").outputMode("append").start()
    input.addData(b1.map { case (id, t) => Doc(id, t) }: _*)
    q.processAllAvailable()
    input.addData(b2.map { case (id, t) => Doc(id, t) }: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("slsh").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(got.length == got.distinct.length, "no pair may be emitted twice")
    val batch = graft.pipeline.Dedup.lshCandidatePairs(
      (b1 ++ b2).toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(got.toSet == batch.toSet)
    assert(got.toSet.contains((1L, 4L)), "cross-batch exact dup must surface")
  }

  test("streaming verified pairs match batch minhashEstimate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta",   // near-dup of 1
      3L -> "totally different words here now")
    val b2 = Seq(
      4L -> "alpha beta gamma delta epsilon", // exact dup of 1, arrives later
      5L -> "unrelated second batch content doc")
    val input = MemoryStream[Doc]
    val q = Streaming.lshVerifiedStream(input.toDF()).writeStream
      .format("memory").queryName("slshv").outputMode("append").start()
    input.addData(b1.map { case (id, t) => Doc(id, t) }: _*)
    q.processAllAvailable()
    input.addData(b2.map { case (id, t) => Doc(id, t) }: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("slshv").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard"))).toMap
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val batch = graft.pipeline.Dedup.minhashEstimate(
        graft.pipeline.Dedup.lshCandidatePairs(all),
        graft.pipeline.Dedup.minhashSignatures(all))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard"))).toMap
    assert(got == batch && got.nonEmpty)
    assert(got((1L, 4L)) == (8L, 1.0), "cross-batch exact dup fully agrees")
    // the retention gate drops sub-threshold pairs
    val inputF = MemoryStream[Doc]
    val qf = Streaming.lshVerifiedStream(inputF.toDF(), minEst = 1.0).writeStream
      .format("memory").queryName("slshvf").outputMode("append").start()
    (b1 ++ b2).foreach { case (id, t) => inputF.addData(Doc(id, t)) }
    qf.processAllAvailable()
    qf.stop()
    val gotF = spark.table("slshvf").collect().map(r => r.getAs[Double]("est_jaccard"))
    assert(gotF.forall(_ == 1.0))
  }

  test("streaming budget fill pinned to batch sample on hash-ordered feed") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("source", StringType)))
    val rows = (1L to 20L).map { i =>
      val src = if (i <= 15) "big" else "small"
      Row(i, (1 to 10).map(j => s"w${i}_$j").mkString(" "), src)
    }
    import scala.jdk.CollectionConverters._
    val d = spark.createDataFrame(rows.asJava, docSchema)
    val batch = graft.pipeline.Corpus.budgetSample(d, 60L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"))).toSet
    // budgets from the same mix weights the batch operator uses
    val budgets = graft.pipeline.Corpus.mixWeights(d).collect()
      .map(r => r.getAs[String]("source") ->
        math.floor(60.0 * r.getAs[Double]("mix_weight")).toLong).toMap
    // feed in the batch operator's hash order, split across 2 batches
    val feed = d.select(
        col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.pipeline.TextOps.hash32(
          concat(lit("budget_"), col("doc_id").cast("string"))).as("ord"))
      .collect()
      .map(r => Streaming.BudgetDoc(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r.source, r.ord, r.doc_id))
    val input = MemoryStream[Streaming.BudgetDoc]
    val q = Streaming.budgetFillStream(input.toDS(), budgets).writeStream
      .format("memory").queryName("sbudget").outputMode("append").start()
    val (b1, b2) = feed.splitAt(7)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("sbudget").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"))).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming PQ encode pinned to batch codes (literal codebook, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = graft.pipeline.Similarity.pqCodebooks(e)
    val sample = e.where(col("vec_id") < 10).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding"))))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.pqEncodeStream(
        input.toDF().toDF("vec_id", "embedding"), books).writeStream
      .format("memory").queryName("spq").outputMode("append").start()
    input.addData(sample.take(5): _*)
    q.processAllAvailable()
    input.addData(sample.drop(5): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spq").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("sub"), r.getAs[Int]("code"))).toSet
    val want = graft.pipeline.Similarity
      .pqEncode(e.where(col("vec_id") < 10), books).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("sub"), r.getAs[Int]("code"))).toSet
    assert(got == want && got.size == 80, "10 vecs x 8 subspaces, batch-identical")
  }

  test("streaming fuzzy decontamination pinned to batch fuzzyContamination") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",   // bench
      2L -> "alpha beta gamma delta epsilon zeta eta theta",   // verbatim copy
      3L -> "alpha beta gamma delta epsilon zeta eta changed", // near copy
      4L -> "totally unrelated words that share nothing at all ok",
      5L -> "more disjoint content with zero shingle overlap anywhere")
    val d = spark.createDataFrame(
      texts.map { case (id, t) => Row(id, t) }.asJava, schema)
    val sigs = graft.pipeline.Dedup.minhashSignatures(d)
    val benchSigs = sigs.where(col("doc_id") === 1).localCheckpoint(true)
    val batch = graft.pipeline.Dedup.fuzzyContamination(d, sigs, benchSigs)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_bench_candidates"),
        r.getAs[Double]("max_est_jaccard"), r.getAs[Boolean]("contaminated"))).toSet
    val input = MemoryStream[(Long, String)]
    val q = Streaming.fuzzyDecontaminateStream(
        input.toDF().toDF("doc_id", "text"), benchSigs).writeStream
      .format("memory").queryName("sfuzzy").outputMode("append").start()
    input.addData(texts.take(3): _*)
    q.processAllAvailable()
    input.addData(texts.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sfuzzy").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_bench_candidates"),
        r.getAs[Double]("max_est_jaccard"), r.getAs[Boolean]("contaminated"))).toSet
    assert(got == batch && got.size == 5)
    // the verbatim copy is flagged perfect; the bench doc's self-pair is not
    assert(got.contains((2L, 1L, 1.0, true)) && got.contains((1L, 0L, 0.0, false)))
  }

  test("streaming ADC search pinned to batch topKPq (query stream vs static codes)") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = graft.pipeline.Similarity.pqCodebooks(e)
    val codes = graft.pipeline.Similarity.pqEncode(e, books).localCheckpoint(true)
    val qs = e.where(col("vec_id") < 5).collect()
      .map(r => Streaming.AdcQuery(
        r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val input = MemoryStream[Streaming.AdcQuery]
    val q = Streaming.adcSearchStream(input.toDS(), codes, books).writeStream
      .format("memory").queryName("sadc").outputMode("append").start()
    // queries split across micro-batches: each is answered in its own batch
    input.addData(qs.take(2): _*)
    q.processAllAvailable()
    input.addData(qs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sadc").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSet
    val want = graft.pipeline.Similarity.topKPq(e, books).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSet
    // bit-identical distances: same kernels, same fold order
    assert(got == want && got.size == 25, "5 queries x top-5, batch-identical")
  }

  test("streaming graph walk pinned to batch graphSearch (BFS twin = unpruned beam)") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // serve the top-4 prefix graph with 4 hops: the stream can't prune
    // per hop (no mid-plan windows), so its per-query path count is
    // (1+4)^4 — bounded — and its visited set is the FULL 4-hop
    // neighborhood; batch graphSearch with beam >= that neighborhood
    // (<= 341 nodes) computes the identical answer.
    val g = graft.pipeline.Similarity
      .graphPrefix(graft.pipeline.Similarity.knnWorkingList(e), 4)
      .localCheckpoint(true)
    val qs = e.where(col("vec_id") < 3).collect()
      .map(r => Streaming.AdcQuery(
        r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val input = MemoryStream[Streaming.AdcQuery]
    val q = Streaming.graphWalkStream(input.toDS(), g, e).writeStream
      .format("memory").queryName("sgwalk").outputMode("append").start()
    input.addData(qs.take(1): _*)
    q.processAllAvailable()
    input.addData(qs.drop(1): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sgwalk").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val want = graft.pipeline.Similarity
      .graphSearch(e, g, numQueries = 3, k = 4, beam = 400, hops = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    // bit-identical cosines: same dot kernel, same norm spelling
    assert(got == want && got.size == 12, "3 queries x top-4, batch-identical")
  }

  test("prepareStream: first-arrival dedup + quality gate + batch-identical split") {
    implicit val sqlCtx = spark.sqlContext
    val keepA = "the of and " + (1 to 37).map(i => s"word$i").mkString(" ")
    val keepB = "the of and " + (1 to 37).map(i => s"wordb$i").mkString(" ")
    val input = MemoryStream[Streaming.PrepDoc]
    val q = Streaming.prepareStream(input.toDS()).writeStream
      .format("memory").queryName("sprep").outputMode("append").start()
    // batch 1: keeper, its exact dup (same batch, min id wins), a reject
    input.addData(
      Streaming.PrepDoc(1L, keepA),
      Streaming.PrepDoc(2L, keepA),
      Streaming.PrepDoc(3L, "too short"))
    q.processAllAvailable()
    // batch 2: cross-batch dup of the keeper (dropped), a new keeper
    input.addData(
      Streaming.PrepDoc(4L, keepA),
      Streaming.PrepDoc(5L, keepB))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sprep").orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"),
        r.getAs[Long]("n_tokens")))
    // expected: docs 1 and 5 survive, with the BATCH split assignment
    val want = graft.pipeline.Corpus
      .splitAssign(Seq(1L, 5L).toDF("doc_id"))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"), 40L))
    assert(got.toSeq == want.toSeq)
  }

  test("streaming quality gate matches the batch Corpus.gopherFilter") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> ("the of and " + (1 to 37).map(i => s"word$i").mkString(" ")), // keep
      2L -> "too short",                                                   // drop
      3L -> ("the of and " + Seq.fill(20)("spam spam spam").mkString(" ")))// repetitive
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.qualityFilterStream(input.toDF()).writeStream
      .format("memory").queryName("squal").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("squal").orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep")))
    val want = graft.pipeline.Corpus.gopherFilter(texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep")))
    assert(got.toSeq == want.toSeq)
    assert(got.toSeq == Seq((1L, true), (2L, false), (3L, false)))
  }

  test("streaming paragraph explode matches the batch Corpus.paragraphs") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "first para\n\nsecond para\n\n\n\nthird",
      2L -> "single paragraph",
      3L -> "lead\n\n   \n\ntail")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.paragraphsStream(input.toDF()).writeStream
      .format("memory").queryName("sparas").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sparas").orderBy("doc_id", "para_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val want = graft.pipeline.Corpus.paragraphs(texts.toDF("doc_id", "text"))
      .orderBy("doc_id", "para_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == want.toSeq && got.length == 6)
  }

  test("streaming split assignment equals the batch split for the same ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    input.addData((1L to 50L).map(i => Doc(i, s"text $i")): _*)
    val q = Streaming.splitStream(input.toDF()).writeStream
      .format("memory").queryName("ssplit").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssplit").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = graft.pipeline.Corpus
      .splitAssign((1L to 50L).map(i => (i, s"text $i")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == want.toSeq)
    // every bucket name in range, reproducible across engines/streams
    assert(got.forall(r => Set("train", "valid", "test")(r._3)))
  }

  test("streaming bigram scoring vs a static model matches the batch score") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat ran",
      3L -> "dogs bark loudly at night")
    val batchDocs = texts.toDF("doc_id", "text")
    val bgBatch = batchDocs.select(
      col("doc_id"),
      explode(graft.pipeline.TextOps.shingles(col("text"), 2)).as("bg"))
    // model trained in batch (the production shape: static model,
    // live stream scored against it)
    val model = graft.pipeline.Corpus.bigramModel(bgBatch)
    val want = graft.pipeline.Corpus.bigramScore(bgBatch, model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.bigramScoreStream(input.toDF(), model).writeStream
      .format("memory").queryName("sbigram").outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbigram").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq && got.length == 3)
  }

  test("streaming DSIR scoring vs a static trained ratio table matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "alpha beta alpha beta gamma",
      2L -> "gamma delta gamma delta",
      3L -> "alpha beta delta")
    val batchDocs = texts
      .map { case (id, t) => (id, t, if (id == 1L) "src1" else "src2") }
      .toDF("doc_id", "text", "source")
    val ratios = graft.pipeline.Corpus
      .dsirRatios(batchDocs, col("source") === "src1")
      .collect() // freeze the trained model so both sides read one artifact
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("b", "lr_micro")
    val want = graft.pipeline.Corpus
      .dsirWeights(batchDocs, col("source") === "src1")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.dsirScoreStream(input.toDF(), ratios).writeStream
      .format("memory").queryName("sdsir").outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdsir").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq && got.length == 3)
  }

  test("streaming BM25 scoring vs frozen stats matches batch score_micro") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "x a x b",
      2L -> "x c",
      3L -> "q d e",
      4L -> "a b c")
    val batchDocs = texts.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    val want = graft.pipeline.Corpus
      .bm25TopK(batchDocs, Seq("q", "x"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // frozen stats a batch pass produced: N=4, sum dl=12 -> avgdl=3
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.bm25ScoreStream(
        input.toDF(), Map("x" -> 2.0, "q" -> 1.0), n = 4.0, avgdl = 3.0)
      .writeStream
      .format("memory").queryName("sbm25").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbm25").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq, s"got=${got.toSeq} want=${want.toSeq}")
    assert(got.length == 3, "doc without query terms must be pruned")
  }

  test("streaming aHash matches batch bit-for-bit over the real PNG corpus") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(40)
    val records = Multimodal.syntheticImages(spark, d).collect()
    val want = Multimodal
      .aHash(Multimodal.syntheticImages(spark, d), Multimodal.ImageIODecoder)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val input = MemoryStream[MediaRecord]
    input.addData(records.toIndexedSeq: _*)
    val q = Streaming.aHashStream(input.toDS(), Multimodal.ImageIODecoder)
      .writeStream
      .format("memory").queryName("sahash").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sahash").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq && got.length == 40)
  }

  test("streaming intra-doc substring dedup matches the batch rebuild bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // doc 1: an 8-token phrase repeated twice within the doc (later
    // span removed); doc 2: shares that phrase with doc 1 but has no
    // internal repeat (cross-doc repeats are NOT this op's job);
    // doc 3: shorter than one window; doc 4: three repeats with
    // overlapping spans (the run-merge case).
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val texts = Seq(
      1L -> s"$phrase alpha beta gamma $phrase tail",
      2L -> s"$phrase completely different continuation here",
      3L -> "too short",
      4L -> s"$phrase $phrase $phrase")
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.intraDocSubstringDedupStream(input.toDF()).writeStream
      .format("memory").queryName("sintrasub").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("sintrasub").orderBy("doc_id").collect().map(key)
    val want = graft.pipeline.Corpus.substringDedupFilterIntraDoc(
        texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.length == 4)
    assert(got(0).contains("true") && got(3).contains("true"))
    assert(got(1).contains("false") && got(2).contains("false"))
  }

  test("streaming span decontamination matches the batch span removal bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val leak = "what is the capital of france then"  // 7 tokens, >1 window
    val texts = Seq(
      1L -> s"clean document with no bench overlap at all",
      2L -> s"intro words $leak closing words here",
      3L -> leak)                                    // verbatim copy, empties
    val bench = Seq(100L -> leak)
    // Bench window keys computed EXACTLY as the engine does (md5 of the
    // space-joined 4-gram), but independently in JVM code.
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val benchKeys = leak.split(" ").sliding(4).map(w => md5hex(w.mkString(" "))).toSeq
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.spanDeconStream(input.toDF(), benchKeys).writeStream
      .format("memory").queryName("sspandecon").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("sspandecon").orderBy("doc_id").collect().map(key)
    val want = graft.pipeline.Corpus.decontaminateSpans(
        texts.toDF("doc_id", "text"), bench.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.length == 3)
    assert(got(0).contains("false") && got(1).contains("true"))
    // verbatim copy loses all its tokens
    assert(spark.table("sspandecon").where(col("doc_id") === 3)
      .head().getAs[Long]("n_removed") == 7L)
  }

  test("streaming language-consistency screen matches the batch majority vote") {
    implicit val sqlCtx = spark.sqlContext
    // en-stop tokens {the,a,of,to,and}, es {el,la,de,y,que}; build
    // docs long enough to span several 32-token chunks.
    val en = "the cat and a dog of the house to see and more words here padding out the chunk with the usual and a of to filler tokens going on"
    val es = "el gato y la casa de el perro que vive y la calle de que hablamos y el resto de la frase que sigue aqui con el y la de"
    val texts = Seq(
      1L -> (en + " " + en),        // uniformly english, 2+ chunks
      2L -> (en + " " + es),        // half-and-half mix
      3L -> "tiny und doc")         // one chunk, no stopwords -> und
    val input = MemoryStream[Doc]
    input.addData(texts.map { case (id, txt) => Doc(id, txt) }: _*)
    val q = Streaming.langConsistencyStream(input.toDF()).writeStream
      .format("memory").queryName("slangc").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("slangc").orderBy("doc_id").collect().map(key)
    // batch spelling: chunk -> langPred -> per-doc majority vote
    val want = {
      import org.apache.spark.sql.expressions.Window
      val counts = graft.pipeline.Corpus.chunk(
          texts.toDF("doc_id", "text"), chunkSize = 32, stride = 32)
        .select(col("doc_id"),
          graft.pipeline.TextOps.langPred(col("chunk_text")).as("l"))
        .groupBy("doc_id", "l").agg(count(lit(1)).as("c"))
      val byDoc = Window.partitionBy("doc_id")
      val rk = Window.partitionBy("doc_id").orderBy(col("c").desc, col("l").asc)
      counts
        .withColumn("_rk", row_number().over(rk))
        .withColumn("n_chunks", sum("c").over(byDoc))
        .withColumn("n_langs", count(lit(1)).over(byDoc))
        .where(col("_rk") === 1)
        .select(col("doc_id"), col("n_chunks"), col("n_langs"),
          col("l").as("majority_lang"),
          round(col("c").cast("double") / col("n_chunks"), 6).as("majority_frac"),
          (col("n_langs") > 1).as("mixed"))
        .orderBy("doc_id").collect().map(key)
    }
    assert(got.toSeq == want.toSeq && got.length == 3)
    assert(got(1).contains("true"))  // the mixed doc flags
  }

  test("streaming winnow fingerprints match batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(30).collect()
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val input = MemoryStream[Doc]
    input.addData(rows: _*)
    val q = Streaming.winnowStream(input.toDF()).writeStream
      .format("memory").queryName("swinnow").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("swinnow").orderBy("doc_id").collect().map(key)
    val want = graft.pipeline.Corpus.winnowFingerprints(
        rows.toSeq.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.length == 30)
  }

  test("streaming quality-model scoring matches batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(50).collect()
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val input = MemoryStream[Doc]
    input.addData(rows: _*)
    val q = Streaming.qualityModelScoreStream(input.toDF()).writeStream
      .format("memory").queryName("sqms").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val got = spark.table("sqms").orderBy("doc_id").collect().map(key)
    val want = graft.pipeline.Corpus.qualityModelScore(
        rows.toSeq.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(key)
    assert(got.toSeq == want.toSeq && got.length == 50)
  }

  test("streaming URL dedup keeps the first sighting per canonical URL across batches") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Streaming.SightingIn(1L, "https://www.example.com/doc/7?ref=feed"),
      Streaming.SightingIn(2L, "https://example.com/doc/7"),      // same canon as 1
      Streaming.SightingIn(3L, "https://example.com/doc/8"))
    val b2 = Seq(
      Streaming.SightingIn(4L, "https://example.com/doc/7#frag"), // dup, later batch
      Streaming.SightingIn(5L, "https://example.com/doc/9?x=1"))
    val input = MemoryStream[Streaming.SightingIn]
    val q = Streaming.urlDedupStream(input.toDS()).writeStream
      .format("memory").queryName("surldedup").outputMode("append").start()
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("surldedup").collect()
      .map(r => r.getAs[Long]("sighting_id") -> r.getAs[Boolean]("is_first")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
    // and the merged sightings actually share a key
    val keys = spark.table("surldedup").collect()
      .map(r => r.getAs[Long]("sighting_id") -> r.getAs[String]("url_key")).toMap
    assert(keys(1L) == keys(2L) && keys(2L) == keys(4L) && keys(1L) != keys(3L))
  }

  test("streaming bottom-k quantile sketch converges to the batch sample estimate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => Streaming.QEventIn(r.getString(0), r.getLong(1), r.getDouble(2)))
    val input = MemoryStream[Streaming.QEventIn]
    val q = Streaming.quantileSketchStream(input.toDS()).writeStream
      .format("memory").queryName("sqsk").outputMode("update").start()
    input.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
    input.addData(rows.drop(rows.length / 2): _*); q.processAllAvailable(); q.stop()
    // update mode appends refreshed rows; the LAST emission per key is
    // the converged sketch
    val got = spark.table("sqsk").collect()
      .zipWithIndex
      .groupBy(_._1.getAs[String]("event_type"))
      .map { case (et, xs) =>
        val r = xs.maxBy(_._2)._1
        et -> (r.getAs[Long]("n_sample"),
          math.rint(r.getAs[Double]("p50_est") * 1e6) / 1e6,
          math.rint(r.getAs[Double]("p90_est") * 1e6) / 1e6)
      }
    val want = {
      val ev = rows.toSeq.toDF("event_type", "event_id", "value")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
        .orderBy(
          graft.pipeline.TextOps.hash32(
            concat(lit("qs_"), col("event_id").cast("string"))).asc,
          col("event_id").asc)
      ev.withColumn("_rn", row_number().over(w)).where(col("_rn") <= 128)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))
        .toMap
    }
    assert(got == want && got.nonEmpty)
  }

  test("streaming sessions split on the gap like the batch sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(
      Ev(1, t(0), 7, "click", 1.0), Ev(2, t(10), 7, "click", 1.0),
      Ev(3, t(100), 7, "click", 1.0), // gap > 30min -> new session
      Ev(4, t(0), 8, "view", 1.0))
    val q = Streaming.sessions(input.toDF()).writeStream
      .format("memory").queryName("ssess").outputMode("append").start()
    input.addData(Ev(99, t(1000), 9, "click", 1.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssess").orderBy("user_id", "session_start").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("user_id") == 7 && got(0).getAs[Long]("n_events") == 2)
    assert(got(1).getAs[Long]("user_id") == 7 && got(1).getAs[Long]("n_events") == 1)
    assert(got(2).getAs[Long]("user_id") == 8)
  }

  test("streaming fixed-N reservoir converges to the batch corpus_sample_fixed_n draw") {
    implicit val sqlCtx = spark.sqlContext
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = d.select("doc_id", "source").collect()
      .map(r => Streaming.FixedNDocIn(r.getLong(0), r.getString(1)))
    val input = MemoryStream[Streaming.FixedNDocIn]
    val q = Streaming.fixedNStream(input.toDS(), n = 100, shards = 8)
      .writeStream.format("memory").queryName("sfixn")
      .outputMode("update").start()
    input.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
    input.addData(rows.drop(rows.length / 2): _*)
    // re-deliver a chunk: the reservoir must fold duplicates idempotently
    input.addData(rows.take(20): _*)
    q.processAllAvailable(); q.stop()
    // every emitted row was in some intermediate reservoir; the final
    // draw is the N smallest distinct (pick_key, doc_id) of everything
    // emitted (reservoirs only tighten), matching the batch TakeOrdered
    val got = spark.table("sfixn")
      .select("pick_key", "doc_id", "source").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).take(100).toSeq
    val want = QueriesPipeline
      .queries("corpus_sample_fixed_n")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("pick_key"), r.getAs[Long]("doc_id"),
        r.getAs[String]("source")))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == want && got.length == 100)
  }

  test("streaming deletion blast radius converges to the batch deletion_impact_report n_hit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // the served artifacts the batch report probes, as static sides
    val docTokens = d.select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val shardMap = graft.pipeline.Corpus.shardAssign(d)
    val cellMap = graft.pipeline.Similarity.cellAssignments(
      e, graft.pipeline.IvfChain.centroids(spark, dir, e))
    val clusterMap = graft.pipeline.DedupChain.clusterLabels(spark, dir, d)
    val tombs = d.where(col("doc_id") % 97 === 0).select("doc_id").collect()
      .map(r => Streaming.TombstoneIn(r.getLong(0)))
    val input = MemoryStream[Streaming.TombstoneIn]
    val q = Streaming.deletionStream(
        input.toDS(), docTokens, shardMap, cellMap, clusterMap)
      .writeStream.format("memory").queryName("sdel")
      .outputMode("update").start()
    input.addData(tombs.take(tombs.length / 2): _*); q.processAllAvailable()
    input.addData(tombs.drop(tombs.length / 2): _*)
    // re-deliver: set semantics must keep the counts exact
    input.addData(tombs.take(2): _*)
    q.processAllAvailable(); q.stop()
    // update mode re-emits running rows; the LAST emission per tier is
    // the converged blast radius
    val got = spark.table("sdel").collect().zipWithIndex
      .groupBy(_._1.getAs[String]("tier"))
      .map { case (tier, xs) => tier -> xs.maxBy(_._2)._1.getAs[Long]("n_hit") }
    val want = QueriesPipeline.queries("deletion_impact_report")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("tier") -> r.getAs[Long]("n_hit")).toMap
    assert(got == want && got.size == 5)
  }

  test("streaming running release card converges to the batch sketch datasheet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val rows = d.select("doc_id", "source", "text").collect()
      .map(r => Streaming.DriftDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[Streaming.DriftDoc]
    val q = Streaming.datasheetStream(input.toDF()).writeStream
      .format("memory").queryName("scard").outputMode("update").start()
    input.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
    input.addData(rows.drop(rows.length / 2): _*); q.processAllAvailable()
    // serving-side merge: last emission per shard, then k-smallest of
    // each hash union / bottom-k of the sample union
    def merged(): (Seq[Long], Seq[Long], Seq[(Long, Long, Long, Long)]) = {
      val last = spark.table("scard").collect().zipWithIndex
        .groupBy(_._1.getAs[Long]("shard"))
        .map { case (_, xs) => xs.maxBy(_._2)._1 }.toSeq
      (last.flatMap(_.getSeq[Long](1)).distinct.sorted.take(256),
        last.flatMap(_.getSeq[Long](2)).distinct.sorted.take(256),
        last.flatMap(_.getSeq[org.apache.spark.sql.Row](3)
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
          .distinct.sortBy(x => (x._1, x._2)).take(256))
    }
    val before = merged()
    // re-delivery: EVERY state structure is keyed, so a duplicate
    // batch must be a NO-OP on the served card — no hand-compensation
    // (the old exact counters needed the duplicates backed out by
    // hand; r18 ADVICE, twice carried)
    input.addData(rows.take(7): _*)
    q.processAllAvailable(); q.stop()
    val (kmvd, kmv, smp) = merged()
    assert((kmvd, kmv, smp) == before,
      "re-delivered docs must fold into the keyed state unchanged")
    // bit-level convergence pins: the merged KMV arrays and the merged
    // sample ARE the batch aggregates over the same Catalyst
    // expressions (the stream folded the identical hashes)
    val st = d.select(
      col("doc_id"),
      size(graft.pipeline.TextOps.tokens(col("text"))).cast("bigint").as("nt"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("bigint").as("h"),
      conv(substring(md5(concat(lit("dsd_"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("bigint").as("hd"),
      graft.pipeline.TextOps.hash32(
        concat(lit("dsq_"), col("doc_id").cast("string"))).as("sh"))
    assert(kmvd == st.select("hd").distinct.orderBy("hd").limit(256)
      .collect().map(_.getLong(0)).toSeq)
    assert(kmv == st.select("h").distinct.orderBy("h").limit(256)
      .collect().map(_.getLong(0)).toSeq)
    assert(smp.map(x => (x._1, x._2)) ==
      st.orderBy(col("sh").asc, col("doc_id").asc).limit(256)
        .select("sh", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    def pct(sorted: IndexedSeq[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    def est(a: Seq[Long]) =
      if (a.length < 256) a.length.toDouble
      else 255.0 * 1152921504606846976.0 / a(255).toDouble
    val nts = smp.map(_._3.toDouble).sorted.toIndexedSeq
    val card = QueriesPipeline.queries("corpus_datasheet_sketch")(spark, dir).head
    // the distinct-content estimate and the sample percentiles are the
    // batch sketch card's own figures (the stream's fixed point)
    assert(math.abs(est(kmv) - card.getAs[Double]("est_distinct_docs")) < 1e-4)
    assert(math.abs(pct(nts, 0.5) - card.getAs[Double]("p50_tokens_est")) < 1e-4)
    assert(math.abs(pct(nts, 0.9) - card.getAs[Double]("p90_tokens_est")) < 1e-4)
    // the sketch-only replacements for the retired exact counters:
    // est_n_docs from the doc-key KMV, token mass = est_n_docs x
    // sample mean — each within KMV error (k=256 -> ~6% sigma) of the
    // exact batch figures they estimate
    val estDocs = est(kmvd)
    val estTok = estDocs * nts.sum / nts.length
    assert(math.abs(estDocs - card.getAs[Long]("n_docs")) <
      0.25 * card.getAs[Long]("n_docs"))
    assert(math.abs(estTok - card.getAs[Long]("n_tokens")) <
      0.25 * card.getAs[Long]("n_tokens"))
  }

  test("the public *Stream surface set matches the declared inventory") {
    // SURVEY.md's streaming-twin claim is pinned HERE, not in prose
    // (round-16 verdict: the prose count drifted). The expected set is
    // Streaming.StreamSurfaces — ONE declared inventory instead of a
    // hand-bumped count (r17 advice): a rename or an undeclared helper
    // ending in "Stream" fails with the exact name diff, pointing at
    // the inventory to update. getMethods sees public methods only;
    // synthetic default-arg methods don't end in "Stream", so the scan
    // counts exactly the callable twin surfaces.
    val scanned = graft.streaming.Streaming.getClass.getMethods
      .map(_.getName).filter(_.endsWith("Stream")).distinct.sorted.toSeq
    val declared = graft.streaming.Streaming.StreamSurfaces.sorted
    assert(declared == declared.distinct, "inventory has duplicates")
    assert(scanned == declared,
      s"undeclared: ${(scanned.toSet -- declared.toSet).toSeq.sorted.mkString(", ")}; " +
        s"missing: ${(declared.toSet -- scanned.toSet).toSeq.sorted.mkString(", ")} — " +
        "update Streaming.StreamSurfaces together with the def")
  }
}
