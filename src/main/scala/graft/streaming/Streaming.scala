package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Structured Streaming surface: the streaming counterparts of the
  * batch bars derivation, the EWM recursion, and sessionization.
  *
  * Scale design: all three are keyed stateful ops — state is
  * hash-partitioned on the key (symbol / user), checkpointed
  * incrementally, and each micro-batch touches only updated keys.
  * Watermarks bound state growth for the windowed aggregations.
  */
object Streaming {

  /** THE declared streaming-twin inventory — the single source of
    * truth for the public `*Stream` surface. StreamingSpec asserts the
    * reflection scan of this object equals this list exactly (so a
    * rename or an undeclared helper ending in "Stream" points HERE,
    * not at a bare count), and SURVEY.md cites the pin instead of
    * carrying a literal number (the count drifted in prose twice —
    * r16 and r17 verdicts). Add the def AND its entry here together.
    */
  val StreamSurfaces: Seq[String] = Seq(
    "aHashStream", "adcSearchStream", "asofStream", "attributionStream",
    "badwordsGateStream", "bigramScoreStream", "binarySearchStream",
    "bitextScoreStream", "bloomDecontaminateStream", "bm25ScoreStream",
    "bpeTokenCountStream", "budgetFillStream", "changelogStream",
    "changelogTombstoneStream",
    "chunkStream", "datasheetStream", "decontaminateStream",
    "dedupStream", "deletionStream", "domainGateStream",
    "dsirScoreStream", "emaStream", "embeddingSpectrumStream",
    "fertilityStream", "fixedNStream", "fuzzyDecontaminateStream",
    "graphWalkStream", "htmlExtractStream", "intraDocDedupStream",
    "intraDocSubstringDedupStream", "ivfCellDriftStream",
    "langConsistencyStream", "langIdModelStream", "lshCandidateStream",
    "lshVerifiedStream", "mediaFeaturesStream", "paragraphsStream",
    "pqEncodeStream", "prepareStream", "qualityFilterStream",
    "qualityModelScoreStream", "quantileSketchStream",
    "rateAnomalyStream", "rateSampleStream", "redactPiiStream",
    "retentionStream", "semanticDeconStream", "smaStream",
    "sourceDriftStream", "spanDeconStream", "splitStream",
    "sq8EncodeStream", "tokenIdsStream", "urlDedupStream",
    "urlNormalizeStream", "videoDedupStream", "winnowStream",
    "wordpieceStream", "zkeyStream")

  /** Event-time column handling that actually mirrors the batch side:
    * a LongType ts is the repo's canonical long-of-NANOS (nanosAsLong
    * parquet reading) and must go through integer `div 1000` +
    * timestamp_micros — a bare cast(long -> timestamp) would interpret
    * it as SECONDS and overflow. Timestamp-typed input passes through.
    * The dispatch itself is shared with batch bars/sessionization
    * ([[graft.sources.Bars.eventTimeMicros]]).
    */
  private def eventTime(events: DataFrame): Column =
    timestamp_micros(graft.sources.Bars.eventTimeMicros(events))

  /** Streaming OHLCV bars: 1-hour tumbling event-time windows per
    * event_type, watermarked so late data beyond `lateness` is dropped
    * and window state is evicted. Mirrors graft.sources.Bars.
    */
  def bars(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", eventTime(events))
      .withWatermark("ts", lateness)
      .groupBy(
        col("event_type").as("symbol"),
        window(col("ts"), "1 hour"))
      .agg(
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        min_by(col("value"), col("event_id")).as("open"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))
      .select(
        col("symbol"), col("window.start").as("timestamp"),
        col("low"), col("high"), col("open"), col("close"), col("volume"))

  case class BarInput(symbol: String, timestamp: java.sql.Timestamp, close: Double)
  case class EmaOutput(symbol: String, timestamp: java.sql.Timestamp, close: Double, ema: Double)
  case class EmaState(ema: Double)

  /** Streaming per-symbol EMA (adjust=false recursion) via keyed state —
    * the streaming twin of the EwmaWindow batch expression. Input must
    * arrive in event order per symbol (e.g. from the bars stream with a
    * watermark upstream); each record updates y = alpha*x + (1-alpha)*y.
    */
  def emaStream(bars: Dataset[BarInput], span: Int): Dataset[EmaOutput] = {
    import bars.sparkSession.implicits._
    val alpha = 2.0 / (span + 1)
    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (symbol: String, rows: Iterator[BarInput], state: GroupState[EmaState]) => {
          var y = state.getOption.map(_.ema)
          val out = rows.toSeq.sortBy(_.timestamp.getTime).map { r =>
            val next = y match {
              case None => r.close
              case Some(prev) => alpha * r.close + (1.0 - alpha) * prev
            }
            y = Some(next)
            EmaOutput(symbol, r.timestamp, r.close, next)
          }
          y.foreach(v => state.update(EmaState(v)))
          out.iterator
        })
  }

  case class SmaOutput(symbol: String, timestamp: java.sql.Timestamp, close: Double,
      sma: Option[Double])
  case class RingState(values: List[Double])

  /** Streaming rolling SMA via a keyed ring buffer of the last n
    * closes — the SURVEY §7.7 state shape for windowed indicators on
    * unbounded streams. min_periods semantics match the batch kernel:
    * null until the buffer holds n values.
    */
  def smaStream(bars: Dataset[BarInput], n: Int): Dataset[SmaOutput] = {
    import bars.sparkSession.implicits._
    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (symbol: String, rows: Iterator[BarInput], state: GroupState[RingState]) => {
          var ring = state.getOption.map(_.values).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.timestamp.getTime).map { r =>
            ring = (r.close :: ring).take(n)
            val sma = if (ring.length == n) Some(ring.sum / n) else None
            SmaOutput(symbol, r.timestamp, r.close, sma)
          }
          state.update(RingState(ring))
          out.iterator
        })
  }

  case class AsofIn(symbol: String, t: Long, side: Int,
      event_id: Option[Long], value: Option[Double], payload: Option[Double])
  case class AsofOut(symbol: String, t: Long, event_id: Long, value: Double,
      payload: Option[Double])
  case class AsofState(lastPayload: Option[Double])

  /** Streaming as-of enrichment — the streaming twin of
    * [[graft.operators.TimeJoins.asof]]. Both sides arrive unioned and
    * tagged (side 0 = right/reference, side 1 = left/probe, exactly
    * the batch union-merge encoding); keyed state holds the most
    * recent right payload per key, so each probe row is enriched with
    * the latest reference value at or before its time. Within a
    * micro-batch rows are processed in (t, side) order — the same
    * inclusive tie rule as the batch plan; across batches correctness
    * relies on per-key event-order arrival (e.g. from an upstream
    * watermarked bar stream), like the other stateful twins here.
    * State is O(1) per key and never evicted (the latest reference
    * value stays relevant indefinitely).
    */
  def asofStream(rows: Dataset[AsofIn]): Dataset[AsofOut] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (symbol: String, it: Iterator[AsofIn], state: GroupState[AsofState]) => {
          var last = state.getOption.flatMap(_.lastPayload)
          val out = Seq.newBuilder[AsofOut]
          it.toSeq.sortBy(r => (r.t, r.side)).foreach { r =>
            if (r.side == 0) last = r.payload.orElse(last)
            else out += AsofOut(symbol, r.t, r.event_id.get, r.value.get, last)
          }
          state.update(AsofState(last))
          out.result().iterator
        })
  }

  case class DocIn(doc_id: Long, content_md5: String)
  case class DedupOut(doc_id: Long, content_md5: String, is_first: Boolean)
  case class SeenState(seen: Boolean)

  /** Streaming exact dedup — the streaming twin of
    * [[graft.pipeline.Dedup.exactGroups]]: keyed state per content
    * hash marks whether the content was already emitted, so each doc
    * is flagged kept (first arrival) or duplicate. Within a
    * micro-batch ties resolve by doc_id (matching the batch
    * min-doc_id canonical); across batches first-arrival wins — the
    * streaming-native semantic. State is one boolean per distinct
    * content hash, hash-partitioned like any keyed state; a production
    * deployment bounds it with a TTL timeout where re-emitting a dup
    * after expiry is acceptable.
    */
  def dedupStream(docs: Dataset[DocIn]): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_md5)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (md5: String, rows: Iterator[DocIn], state: GroupState[SeenState]) => {
          var seen = state.getOption.exists(_.seen)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val first = !seen
            seen = true
            DedupOut(r.doc_id, md5, first)
          }
          state.update(SeenState(seen))
          out.iterator
        })
  }

  case class QEventIn(event_type: String, event_id: Long, value: Double)
  case class QSketchOut(
      event_type: String, n_sample: Long, p50_est: Double, p90_est: Double)
  case class QSketchState(rows: List[(Long, Long, Double)])

  /** Streaming bottom-k quantile sketch — the stream twin of the
    * approx_quantiles_sample batch query, and the reason a bottom-k-
    * by-hash sample is the right quantile sketch for a live pipeline:
    * the keyed state IS the sample (the k smallest (md5-hash,
    * event_id, value) triples per key — bounded at k rows per key by
    * construction), every micro-batch folds its arrivals in and
    * emits the key's refreshed p50/p90, and because membership
    * depends only on each row's own hash, the state after ANY arrival
    * order equals the batch sample over the same rows — the estimate
    * CONVERGES to the batch query's exactly (pinned in
    * StreamingSpec). Update mode; percentile interpolation matches
    * Spark's `percentile` (linear between floor/ceil positions).
    */
  def quantileSketchStream(
      events: Dataset[QEventIn], k: Int = 128): Dataset[QSketchOut] = {
    import events.sparkSession.implicits._
    def h32(s: String) = graft.pipeline.TextOps.hash32Jvm(s)
    def pct(sorted: IndexedSeq[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[QEventIn], state: GroupState[QSketchState]) =>
          val cur = state.getOption.map(_.rows).getOrElse(Nil)
          val merged = (cur ++ rows.map(r =>
              (h32(s"qs_${r.event_id}"), r.event_id, r.value)).toList)
            .distinct.sortBy(t => (t._1, t._2)).take(k)
          state.update(QSketchState(merged))
          val vals = merged.map(_._3).sorted.toIndexedSeq
          QSketchOut(et, merged.length.toLong, pct(vals, 0.5), pct(vals, 0.9))
      }
  }

  case class SightingIn(sighting_id: Long, url: String)
  case class UrlDedupOut(sighting_id: Long, url_key: String, is_first: Boolean)

  /** Streaming URL-keyed crawl dedup — the stream twin of the
    * dedup_urls merge: each arriving crawl sighting is canonicalized
    * ([[graft.pipeline.Corpus.canonicalUrl]], the same stateless
    * projection the batch runs) and first-arrival-wins keyed state on
    * the canonical-URL md5 flags it kept or duplicate — the
    * ingest-side "have we already crawled this page" gate. Within a
    * micro-batch ties resolve by sighting_id (the batch min
    * canonical); state is one boolean per distinct canonical URL,
    * TTL-boundable like [[dedupStream]]'s.
    */
  def urlDedupStream(sightings: Dataset[SightingIn]): Dataset[UrlDedupOut] = {
    import sightings.sparkSession.implicits._
    sightings
      .withColumn("url_key",
        md5(graft.pipeline.Corpus.canonicalUrl(col("url"))))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(Long, String, String)],
         state: GroupState[SeenState]) => {
          var seen = state.getOption.exists(_.seen)
          val out = rows.toSeq.sortBy(_._1).map { r =>
            val first = !seen
            seen = true
            UrlDedupOut(r._1, key, first)
          }
          state.update(SeenState(seen))
          out.iterator
        })
  }

  case class BandIn(doc_id: Long, band: Int, v: Long)
  case class PairOut(doc_a: Long, doc_b: Long)
  case class BucketState(ids: List[Long])
  case class PairSeen(seen: Boolean)

  /** Streaming NEAR-dedup candidates — the stream twin of
    * [[graft.pipeline.Dedup.lshCandidatePairs]]: each arriving
    * document's MinHash band values are checked against every band
    * value seen so far, so a near-duplicate of ANY historical document
    * surfaces in the micro-batch where it arrives. The signature
    * pipeline (shingle → md5 → 8 minhashes → 4 bands) is the batch
    * body unchanged (stateless, codegen'd); the statefulness is two
    * chained keyed stages, both append-mode:
    *
    *  1. keyed by (band, value): state = doc_ids seen in the bucket;
    *     a new arrival emits a candidate pair against each of them
    *     (within a batch, ids join in ascending order, matching the
    *     batch `doc_a < doc_b` canonicalization);
    *  2. keyed by (doc_a, doc_b): one boolean per emitted pair — the
    *     streaming equivalent of the batch `.distinct()` across bands
    *     and batches, so downstream sees each candidate exactly once.
    *
    * Docs too short to shingle have NULL signatures and are filtered
    * before stage 1 — the same self-exclusion the batch equi-join
    * performs. State is hash-partitioned on its key like any keyed
    * state; a production deployment bounds both stores with TTL
    * timeouts (an expired bucket forgets old docs — the standard
    * sliding-history trade every streaming dedup makes). Feed the
    * emitted candidates to the batch jaccard verifier over the
    * accumulated corpus for the exactness pass.
    */
  def lshCandidateStream(docs: DataFrame): Dataset[PairOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = graft.pipeline.Dedup.lshBands(
      graft.pipeline.Dedup.minhashSignaturesSh(graft.pipeline.Dedup.shingled(docs)))
    val exploded = banded.select(
        col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"band$b").as("v"))): _*)).as("bv"))
      .select(col("doc_id"), col("bv.band").as("band"), col("bv.v").as("v"))
      .where(col("v").isNotNull)
    val candidates = exploded.as[BandIn]
      .groupByKey(r => (r.band, r.v))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[BandIn], state: GroupState[BucketState]) => {
          var acc = state.getOption.map(_.ids).getOrElse(Nil)
          val out = List.newBuilder[PairOut]
          rows.map(_.doc_id).toSeq.distinct.sorted.foreach { id =>
            if (!acc.contains(id)) {
              acc.foreach(o => out += PairOut(math.min(o, id), math.max(o, id)))
              acc = id :: acc
            }
          }
          state.update(BucketState(acc))
          out.result().iterator
        })
    candidates
      .groupByKey(p => (p.doc_a, p.doc_b))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Long, Long), rows: Iterator[PairOut], state: GroupState[PairSeen]) => {
          val first = !state.getOption.exists(_.seen)
          state.update(PairSeen(true))
          if (first && rows.hasNext) Iterator(PairOut(key._1, key._2))
          else Iterator.empty
        })
  }

  case class SigBandIn(doc_id: Long, band: Int, v: Long, sig: Seq[Long])
  case class SigBucketState(entries: List[(Long, Seq[Long])])
  case class VerifiedPairOut(
      doc_a: Long, doc_b: Long, n_agree: Long, est_jaccard: Double)
  case class BestPairState(seen: Boolean)

  /** Streaming VERIFIED near-dedup — [[lshCandidateStream]] with the
    * signature-estimated Jaccard attached (the stream twin of
    * [[graft.pipeline.Dedup.minhashEstimate]] over the candidate
    * pairs). The bucket state carries each historical doc's full
    * 8-component signature alongside its id, so the estimate is
    * computed AT EMISSION — no second lookup join against a signature
    * store, which a streaming deployment would otherwise need for
    * verification. That is the scale trade: state grows from 1 long to
    * 9 longs per (bucket, doc), still O(signature) ≪ O(text), and the
    * verify step costs 8 comparisons per emitted pair. The estimate
    * for a given pair is identical whichever band surfaces it (it is a
    * pure function of the two signatures), so the stage-2 pair dedup
    * can keep any one emission. Pairs below `minEst` are dropped
    * after estimation — the streaming analog of the batch
    * `jaccard >= threshold` retention gate; pass 0.0 to keep all
    * candidates.
    */
  def lshVerifiedStream(docs: DataFrame, minEst: Double = 0.0): Dataset[VerifiedPairOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = graft.pipeline.Dedup.lshBands(
      graft.pipeline.Dedup.minhashSignaturesSh(graft.pipeline.Dedup.shingled(docs)))
    val exploded = banded.select(
        col("doc_id"),
        array((0 until 8).map(i => col(s"m$i")): _*).as("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"band$b").as("v"))): _*)).as("bv"))
      .select(
        col("doc_id"), col("bv.band").as("band"), col("bv.v").as("v"),
        col("sig"))
      .where(col("v").isNotNull)
    def estimate(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toLong
    val candidates = exploded.as[SigBandIn]
      .groupByKey(r => (r.band, r.v))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[SigBandIn],
            state: GroupState[SigBucketState]) => {
          var acc = state.getOption.map(_.entries).getOrElse(Nil)
          val out = List.newBuilder[VerifiedPairOut]
          rows.toSeq.sortBy(_.doc_id).distinctBy(_.doc_id).foreach { r =>
            if (!acc.exists(_._1 == r.doc_id)) {
              acc.foreach { case (oid, osig) =>
                val n = estimate(osig, r.sig)
                out += VerifiedPairOut(
                  math.min(oid, r.doc_id), math.max(oid, r.doc_id),
                  n, n / 8.0)
              }
              acc = (r.doc_id, r.sig) :: acc
            }
          }
          state.update(SigBucketState(acc))
          out.result().iterator
        })
    candidates
      .filter(_.est_jaccard >= minEst)
      .groupByKey(p => (p.doc_a, p.doc_b))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, Long), rows: Iterator[VerifiedPairOut],
            state: GroupState[BestPairState]) => {
          val first = !state.getOption.exists(_.seen)
          state.update(BestPairState(true))
          if (first && rows.hasNext) Iterator(rows.next())
          else Iterator.empty
        })
  }

  /** Streaming PQ encode — the live-ingest twin of
    * [[graft.pipeline.Similarity.pqEncode]], in the online-serving
    * shape: the trained codebook (m·ksub tiny rows) is collected ONCE
    * at plan-build time and baked into the plan as literal arrays, so
    * encoding is a STATELESS per-row map — no stream-static join, no
    * state store, nothing to checkpoint. This is how an index server
    * actually runs (codebook in memory, assignment pure compute); the
    * same literal-bake works for any broadcast-sized model artifact.
    * The argmin is an `array_min` over (d2, cid) structs — identical
    * ordering (ties to lowest cid) and identical distance arithmetic
    * (dotF/dotFD kernels; the driver-side fold for c·c replays the
    * same IEEE sequence as the batch `aggregate`) — so stream and
    * batch codes are pinned equal in StreamingSpec.
    */
  def pqEncodeStream(vecs: DataFrame, books: DataFrame, m: Int = 8): DataFrame = {
    import graft.functions.{dotF, dotFD}
    val sub = 64 / m
    val bk = books.collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("cid"), r.getSeq[Double](r.fieldIndex("ce"))))
      .groupBy(_._1)
    val codeCols = (0 until m).map { j =>
      val sv = slice(col("embedding"), j * sub + 1, sub)
      val xx = dotF(sv, sv)
      val cands = array(bk(j).sortBy(_._2).map { case (_, cid, ce) =>
        val ceLit = array(ce.map(lit): _*)
        val cc = lit(ce.foldLeft(0.0)((a, x) => a + x * x))
        struct(
          (xx - lit(2.0) * dotFD(sv, ceLit) + cc).as("d2"),
          lit(cid).as("cid"))
      }.toSeq: _*)
      struct(lit(j).as("sub"), array_min(cands).getField("cid").as("code"))
    }
    vecs.select(col("vec_id"), explode(array(codeCols: _*)).as("c"))
      .select(col("vec_id"), col("c.sub").as("sub"), col("c.code").as("code"))
  }

  case class AdcQuery(query_id: Long, embedding: Array[Float])
  case class AdcScored(query_id: Long, neighbor_id: Long, adc_dist: Double)
  case class AdcHit(query_id: Long, rank: Int, neighbor_id: Long, adc_dist: Double)

  /** Streaming ADC search — the index-SERVER query path: a live stream
    * of full-precision query vectors against a STATIC PQ-coded corpus
    * (the artifact [[pqEncodeStream]] / batch pqEncode maintains).
    * Complements pqEncodeStream, which is the ingest side of the same
    * server.
    *
    * Shape: the codebook is baked into the plan as literals (as in
    * pqEncodeStream), so each arriving query computes its m·ksub
    * distance table statelessly; the scan is a stream-static join
    * against the packed code table — per micro-batch, each query reads
    * every code row exactly as a production ADC server scans its
    * in-RAM shard, with the distance a fixed ascending-subspace fold
    * of m table lookups, never a float vector. The final top-k is a
    * bounded k-element heap per query (no state retained: a query is
    * answered entirely within its arrival batch), so worker memory is
    * O(k) per in-flight query regardless of corpus size. At scale the
    * code table is range-sharded across executors and the same join
    * becomes the scatter phase, the heap merge the gather.
    *
    * Distance arithmetic replays the batch [[graft.pipeline.Similarity.topKPq]]
    * IEEE sequence exactly (same dotF/dotFD kernels, same
    * ascending-sub fold from 0.0, ties to the lower neighbor_id), so
    * stream hits are pinned equal to batch hits in StreamingSpec.
    */
  def adcSearchStream(
      queries: Dataset[AdcQuery], codes: DataFrame, books: DataFrame,
      k: Int = 5, m: Int = 8): Dataset[AdcHit] = {
    import queries.sparkSession.implicits._
    import graft.functions.{dotF, dotFD}
    val sub = 64 / m
    val bk = books.collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("cid"), r.getSeq[Double](r.fieldIndex("ce"))))
      .groupBy(_._1)
    // (vec_id, codes[m]) — the packed in-RAM layout an ADC server
    // actually holds (1 byte per subspace in production; ints here).
    val packed = codes.groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
    // Σ_j dtable_j[code_j]: each subspace term is a lookup into the
    // query's literal-codebook distance array, folded in ascending-sub
    // order from 0.0 — the batch aggregate's exact IEEE sequence.
    val adc = (0 until m).foldLeft(lit(0.0)) { (acc, j) =>
      val sv = slice(col("embedding"), j * sub + 1, sub)
      val xx = dotF(sv, sv)
      val d2s = array(bk(j).sortBy(_._2).map { case (_, _, ce) =>
        val ceLit = array(ce.map(lit): _*)
        val cc = lit(ce.foldLeft(0.0)((a, x) => a + x * x))
        xx - lit(2.0) * dotFD(sv, ceLit) + cc
      }.toSeq: _*)
      acc + element_at(d2s, element_at(col("codes"), j + 1).cast("int") + 1)
    }
    queries.toDF()
      .join(packed, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adc.as("adc_dist"))
      .as[AdcScored]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (qid: Long, rows: Iterator[AdcScored], state: GroupState[BestPairState]) => {
          // bounded top-k: max-heap of size k keyed (adc, neighbor_id),
          // worst candidate on top; never holds more than k entries.
          val ord = Ordering.Tuple2[Double, Long]
          val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
          rows.foreach { r =>
            val t = (r.adc_dist, r.neighbor_id)
            if (heap.size < k) heap.enqueue(t)
            else if (ord.lt(t, heap.head)) { heap.dequeue(); heap.enqueue(t) }
          }
          // no state.update: a query is one-shot, nothing to retain
          val best: Seq[(Double, Long)] = heap.dequeueAll.reverse
          best.zipWithIndex.map { case ((d, id), i) =>
            AdcHit(qid, i + 1, id, d)
          }.iterator
        })
  }

  case class VideoSetRecord(video_id: Long, hashes: Seq[String])
  case class VideoCand(video_id: Long, n_mine: Long, base_id: Long, base_sz: Long)
  case class VideoDupHit(
      id_a: Long, id_b: Long, n_shared: Long, n_union: Long,
      jaccard_micro: Long)

  /** STREAMING video dedup — the ingest half of
    * [[graft.pipeline.Multimodal.videoDupPairsIncremental]]: each
    * arriving record carries one whole video's frame-hash set (the
    * ingest unit IS the video, as with media records), the SERVED
    * base index ([[graft.pipeline.Multimodal.videoServedIndex]]:
    * df-capped hash → base video rows with uncapped set sizes)
    * answers via one stream-static equi-join on the hash, and one
    * flatMapGroupsWithState computes exact integer Jaccard per
    * (new, base) pair from the matched-hash counts. Delta-delta pairs
    * and delta-induced hub re-adjudication stay batch jobs — the same
    * division of labor as every incremental tier; for in-order
    * arrivals with no delta-induced hubs the emitted pairs equal the
    * batch incremental's delta-base rows exactly (spec-pinned).
    */
  def videoDedupStream(
      videos: Dataset[VideoSetRecord], baseIndex: DataFrame,
      minJaccardMicro: Long = 500000L): Dataset[VideoDupHit] = {
    import videos.sparkSession.implicits._
    val cand = videos.toDF()
      .select(col("video_id"),
        size(array_distinct(col("hashes"))).cast("long").as("n_mine"),
        explode(array_distinct(col("hashes"))).as("ahash"))
      .join(baseIndex.select(col("ahash"), col("video_id").as("base_id"),
        col("sz").as("base_sz")), Seq("ahash"))
      .select(col("video_id"), col("n_mine"), col("base_id"), col("base_sz"))
      .as[VideoCand]
    cand.groupByKey(_.video_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (vid: Long, rows: Iterator[VideoCand],
            state: GroupState[BestPairState]) => {
          val rs = rows.toArray
          val nMine = rs.head.n_mine
          rs.groupBy(r => (r.base_id, r.base_sz)).iterator.flatMap {
            case ((b, bsz), g) =>
              val shared = g.length.toLong
              val union = nMine + bsz - shared
              // floor(x + 0.5): the batch jaccardTail spelling
              val jm = math.floor(shared * 1000000.0 / union + 0.5).toLong
              if (jm >= minJaccardMicro)
                Some(VideoDupHit(
                  math.min(vid, b), math.max(vid, b), shared, union, jm))
              else None
          }
        })
  }

  case class RetentionEvent(user_id: Long, wk: Long)
  case class CohortState(cohort_wk: Long, seen: Seq[Long])
  case class RetentionRow(user_id: Long, wk: Long, cohort_wk: Long)

  /** Streaming retention enrichment — the ingest half of
    * `events_retention_cohorts`: keyed state holds each user's first
    * active epoch-week (their cohort) plus the weeks already emitted,
    * so every (user, week) surfaces exactly once with its cohort
    * attached; the per-(cohort, offset) counting stays a batch
    * aggregation over this stream's sink. State is O(active weeks per
    * user) — bounded by the observation window, the
    * watermark-eviction candidate on a real deployment. Caveat shared
    * with every incremental tier: an event arriving EARLIER than the
    * stored cohort would need retroactive relabeling — the batch
    * recompute owns corrections; the stream serves the in-order
    * approximation (in-order arrival makes them identical, which is
    * what the spec pins).
    */
  def retentionStream(events: DataFrame): Dataset[RetentionRow] = {
    import events.sparkSession.implicits._
    val us = graft.sources.Bars.eventTimeMicros(events)
    events.select(col("user_id"), us.as("us"))
      .select(col("user_id"), expr("us div 604800000000").as("wk"))
      .as[RetentionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[RetentionEvent],
            state: GroupState[CohortState]) => {
          val weeks = rows.map(_.wk).toArray.distinct.sorted
          val prev = if (state.exists) Some(state.get) else None
          val cohort = prev.fold(weeks.min)(p => math.min(p.cohort_wk, weeks.min))
          val seen = prev.fold(Set.empty[Long])(_.seen.toSet)
          val fresh = weeks.filterNot(seen)
          state.update(CohortState(cohort, (seen ++ fresh).toSeq.sorted))
          fresh.iterator.map(w => RetentionRow(uid, w, cohort))
        })
  }

  case class BinQuery(query_id: Long, embedding: Array[Float])
  case class BinScored(
      query_id: Long, neighbor_id: Long, hamming: Long,
      qe: Array[Float], ne: Array[Float])
  case class BinHit(
      query_id: Long, rank: Int, neighbor_id: Long, hamming: Long, cosine: Double)

  /** STREAMING binary-fingerprint ANN — the serving path of
    * [[graft.pipeline.Similarity.topKBinary]]: arriving query vectors
    * scan the SERVED 8-byte sign-bit index ([[graft.pipeline
    * .Similarity.binaryServedIndex]]) with integer `bit_count(xor)`
    * Hamming in the stream-static join projection, a bounded
    * `nCandidates`-heap per query keyed (hamming, neighbor_id) — the
    * batch shortlist's exact order — and the survivors re-rank with a
    * JVM fold bit-identical to the codegen dot product
    * (`acc += (double)a[i] * (double)b[i]`, DotProductF's sequence),
    * so emitted hits equal the batch top-k exactly (spec-pinned).
    * No retained state across queries; float vectors are touched only
    * for the ≤nCandidates survivors.
    */
  def binarySearchStream(
      queries: Dataset[BinQuery], index: DataFrame,
      k: Int = 5, nCandidates: Int = 20): Dataset[BinHit] = {
    import queries.sparkSession.implicits._
    val q = queries.toDF()
      .withColumn("qbits", graft.pipeline.Similarity.signBits(col("embedding")))
    q.join(index, col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        bit_count(col("qbits").bitwiseXOR(col("nbits"))).cast("long").as("hamming"),
        col("embedding").as("qe"), col("ne"))
      .as[BinScored]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (qid: Long, rows: Iterator[BinScored], _: GroupState[Int]) => {
          def dotF(a: Array[Float], b: Array[Float]): Double = {
            var acc = 0.0; var i = 0
            while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
            acc
          }
          type Cand = ((Long, Long), (Array[Float], Array[Float]))
          val ord = Ordering.Tuple2[Long, Long]
          val heap = scala.collection.mutable.PriorityQueue
            .empty[Cand](Ordering.by((c: Cand) => c._1))
          rows.foreach { r =>
            val key = (r.hamming, r.neighbor_id)
            if (heap.size < nCandidates) heap.enqueue((key, (r.qe, r.ne)))
            else if (ord.lt(key, heap.head._1)) {
              heap.dequeue(); heap.enqueue((key, (r.qe, r.ne)))
            }
          }
          heap.toList.map { case ((h, nid), (qe, ne)) =>
              (nid, h, dotF(qe, ne) / (math.sqrt(dotF(qe, qe)) * math.sqrt(dotF(ne, ne))))
            }
            .sortBy { case (nid, _, cos) => (-cos, nid) }
            .take(k).zipWithIndex
            .map { case ((nid, h, cos), i) => BinHit(qid, i + 1, nid, h, cos) }
            .iterator
        })
  }

  case class RateEvent(event_type: String, us: Long)
  case class RateOut(
      event_type: String, hour: Long, cnt: Long,
      prev_sum: Long, prev_n: Long, rate_pm: Long, anomaly: Boolean)
  case class RateState(open_hour: Long, open_cnt: Long, closed: Seq[(Long, Long)])

  /** STREAMING event-rate spike detector — the ingest half of the
    * batch `events_rate_anomaly` table: per event_type, keyed state
    * holds the OPEN hour's running count plus the last three CLOSED
    * hourly counts; when an arriving event's hour advances past the
    * open hour, the closed hour emits its anomaly row (count vs the
    * trailing-3h mean, the batch query's exact integer per-mille
    * arithmetic). O(1) state per event type; emission at hour
    * granularity is the monitoring contract — the open hour never
    * emits (its count is still growing), so rows equal the batch
    * table restricted to closed hours (spec-pinned, including hours
    * that close across micro-batch boundaries). Late events for an
    * already-closed hour are the batch recompute's job (the
    * retentionStream ownership split).
    */
  def rateAnomalyStream(
      events: Dataset[RateEvent],
      thresholdPm: Long = 1500L): Dataset[RateOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (et: String, rows: Iterator[RateEvent], state: GroupState[RateState]) => {
          val hours = rows.map(_.us / 3600000000L).toArray.sorted
          var st = if (state.exists) state.get else RateState(-1L, 0L, Nil)
          val out = Seq.newBuilder[RateOut]
          def close(): Unit = if (st.open_hour >= 0) {
            val trail = st.closed.takeRight(3)
            val (ps, pn) = (trail.map(_._2).sum, trail.size.toLong)
            val rate = if (pn > 0) st.open_cnt * pn * 1000L / ps else -1L
            out += RateOut(et, st.open_hour, st.open_cnt, ps, pn,
              rate, pn > 0 && rate > thresholdPm)
            st = RateState(-1L, 0L,
              (st.closed :+ (st.open_hour, st.open_cnt)).takeRight(3))
          }
          hours.foreach { h =>
            if (h != st.open_hour) {
              if (st.open_hour >= 0 && h > st.open_hour) close()
              if (st.open_hour < 0 || h > st.open_hour)
                st = RateState(h, 0L, st.closed)
            }
            if (h == st.open_hour) st = st.copy(open_cnt = st.open_cnt + 1)
          }
          state.update(st)
          out.result().iterator
        })
  }

  case class AttrEvent(
      event_id: Long, user_id: Long, event_type: String, value: Double,
      us: Long, channel: Int)
  case class AttrOut(pid: Long, channel: Int, cents: Long)
  case class LastClick(cus: Long, cid: Long, channel: Int)

  /** STREAMING last-touch attribution — the ingest half of the batch
    * `events_attribution` rollup: per user, keyed state holds the most
    * recent click (ts, id, channel); each arriving purchase emits its
    * attribution row immediately (channel −1 when no click is inside
    * the 6h window), so the revenue dashboard updates at event
    * latency while the batch job owns the authoritative per-channel
    * rollup. One `flatMapGroupsWithState` with O(1) state per user;
    * within a micro-batch, rows are replayed in (us, event_id) order —
    * the same total order the batch join's max-struct picks — so a
    * click and purchase landing in one batch attribute exactly as the
    * batch twin (spec-pinned, including the cross-batch case where the
    * click arrived in an earlier batch).
    *
    * State cardinality: one LastClick row (~24 B) per user EVER seen —
    * bounded per key but O(|users|) overall, ~24 GB of state at 1e9
    * users spread across the shuffle partitions. That is priced into
    * the "batch owns the rollup" stance (the stream only needs users
    * with a live 6h window); a deployment that cannot carry it should
    * switch the stream to event-time + `GroupStateTimeout` and evict
    * users inactive past `windowUs` — the attribution answer is
    * unchanged because an expired click can never be inside the
    * window of a later purchase.
    */
  def attributionStream(
      events: Dataset[AttrEvent],
      windowUs: Long = 21600000000L): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[AttrEvent], state: GroupState[LastClick]) => {
          val ordered = rows.toArray.sortBy(e => (e.us, e.event_id))
          var last = if (state.exists) Some(state.get) else None
          val out = Seq.newBuilder[AttrOut]
          ordered.foreach { e =>
            if (e.event_type == "click")
              last = Some(LastClick(e.us, e.event_id, e.channel))
            else if (e.event_type == "purchase") {
              val ch = last match {
                case Some(c) if c.cus < e.us && e.us - c.cus <= windowUs => c.channel
                case _ => -1
              }
              out += AttrOut(e.event_id, ch, math.floor(e.value * 100 + 0.5).toLong)
            }
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }

  case class BitextQuery(src_id: Long, embedding: Array[Float])
  case class BitextCandRow(
      src_id: Long, tgt_id: Long, cos_micro: Long, bsum: Long, bcnt: Long)
  case class BitextHit(
      src_id: Long, fwd_rank: Int, tgt_id: Long, margin_micro: Long)

  /** STREAMING bitext margin scorer — the ingest half of
    * [[graft.pipeline.Similarity.bitextMine]]: new src-language
    * vectors arrive, the SERVED tgt index
    * ([[graft.pipeline.Similarity.bitextServedIndex]]: home cell,
    * embedding, and the base pass's neighborhood sums) answers.
    * Per record: probe cells come from a pure literal-centroid column
    * expression (the [[adcSearchStream]] literal-codebook stance —
    * negated-cosine struct sort replaces the window a stream cannot
    * run, same (ccos desc, cid asc) order as trainedAssignments), one
    * stream-static equi-join on cell produces the candidates, and one
    * flatMapGroupsWithState ranks them by margin using the record's
    * OWN candidate top-k as the fwd neighborhood — for a src whose
    * probes land in base cells, the emitted (fwd_rank, margin) rows
    * equal the batch [[graft.pipeline.Similarity.bitextMargins]] rows
    * exactly (spec-pinned). Mutual-best adjudication needs the tgt
    * direction across ALL srcs, so it stays a batch/compaction job —
    * the same division of labor as every incremental dedup tier.
    */
  def bitextScoreStream(
      queries: Dataset[BitextQuery], servedIndex: DataFrame,
      cents: DataFrame, nCells: Int = 2, k: Int = 4): Dataset[BitextHit] = {
    import queries.sparkSession.implicits._
    import graft.functions.{dotF, dotFD}
    val cs = cents.collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Double](r.fieldIndex("ce"))))
    val qn = sqrt(dotF(col("embedding"), col("embedding")))
    val scoredCells = array(cs.map { case (cid, ce) =>
      val ceLit = array(ce.map(lit): _*)
      val cn = lit(math.sqrt(ce.foldLeft(0.0)((a, x) => a + x * x)))
      struct(
        (-(dotFD(col("embedding"), ceLit) / (qn * cn))).as("negccos"),
        lit(cid).as("cid"))
    }.toSeq: _*)
    val probes = queries.toDF()
      .withColumn("qn", qn)
      .withColumn("cell",
        explode(transform(slice(array_sort(scoredCells), 1, nCells),
          s => s.getField("cid"))))
    val cand = probes.join(servedIndex, Seq("cell"))
      .select(col("src_id"), col("tgt_id"),
        round(dotF(col("embedding"), col("te")) / (col("qn") * col("tn")) * 1e6, 0)
          .cast("bigint").as("cos_micro"),
        col("bsum"), col("bcnt"))
      .as[BitextCandRow]
    cand.groupByKey(_.src_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sid: Long, rows: Iterator[BitextCandRow],
            state: GroupState[BestPairState]) => {
          val rs = rows.toArray
          val top = rs.sortBy(r => (-r.cos_micro, r.tgt_id)).take(k)
          // favg is double division of exact integer sums — the same
          // IEEE sequence as the batch margin expression
          val favg = top.map(_.cos_micro).sum.toDouble / top.length
          rs.map { r =>
            val margin = r.cos_micro.toDouble /
              ((favg + r.bsum.toDouble / r.bcnt) / 2.0)
            (r.tgt_id, margin)
          }.sortBy { case (t, m) => (-m, t) }
            .zipWithIndex.map { case ((t, m), i) =>
              BitextHit(sid, i + 1, t,
                BigDecimal(m * 1e6)
                  .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
            }.iterator
        })
  }

  case class GraphWalkScored(query_id: Long, node: Long, cosine: Double)
  case class GraphHit(query_id: Long, rank: Int, neighbor_id: Long, cosine: Double)

  /** GRAPH-ANN serving as a STREAM: queries arrive, the static
    * NN-descent kNN graph answers — the streaming twin of
    * [[graft.pipeline.Similarity.graphSearch]]. The expansion is
    * fixed-depth BFS from the entry node: `hops` chained
    * stream-static equi-joins of the per-query frontier with the
    * graph's edge list (each hop multiplies paths by 1+degree, so
    * per-query work is (1+k)^hops scored rows — serving-bounded and
    * corpus-independent), then ONE exact rank over the visited
    * neighborhood as a bounded top-k heap in flatMapGroupsWithState
    * (the [[adcSearchStream]] stance; the visited-set dedup rides the
    * same pass). Streams can't rank mid-plan (no windows), so there
    * is no per-hop beam prune — the visited set is the FULL h-hop
    * neighborhood, and the stream answer equals the batch walk with
    * `beam` >= neighborhood size, which is exactly what the spec
    * pins.
    */
  def graphWalkStream(
      queries: Dataset[AdcQuery], graph: DataFrame, corpus: DataFrame,
      k: Int = 4, hops: Int = 4): Dataset[GraphHit] = {
    import queries.sparkSession.implicits._
    import graft.functions.dotF
    val edges = graph.select(col("vec_id").as("enode"), col("neighbor_id"))
    var frontier = queries.toDF()
      .select(col("query_id"), col("embedding"), lit(0L).as("node"))
    for (_ <- 1 to hops) {
      frontier = frontier.unionAll(
        frontier.join(edges, col("node") === col("enode"))
          .select(col("query_id"), col("embedding"),
            col("neighbor_id").as("node")))
    }
    val scored = frontier
      .join(
        corpus.select(col("vec_id").as("nid"), col("embedding").as("ne")),
        col("node") === col("nid"))
      .select(col("query_id"), col("node"),
        (dotF(col("embedding"), col("ne")) /
          (sqrt(dotF(col("embedding"), col("embedding"))) *
            sqrt(dotF(col("ne"), col("ne"))))).as("cosine"))
      .as[GraphWalkScored]
    scored.groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (qid: Long, rows: Iterator[GraphWalkScored], state: GroupState[BestPairState]) => {
          // worst-on-top ordering: lower cosine (then larger node id)
          // dequeues first, so the heap never holds more than k.
          val ord = new Ordering[(Double, Long)] {
            def compare(a: (Double, Long), b: (Double, Long)): Int = {
              val c = java.lang.Double.compare(b._1, a._1)
              if (c != 0) c else java.lang.Long.compare(a._2, b._2)
            }
          }
          val seen = scala.collection.mutable.HashSet.empty[Long]
          val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
          rows.foreach { r =>
            if (r.node != qid && seen.add(r.node)) {
              val t = (r.cosine, r.node)
              if (heap.size < k) heap.enqueue(t)
              else if (ord.lt(t, heap.head)) { heap.dequeue(); heap.enqueue(t) }
            }
          }
          val best: Seq[(Double, Long)] = heap.dequeueAll.reverse
          best.zipWithIndex.map { case ((c, id), i) =>
            GraphHit(qid, i + 1, id, c)
          }.iterator
        })
  }

  case class BudgetDoc(doc_id: Long, source: String, n_tokens: Long, ord: Long)
  case class BudgetOut(doc_id: Long, source: String, n_tokens: Long, cum_tokens: Long)
  case class BudgetState(cum: Long)

  /** Streaming token-budget fill — the live-ingest twin of
    * [[graft.pipeline.Corpus.budgetSample]]: per-source keyed state
    * holds the running admitted-token total, and an arriving document
    * is admitted while the tokens BEFORE it fit the source's budget
    * (the same exclusive-prefix rule as the batch operator, so the
    * boundary-crossing document is admitted). Budgets arrive as a
    * PARAMETER — in production they come from the mix-weight
    * computation over a corpus snapshot, because live ingest cannot
    * know the final mix denominators. Admission is arrival-ordered
    * across micro-batches (the live semantic: early documents win);
    * within a batch, rows order by the caller-supplied ranking key
    * `ord` then doc_id, so a feed presented in the batch operator's
    * hash order reproduces the batch sample exactly (pinned in
    * StreamingSpec). State is one long per source.
    */
  def budgetFillStream(
      docs: Dataset[BudgetDoc], budgets: Map[String, Long]): Dataset[BudgetOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[BudgetDoc], state: GroupState[BudgetState]) => {
          val budget = budgets.getOrElse(src, 0L)
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r.ord, r.doc_id)).flatMap { r =>
            if (cum < budget) {
              cum += r.n_tokens
              Some(BudgetOut(r.doc_id, src, r.n_tokens, cum))
            } else None
          }
          state.update(BudgetState(cum))
          out.iterator
        })
  }

  case class PrepDoc(doc_id: Long, text: String)

  /** Streaming corpus preparation — the live-ingest twin of the batch
    * `corpus_prepare` query: exact-dedup FIRST-arrival filtering
    * (content-md5 keyed state, as [[dedupStream]]), then the stateless
    * quality gate and the reproducible split assignment on the
    * survivors — so the live path and the batch backfill apply the
    * same thresholds and the same md5 split and cannot disagree on a
    * kept document's placement. Near-dup canonicalization is
    * deliberately NOT here: it needs the corpus-wide LSH chain — run
    * [[lshCandidateStream]] for live candidate surfacing and the
    * batch chain over the accumulated corpus for retention decisions.
    *
    * Output: one row per kept first-arrival document —
    * (doc_id, split, n_tokens). Append mode; state is one boolean per
    * distinct content hash (TTL-bound it in production).
    */
  def prepareStream(docs: Dataset[PrepDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    val firsts = docs
      .select(col("doc_id"), col("text"), md5(col("text")).as("cmd5"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, String, String)],
            state: GroupState[SeenState]) => {
          val seen = state.getOption.exists(_.seen)
          state.update(SeenState(true))
          if (seen) Iterator.empty
          else rows.toSeq.sortBy(_._1).headOption
            .map(r => PrepDoc(r._1, r._2)).iterator
        })
    graft.pipeline.Corpus.gopherFilter(firsts.toDF())
      .where(col("keep"))
      .select(
        col("doc_id"),
        graft.pipeline.Corpus.splitCol(col("doc_id")).as("split"),
        col("n_words").as("n_tokens"))
  }

  /** Streaming decontamination — the stream twin of
    * [[graft.pipeline.Dedup.decontaminate]]. The benchmark gram set is
    * tiny and static (collect it once with
    * [[graft.pipeline.Dedup.benchmarkGrams]]), so it ships as a
    * literal array and the check is a stateless map-only
    * `array_intersect` per micro-batch — no state store, no watermark,
    * append mode. Same n_hits semantics as the batch operator
    * (distinct shared grams; array_intersect deduplicates).
    */
  def decontaminateStream(docs: DataFrame, benchGrams: Seq[Long], n: Int = 4): DataFrame = {
    import graft.pipeline.TextOps
    val grams = transform(TextOps.shingles(col("text"), n), g => TextOps.hash32(g))
    docs.select(
      col("doc_id"),
      size(array_intersect(grams, typedlit(benchGrams))).cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Streaming Bloom decontamination — the stream twin of
    * [[graft.pipeline.Dedup.bloomDecontaminate]], and the reason that
    * operator exists in this shape: the fixed-size bitmap is a literal
    * array column (8 KB at 2¹⁶ bits regardless of eval-suite size), so
    * the probe is a completely STATELESS projection — no stream-static
    * join, no keyed state, nothing retained between batches — which is
    * what a contamination gate on a live ingest feed has to be. The
    * batch operator is itself a pure map, so the twin delegates
    * verbatim; bit-identical output is pinned in StreamingSpec.
    */
  def bloomDecontaminateStream(
      docs: DataFrame,
      bitmap: Array[Long],
      n: Int = graft.pipeline.Dedup.BloomN,
      mBits: Int = graft.pipeline.Dedup.BloomMBits,
      kHash: Int = graft.pipeline.Dedup.BloomKHash): DataFrame =
    graft.pipeline.Dedup.bloomDecontaminate(docs, bitmap, n, mBits, kHash)

  /** Streaming BPE token accounting: [[graft.pipeline.Bpe.tokenCount]]
    * is a chain of literal-merge-table replaces — a pure stateless
    * codegen projection, so the stream twin is the batch expression
    * verbatim. The merge table rides in the plan as literals, nothing
    * is retained between batches; this is the online half of the
    * pack/budget tier's subword accounting (a live ingest can report
    * tokenizer-faithful token counts before anything is persisted).
    */
  def bpeTokenCountStream(docs: DataFrame): DataFrame =
    docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.pipeline.Bpe.tokenCount(
        org.apache.spark.sql.functions.col("text")).as("n_tokens_bpe"))

  /** Streaming integer token ids ([[graft.pipeline.Bpe.tokenIds]]):
    * encode + the GPT-2-style id mapping are both stateless codegen
    * projections, so the stream twin is the batch expression verbatim
    * — a live ingest can emit trainer-ready id sequences the moment a
    * document arrives.
    */
  def tokenIdsStream(docs: DataFrame): DataFrame =
    docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.pipeline.Bpe.tokenIds(
        org.apache.spark.sql.functions.col("text")).as("ids"))

  /** Streaming WordPiece segmentation
    * ([[graft.pipeline.Wordpiece.pieces]]): greedy longest-match over
    * the committed vocabulary is a stateless map-only kernel (the
    * vocab is compiled into the expression), so the stream twin is the
    * batch expression verbatim — the BERT-family counterpart of
    * [[tokenIdsStream]] for live ingest.
    */
  def wordpieceStream(docs: DataFrame): DataFrame =
    docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.pipeline.Wordpiece.pieces(
        org.apache.spark.sql.functions.col("text")).as("pieces"))

  /** Streaming SQ8 quantization — the ONLINE INDEX-INGEST path: new
    * vectors are encoded against the FROZEN trained quantizer (mins/
    * spans from the batch [[graft.pipeline.Similarity.sq8Params]]
    * pass, passed as literals) the moment they arrive, so the serving
    * index appends 64-byte codes instead of 256-byte floats with no
    * retrain in the loop. Stateless map-only; shares
    * [[graft.pipeline.Similarity.sq8EncodeCol]] with the batch build,
    * so online and batch codes are bit-identical (the same
    * frozen-artifact hot-swap stance as bm25/dsir/quality scoring).
    */
  def sq8EncodeStream(
      vectors: DataFrame, mins: Seq[Double], spans: Seq[Double]): DataFrame =
    vectors.select(
      org.apache.spark.sql.functions.col("vec_id"),
      graft.pipeline.Similarity.sq8EncodeCol(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.typedLit(mins),
        org.apache.spark.sql.functions.typedLit(spans)).as("code"))

  /** Streaming z-order key assignment — the ingest-side router for
    * the [[graft.sources.Zorder]] layout: arriving events get their
    * Morton key against FROZEN layout bounds (from the batch
    * [[graft.sources.Zorder.bounds2]] aggregate), so a live writer
    * can append into the correct curve bucket without re-clustering.
    * Stateless; same bin/interleave expressions as the batch layout.
    */
  def zkeyStream(
      events: DataFrame,
      mnx: Double, mxx: Double, mny: Double, mxy: Double): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    events.select(
      col("event_id"),
      graft.sources.Zorder.morton16(
        graft.sources.Zorder.bin8(col("user_id").cast("double"), lit(mnx), lit(mxx)),
        graft.sources.Zorder.bin8(col("value"), lit(mny), lit(mxy))).as("zkey"))
  }

  /** Streaming domain blocklist gate: the registered-domain predicate
    * ([[graft.pipeline.Corpus.domainGate]]) is a stateless map over
    * (doc_id, source), so the stream twin delegates verbatim — the
    * ingest-side drop filter that keeps blocklisted domains from ever
    * reaching storage.
    */
  def domainGateStream(docs: DataFrame): DataFrame =
    docs.where(graft.pipeline.Corpus.domainGate())

  /** Streaming badwords gate: the C4-style term-lexicon ratio gate
    * ([[graft.pipeline.TextOps.badwordsStats]]) is a stateless map
    * over each document's own tokens, so the twin delegates verbatim —
    * the ingest-side scrub that keeps lexicon-heavy documents from
    * ever reaching storage.
    */
  def badwordsGateStream(docs: DataFrame): DataFrame =
    graft.pipeline.TextOps.badwordsStats(docs)

  /** Streaming per-source rate sampling: the keep decision is a pure
    * hash of the document id against a literal CASE rate table
    * ([[graft.pipeline.Corpus.rateSample]]) — stateless, so the twin
    * delegates verbatim. The ingest-side downsampler: a doc's
    * keep/drop is identical whether adjudicated in a batch pass or
    * the moment it arrives, and re-processing a doc reaches the same
    * verdict (exactly-once not required for correctness).
    */
  def rateSampleStream(
      docs: DataFrame,
      ratesPm: Map[String, Int],
      defaultPm: Int = 10000): DataFrame =
    graft.pipeline.Corpus.rateSample(docs, ratesPm, defaultPm)

  /** Streaming WITHIN-document dedup: a streaming record carries the
    * whole document, and intra-doc dedup needs no cross-document
    * state — so the twin is a per-row projection. The spelling
    * differs from batch by necessity (streaming cannot run the
    * window/groupBy rebuild), but the SEMANTICS are pinned
    * bit-identical in StreamingSpec: chunk the text into the same
    * 32-token units as [[graft.pipeline.Corpus.chunk]], keep each
    * unit iff its first occurrence index in the unit array is its own
    * (array_position — O(units²) per doc, bounded by one document,
    * the same bound the batch rebuild buffers anyway), re-join.
    */
  def intraDocDedupStream(docs: DataFrame): DataFrame = {
    val units = expr(
      """transform(
        |  sequence(0, greatest((size(split(text, ' ')) - 32 + 31) div 32, 0)),
        |  i -> array_join(slice(split(text, ' '), i * 32 + 1, 32), ' '))""".stripMargin)
    val kept = expr("filter(_u, (u, i) -> array_position(_u, u) == i + 1)")
    docs
      .withColumn("_u", units)
      .withColumn("_k", kept)
      .select(
        col("doc_id"),
        size(col("_u")).cast("long").as("n_paras"),
        (size(col("_u")) - size(col("_k"))).cast("long").as("n_dropped"),
        round((size(col("_u")) - size(col("_k"))).cast("double") / size(col("_u")), 6)
          .as("drop_frac"),
        array_join(col("_k"), " ").as("text_clean"),
        (size(col("_u")) > size(col("_k"))).as("changed"))
  }

  /** Streaming tokenizer-fertility: the per-language running totals
    * behind [[graft.QueriesPipeline]]'s `tokenizer_fertility` as a
    * complete-mode aggregate — state is one row per language (a
    * HANDFUL of keys, the boundedness argument), each micro-batch
    * folds its docs' char/word/BPE-token counts in via map-side
    * partials, and the emitted table converges to the batch one when
    * the stream drains (pinned in StreamingSpec).
    */
  def fertilityStream(docs: DataFrame): DataFrame =
    docs.select(
        col("lang"),
        length(col("text")).cast("bigint").as("nc"),
        size(split(col("text"), " ")).cast("bigint").as("nw"),
        graft.pipeline.Bpe.tokenCount(col("text")).as("nb"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nc").as("n_chars"),
        sum("nw").as("n_words"),
        sum("nb").as("n_bpe_tokens"))
      .select(
        col("lang"), col("n_docs"), col("n_chars"), col("n_words"),
        col("n_bpe_tokens"),
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)
          .as("chars_per_bpe"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6)
          .as("bpe_per_word"))

  /** Streaming URL canonicalization: pure regex/array projections
    * ([[graft.pipeline.Corpus.urlNormalize]]), so the twin delegates
    * verbatim — the ingest-side normalize-before-store step that
    * makes URL-keyed dedup possible downstream.
    */
  def urlNormalizeStream(docs: DataFrame): DataFrame =
    graft.pipeline.Corpus.urlNormalize(docs)

  /** Streaming SEMANTIC decontamination: arriving corpus vectors
    * score against the static broadcast bench table (an eval suite —
    * KB-MB), and the per-bench leak report is a complete-mode
    * aggregate whose state is ONE row per bench item (leak count +
    * the running nearest-corpus max-struct) — bounded by the eval
    * suite, never the stream. The batch operator's plan (broadcast
    * cross join + partial-combining agg) is streaming-legal as-is,
    * so the twin delegates verbatim; the emitted table converges to
    * the batch report when the stream drains (pinned in
    * StreamingSpec).
    */
  def semanticDeconStream(
      vecs: DataFrame, bench: DataFrame, threshold: Double = 0.4): DataFrame =
    graft.pipeline.Similarity.semanticContamination(vecs, bench, threshold)

  /** Streaming PII redaction — like the Bloom probe, the batch scrub
    * is a pure stateless projection (regex count + replace in a fixed
    * stage order), so the stream twin is the batch operator verbatim:
    * scrub-before-persist works on a live ingest feed with nothing
    * retained between batches.
    */
  def redactPiiStream(docs: DataFrame): DataFrame =
    graft.pipeline.Corpus.redactPii(docs)

  /** Streaming HTML→text extraction — the raw-crawl FRONT DOOR as a
    * stream: [[graft.pipeline.Html.extractDocs]] is a pure stateless
    * projection (dotall block removal, per-line tag strip + entity
    * decode + integer line gates, newline join, in a fixed stage
    * order), so the stream twin is the batch operator verbatim (the
    * [[redactPiiStream]] stance). A live crawl feed extracts at
    * ingest latency with nothing retained between micro-batches;
    * every downstream twin (dedup, quality, tokenize) can chain off
    * `extracted_text` in the same query.
    */
  def htmlExtractStream(docs: DataFrame): DataFrame =
    graft.pipeline.Html.extractDocs(docs)

  case class FuzzyRow(
      doc_id: Long, bench_id: Option[Long], n_agree: Option[Long])
  case class FuzzyFlag(
      doc_id: Long, n_bench_candidates: Long, max_est_jaccard: Double,
      contaminated: Boolean)

  /** Streaming FUZZY decontamination — the stream twin of
    * [[graft.pipeline.Dedup.fuzzyContamination]]: each arriving
    * document computes its MinHash signature and LSH bands statelessly
    * (pure column expressions, the batch spelling), probes the STATIC
    * benchmark band table (eval-suite-sized, broadcast by the
    * stream-static join), and is emitted with the count of distinct
    * benchmark near-matches and the best signature-estimated Jaccard.
    * LEFT join keeps clean documents flowing (n=0, not dropped); the
    * per-doc fold is a flatMapGroupsWithState that retains no state —
    * a document is adjudicated entirely within its arrival batch.
    * Same semantics as the batch operator including self-pair
    * exclusion, pinned in StreamingSpec.
    */
  def fuzzyDecontaminateStream(
      docs: DataFrame, benchSigs: DataFrame): Dataset[FuzzyFlag] = {
    import docs.sparkSession.implicits._
    import graft.pipeline.Dedup
    val banded = Dedup.lshBands(Dedup.minhashSignatures(docs))
    val streamSide = banded.select(
      col("doc_id") +: (0 until 8).map(i => col(s"m$i")) :+
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"band$b").as("v"))): _*)).as("bv"): _*)
      .select(col("doc_id") +: (0 until 8).map(i => col(s"m$i")) :+
        col("bv.band").as("band") :+ col("bv.v").as("v"): _*)
    val benchSide = Dedup.lshBands(benchSigs).select(
      col("doc_id").as("bench_id") +:
        (0 until 8).map(i => col(s"m$i").as(s"bm$i")) :+
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"band$b").as("v"))): _*)).as("bv"): _*)
      .select(col("bench_id") +: (0 until 8).map(i => col(s"bm$i")) :+
        col("bv.band").as("bband") :+ col("bv.v").as("bv"): _*)
    val agree = (0 until 8)
      .map(i => when(col(s"m$i") === col(s"bm$i"), 1).otherwise(0))
      .reduce(_ + _)
    streamSide
      .join(benchSide,
        col("band") === col("bband") && col("v") === col("bv") &&
          col("doc_id") =!= col("bench_id"),
        "left")
      .select(
        col("doc_id"), col("bench_id"),
        when(col("bench_id").isNotNull, agree.cast("long")).as("n_agree"))
      .as[FuzzyRow]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, rows: Iterator[FuzzyRow], state: GroupState[BestPairState]) => {
          // distinct bench matches (multi-band hits collapse; n_agree
          // is a pure function of the pair, so any copy works)
          val hits = scala.collection.mutable.Map.empty[Long, Long]
          rows.foreach(r => r.bench_id.foreach(b => hits(b) = r.n_agree.get))
          val maxEst = if (hits.isEmpty) 0.0 else hits.values.max / 8.0
          Iterator(FuzzyFlag(id, hits.size.toLong, maxEst, hits.nonEmpty))
        })
  }

  /** Streaming chunking — the stream twin of
    * [[graft.pipeline.Corpus.chunk]]. Chunk boundaries are
    * deterministic per-document functions of the token count, so the
    * operator is a stateless map-only explode: append mode, no state
    * store, no watermark — the batch body runs unchanged on the
    * stream.
    */
  def chunkStream(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame =
    graft.pipeline.Corpus.chunk(docs, chunkSize, stride)

  /** Streaming quality gate — the stream twin of
    * [[graft.pipeline.Corpus.gopherFilter]]. Every rule is a pure
    * per-document function of the text, so the gate is a stateless
    * map-only projection: append mode, no state store, no watermark —
    * the batch body runs unchanged on the stream. This is the shape a
    * live ingest pipeline wants: drop/route documents at arrival time
    * with the SAME thresholds the batch backfill applied, so the two
    * paths cannot disagree on a keep decision.
    */
  def qualityFilterStream(docs: DataFrame): DataFrame =
    graft.pipeline.Corpus.gopherFilter(docs)

  /** Streaming media decode/resize/featurize — the stream twin of
    * [[graft.pipeline.Multimodal.extractFeatures]]. The batched
    * mapPartitions seam is a stateless per-record transform (decode
    * cost amortized over the partition's batches exactly as in
    * batch), so the SAME body runs on a live media stream: append
    * mode, no state store, no watermark — the shape an ingest
    * pipeline uses to featurize images/frames at arrival time with
    * the batch path's exact decoder and feature contract.
    */
  def mediaFeaturesStream(
      records: Dataset[graft.pipeline.Multimodal.MediaRecord],
      decoder: graft.pipeline.Multimodal.MediaDecoder =
        graft.pipeline.Multimodal.DeterministicFakeDecoder,
      resizeTo: Option[(Int, Int)] = None)
      : Dataset[graft.pipeline.Multimodal.MediaFeatures] =
    graft.pipeline.Multimodal.extractFeatures(
      records, decoder, resizeTo = resizeTo)

  /** Streaming paragraph explode — the stream twin of
    * [[graft.pipeline.Corpus.paragraphs]]. Splitting on a separator
    * regex is a pure per-document function: stateless map-only
    * posexplode, append mode, no state store. (Paragraph-level
    * near-DEDUP against history needs a signature store — feed these
    * units to the batch chain over the accumulated corpus instead.)
    */
  def paragraphsStream(docs: DataFrame, sepRegex: String = "\\n{2,}"): DataFrame =
    graft.pipeline.Corpus.paragraphs(docs, sepRegex)

  /** Streaming train/valid/test assignment — the stream twin of
    * [[graft.pipeline.Corpus.splitAssign]]. Pure md5 bucketing of the
    * doc id: stateless map, append mode, identical assignment to the
    * batch split for the same ids (the property that makes a split
    * reproducible across a backfill and its live stream).
    */
  def splitStream(docs: DataFrame, trainPct: Int = 80, validPct: Int = 10): DataFrame =
    graft.pipeline.Corpus.splitAssign(docs, trainPct, validPct)

  /** Streaming bigram-LM fluency scoring against a STATIC model frame
    * (bg, logp_micro — train one with
    * [[graft.pipeline.Corpus.bigramModel]]) — the stream twin of the
    * doc_bigram_logprob batch query's scoring half. Stream-static
    * join on the bigram key (planned per micro-batch; AQE broadcasts
    * a small model) followed by an UPDATE-mode per-doc aggregate:
    * each document's bigrams arrive atomically in its micro-batch, so
    * its score finalizes in that batch — the aggregate needs no
    * watermark, and state is one row per doc seen (bound it with a
    * TTL in a long-lived deployment). Inner join drops bigrams absent
    * from the model, exactly like the batch self-trained query.
    */
  def bigramScoreStream(docs: DataFrame, model: DataFrame): DataFrame = {
    import graft.pipeline.{Corpus, TextOps}
    Corpus.bigramScore(
      docs.select(col("doc_id"), explode(TextOps.shingles(col("text"), 2)).as("bg")),
      model)
  }

  /** Per-row substring-span removal tail shared by the two streaming
    * span-edit twins below: `dups` is a SORTED-ascending array of
    * duplicated window start positions (0-based, each covering
    * [p, p+n) of the token array `_t`), and one `aggregate` pass
    * concatenates the kept slices between spans — the per-row
    * spelling of the batch run-merge rebuild (overlap handled by
    * capping each slice at the running cursor), so the output
    * contract matches [[graft.pipeline.Corpus.substringDedupFilter]]
    * column-for-column. O(tokens + spans) per document, same bound as
    * the batch tail.
    */
  private def keptAfterSpanRemoval(dups: Column, n: Int): Column =
    aggregate(
      dups,
      struct(lit(0).as("cur"), array().cast("array<string>").as("acc")),
      (st, p) => struct(
        greatest(st.getField("cur"), p + n).as("cur"),
        concat(
          st.getField("acc"),
          slice(col("_t"), st.getField("cur") + 1,
            greatest(p - st.getField("cur"), lit(0)))).as("acc")),
      st => concat(
        st.getField("acc"),
        slice(col("_t"), st.getField("cur") + 1,
          size(col("_t")) - st.getField("cur"))))

  private def substringOutput(kept: Column): Seq[Column] = Seq(
    col("doc_id"),
    size(col("_t")).cast("long").as("n_tokens"),
    (size(col("_t")) - size(kept)).cast("long").as("n_removed"),
    round(
      (size(col("_t")) - size(kept)).cast("double") /
        greatest(size(col("_t")), lit(1)), 6).as("removed_frac"),
    md5(array_join(kept, " ")).as("text_sub_md5"),
    (size(kept) < size(col("_t"))).as("changed"))

  /** The n-token window md5 keys of `_t`, 1-per-start-position —
    * the per-row mirror of the batch substringWindows explode.
    */
  private def windowKeys(n: Int): Column =
    when(size(col("_t")) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(col("_t")) - n),
        p => md5(concat_ws(" ", slice(col("_t"), p + 1, lit(n))))))

  /** Streaming WITHIN-document substring dedup — the stream twin of
    * [[graft.pipeline.Corpus.substringDedupFilterIntraDoc]]. A
    * streaming record carries the whole document and intra-doc
    * repeats need no cross-document state, so the twin is a per-row
    * projection: window keys, first-occurrence test via
    * array_position (O(windows²) per doc worst case, bounded by one
    * document — the intraDocDedupStream precedent), then the linear
    * span-removal tail. Semantics pinned bit-identical to batch in
    * StreamingSpec.
    */
  def intraDocSubstringDedupStream(
      docs: DataFrame,
      n: Int = graft.pipeline.Corpus.SubstringN): DataFrame = {
    require(n >= 2, s"bad substring window n=$n")
    val withDups = docs
      .withColumn("_t", graft.pipeline.TextOps.tokens(col("text")))
      .withColumn("_wk", windowKeys(n))
      .withColumn("_dups",
        when(size(col("_wk")) === 0, array().cast("array<int>"))
          .otherwise(filter(
            sequence(lit(0), size(col("_wk")) - 1),
            p => array_position(col("_wk"), element_at(col("_wk"), p + 1))
              =!= (p + 1).cast("long"))))
    withDups.select(substringOutput(keptAfterSpanRemoval(col("_dups"), n)): _*)
  }

  /** Streaming span-level decontamination — the stream twin of
    * [[graft.pipeline.Corpus.decontaminateSpans]]. The benchmark's
    * window-key set is eval-suite-sized and rides in the plan as a
    * literal (the decontaminateStream stance), so the probe is a
    * completely stateless projection: a corpus window is a removed
    * span iff its key is in the bench set, then the shared linear
    * rebuild. The live-ingest shape of eval-leak surgery: a doc is
    * edited at arrival time with the SAME spans the batch backfill
    * would remove.
    */
  def spanDeconStream(
      docs: DataFrame,
      benchWkeys: Seq[String],
      n: Int = 4): DataFrame = {
    require(n >= 2, s"bad span window n=$n")
    val withDups = docs
      .withColumn("_t", graft.pipeline.TextOps.tokens(col("text")))
      .withColumn("_wk", windowKeys(n))
      .withColumn("_dups",
        when(size(col("_wk")) === 0, array().cast("array<int>"))
          .otherwise(filter(
            sequence(lit(0), size(col("_wk")) - 1),
            p => array_contains(typedlit(benchWkeys),
              element_at(col("_wk"), p + 1)))))
    withDups.select(substringOutput(keptAfterSpanRemoval(col("_dups"), n)): _*)
  }

  /** Streaming language-consistency screen — the stream twin of the
    * lang_consistency batch query. Every chunk of a document lives in
    * the document's own row, so the majority vote is a per-row array
    * computation (chunk, lang-ID per chunk, count per distinct lang,
    * sort by (count desc, lang asc), take the head): stateless map,
    * append mode, no cross-document state. The per-doc windows the
    * batch query runs become array_sort with a comparator here —
    * same tie-break, pinned equal in StreamingSpec.
    */
  def langConsistencyStream(
      docs: DataFrame,
      chunkSize: Int = 32): DataFrame = {
    // integral `div` + greatest-clamp, the exact Corpus.chunk spelling
    // (stride = chunkSize here): float `/` would round instead of
    // truncate and disagree on chunk counts.
    val extra = expr(
      s"greatest((size(_t) - $chunkSize + ${chunkSize - 1}) div $chunkSize, 0)")
      .cast("int")
    val chunks = transform(
      sequence(lit(0), extra),
      c => concat_ws(" ", slice(col("_t"), c * chunkSize + 1, lit(chunkSize))))
    val langs = transform(col("_chunks"),
      ch => graft.pipeline.TextOps.langPred(ch))
    val counts = transform(
      array_distinct(col("_langs")),
      l => struct(
        size(filter(col("_langs"), x => x === l)).as("c"),
        l.as("l")))
    // (count desc, lang asc) — the batch row_number ordering
    val best = element_at(
      array_sort(col("_counts"), (a, b) =>
        when(a.getField("c") > b.getField("c"), -1)
          .when(a.getField("c") < b.getField("c"), 1)
          .when(a.getField("l") < b.getField("l"), -1)
          .when(a.getField("l") > b.getField("l"), 1)
          .otherwise(0)), 1)
    docs
      .withColumn("_t", graft.pipeline.TextOps.tokens(col("text")))
      .withColumn("_chunks", chunks)
      .withColumn("_langs", langs)
      .withColumn("_counts", counts)
      .select(
        col("doc_id"),
        size(col("_chunks")).cast("long").as("n_chunks"),
        size(col("_counts")).cast("long").as("n_langs"),
        best.getField("l").as("majority_lang"),
        round(
          best.getField("c").cast("double") / size(col("_chunks")), 6)
          .as("majority_frac"),
        (size(col("_counts")) > 1).as("mixed"))
  }

  /** Streaming winnowing — the stream twin of
    * [[graft.pipeline.Corpus.winnowFingerprints]]: the whole
    * selection is per-row array arithmetic, so the twin delegates
    * verbatim (stateless, append mode). The ingest side of a
    * winnow-keyed dedup index: fingerprint a document the moment it
    * arrives, feed (doc_id, fingerprint) rows to the keyed store the
    * batch pair generator queries.
    */
  def winnowStream(docs: DataFrame): DataFrame =
    graft.pipeline.Corpus.winnowFingerprints(docs)

  /** Streaming classifier-based quality scoring — the stream twin of
    * [[graft.pipeline.Corpus.qualityModelScore]]. The committed
    * weight vector rides in the plan as literals and the whole score
    * is a per-document projection (exact-integer hashed-bucket fold +
    * five dense multiply-adds), so the twin delegates verbatim:
    * stateless, append mode — the ingest-side quality gate scores a
    * doc the moment it arrives with bit-identical logits to the
    * batch backfill.
    */
  def qualityModelScoreStream(docs: DataFrame): DataFrame =
    graft.pipeline.Corpus.qualityModelScore(docs)

  /** Streaming trained language ID — the stream twin of
    * [[graft.pipeline.Corpus.langIdModelScore]]: the committed
    * per-language NB weight tables ride as literals, each score is an
    * exact integer fold over the hashed-token buckets, and the argmax
    * is a struct sort — a pure stateless projection, so the twin
    * delegates verbatim (the qualityModelScoreStream stance). An
    * ingest feed gets its language label at arrival with
    * bit-identical scores to the batch backfill (StreamingSpec).
    */
  def langIdModelStream(docs: DataFrame): DataFrame =
    graft.pipeline.Corpus.langIdModelScore(docs)

  /** Streaming DSIR scoring against a STATIC trained bucket-ratio
    * table (b, lr_micro — train one with
    * [[graft.pipeline.Corpus.dsirRatios]]): the production shape for
    * importance-weighting an ingest stream with a corpus-trained
    * model. Per-doc bucket counts are computed PER ROW with array
    * expressions (chained streaming aggregations are unsupported, so
    * the batch side's (doc, bucket) groupBy is not available — and at
    * ≤`buckets` distinct values per doc the array scan is cheap);
    * then one broadcast stream-static join on the ≤128-row model and
    * a single UPDATE-mode per-doc aggregate, which finalizes in the
    * arrival micro-batch since a document's features arrive
    * atomically. Integer-micro arithmetic end to end, so scores are
    * bit-identical to the batch [[graft.pipeline.Corpus.dsirScore]]
    * (pinned in StreamingSpec).
    */
  def dsirScoreStream(
      docs: DataFrame, ratios: DataFrame, buckets: Int = 128): DataFrame = {
    import graft.pipeline.{Corpus, TextOps}
    val bs = transform(
      concat(TextOps.tokens(col("text")), TextOps.shingles(col("text"), 2)),
      f => TextOps.hash32(f) % lit(buckets.toLong))
    val features = docs
      .select(col("doc_id"), bs.as("_bs"))
      .select(
        col("doc_id"),
        explode(transform(
          array_distinct(col("_bs")),
          b => struct(
            b.as("b"),
            size(filter(col("_bs"), x => x === b)).cast("long").as("cnt"))))
          .as("p"))
      .select(col("doc_id"), col("p.b").as("b"), col("p.cnt").as("cnt"))
    Corpus.dsirScore(features, ratios)
  }

  /** Streaming BM25 scoring of incoming documents against FROZEN
    * retrieval statistics (per-term df, corpus size n, avgdl — the
    * numbers a batch pass over the corpus produced): the serving
    * side of [[graft.pipeline.Corpus.bm25TopK]]. Everything rides in
    * the plan as literals — per-term idf is precomputed driver-side
    * from the same double spelling the batch expression uses — so the
    * twin is a STATELESS per-row projection (append mode, no state
    * store): tf per query term via one array scan each, contribution
    * rounded to integer micros exactly like batch, rows with no
    * matching term dropped (the inverted-probe prune). Per-doc
    * score_micro is bit-identical to the batch query for the same
    * stats (StreamingSpec).
    */
  def bm25ScoreStream(
      docs: DataFrame,
      df: Map[String, Double],
      n: Double,
      avgdl: Double,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = graft.pipeline.TextOps.tokens(col("text"))
    val dl = size(toks).cast("double")
    val per = df.toSeq.sortBy(_._1).map { case (term, dfT) =>
      val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
      val tf = size(filter(toks, x => x === term)).cast("double")
      struct(
        (tf > 0).cast("long").as("m"),
        when(tf > 0,
          round(lit(idf) * (tf * (k1 + 1.0)) /
            (tf + (lit(1.0 - b) + dl * b / avgdl) * k1) * 1e6, 0)
            .cast("long"))
          .otherwise(lit(0L)).as("c"))
    }
    docs
      .select(col("doc_id"), array(per: _*).as("_p"))
      .select(
        col("doc_id"),
        aggregate(col("_p"), lit(0L), (a, s) => a + s.getField("m"))
          .as("n_terms_matched"),
        aggregate(col("_p"), lit(0L), (a, s) => a + s.getField("c"))
          .as("score_micro"))
      .where(col("n_terms_matched") > 0)
  }

  /** Streaming perceptual hashing — the ingest-side image-dedup key.
    * aHash is a STATELESS batched per-partition projection (decode →
    * 8×8 NN-resize → mean-threshold bits), so the twin delegates
    * verbatim and runs append-mode with no state store; feed the
    * (doc_id, ahash) output to a first-sighting dedup state (the
    * urlDedupStream pattern) or to the batch band join for cross-
    * batch near-dup pairs. Bit-identical to batch by construction
    * (same kernel; StreamingSpec pins it through a MemoryStream).
    */
  def aHashStream(
      media: Dataset[graft.pipeline.Multimodal.MediaRecord],
      decoder: graft.pipeline.Multimodal.MediaDecoder =
        graft.pipeline.Multimodal.DeterministicFakeDecoder): DataFrame =
    graft.pipeline.Multimodal.aHash(media, decoder)

  /** STREAMING IVF-cell drift monitor — the ingest half of the batch
    * `ivf_cell_drift` report: the trained centroids AND the base
    * snapshot's per-cell counts are FROZEN as literals (the index as
    * it existed at the last retrain), and the live delta ingest is
    * watched against them. Three stateless/distributed stages, no
    * keyed state at all:
    *
    *  1. home-cell assignment per arriving vector — literal-centroid
    *     struct sort (the adcSearchStream stance; (ccos desc, cid asc)
    *     order exactly as batch trainedAssignments), map-only;
    *  2. ONE global streaming aggregate of nlist conditional counts
    *     (complete mode) — partial-aggregated map-side, so the shuffle
    *     moves nlist longs per partition, never vectors;
    *  3. a stateless explode back to the batch schema, with base_pm a
    *     literal (the base side is frozen) and delta_pm normalized by
    *     the in-plan sum of the nlist counters.
    *
    * After the stream drains the same delta rows the batch saw, every
    * (cid, n_base, n_delta, base_pm, delta_pm, drift_pm, retrain) row
    * is bit-identical to the batch report (StreamingSpec pins it) —
    * integer per-milles, so no float convergence caveats.
    */
  def ivfCellDriftStream(
      vectors: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      baseCounts: Seq[(Int, Long)],
      retrainPm: Long = 100L): DataFrame = {
    import graft.functions.{dotF, dotFD}
    require(cents.nonEmpty && baseCounts.map(_._2).sum > 0,
      "frozen centroids and a non-empty base snapshot are the monitor's contract")
    val qn = sqrt(dotF(col("embedding"), col("embedding")))
    val scoredCells = array(cents.map { case (cid, ce) =>
      val ceLit = array(ce.map(lit): _*)
      val cn = lit(math.sqrt(ce.foldLeft(0.0)((a, x) => a + x * x)))
      struct(
        (-(dotFD(col("embedding"), ceLit) / (qn * cn))).as("negccos"),
        lit(cid).as("cid"))
    }: _*)
    val cids = cents.map(_._1).sorted
    val assigned = vectors.withColumn(
      "cid", element_at(array_sort(scoredCells), 1).getField("cid"))
    val counts = assigned.agg(
      sum(when(col("cid") === cids.head, 1L).otherwise(0L)).as(s"_d${cids.head}"),
      cids.tail.map(i =>
        sum(when(col("cid") === i, 1L).otherwise(0L)).as(s"_d$i")): _*)
    val baseMap = baseCounts.toMap
    val tb = baseCounts.map(_._2).sum
    val rows = array(cids.map { i =>
      val nb = baseMap.getOrElse(i, 0L)
      struct(
        lit(i).as("cid"), lit(nb).as("n_base"), col(s"_d$i").as("n_delta"),
        lit(nb * 1000L / tb).as("base_pm"))
    }: _*)
    counts
      .withColumn("_td", cids.map(i => col(s"_d$i")).reduce(_ + _))
      .select(explode(rows).as("r"), col("_td"))
      .select(
        col("r.cid").as("cid"), col("r.n_base").as("n_base"),
        col("r.n_delta").as("n_delta"), col("r.base_pm").as("base_pm"),
        expr("r.n_delta * 1000 div _td").as("delta_pm"))
      .withColumn("drift_pm", abs(col("base_pm") - col("delta_pm")))
      .withColumn("retrain", col("drift_pm") > retrainPm)
  }

  /** STREAMING snapshot changelog — the ingest half of the batch
    * `snapshot_diff_report`: each arriving document is classified
    * against the BASE snapshot (added / modified / unchanged) the
    * moment it lands, via one stream-static LEFT join on doc_id —
    * the static side is the base snapshot's (doc_id, content-hash)
    * projection read where it sits, never broadcast or held as
    * state, so the monitor scales with the join, not with memory.
    * `removed` is batch-only HERE: absence cannot be observed on a
    * plain arrival stream; the batch changelog owns it — unless the
    * feed marks deletions, in which case
    * [[changelogTombstoneStream]] observes `removed` at ingest too.
    * Per-doc classes are pinned equal to the batch report's
    * arithmetic in StreamingSpec.
    */
  def changelogStream(docs: DataFrame, base: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), md5(col("text")).as("_hb"))
      .join(base.select(col("doc_id"), col("_ha")), Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("source"),
        when(col("_ha").isNull, "added")
          .when(col("_ha") =!= col("_hb"), "modified")
          .otherwise("unchanged").as("change"))

  /** [[changelogStream]] with the TOMBSTONE convention (round 19, the
    * r18 by-decision gap closed): `removed` becomes observable at
    * ingest when the feed marks deletions as rows — the stream carries
    * a boolean `tombstone` column, and a marked row classifies as
    * `removed` when the base snapshot holds the doc. A tombstone for a
    * doc the base never had emits NOTHING (the batch full-outer diff
    * has no row for a doc in neither snapshot — the no-op delete).
    * Same stream-static LEFT join plan as [[changelogStream]]; the
    * marker is a map-side predicate. With a delta feed of snapshot B's
    * docs plus tombstones for base∖B, the emitted classes converge to
    * the batch `snapshot_diff_report`'s full-outer classification
    * INCLUDING `removed` (StreamingSpec pins the fixture arithmetic).
    */
  def changelogTombstoneStream(docs: DataFrame, base: DataFrame): DataFrame =
    docs
      // a NULL marker (nullable source column, field omitted) means
      // "not a tombstone" — normalized ONCE so the filter and the
      // classifier below cannot disagree (an un-coalesced NULL made
      // the filter DROP a new doc's row while the classifier would
      // have said "added")
      .select(col("doc_id"), col("source"),
        coalesce(col("tombstone"), lit(false)).as("tombstone"),
        md5(col("text")).as("_hb"))
      .join(base.select(col("doc_id"), col("_ha")), Seq("doc_id"), "left")
      .where(!col("tombstone") || col("_ha").isNotNull)
      .select(
        col("doc_id"), col("source"),
        when(col("tombstone"), "removed")
          .when(col("_ha").isNull, "added")
          .when(col("_ha") =!= col("_hb"), "modified")
          .otherwise("unchanged").as("change"))

  /** STREAMING embedding-spectrum monitor — the ingest half of the
    * batch `embedding_spectrum`: the trained rotation rides as plan
    * literals (64 codegen'd dot kernels, the batch [[graft.pipeline
    * .Opq.rotate]] spelling verbatim) and ONE distributed global
    * aggregate folds the d exact-integer micro second moments
    * (map-side combined — the shuffle carries d longs per partition,
    * never vectors). A streaming aggregate cannot be followed by a
    * rank window, so the d-row ranking/cumsum happens with ARRAY
    * expressions on the single aggregate row (struct sort on
    * (−sq, dim) = the batch (sq desc, dim asc) order; cumulative sums
    * via slice+aggregate — O(d²) integer adds on one row) before a
    * stateless posexplode back to the batch schema. Complete mode;
    * bit-identical to the batch spectrum once the stream drains
    * (StreamingSpec) — the live rank-collapse alarm for an embedding
    * ingest feed.
    */
  def embeddingSpectrumStream(
      vectors: DataFrame, rotation: Array[Array[Double]]): DataFrame = {
    import graft.pipeline.{Opq, Similarity}
    val d = Opq.Dim
    val row = Similarity.spectrumRow(vectors, rotation)
    val items = array((0 until d).map(r =>
      struct((-col(s"_s$r")).as("nsq"), lit(r).as("dim"))): _*)
    val sorted = array_sort(items)
    row
      .withColumn("_tot", (0 until d).map(r => col(s"_s$r")).reduce(_ + _))
      .withColumn("_sorted", sorted)
      .select(
        posexplode(col("_sorted")).as(Seq("_p", "t")),
        col("_sorted"), col("_n"), col("_tot"))
      .withColumn("cum_sq",
        aggregate(slice(col("_sorted"), lit(1), col("_p") + 1), lit(0L),
          (a, s) => a - s.getField("nsq")))
      .select(
        col("t.dim").as("dim"),
        (col("_p") + 1).cast("long").as("rank"),
        expr("(-t.nsq) div _n").as("var_micro"),
        expr("(-t.nsq) * 1000 div _tot").as("share_pm"),
        expr("cum_sq * 1000 div _tot").as("cum_share_pm"))
  }

  case class DriftDoc(doc_id: Long, source: String, text: String)

  /** Frozen per-source base stats for [[sourceDriftStream]] — the last
    * full batch pass's side of the report, shipped to the monitor as
    * plain values.
    */
  case class SourceBase(
      source: String, base_docs: Long, base_q_micro: Long, base_dup_pm: Long)
  case class SourceDriftState(n: Long, qsum: Long, seen: Set[String])
  case class SourceDriftOut(
      source: String, base_docs: Long, delta_docs: Long,
      base_q_micro: Long, delta_q_micro: Long,
      base_dup_pm: Long, delta_dup_pm: Long,
      q_drift_micro: Long, dup_drift_pm: Long)

  /** STREAMING ingest-drift monitor — the ingest half of the batch
    * `source_drift_report`: the base half's per-source stats ride in
    * frozen ([[SourceBase]], from the last full pass), delta docs
    * arrive live, and every micro-batch re-emits each touched source's
    * full report row. Unlike ivf_cell_drift, NOTHING here crosses
    * sources — every output column is per-key — so one
    * flatMapGroupsWithState keyed by source computes the exact batch
    * row incrementally.
    *
    * The q_micro / content-hash columns are computed BEFORE the
    * stateful op by the SAME Catalyst expressions as the batch query
    * (TextOps.qualityScore, md5) — a stateless projection — so the
    * keyed state only folds exact integers: (n, Σq_micro, seen-hash
    * set). The seen set is the honest cost of an EXACT dup rate on a
    * stream: O(delta docs per source) 32-char entries; a 100 TB
    * deployment swaps it for a sketch (the decontaminate_bloom trade,
    * measured there) or re-keys by (source, hash). Integer divs match
    * the batch `div` spelling, so rows pin bit-identical once the
    * stream drains (StreamingSpec).
    */
  def sourceDriftStream(
      docs: Dataset[DriftDoc],
      base: Seq[SourceBase]): Dataset[SourceDriftOut] = {
    import docs.sparkSession.implicits._
    val baseMap = base.map(b => b.source -> b).toMap
    val staged = docs.toDF().select(
      col("source"),
      floor(graft.pipeline.TextOps.qualityScore(col("text")) * 1000000 + 0.5)
        .cast("bigint").as("q_micro"),
      md5(col("text")).as("h"))
      .as[(String, Long, String)]
    staged
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[(String, Long, String)],
            state: GroupState[SourceDriftState]) => {
          var st = if (state.exists) state.get
            else SourceDriftState(0L, 0L, Set.empty)
          rows.foreach { case (_, q, h) =>
            st = SourceDriftState(st.n + 1, st.qsum + q, st.seen + h)
          }
          state.update(st)
          val b = baseMap.getOrElse(src, SourceBase(src, 0L, 0L, 0L))
          val dq = st.qsum / st.n
          val ddup = (st.n - st.seen.size) * 1000L / st.n
          Iterator.single(SourceDriftOut(
            src, b.base_docs, st.n, b.base_q_micro, dq,
            b.base_dup_pm, ddup,
            math.abs(dq - b.base_q_micro), math.abs(ddup - b.base_dup_pm)))
        })
  }

  case class FixedNDocIn(doc_id: Long, source: String)
  case class FixedNState(rows: List[(Long, Long, String)])
  case class FixedNOut(shard: Long, pick_key: Long, doc_id: Long, source: String)

  /** STREAMING fixed-N uniform sample — the ingest half of the batch
    * `corpus_sample_fixed_n` draw: A-Res reservoir sampling with
    * DETERMINISTIC priorities. Every arriving doc gets the same salted
    * content-free priority the batch ranks by (hash32("fixn:"+doc_id)),
    * and keyed state keeps the N smallest (priority, doc_id) pairs
    * seen so far. State is sharded by doc_id mod `shards` so the
    * reservoir parallelizes like any keyed state and each shard holds
    * at most N rows — the union of shard reservoirs provably contains
    * the global bottom-N (each shard keeps ITS bottom-N, and the
    * global bottom-N is shard-wise bottom-N), so the serving read
    * takes the N smallest of a bounded shards·N-row union and the
    * batch draw is the FIXED POINT once the stream has seen the
    * corpus (StreamingSpec pins equality). Re-delivered docs fold in
    * idempotently (distinct on the pair). With per-doc weights the
    * same state machine runs on priority^(1/w) — A-Res proper; the
    * uniform draw is the w=1 case. Each micro-batch re-emits a
    * touched shard's full reservoir (update mode) so the serving side
    * always reads a complete draw.
    */
  def fixedNStream(
      docs: Dataset[FixedNDocIn],
      n: Int = 100,
      shards: Int = 8): Dataset[FixedNOut] = {
    import docs.sparkSession.implicits._
    require(n > 0 && shards > 0, s"need n > 0 and shards > 0 (got $n, $shards)")
    docs
      .groupByKey(d => math.floorMod(d.doc_id, shards.toLong))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Long, rows: Iterator[FixedNDocIn],
            state: GroupState[FixedNState]) => {
          val cur = state.getOption.map(_.rows).getOrElse(Nil)
          // dedupe on the (priority, doc_id) SORT KEY, state first: a
          // doc re-delivered with changed metadata must not occupy two
          // reservoir slots (a triple-distinct would let it evict a
          // legitimate bottom-N doc), and first-seen metadata wins
          // deterministically
          val merged = (cur ++ rows.map(d =>
              (graft.pipeline.TextOps.hash32Jvm(s"fixn:${d.doc_id}"),
                d.doc_id, d.source)))
            .distinctBy(t => (t._1, t._2))
            .sortBy(t => (t._1, t._2)).take(n)
          state.update(FixedNState(merged))
          merged.iterator.map { case (pk, id, src) =>
            FixedNOut(shard, pk, id, src)
          }
        })
  }

  case class CardState(
      kmvd: List[Long], kmv: List[Long],
      smp: List[(Long, Long, Long, Long)])
  case class CardShardOut(
      shard: Long, kmv_doc: Seq[Long], kmv: Seq[Long],
      sample: Seq[(Long, Long, Long, Long)])

  /** STREAMING running release card — re-delivery-SAFE (round 19,
    * twice-carried ADVICE): every piece of state is a KEYED bounded
    * structure that folds a re-delivered doc into itself — the KMV
    * k-smallest distinct 60-bit doc-key hashes (doc count estimator),
    * the KMV k-smallest distinct 60-bit CONTENT hashes (distinct-doc
    * estimator), and the bottom-k-by-(priority, doc_id) sample
    * carrying each sampled doc's token/char mass. No plain-add
    * counter survives: the old exact n_docs/n_tokens/n_chars silently
    * over-counted every re-delivered row and so REQUIRED an
    * exactly-once sink; this is the "split the card" resolution — the
    * stream serves sketch-only columns, the batch card stays the
    * authority for exact figures, and at-least-once delivery needs no
    * caveat (StreamingSpec injects duplicates and pins the output
    * unchanged, no hand-compensation).
    *
    * The ingest half of the batch `corpus_datasheet_sketch_pure`:
    * the stateless projection computes nt/nc/h/sh with the batch
    * query's OWN Catalyst expressions (the sourceDriftStream stance),
    * so the folded hashes are bit-identical to the batch scan's.
    * State is bounded at O(3k) rows per shard regardless of stream
    * length. Each micro-batch re-emits a touched shard's partials
    * (update mode); the serving read merges ≤`shards` rows — the k
    * smallest of each hash union (each shard keeps ITS k smallest, so
    * the union contains the global bottom-k; same argument as
    * [[fixedNStream]]), the bottom-k of the sample union — and
    * derives the card: est_n_docs (KMV over doc keys), est_distinct
    * (KMV over content), est token/char mass = est_n_docs × sample
    * mean, sample percentiles. The batch sketch card's estimates are
    * the FIXED POINT once the stream has seen the corpus
    * (StreamingSpec pins the merged figures against the batch row).
    *
    * CHECKPOINT COMPATIBILITY: the round-19 restructure (exact
    * counters removed, `kmvd` added, sample rows widened to 4-tuples)
    * changed both the state encoder ([[CardState]]) and the public
    * output schema ([[CardShardOut]]). A query resuming from a
    * pre-round-19 Structured Streaming checkpoint will fail at state
    * restore (the encoder change is silent until then) — resume
    * requires a FRESH checkpoint directory; the sketches rebuild from
    * the replayed source.
    */
  def datasheetStream(
      docs: DataFrame, k: Int = 256, shards: Int = 8): Dataset[CardShardOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val staged = docs.select(
      col("doc_id"),
      size(graft.pipeline.TextOps.tokens(col("text"))).cast("bigint").as("nt"),
      length(col("text")).cast("bigint").as("nc"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("bigint").as("h"),
      conv(substring(md5(concat(lit("dsd_"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("bigint").as("hd"),
      graft.pipeline.TextOps.hash32(
        concat(lit("dsq_"), col("doc_id").cast("string"))).as("sh"))
      .as[(Long, Long, Long, Long, Long, Long)]
    staged
      .groupByKey(t => math.floorMod(t._1, shards.toLong))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Long, rows: Iterator[(Long, Long, Long, Long, Long, Long)],
            state: GroupState[CardState]) => {
          val st = state.getOption.getOrElse(CardState(Nil, Nil, Nil))
          val batch = rows.toList
          val merged = CardState(
            (st.kmvd ++ batch.map(_._5)).distinct.sorted.take(k),
            (st.kmv ++ batch.map(_._4)).distinct.sorted.take(k),
            (st.smp ++ batch.map(t => (t._6, t._1, t._2, t._3)))
              .distinctBy(x => (x._1, x._2))
              .sortBy(x => (x._1, x._2)).take(k))
          state.update(merged)
          Iterator.single(CardShardOut(
            shard, merged.kmvd, merged.kmv, merged.smp))
        })
  }

  case class TombstoneIn(doc_id: Long)
  case class TierHit(tier: String, key: Long, weight: Long)
  case class BlastState(keys: Set[Long], wsum: Long)
  case class BlastOut(tier: String, n_hit: Long)

  /** STREAMING deletion blast radius — the tombstone-arrival half of
    * the batch `deletion_impact_report`: right-to-be-forgotten
    * requests arrive as a stream of doc_ids and probe the SERVED
    * artifacts (the doc/token table, the JSONL shard map, the IVF
    * cell assignments, the near-dup cluster labels) via stream-static
    * equi-joins — the artifacts are the batch frames the pipeline
    * already maintains, riding as the static sides. One keyed state
    * per tier folds the running blast radius: distinct shards / cells
    * / clusters touched so far, distinct docs and their token mass.
    * Every micro-batch re-emits each touched tier's running n_hit
    * (update mode); the batch report stays the AUTHORITY — the stream
    * converges to its n_hit column once all tombstones have arrived
    * (StreamingSpec pins equality), and n_total/share_pm stay batch
    * figures because totals are properties of the corpus, not of the
    * delete stream. State is O(delete set) for the doc tiers and
    * O(artifact keys touched) for the index tiers; re-delivered
    * tombstones fold in idempotently (set semantics).
    */
  def deletionStream(
      tombstones: Dataset[TombstoneIn],
      docTokens: DataFrame,
      shardMap: DataFrame,
      cellMap: DataFrame,
      clusterMap: DataFrame): Dataset[BlastOut] = {
    import tombstones.sparkSession.implicits._
    val t = tombstones.toDF()
    val docHits = t
      .join(docTokens.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"))
      .flatMap { r =>
        Seq(
          TierHit("1_docs", r.getLong(0), 1L),
          TierHit("2_tokens", r.getLong(0), r.getLong(1)))
      }
    val shardHits = t
      .join(shardMap.select(col("doc_id"), col("shard")), Seq("doc_id"))
      .select(lit("3_shards").as("tier"), col("shard").as("key"),
        lit(1L).as("weight")).as[TierHit]
    val cellHits = t
      .join(cellMap.select(col("vec_id"), col("cid")),
        col("doc_id") === col("vec_id"))
      .select(lit("4_ivf_cells").as("tier"), col("cid").cast("long").as("key"),
        lit(1L).as("weight")).as[TierHit]
    val clusterHits = t
      .join(clusterMap.select(col("doc_id"), col("cluster_id")), Seq("doc_id"))
      .select(lit("5_neardup_clusters").as("tier"),
        col("cluster_id").as("key"), lit(1L).as("weight")).as[TierHit]
    docHits.unionAll(shardHits).unionAll(cellHits).unionAll(clusterHits)
      .groupByKey(_.tier)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (tier: String, rows: Iterator[TierHit], state: GroupState[BlastState]) => {
          var st = state.getOption.getOrElse(BlastState(Set.empty, 0L))
          rows.foreach { h =>
            if (!st.keys.contains(h.key))
              st = BlastState(st.keys + h.key, st.wsum + h.weight)
          }
          state.update(st)
          val n = if (tier == "2_tokens") st.wsum else st.keys.size.toLong
          Iterator.single(BlastOut(tier, n))
        })
  }

  /** Streaming sessionization with Spark's native session_window:
    * per-user sessions that close after `gap` of inactivity; the
    * watermark finalizes (and evicts) sessions. The streaming twin of
    * graft.pipeline.Sessionize.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes", lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", eventTime(events))
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
