package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.indicators.Indicators
import graft.sources.{Bars, Sessions}

/** Scaling-linearity smoke: run the load-bearing paths at 1x and Nx the
  * sf0.1 event volume and report the time ratio. The Nx frame is the
  * provided events table unioned N times with disjoint event_id and
  * symbol spaces — a pure volume amplifier (more symbols x same
  * per-symbol density, matching how production data grows), not new
  * synthetic fixtures. A path whose ratio tracks N is shuffle/window
  * linear; superlinear ratios expose accidental cross-partition or
  * quadratic work.
  *
  * Usage: runMain graft.tools.ScaleSmoke [sfDir] [N]
  */
object ScaleSmoke {

  // Fixture amplifiers live in [[Amplify]] (shared with ChainScale);
  // the stance notes (plain vs decorrelated, which measures what) are
  // on the Amplify methods.
  private def amplify(events: DataFrame, n: Int): DataFrame = Amplify.events(events, n)
  private def amplifyDocs(docs: DataFrame, n: Int): DataFrame = Amplify.docs(docs, n)
  private def amplifyDocsDistinct(docs: DataFrame, n: Int): DataFrame = Amplify.docsDistinct(docs, n)
  private def amplifyEmb(e: DataFrame, n: Int): DataFrame = Amplify.emb(e, n)
  private def amplifyEmbDecor(e: DataFrame, n: Int): DataFrame = Amplify.embDecor(e, n)

  private def time(what: String, f: => Long): Double = {
    val t0 = System.nanoTime()
    val rows = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"$what%-28s $dt%7.2f s   ($rows rows)")
    dt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev1 = Bars.readEvents(spark, sfDir)
    // warm up (codegen, footer reads)
    ev1.count()

    def chain(ev: DataFrame): Long =
      Indicators(Bars.fromEventsDF(ev))
        .sma(Seq("close"), 20).ema(Seq("close"), 9).rsi(Seq("close"), 14)
        .dataframe.count()

    def asof(ev: DataFrame): Long = {
      val left = ev.select(
        col("event_id"), col("event_type").as("symbol"),
        Bars.eventTimeMicros(ev).as("ts_us"), col("value"))
      val barCloses = Bars.fromEventsDF(ev).select(
        col("symbol"), unix_micros(col("timestamp")).as("bar_us"),
        col("close").as("bar_close"))
      graft.operators.TimeJoins.asof(left, barCloses, "symbol", "ts_us", "bar_us",
        Seq("bar_close")).count()
    }

    def sess(ev: DataFrame): Long =
      graft.pipeline.Sessionize.sessions(ev).count()

    // Fixed 1x benchmark against the amplified corpus — the production
    // shape (eval suites don't grow with the corpus); measures the
    // map+broadcast-semi corpus side alone.
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench1 = docs1.where(col("doc_id") % 50 === 0)
    def decon(d: DataFrame): Long =
      graft.pipeline.Dedup.decontaminate(d, bench1)
        .where(col("contaminated")).count()

    // Bloom probe: bitmap built ONCE from the fixed bench (the build
    // is eval-suite work, not corpus work), probe is the map-only
    // literal-bitmap pass — the ratio must track the corpus volume.
    lazy val bloomBm = graft.pipeline.Dedup.bloomBitmap(bench1)
    def bloomDecon(d: DataFrame): Long =
      graft.pipeline.Dedup.bloomDecontaminate(d, bloomBm)
        .where(col("contaminated")).count()

    // OPQ training: the distributed second-moment pass dominates (the
    // eigensolve is driver-side microseconds); rotate+count adds the
    // map-only apply. Linear by construction — this row is the
    // witness.
    def opqTrain(e: DataFrame): Long = {
      val rot = graft.pipeline.Opq.trainRotation(e)
      graft.pipeline.Opq.rotate(e, rot).count()
    }

    // The banded dedup chain end-to-end: signatures -> LSH candidates
    // -> jaccard verify. Built on raw Dedup (not the DedupChain memo)
    // so both scales do full work; clearCache between timings releases
    // the chain's internal persists.
    def lshChain(d: DataFrame): Long = {
      val m = graft.pipeline.Dedup
        .jaccardPairs(graft.pipeline.Dedup.lshCandidatePairs(d), d)
        .where(col("jaccard") >= 0.5).count()
      spark.catalog.clearCache()
      m
    }

    // Two-pass distributed prefix plan (pack offsets): pass 1 collects
    // numParts rows, pass 2 windows per partition — should track volume.
    def pack(d: DataFrame): Long =
      graft.pipeline.Corpus.packOffsets(d, ctx = 512L).count()

    // Map-side-counting TF-IDF (round 6): the corpus pass is map-only,
    // then one vocabulary shuffle + per-doc top-1 window.
    def tfidf(d: DataFrame): Long = {
      val m = graft.pipeline.Corpus.topTfidfTokens(d).count()
      spark.catalog.clearCache() // release the pair-frame persist
      m
    }

    // Inverted packing index: inherits packOffsets' distributed prefix
    // plan, then a map-only window explode + one groupBy shuffle.
    def packWin(d: DataFrame): Long =
      graft.pipeline.Corpus.packWindows(d, ctx = 512L)
        .groupBy("window_id").count().count()

    // Window MATERIALIZATION: the one window_id shuffle carries the
    // sliced pieces — total volume = corpus tokens, so the ratio must
    // track volume.
    def packMat(d: DataFrame): Long =
      graft.pipeline.Corpus.packMaterialize(d, ctx = 512L).count()

    // Full retention chain: LSH chain -> CC labels -> keep-longest
    // representatives (one max_by agg over labels joined to docs).
    def reps(d: DataFrame): Long = {
      val edges = graft.pipeline.Dedup
        .jaccardPairs(graft.pipeline.Dedup.lshCandidatePairs(d), d)
        .where(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      val m = graft.pipeline.Dedup
        .representatives(graft.pipeline.Dedup.clusters(edges), d).count()
      spark.catalog.clearCache()
      m
    }

    // Paragraph-unit near-dedup (32-token blocks through the banded
    // chain) — ~2.3x the unit count of the doc-level chain per doc.
    def paraDedup(d: DataFrame): Long = {
      val units = graft.pipeline.Corpus.chunk(d, chunkSize = 32, stride = 32)
        .select(
          (col("doc_id") * 1000 + col("chunk_id")).as("doc_id"),
          col("chunk_text").as("text"))
      val m = graft.pipeline.Dedup.paragraphPairs(units).count()
      spark.catalog.clearCache()
      m
    }

    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // Fixed query set (vec_id < 5 exists only in copy 0) against an
    // Nx corpus — the production ANN shape: corpus grows, probes don't.
    def ann(e: DataFrame): Long =
      graft.pipeline.Similarity.topKBucketed(e).count()

    // Full IVF training (2 Lloyd iterations, NOT the session memo — the
    // raw work) + the corpus-scale cell assignment it serves.
    def ivf(e: DataFrame): Long = {
      val cents = graft.pipeline.Similarity.kmeansCentroids(e)
      graft.pipeline.Similarity.cellSizes(e, cents).count()
    }
    def qual(d: DataFrame): Long =
      graft.pipeline.Corpus.gopherFilter(d).count()

    // CMS build + top-k estimate: the sketch exchange is d*w rows no
    // matter the corpus; the corpus-side work is the token explode.
    def cms(d: DataFrame): Long = {
      val m = graft.pipeline.Corpus.cmsCounts(d).count()
      spark.catalog.clearCache() // release the token-count persist
      m
    }

    // Budget fill: weights agg + one per-source prefix window.
    def budget(d: DataFrame, tot: Long): Long =
      graft.pipeline.Corpus.budgetSample(d, tot).count()

    // Fuzzy decontamination: fixed bench signature table (eval suites
    // don't grow), Nx corpus side — map-only sigs+bands + broadcast
    // band probe + one doc_id agg. PLAIN copies (shared shingles) are
    // correct here: the probe is corpus×bench with the bench fixed, so
    // collisions grow ~N (every copy of a contaminated doc still
    // collides) — linear by construction, unlike the pairwise chains.
    val benchSigs1 = graft.pipeline.Dedup.minhashSignatures(bench1)
    def fuzzyDecon(d: DataFrame): Long = {
      val sigs = graft.pipeline.Dedup.minhashSignatures(d)
      graft.pipeline.Dedup.fuzzyContamination(d, sigs, benchSigs1)
        .where(col("contaminated")).count()
    }

    // Exact paragraph dedup filter: plain-amplified copies share every
    // non-tail chunk, so dup groups grow N deep — the window's
    // per-group O(copies) work is exactly the linearity under test.
    def paraFilter(d: DataFrame): Long = {
      val units = graft.pipeline.Corpus.chunk(d, chunkSize = 32, stride = 32)
        .select(
          col("doc_id"), col("chunk_id").as("para_idx"),
          col("chunk_text").as("para_text"))
      graft.pipeline.Corpus.paragraphDedupFilter(units).count()
    }

    // Exact substring dedup: plain copies duplicate every window of
    // copy 0, so duplicated occurrences (and the removal-span explode)
    // grow ~N deep on hot window keys — the groupBy-min
    // first-occurrence partial-aggregates those map-side, the same
    // skew contract as parafilter; the ratio must track volume, not
    // duplication depth.
    def subFilter(d: DataFrame): Long =
      graft.pipeline.Corpus.substringDedupFilter(d).count()

    // Global rank on the two-pass range-partition plan: repartition +
    // per-partition window; the offsets job is numParts rows at any N.
    def grank(d: DataFrame): Long = {
      val m = graft.plans.Scale.rowNumberDistributed(
        d.select(
          col("doc_id"),
          graft.pipeline.TextOps.qualityScore(col("text")).as("q")),
        Seq(col("q").desc, col("doc_id").asc), "rank").count()
      spark.catalog.clearCache() // release the range-partition persist
      m
    }

    // PQ: per-subspace training (8 independent small k-means) + the
    // corpus-scale encode against the broadcast codebook.
    def pq(e: DataFrame): Long = {
      val books = graft.pipeline.Similarity.pqCodebooks(e)
      val m = graft.pipeline.Similarity.pqEncode(e, books).count()
      spark.catalog.clearCache()
      m
    }

    // SemDeDup at scale contract: cell COUNT grows with the corpus so
    // per-cell population (and so each quadratic tile) stays bounded —
    // k is scaled with N here, which is what a production run does
    // (cells ~ corpus / target_cell_size). Decorrelated copies, see
    // amplifyEmbDecor.
    // NN-descent kNN graph at scale contract: every round is bounded
    // by n·(2·searchK)² candidate edges — linear in n at fixed
    // working-list width — so Nx decorrelated vectors must cost ~Nx.
    // (Recall at larger n wants a wider searchK — a ~log n growth,
    // see Similarity.knnGraph scaladoc — which scales the constant,
    // not the shape.)
    def knng(e: DataFrame): Long = {
      val m = graft.pipeline.Similarity.knnGraph(e).count()
      spark.catalog.clearCache()
      m
    }

    // serving walk timed on a PREBUILT graph (the production split:
    // the descent is the indexing bill, the walk is the query bill)
    def gwalkGraph(e: DataFrame): DataFrame =
      graft.pipeline.Similarity
        .graphPrefix(graft.pipeline.Similarity.knnWorkingList(e), 16)
        .localCheckpoint(true)
    def gwalk(e: DataFrame, g: DataFrame): Long = {
      val m = graft.pipeline.Similarity.graphSearch(e, g).count()
      spark.catalog.clearCache()
      m
    }

    def mediaRep(d: DataFrame): Long = {
      val labels = graft.pipeline.Dedup.clusters(
        graft.pipeline.Multimodal.aHashPairs(
          graft.pipeline.Multimodal.aHash(
            graft.pipeline.Multimodal.syntheticImages(spark, d),
            graft.pipeline.Multimodal.ImageIODecoder), maxHamming = 3)
          .select(col("doc_a"), col("doc_b")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(col("px").desc, col("doc_id").asc)
      val m = labels
        .withColumn("px", graft.pipeline.Multimodal.imagePixels(col("doc_id")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).count()
      spark.catalog.clearCache()
      m
    }

    def semdedup(e: DataFrame, k: Int): Long = {
      val cents = graft.pipeline.Similarity.kmeansCentroids(e, k = k)
      val m = graft.pipeline.Similarity
        .semanticDupPairs(e, cents, 0.4, nCells = 1).count()
      spark.catalog.clearCache() // release the assignment persist
      m
    }

    // Bitext mining rides the semdedup frontier (bipartite cell tiles),
    // so the same cells-track-corpus rule applies: centroid count
    // scales with volume to hold per-cell populations bounded.
    def bitext(e: DataFrame, k: Int): Long = {
      val cents = graft.pipeline.Similarity.kmeansCentroids(e, k = k)
      val m = graft.pipeline.Similarity.bitextMine(e, cents, nCells = 1).count()
      spark.catalog.clearCache() // release the assignment + candidate persists
      m
    }

    def badwords(d: DataFrame): Long =
      graft.pipeline.TextOps.badwordsStats(d).where(col("keep")).count()

    // Video frame-set dedup measured on the HASH table (the operator's
    // real input seam), amplified with per-copy-suffixed hashes so
    // copies share no frames — the amplifyDocsDistinct stance: the
    // synthetic frame family's period-256 series aliasing would
    // otherwise make cross-copy alias pairs grow quadratically and
    // measure the FIXTURE, not the join.
    lazy val vhash1 = graft.pipeline.Multimodal.aHash(
      graft.pipeline.Multimodal.syntheticVideoFrames(spark, docs1),
      graft.pipeline.Multimodal.PcmDecoder).localCheckpoint(true)
    def amplifyVideoHashes(h: DataFrame, copies: Int): DataFrame = {
      val maxPacked = h.agg(max(col("doc_id"))).head().getLong(0) + 16
      (0 until copies).map { i =>
        h.select(
          (col("doc_id") + i * maxPacked).as("doc_id"),
          concat(col("ahash"), lit(s"_$i")).as("ahash"),
          col("abits"))
      }.reduce(_ union _)
    }
    def videoDedup(h: DataFrame): Long = {
      val m = graft.pipeline.Multimodal.videoDupPairs(h).count()
      spark.catalog.clearCache() // release the set-frame persist
      m
    }

    // Incremental video dedup: a FIXED 1/10 delta against a growing
    // base — the ingest shape (the delta does not grow with the
    // corpus); base sets come from the amplified hash table.
    def videoDedupInc(h: DataFrame): Long = {
      val isNew = expr("(doc_id DIV 16) % 10 = 0")
      val baseSets = h.where(!isNew)
        .select(expr("doc_id DIV 16").as("video_id"), col("ahash")).distinct()
      val m = graft.pipeline.Multimodal
        .videoDupPairsIncremental(baseSets, h.where(isNew)).count()
      spark.catalog.clearCache()
      m
    }

    // Alignment gate: real decode + histogram features joined to the
    // embedding prefix — decode is the linear bill (the mediaRep
    // reading), the join is id-keyed.
    def alignGate(d: DataFrame, e: DataFrame): Long = {
      import graft.functions.dotF
      val feats = graft.pipeline.Multimodal.extractFeatures(
          graft.pipeline.Multimodal.syntheticImages(spark, d),
          graft.pipeline.Multimodal.ImageIODecoder).toDF()
        .select(col("id").as("doc_id"), col("features"))
      val txt = e.select(col("vec_id").as("doc_id"),
        slice(col("embedding"), 1, 16).as("e16"))
      val dn = sqrt(dotF(col("features"), col("features"))) *
        sqrt(dotF(col("e16"), col("e16")))
      feats.join(txt, Seq("doc_id"))
        .where(when(dn > 0, dotF(col("features"), col("e16")) / dn)
          .otherwise(lit(0.0)) >= 0)
        .count()
    }

    def retention(ev: DataFrame): Long = {
      val uw = ev.select(col("user_id"),
          graft.sources.Bars.eventTimeMicros(ev).as("us"))
        .select(col("user_id"), expr("us div 604800000000").as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("off"))
        .agg(countDistinct(col("user_id")).as("n"))
        .count()
    }

    // Single-key skew witness for the exact paragraph filter: the same
    // total row count either all-distinct or with ONE unit text 1e6
    // copies deep (the 100 TB boilerplate shape — "All rights
    // reserved." everywhere). The groupBy+min(struct) first-occurrence
    // partial-aggregates the hot key map-side, so the skewed run must
    // cost about the same as the distinct run; the row_number-window
    // shape this replaced would feed every copy of the hot key to ONE
    // reducer task and the ratio would track the duplication depth.
    def paraFilterSynth(nRows: Long, hotKey: Boolean): Long = {
      val base = spark.range(nRows)
      val text =
        if (hotKey)
          when(col("id") % 2 === 0,
              lit("all rights reserved by the original publisher of this site"))
            .otherwise(concat(lit("distinct filler unit number "), col("id")))
        else concat(lit("distinct filler unit number "), col("id"))
      val units = base.select(
        col("id").as("doc_id"), lit(0L).as("para_idx"), text.as("para_text"))
      graft.pipeline.Corpus.paragraphDedupFilter(units).count()
    }

    // Zipf-head skew witness for domain_stats: the same row count with
    // every doc on ONE registered domain (the real-web head shape —
    // a single platform domain holding 1e6+ docs) vs spread over ~1e5
    // domains. groupBy(domain).agg(countDistinct(host), counts, sums)
    // partial-aggregates map-side — Spark plans count(DISTINCT) as a
    // first (domain, host) aggregate, and the synthetic url keeps
    // hosts-per-domain bounded (www/cdn/apex) — so the hot-domain run
    // must cost about the same as the uniform one.
    def domainStatsSynth(nRows: Long, hotDomain: Boolean): Long = {
      val src =
        if (hotDomain) lit("hothead")
        else concat(lit("s"), (col("id") % 100000).cast("string"))
      val d = spark.range(nRows).select(
        col("id").as("doc_id"),
        lit("some short document body text").as("text"),
        src.as("source"))
      graft.pipeline.Corpus.domainStats(d).count()
    }

    // Per-doc linearity witness for the substring-dedup REBUILD: two
    // documents, the second an exact copy of the first, so every
    // window of doc 1 is a duplicate and the removal set covers the
    // whole document (R ≈ L — the worst case). The run-subtraction
    // rebuild is O(L + runs) per doc, so 4x the tokens must cost ~4x;
    // the array_contains spelling this replaced (round 11) was
    // O(L·R) = O(L²) and would go ~16x.
    def subFilterSynthLongDup(nTok: Int): Long = {
      val words = transform(sequence(lit(0), lit(nTok - 1)), i => concat(lit("w"), i))
      val d = spark.range(2).select(
        col("id").as("doc_id"), array_join(words, " ").as("text"))
      graft.pipeline.Corpus.substringDedupFilter(d).count()
    }

    // Single-key skew witness for the exact-dup canonical used by the
    // corpus_filter/prepare family: the same total row count either
    // all-distinct or with ONE content hash 1e6 copies deep.
    // Corpus.withExactCanonical partial-aggregates the hot hash
    // map-side and the join-back probe rows are independent lookups,
    // so the skewed run must cost about the same as the distinct one;
    // the Window.partitionBy(cmd5) shape this replaced (round 11)
    // would buffer every copy in one reducer task.
    def exactCanonSynth(nRows: Long, hotKey: Boolean): Long = {
      val base = spark.range(nRows)
      val text =
        if (hotKey)
          when(col("id") % 2 === 0, lit("the same boilerplate document body"))
            .otherwise(concat(lit("distinct document body "), col("id")))
        else concat(lit("distinct document body "), col("id"))
      val d = base.select(col("id").as("doc_id"), md5(text).as("cmd5"))
      graft.pipeline.Corpus.withExactCanonical(d)
        .where(col("is_exact_canonical")).count()
    }

    // Within-doc dedup: per-doc window partitions are bounded by one
    // document's unit count, so Nx documents -> Nx independent
    // partitions; the ratio must track volume.
    def intraFilter(d: DataFrame): Long = {
      val units = graft.pipeline.Corpus.chunk(d, chunkSize = 32, stride = 32)
        .select(
          col("doc_id"), col("chunk_id").as("para_idx"),
          col("chunk_text").as("para_text"))
      graft.pipeline.Corpus.intraDocDedupFilter(units).count()
    }

    // One-doc worst case for intra-doc dedup: the SAME unit count in
    // one document, all-distinct vs one unit 250k copies deep. Both
    // runs buffer the one document (the rebuild's inherent bound);
    // the hot run must not cost more — the (doc, hash) window group
    // is within the same single-doc task either way.
    def intraDocSynth(nUnits: Long, hot: Boolean): Long = {
      val text =
        if (hot) lit("the one repeated unit body")
        else concat(lit("distinct unit body number "), col("id"))
      val units = spark.range(nUnits).select(
        lit(0L).as("doc_id"), col("id").as("para_idx"), text.as("para_text"))
      graft.pipeline.Corpus.intraDocDedupFilter(units).count()
    }

    // Semantic decontamination: fixed bench vectors (eval suites don't
    // grow) against an Nx corpus — broadcast bench, map-only cosine
    // pass + per-bench partial agg; the ratio must track corpus volume.
    val embBench1 = emb1.where(col("vec_id") % 50 === 0)
    def semDecon(e: DataFrame): Long =
      graft.pipeline.Similarity.semanticContamination(e, embBench1)
        .agg(sum(col("n_leaks"))).head().getLong(0)

    // Span decon: fixed bench window-key set broadcast, Nx corpus
    // windows probe it — linear by the same argument as decontaminate.
    def spanDecon(d: DataFrame): Long =
      graft.pipeline.Corpus.decontaminateSpans(d, bench1)
        .where(col("changed")).count()

    // Within-doc substring dedup: doc-leading window partitions are
    // independent per doc; Nx docs -> Nx partitions.
    def subIntra(d: DataFrame): Long =
      graft.pipeline.Corpus.substringDedupFilterIntraDoc(d).count()

    // Epoch shuffle: packWindows' prefix plan + the distributed rank
    // over window rows (corpus tokens / 512 of them).
    def packShuf(d: DataFrame): Long = {
      val m = graft.pipeline.Corpus.packShuffle(d, ctx = 512L).count()
      spark.catalog.clearCache() // release the range-partition persist
      m
    }

    // Per-lang fertility: the 256-replace BPE encode is the bill —
    // map-only, then a |langs|-key agg; must track volume.
    def fert(d: DataFrame): Long =
      d.select(
          col("lang"),
          length(col("text")).cast("bigint").as("nc"),
          size(split(col("text"), " ")).cast("bigint").as("nw"),
          graft.pipeline.Bpe.tokenCount(col("text")).as("nb"))
        .groupBy("lang")
        .agg(count(lit(1)), sum("nc"), sum("nw"), sum("nb"))
        .count()

    // Shard plan: the distributed prefix sum is the bill; Nx docs ->
    // Nx prefix rows, the per-partition offset map stays O(partitions).
    def shard(d: DataFrame): Long =
      graft.pipeline.Corpus.shardAssign(d).agg(max("shard")).head().getLong(0)

    // Classifier quality score: one md5 + literal lookup per token,
    // five dense mul-adds per doc — pure map, must track volume.
    def qms(d: DataFrame): Long =
      graft.pipeline.Corpus.qualityModelScore(d).where(col("keep")).count()

    // Source-overlap matrix: per-key join fan-out is bounded by
    // |sources|², so Nx windows -> Nx join rows. amplifyDocsDistinct
    // (per-copy token suffixes) keeps copies from sharing windows —
    // cross-copy collisions would measure the fixture's duplication,
    // not the operator.
    def srcOverlap(d: DataFrame): Long =
      graft.pipeline.Corpus.sourceWindowOverlap(d)
        .agg(coalesce(sum("n_shared_windows"), lit(0L))).head().getLong(0)

    // Vocab coverage: count shuffle + distributed rank over the vocab
    // + 3-row broadcast sweep; must track token volume.
    def vocabCov(d: DataFrame): Long = {
      val counts = d
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_occ"))
      val (ranked, _) = graft.plans.Scale.rowNumberDistributedWithTotal(
        counts, Seq(col("n_occ").desc, col("token").asc), "rank")
      val m = ranked.where(col("rank") <= 1000)
        .agg(coalesce(sum("n_occ"), lit(0L))).head().getLong(0)
      spark.catalog.clearCache()
      m
    }

    // Winnowing: per-row array arithmetic, O(grams·w) per doc — pure
    // map, must track volume.
    def winnow(d: DataFrame): Long =
      graft.pipeline.Corpus.winnowFingerprints(d)
        .agg(sum("n_fingerprints")).head().getLong(0)

    // Hot-window worst case for the source-overlap matrix: the SAME
    // 8-token phrase in EVERY document (every source shares the one
    // window) vs all-distinct windows. The (source, wkey) distinct
    // collapses the hot key map-side and the self-join fan-out is
    // bounded by |sources|², so hot must cost ~ distinct.
    def srcOverlapSynth(nRows: Long, hot: Boolean): Long = {
      val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
      val text =
        if (hot) concat(lit(phrase + " tail "), col("id"))
        else concat(
          lit("t"), col("id"), lit("a t"), col("id"), lit("b t"),
          col("id"), lit("c t"), col("id"), lit("d t"), col("id"),
          lit("e t"), col("id"), lit("f t"), col("id"), lit("g t"),
          col("id"), lit("h"))
      val d = spark.range(nRows).select(
        col("id").as("doc_id"), text.as("text"),
        concat(lit("src"), pmod(col("id"), lit(5))).as("source"))
      graft.pipeline.Corpus.sourceWindowOverlap(d).count()
    }

    // Winnow pair generation: fingerprint rows + df-capped self-join;
    // decorrelated amplifier so cross-copy fingerprint collisions
    // don't masquerade as operator cost.
    def winPairs(d: DataFrame): Long =
      graft.pipeline.Corpus.winnowCandidatePairs(d).count()

    // Curriculum order: classifier score (map) + distributed rank +
    // distributed prefix sum — two prefix plans over doc rows.
    def curriculum(d: DataFrame): Long = {
      val scored = graft.pipeline.Corpus.qualityModelScore(d)
        .select(col("doc_id"), col("n_tokens"), col("logit"))
      val ranked = graft.plans.Scale.rowNumberDistributed(
        scored, Seq(col("logit").desc, col("doc_id").asc), "curriculum_pos")
      val m = graft.plans.Scale
        .cumSumDistributedLong(ranked, "n_tokens", "curriculum_pos", "cum_tokens")
        .agg(max("cum_tokens")).head().getLong(0)
      spark.catalog.clearCache()
      m
    }

    // Hot-fingerprint worst case for winnow pairs: every doc contains
    // the SAME 8-token phrase (its fingerprint lands in all 1e6 docs)
    // plus unique filler. The df>16 stop-list drops the hot
    // fingerprint BEFORE the self-join, so the hot fixture must cost
    // ~ the all-distinct one — without the cap it would emit ~5e11
    // pairs and never finish.
    def winPairsSynth(nRows: Long, hot: Boolean): Long = {
      val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
      val text =
        if (hot) concat(lit(phrase + " tail "), col("id"))
        else concat(
          lit("t"), col("id"), lit("a t"), col("id"), lit("b t"),
          col("id"), lit("c t"), col("id"), lit("d t"), col("id"),
          lit("e t"), col("id"), lit("f t"), col("id"), lit("g t"),
          col("id"), lit("h"))
      spark.range(nRows)
        .select(col("id").as("doc_id"), text.as("text"))
        .transform(graft.pipeline.Corpus.winnowCandidatePairs(_))
        .count()
    }

    // Perplexity buckets: bigram model + score + distributed prefix
    // over doc rows; all shuffles combinable or range-partitioned.
    def pplBuckets(d: DataFrame): Long = {
      val bg = d.select(col("doc_id"),
          explode(graft.pipeline.TextOps.shingles(col("text"), 2)).as("bg"))
        .persist()
      val scored = graft.pipeline.Corpus
        .bigramScore(bg, graft.pipeline.Corpus.bigramModel(bg))
        .select(col("doc_id"), col("n_bigrams"),
          (col("logprob_micro").cast("double") / col("n_bigrams")).as("a"))
        .withColumn("_ord", struct((-col("a")).as("a"), col("doc_id").as("d")))
      val m = graft.plans.Scale
        .cumSumDistributedLong(scored, "n_bigrams", "_ord", "cum")
        .agg(max("cum")).head().getLong(0)
      spark.catalog.clearCache()
      m
    }

    // Epoch-stamped batch manifests: bounded-many (<=4) epoch frames,
    // each its own distributed prefix plan over a shrinking subset —
    // the ratio must track volume times the constant epoch count.
    def packEpochs(d: DataFrame): Long =
      graft.pipeline.Corpus.packBatchesEpochs(d, ctx = 512L).count()

    // One distributed BPE merge-selection round (the trainer's unit of
    // work): explode(bpe_pairs) -> groupBy(pair).count -> argmax. The
    // only exchange is the pair-count aggregate, bounded by the
    // distinct-pair vocabulary — the corpus never moves, so the ratio
    // must track the map-side volume.
    def bpeRound(d: DataFrame): Long =
      BpeTrain.bestPair(d.select(col("text").as("s")))
        .map(_._2).getOrElse(0L)

    // BM25 probe: map-side query-term filter, broadcast df + corpus
    // constants, partial top-k — ratio must track the scan volume.
    def bm25(d: DataFrame): Long =
      graft.pipeline.Corpus
        .bm25TopK(d, Seq("spark", "merge", "window"), 20).count()

    // DSIR train+score: one bounded (doc, bucket) exchange + a
    // broadcast 128-row ratio model — ratio must track volume.
    def dsir(d: DataFrame): Long =
      graft.pipeline.Corpus
        .dsirWeights(d, col("source") === "src1").count()

    // Perceptual-hash dedup: PNG encode+decode+hash map-side, one
    // 16-char-key groupBy — linear. (The PAIRS path is not measured
    // here: the synthetic pixel space has only 2^16 patterns, so its
    // pair count is quadratic in the FIXTURE, not the operator.)
    def phash(d: DataFrame): Long = {
      val h = graft.pipeline.Multimodal.aHash(
        graft.pipeline.Multimodal.syntheticImages(spark, d),
        graft.pipeline.Multimodal.ImageIODecoder)
      h.groupBy("ahash").agg(count(lit(1))).count()
    }

    // PMI collocations: two vocab-sized partial aggs + equi-joins on
    // the support-filtered head — ratio must track token volume.
    def pmi(d: DataFrame): Long =
      graft.pipeline.Corpus.collocationsPmi(d).count()

    // SQ8 / MRL ANN: one (or zero) train aggregate + map-only encode +
    // broadcast-queries candidate scan + partial top-k — linear in
    // corpus rows.
    def sq8(e: DataFrame): Long = graft.pipeline.Similarity.topKSq8(e).count()
    def mrl(e: DataFrame): Long = graft.pipeline.Similarity.topKMrl(e).count()
    def bin(e: DataFrame): Long = graft.pipeline.Similarity.topKBinary(e).count()

    // Unigram: the Viterbi kernel is map-only like the WordPiece row;
    // the piece-freq agg is vocabulary-bounded — linear.
    def uni(d: DataFrame): Long =
      d.select(explode(graft.pipeline.Unigram.pieces(col("text"))).as("p"))
        .groupBy("p").agg(count(lit(1))).count()

    // PII audit: staged regex counts are map-only; the source agg is
    // source-bounded — linear.
    def piiRep(d: DataFrame): Long = graft.pipeline.Corpus.piiReport(d).count()

    // Padding audit: one aggregate over the packOffsets prefix frame.
    def padAudit(d: DataFrame): Long =
      graft.pipeline.Corpus.packPaddingAudit(d).count()

    // Semantic pack order: broadcast cells join + the same distributed
    // prefix plan as pack offsets (synthetic mod-8 cells — the k-means
    // cost is measured by its own row).
    def semOrder(d: DataFrame): Long = {
      import spark.implicits._
      val cells = d.select(col("doc_id"), (col("doc_id") % 8).cast("int").as("cid"))
      graft.pipeline.Corpus.packSemanticOrder(d, cells, ctx = 512L).count()
    }

    // Key-skew planner: one combinable groupBy per key + TakeOrdered.
    def keySkew(ev: DataFrame): Long =
      graft.plans.Scale.keySkewPlan(ev, Seq("user_id", "event_type")).count()

    // Last-touch attribution: (user, 6h-bucket)-keyed equi-join
    // (purchases probe their own bucket + the previous one) +
    // per-purchase max-struct + channel rollup — linear, and
    // window-bounded per key even under hot users (own witness below).
    def attrib(ev: DataFrame): Long = {
      val e = ev.select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        graft.sources.Bars.eventTimeMicros(ev).as("us"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("us").as("pus"),
          floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("us").as("cus"), col("event_id").as("cid"))
        .withColumn("bkt", graft.sources.Bars.timeBucket("cus", 21600000000L))
      p.withColumn("pbkt", graft.sources.Bars.timeBucket("pus", 21600000000L))
        .withColumn("bkt", explode(array(col("pbkt"), col("pbkt") - 1)))
        .join(c, Seq("user_id", "bkt"))
        .where(col("cus") < col("pus") && col("pus") - col("cus") <= 21600000000L)
        .groupBy("pid").agg(max(struct(col("cus"), col("cid"))).as("b"))
        .count()
    }

    // Hot-user fixture for the attribution witness: `nClicks` clicks
    // spread over 30 days across `nUsers` users + 200 purchases on the
    // same user space. nUsers=1 is the bot-user worst case the bare
    // user_id join went quadratic on (round-15 verdict); the bucketed
    // join must keep it within ~1.5x of the uniform fixture because
    // each purchase probe sees only the hot user's CURRENT+PREVIOUS
    // bucket, never their whole click history.
    def attribFixture(nClicks: Long, nUsers: Long): DataFrame = {
      val base = 1700000000000000L
      val spreadUs = 30L * 86400000000L
      val clicks = spark.range(nClicks).select(
        col("id").as("event_id"),
        timestamp_micros(lit(base) + col("id") * lit(spreadUs / nClicks)).as("ts"),
        (col("id") % nUsers).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"))
      val purchases = spark.range(200).select(
        (col("id") + nClicks).as("event_id"),
        timestamp_micros(lit(base) + col("id") * lit(spreadUs / 200) + 1000L).as("ts"),
        (col("id") % nUsers).as("user_id"),
        lit("purchase").as("event_type"),
        lit(10.0).as("value"))
      clicks.union(purchases)
    }

    // Ingest-drift report: ONE scan (single groupBy(source, is_delta))
    // + a 2-rows-per-source conditional-max pivot — linear, and the
    // scan is paid once (round 16; the per-side spelling paid it
    // twice).
    def srcDrift(d: DataFrame): Long = {
      val st = d.select(col("source"),
        (graft.pipeline.TextOps.hash32(
          concat(lit("drift:"), col("doc_id").cast("string"))) % 2 === 1).as("dl"),
        floor(graft.pipeline.TextOps.qualityScore(col("text")) * 1000000 + 0.5)
          .cast("bigint").as("q_micro"),
        md5(col("text")).as("h"))
      st.groupBy("source", "dl")
        .agg(count(lit(1)).as("_n"), sum(col("q_micro")).as("_qs"),
          countDistinct(col("h")).as("_nd"))
        .groupBy("source")
        .agg(
          max(when(col("dl"), col("_n"))).as("delta_docs"),
          max(when(!col("dl"), col("_n"))).as("base_docs"))
        .count()
    }

    // Embedding spectrum: one map-only rotate + one d-sum global agg
    // (the rotation is trained ONCE on the 1x frame and frozen — the
    // monitor's contract; training cost has its own OPQ rows).
    lazy val smokeRot = graft.pipeline.Opq.trainRotation(emb1)
    def spectrum(e: DataFrame): Long =
      graft.pipeline.Similarity.embeddingSpectrum(e, smokeRot).count()

    // RFM segmentation: one events groupBy + three rank plans over the
    // post-agg users frame.
    def rfm(ev: DataFrame): Long = {
      val e = ev.select(col("user_id"), col("event_type"), col("value"),
        graft.sources.Bars.eventTimeMicros(ev).as("us"))
      val u = e.groupBy("user_id").agg(
        max(col("us")).as("last_us"),
        count(lit(1)).cast("bigint").as("n_events"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + 0.5).cast("bigint")).otherwise(0L))
          .as("cents"))
      val (r1, n) = graft.plans.Scale.rowNumberDistributedWithTotal(
        u, Seq(col("last_us").desc, col("user_id").asc), "_rr")
      val r2 = graft.plans.Scale.rowNumberDistributed(
        r1, Seq(col("n_events").desc, col("user_id").asc), "_fr")
      graft.plans.Scale.rowNumberDistributed(
          r2, Seq(col("cents").desc, col("user_id").asc), "_mr")
        .select(
          expr(s"((_rr - 1) * 4) div $n").as("r_q"),
          expr(s"((_fr - 1) * 4) div $n").as("f_q"),
          expr(s"((_mr - 1) * 4) div $n").as("m_q"))
        .groupBy("r_q", "f_q", "m_q").agg(count(lit(1)))
        .count()
    }

    // Sketch-tier datasheet, WITNESS-FREE (the 100 TB path): one global
    // agg where the KMV carries O(k) state map-side combined, plus the
    // TakeOrdered 256-row sample — no exact countDistinct, no exact
    // percentile buffer, so the ratio must track the scan alone.
    def dsketch(d: DataFrame): Long = {
      import graft.functions.kmvSketch
      val b = d.select(
        col("doc_id"),
        size(graft.pipeline.TextOps.tokens(col("text"))).cast("bigint").as("nt"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("bigint").as("h"),
        graft.pipeline.TextOps.hash32(
          concat(lit("dsq_"), col("doc_id").cast("string"))).as("sh"))
      val head = b.agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        kmvSketch(col("h"), 256).as("kmv"))
      val samp = b.orderBy(col("sh").asc, col("doc_id").asc).limit(256)
        .agg(expr("percentile(nt, 0.5)").as("p50"))
      head.crossJoin(samp).count()
    }

    // Order-free shard digest: the bit_xor fold keeps constant
    // aggregation-buffer state per shard group (the retired
    // collect_list digest buffered the WHOLE group) — ratio tracks the
    // scan, group count fixed at 8.
    def xdigest(d: DataFrame): Long =
      d.select(
          (col("doc_id") % 8).as("shard"),
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            md5(col("text")))), 1, 15), 16, 10).cast("bigint").as("dh"))
        .groupBy("shard")
        .agg(expr("bit_xor(dh)").as("dg"), count(lit(1)).as("nd"))
        .count()

    // WordPiece budget sweep: four rank-capped map-only kernel passes.
    def wpBudget(d: DataFrame): Long =
      Seq(12, 50).map { b =>
        d.select(size(graft.pipeline.Wordpiece.piecesBudget(col("text"), b))
          .cast("long").as("np")).agg(sum("np")).count()
      }.sum

    // WordPiece: the greedy-match kernel is map-only; the piece-freq
    // agg is vocabulary-bounded — linear.
    def wp(d: DataFrame): Long =
      d.select(explode(graft.pipeline.Wordpiece.pieces(col("text"))).as("p"))
        .groupBy("p").agg(count(lit(1))).count()

    // Z-order skipping stats: one bounds aggregate + map-only binning
    // + a 32-file grouped agg — linear.
    def zo(e: DataFrame): Long =
      graft.sources.Zorder.skippingStats(e, col("user_id"), col("value")).count()

    // N-gram diversity: 3 shingle explodes + one grouped exact
    // distinct — tracks token volume.
    def ngd(d: DataFrame): Long =
      graft.pipeline.Corpus.ngramDiversity(d).count()

    // Containment verify: joins only the LSH candidate pairs (same
    // frontier as the jaccard verifier).
    def contain(d: DataFrame): Long =
      graft.pipeline.Dedup.containmentPairs(
        graft.pipeline.Dedup.lshCandidatePairs(d), d).count()

    // Bucketed layout: one partitioning shuffle per side at write
    // time, then the exchange-free co-located join — both linear.
    def bucketJoin(d: DataFrame, tag: String): Long = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_smoke_bkt_").toString
      val stats = d.select(col("doc_id"), col("source"),
        size(graft.pipeline.TextOps.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      graft.sources.Io.writeBucketed(
        stats, s"graft_smoke_a_$tag", s"$root/a", "doc_id")
      graft.sources.Io.writeBucketed(
        stats.select(col("doc_id"), (col("n_tokens") * 2).as("x")),
        s"graft_smoke_b_$tag", s"$root/b", "doc_id")
      spark.table(s"graft_smoke_a_$tag")
        .join(spark.table(s"graft_smoke_b_$tag"), Seq("doc_id")).count()
    }

    // HTML front door: synth + extract, map-only — the aggregate over
    // extracted chars defeats count()'s column pruning so the whole
    // extraction actually runs; the returned char mass is the
    // deterministic cross-scale witness.
    def htmlx(d: DataFrame): Long =
      graft.pipeline.Html.extractDocs(
        d.select(col("doc_id"),
          graft.pipeline.Html.synthHtml(col("doc_id"), col("text")).as("html")))
        .agg(sum(col("n_chars_extracted"))).collect()(0).getLong(0)

    lazy val evN = amplify(ev1, n)
    lazy val docsN = amplifyDocs(docs1, n)
    lazy val docsNDistinct = amplifyDocsDistinct(docs1, n)
    lazy val embN = amplifyEmb(emb1, n)
    println(s"== 1x (${ev1.count()} events) vs ${n}x ==")
    val rows: Seq[(String, () => (Double, Double))] = Seq(
      "indicator chain" -> (() => (time("chain 1x", chain(ev1)), time(s"chain ${n}x", chain(evN)))),
      "asof join" -> (() => (time("asof 1x", asof(ev1)), time(s"asof ${n}x", asof(evN)))),
      "sessionize" -> (() => (time("sessionize 1x", sess(ev1)), time(s"sessionize ${n}x", sess(evN)))),
      "decontaminate" -> (() => (time("decontaminate 1x", decon(docs1)), time(s"decontaminate ${n}x", decon(docsN)))),
      "lsh dedup chain" -> (() => (time("lsh chain 1x", lshChain(docs1)), time(s"lsh chain ${n}x", lshChain(docsNDistinct)))),
      "ann lsh topk" -> (() => (time("ann 1x", ann(emb1)), time(s"ann ${n}x", ann(embN)))),
      "pack offsets" -> (() => (time("pack 1x", pack(docs1)), time(s"pack ${n}x", pack(docsN)))),
      "pack windows" -> (() => (time("packwin 1x", packWin(docs1)), time(s"packwin ${n}x", packWin(docsN)))),
      "pack materialize" -> (() => (time("packmat 1x", packMat(docs1)), time(s"packmat ${n}x", packMat(docsN)))),
      "dedup representatives" -> (() => (time("reps 1x", reps(docs1)), time(s"reps ${n}x", reps(docsNDistinct)))),
      "paragraph dedup" -> (() => (time("paradedup 1x", paraDedup(docs1)), time(s"paradedup ${n}x", paraDedup(docsNDistinct)))),
      "tfidf top tokens" -> (() => (time("tfidf 1x", tfidf(docs1)), time(s"tfidf ${n}x", tfidf(docsN)))),
      "ivf train+assign" -> (() => (time("ivf 1x", ivf(emb1)), time(s"ivf ${n}x", ivf(embN)))),
      "quality filter" -> (() => (time("qual 1x", qual(docs1)), time(s"qual ${n}x", qual(docsN)))),
      "cms sketch" -> (() => (time("cms 1x", cms(docs1)), time(s"cms ${n}x", cms(docsNDistinct)))),
      "budget sample" -> (() => (time("budget 1x", budget(docs1, 2000L)), time(s"budget ${n}x", budget(docsN, 2000L * n)))),
      "semantic dedup" -> (() => (time("semdedup 1x", semdedup(emb1, 8)), time(s"semdedup ${n}x", semdedup(amplifyEmbDecor(emb1, n), 8 * n)))),
      "pq train+encode" -> (() => (time("pq 1x", pq(emb1)), time(s"pq ${n}x", pq(embN)))),
      "fuzzy decontaminate" -> (() => (time("fuzzydecon 1x", fuzzyDecon(docs1)), time(s"fuzzydecon ${n}x", fuzzyDecon(docsN)))),
      "paragraph dedup filter" -> (() => (time("parafilter 1x", paraFilter(docs1)), time(s"parafilter ${n}x", paraFilter(docsN)))),
      "substring dedup filter" -> (() => (time("subfilter 1x", subFilter(docs1)), time(s"subfilter ${n}x", subFilter(docsN)))),
      "parafilter hot-key skew" -> (() => (time("parafilter distinct 2e6", paraFilterSynth(2000000L, hotKey = false)), time("parafilter 1e6-deep key", paraFilterSynth(2000000L, hotKey = true)))),
      "exactcanon hot-key skew" -> (() => (time("exactcanon distinct 2e6", exactCanonSynth(2000000L, hotKey = false)), time("exactcanon 1e6-deep key", exactCanonSynth(2000000L, hotKey = true)))),
      "subfilter long-dup doc" -> (() => (time("subfilter dup-doc 50k tok", subFilterSynthLongDup(50000)), time("subfilter dup-doc 200k tok", subFilterSynthLongDup(200000)))),
      "domainstats hot-domain skew" -> (() => (time("domainstats uniform 2e6", domainStatsSynth(2000000L, hotDomain = false)), time("domainstats 1-domain 2e6", domainStatsSynth(2000000L, hotDomain = true)))),
      "intradoc dedup filter" -> (() => (time("intrafilter 1x", intraFilter(docs1)), time(s"intrafilter ${n}x", intraFilter(docsN)))),
      "intradoc one-doc hot-unit" -> (() => (time("intradoc distinct 250k units", intraDocSynth(250000L, hot = false)), time("intradoc 250k-deep unit", intraDocSynth(250000L, hot = true)))),
      "semantic decontaminate" -> (() => (time("semdecon 1x", semDecon(emb1.where(col("vec_id") % 50 =!= 0))), time(s"semdecon ${n}x", semDecon(amplifyEmb(emb1, n))))),
      "pack shuffle" -> (() => (time("packshuf 1x", packShuf(docs1)), time(s"packshuf ${n}x", packShuf(docsN)))),
      "span decontaminate" -> (() => (time("spandecon 1x", spanDecon(docs1)), time(s"spandecon ${n}x", spanDecon(docsN)))),
      "substring intradoc" -> (() => (time("subintra 1x", subIntra(docs1)), time(s"subintra ${n}x", subIntra(docsN)))),
      "tokenizer fertility" -> (() => (time("fert 1x", fert(docs1)), time(s"fert ${n}x", fert(docsN)))),
      "global rank" -> (() => (time("grank 1x", grank(docs1)), time(s"grank ${n}x", grank(docsN)))),
      "bloom decontaminate" -> (() => (time("bloom 1x", bloomDecon(docs1)), time(s"bloom ${n}x", bloomDecon(docsN)))),
      "opq moment+rotate" -> (() => (time("opq 1x", opqTrain(emb1)), time(s"opq ${n}x", opqTrain(embN)))),
      "shard assign" -> (() => (time("shard 1x", shard(docs1)), time(s"shard ${n}x", shard(docsN)))),
      "quality model score" -> (() => (time("qms 1x", qms(docs1)), time(s"qms ${n}x", qms(docsN)))),
      "source overlap" -> (() => (time("srcoverlap 1x", srcOverlap(docs1)), time(s"srcoverlap ${n}x", srcOverlap(docsNDistinct)))),
      "vocab coverage" -> (() => (time("vocabcov 1x", vocabCov(docs1)), time(s"vocabcov ${n}x", vocabCov(docsN)))),
      "winnow fingerprints" -> (() => (time("winnow 1x", winnow(docs1)), time(s"winnow ${n}x", winnow(docsN)))),
      "winnow pairs" -> (() => (time("winpairs 1x", winPairs(docs1)), time(s"winpairs ${n}x", winPairs(docsNDistinct)))),
      "srcoverlap hot-window skew" -> (() => (time("srcoverlap distinct 1e6", srcOverlapSynth(1000000L, hot = false)), time("srcoverlap 1e6-deep window", srcOverlapSynth(1000000L, hot = true)))),
      "pack curriculum" -> (() => (time("curriculum 1x", curriculum(docs1)), time(s"curriculum ${n}x", curriculum(docsN)))),
      "ppl buckets" -> (() => (time("pplbuckets 1x", pplBuckets(docs1)), time(s"pplbuckets ${n}x", pplBuckets(docsN)))),
      "winpairs hot-fingerprint skew" -> (() => (time("winpairs distinct 1e6", winPairsSynth(1000000L, hot = false)), time("winpairs 1e6-deep fingerprint", winPairsSynth(1000000L, hot = true)))),
      "bpe merge round" -> (() => (time("bperound 1x", bpeRound(docs1)), time(s"bperound ${n}x", bpeRound(docsN)))),
      "pack epochs" -> (() => (time("packepochs 1x", packEpochs(docs1)), time(s"packepochs ${n}x", packEpochs(docsN)))),
      "bm25 probe" -> (() => (time("bm25 1x", bm25(docs1)), time(s"bm25 ${n}x", bm25(docsN)))),
      "dsir train+score" -> (() => (time("dsir 1x", dsir(docs1)), time(s"dsir ${n}x", dsir(docsN)))),
      "bucketed write+join" -> (() => (time("bktjoin 1x", bucketJoin(docs1, "x1")), time(s"bktjoin ${n}x", bucketJoin(docsN, "xn")))),
      "pmi collocations" -> (() => (time("pmi 1x", pmi(docs1)), time(s"pmi ${n}x", pmi(docsN)))),
      "phash dedup" -> (() => (time("phash 1x", phash(docs1)), time(s"phash ${n}x", phash(docsN)))),
      "ann sq8 topk" -> (() => (time("sq8 1x", sq8(emb1)), time(s"sq8 ${n}x", sq8(embN)))),
      "ann mrl topk" -> (() => (time("mrl 1x", mrl(emb1)), time(s"mrl ${n}x", mrl(embN)))),
      "wordpiece pieces" -> (() => (time("wp 1x", wp(docs1)), time(s"wp ${n}x", wp(docsN)))),
      "zorder stats" -> (() => (time("zorder 1x", zo(ev1)), time(s"zorder ${n}x", zo(evN)))),
      "ngram diversity" -> (() => (time("ngd 1x", ngd(docs1)), time(s"ngd ${n}x", ngd(docsN)))),
      "containment verify" -> (() => (time("contain 1x", contain(docs1)), time(s"contain ${n}x", contain(docsNDistinct)))),
      "knn graph descent" -> (() => (time("knng 1x", knng(emb1)), time(s"knng ${n}x", knng(amplifyEmbDecor(emb1, n))))),
      "graph walk serving" -> (() => {
        val eN = amplifyEmbDecor(emb1, n)
        val (g1, gN) = (gwalkGraph(emb1), gwalkGraph(eN))
        (time("gwalk 1x", gwalk(emb1, g1)), time(s"gwalk ${n}x", gwalk(eN, gN)))
      }),
      "graph append" -> (() => {
        def split(e: DataFrame) =
          (e.where(col("vec_id") % 50 =!= 0), e.where(col("vec_id") % 50 === 0))
        def append(e: DataFrame): Long = {
          val (base, delta) = split(e)
          val wl = graft.pipeline.Similarity.knnWorkingList(base).localCheckpoint(true)
          val m = graft.pipeline.Similarity.knnGraphAppend(base, delta, wl).count()
          spark.catalog.clearCache()
          m
        }
        (time("gappend 1x", append(emb1)),
          time(s"gappend ${n}x", append(amplifyEmbDecor(emb1, n))))
      }),
      "media representatives" -> (() => (time("mediarep 1x", mediaRep(docs1)), time(s"mediarep ${n}x", mediaRep(docsNDistinct)))),
      "bitext mining" -> (() => (time("bitext 1x", bitext(emb1, 8)), time(s"bitext ${n}x", bitext(amplifyEmbDecor(emb1, n), 8 * n)))),
      "badwords gate" -> (() => (time("badwords 1x", badwords(docs1)), time(s"badwords ${n}x", badwords(docsN)))),
      "video frame dedup" -> (() => (time("videodedup 1x", videoDedup(vhash1)), time(s"videodedup ${n}x", videoDedup(amplifyVideoHashes(vhash1, n))))),
      "video dedup incremental" -> (() => (time("videoinc 1x", videoDedupInc(vhash1)), time(s"videoinc ${n}x", videoDedupInc(amplifyVideoHashes(vhash1, n))))),
      "retention cohorts" -> (() => (time("retention 1x", retention(ev1)), time(s"retention ${n}x", retention(evN)))),
      "alignment gate" -> (() => {
        val eN = amplifyEmbDecor(emb1, n)
        val dN = amplifyDocs(docs1, n)
        (time("align 1x", alignGate(docs1, emb1)), time(s"align ${n}x", alignGate(dN, eN)))
      }),
      "ann binary topk" -> (() => (time("bin 1x", bin(emb1)), time(s"bin ${n}x", bin(embN)))),
      "unigram pieces" -> (() => (time("uni 1x", uni(docs1)), time(s"uni ${n}x", uni(docsN)))),
      "pii report" -> (() => (time("piirep 1x", piiRep(docs1)), time(s"piirep ${n}x", piiRep(docsN)))),
      "padding audit" -> (() => (time("padaudit 1x", padAudit(docs1)), time(s"padaudit ${n}x", padAudit(docsN)))),
      "semantic pack order" -> (() => (time("semorder 1x", semOrder(docs1)), time(s"semorder ${n}x", semOrder(docsN)))),
      "key skew plan" -> (() => (time("keyskew 1x", keySkew(ev1)), time(s"keyskew ${n}x", keySkew(evN)))),
      "events attribution" -> (() => (time("attrib 1x", attrib(ev1)), time(s"attrib ${n}x", attrib(evN)))),
      "attribution hot user" -> (() => (
        time("attrib uniform", attrib(attribFixture(100000L, 1000L))),
        time("attrib hotuser", attrib(attribFixture(100000L, 1L))))),
      "source drift report" -> (() => (time("srcdrift 1x", srcDrift(docs1)), time(s"srcdrift ${n}x", srcDrift(docsN)))),
      "wordpiece budget" -> (() => (time("wpbudget 1x", wpBudget(docs1)), time(s"wpbudget ${n}x", wpBudget(docsN)))),
      "embedding spectrum" -> (() => (time("spectrum 1x", spectrum(emb1)), time(s"spectrum ${n}x", spectrum(embN)))),
      "events rfm" -> (() => (time("rfm 1x", rfm(ev1)), time(s"rfm ${n}x", rfm(evN)))),
      "datasheet sketch" -> (() => (time("dsketch 1x", dsketch(docs1)), time(s"dsketch ${n}x", dsketch(docsN)))),
      "xor shard digest" -> (() => (time("xdigest 1x", xdigest(docs1)), time(s"xdigest ${n}x", xdigest(docsN)))),
      "html extract" -> (() => (time("htmlx 1x", htmlx(docs1)), time(s"htmlx ${n}x", htmlx(docsN)))))
    // Optional 3rd arg: substring filter on row names (targeted re-runs
    // of just-touched paths without paying the whole matrix).
    val only = args.lift(2)
    val results = rows
      .filter { case (nm, _) => only.forall(nm.contains) }
      .map { case (nm, f) => nm -> f() }
    results.foreach { case (name, (t1, tn)) =>
      println(f"$name%-18s ${n}x data -> ${tn / t1}%.1fx time")
    }
    spark.stop()
  }
}
