package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.{Bpe, BpeChain, Corpus, Dedup, DedupChain, Html, KnnChain, Multimodal, PackChain, Sessionize, Similarity, TextOps, Unigram, WalkChain, Wordpiece}

/** Declared queries + DuckDB oracles for the beyond-reference
  * training-data pipeline operators (documents / embeddings / events).
  * Hash primitives are md5-derived on both sides so results are
  * bit-reproducible across engines (see graft.pipeline.TextOps).
  */
object QueriesPipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Bars.readEvents(s, dir)

  /** Doc-level confusion of a Bloom contamination verdict against the
    * exact broadcast-semi verdict — shared by the sized-bitmap fp
    * instrument and the retired fixed-8KB comparison row. Zero-guard
    * on the clean-doc denominator: with every doc contaminated, Spark
    * integer div would yield NULL while DuckDB `//` raises, so both
    * spellings guard and emit NULL.
    */
  private def bloomConfusion(bloomVerdict: DataFrame, exactVerdict: DataFrame): DataFrame =
    bloomVerdict.select(col("doc_id"), col("contaminated").as("bloom_hit"))
      .join(
        exactVerdict.select(col("doc_id"), col("contaminated").as("exact_hit")),
        Seq("doc_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("bloom_hit") && col("exact_hit"), 1L).otherwise(0L))
          .as("both_hit"),
        sum(when(col("bloom_hit") && !col("exact_hit"), 1L).otherwise(0L))
          .as("bloom_only"),
        sum(when(!col("bloom_hit") && col("exact_hit"), 1L).otherwise(0L))
          .as("exact_only"),
        sum(when(!col("bloom_hit") && !col("exact_hit"), 1L).otherwise(0L))
          .as("neither"))
      .withColumn("fp_per_mille",
        when(col("bloom_only") + col("neither") > 0,
          expr("bloom_only * 1000 div (bloom_only + neither)")))

  /** PII FIXTURE for the `pii_*` queries — the [[Corpus.redactPii]]
    * footer (same arithmetic as the `redact_pii` query) applied
    * SPARSELY: doc_id % 3 == 0 gets the email, % 5 the phone, % 7 the
    * IPv4 (doc 0 gets all three; ~43% of docs stay clean), so
    * per-source rates genuinely vary. The operator never sees the
    * injection — it runs real regexes over an opaque text column; the
    * oracle rebuilds the same augmented text with the same arithmetic
    * (the syntheticAudio stance).
    */
  private def piiDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" or +1 555-01"), (col("doc_id") % 100).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" node 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string")))
        .otherwise(lit(""))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> ((s, dir) => {
      val t = TextOps.tokens(col("text"))
      val nTok = size(t).cast("bigint")
      docs(s, dir).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        length(col("text")).cast("bigint").as("n_chars_computed"),
        round((length(col("text")) - (nTok - 1)).cast("double") / nTok, 6).as("avg_token_len"),
        round(length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double") /
          length(col("text")), 6).as("punct_ratio"),
        ceil(length(col("text")) / 4.0).cast("bigint").as("bpe_token_est"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("bigint").as("bpe_regex_tokens"),
        round(TextOps.qualityScore(col("text")), 6).as("quality_score"))
        .orderBy("doc_id")
    }),

    // The one-row DATASHEET a dataset release publishes (Gebru et al.
    // "Datasheets for Datasets" made machine-readable): headline
    // composition (docs, sources, languages, token/char mass), the
    // exact-dup rate, the rule-gate pass rate, the committed
    // quality-score mean in exact micros, and the token-length
    // median/p90. ONE scan — a single global aggregate with map-side
    // partial combine (the two distinct counts and the percentile ride
    // the same Expand); every figure is either an exact integer or the
    // pinned Spark-percentile interpolation quantile_cont mirrors.
    "corpus_datasheet" -> ((s, dir) => {
      val d = docs(s, dir)
      val nTok = size(TextOps.tokens(col("text"))).cast("bigint")
      d.select(
          col("source"), col("lang"), nTok.as("nt"),
          length(col("text")).cast("bigint").as("nc"),
          md5(col("text")).as("h"),
          Corpus.gopherKeep().as("keep"),
          floor(TextOps.qualityScore(col("text")) * 1000000 + 0.5)
            .cast("bigint").as("q"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("nt")).as("n_tokens"),
          sum(col("nc")).as("n_chars"),
          countDistinct(col("h")).as("_nd"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("_gp"),
          sum(col("q")).as("_qs"),
          expr("percentile(nt, 0.5)").as("_p50"),
          expr("percentile(nt, 0.9)").as("_p90"))
        .select(
          col("n_docs"), col("n_sources"), col("n_langs"),
          col("n_tokens"), col("n_chars"),
          expr("(n_docs - _nd) * 1000 div n_docs").as("exact_dup_pm"),
          expr("_gp * 1000 div n_docs").as("gopher_pass_pm"),
          expr("_qs div n_docs").as("mean_quality_micro"),
          round(col("_p50"), 6).as("p50_tokens"),
          round(col("_p90"), 6).as("p90_tokens"))
    }),

    "lang_id" -> ((s, dir) => {
      val en = TextOps.stopCount(col("text"), TextOps.EnStop).cast("bigint")
      val es = TextOps.stopCount(col("text"), TextOps.EsStop).cast("bigint")
      docs(s, dir).select(
        col("doc_id"),
        col("lang"),
        en.as("en_score"),
        es.as("es_score"),
        TextOps.langPred(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // Trained fastText-shaped language ID — the model-based
    // counterpart of the stopword voter above: per language, one
    // EXACT integer dot product of the committed NB weight table
    // (trained in-repo by tools/TrainLangModel, re-derived exactly by
    // PipelineSpec) over 64 hashed-token buckets; argmax with ties to
    // the alphabetically-first label. Map-only at any scale — the
    // md5 per token is computed once and every language reads its own
    // 64-entry literal. Accuracy on this fixture is honest-low (the
    // corpus draws all languages from near-identical token
    // distributions) — lang_id_agreement measures it.
    "lang_id_model" -> ((s, dir) =>
      Corpus.langIdModelScore(docs(s, dir)).orderBy("doc_id")),

    // Cross-signal agreement instrument for the two language-ID
    // spellings (the gate_correlation stance): accuracy of the
    // trained model and the stopword voter against the corpus's lang
    // column, plus their agreement on the subset where the voter
    // commits (!= 'und'). ONE map-only scan + a 1-row agg — both
    // predictions are projections over the same text column, so no
    // join exists to pay for.
    "lang_id_agreement" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("lang"),
        Corpus.langIdModelPred().as("pm"),
        TextOps.langPred(col("text")).as("ps"))
      d.agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("pm") === col("lang"), 1L).otherwise(0L))
            .as("model_correct"),
          sum(when(col("ps") === col("lang"), 1L).otherwise(0L))
            .as("stop_correct"),
          sum(when(col("ps") =!= "und", 1L).otherwise(0L))
            .as("n_stop_decided"),
          sum(when(col("ps") =!= "und" && col("pm") === col("ps"), 1L)
            .otherwise(0L)).as("n_agree_decided"))
        .select(
          col("n_docs"), col("model_correct"), col("stop_correct"),
          expr("model_correct * 1000 div n_docs").as("model_acc_pm"),
          expr("stop_correct * 1000 div n_docs").as("stop_acc_pm"),
          col("n_stop_decided"),
          when(col("n_stop_decided") > 0,
            expr("n_agree_decided * 1000 div n_stop_decided"))
            .as("agree_decided_pm"))
    }),

    // C4-style term-lexicon ("bad words") gate, softened to a
    // blocked-mass ratio (the RefinedWeb stance; ratio 0 degenerates
    // to C4's drop-on-any-hit). The fixture lexicon is a 2-term
    // stand-in for the published list; the gate mechanics — exact
    // integer micro mass, integer-compare keep — are the real thing.
    // Map-only single scan. See [[graft.pipeline.TextOps
    // .badwordsStats]].
    "quality_badwords" -> ((s, dir) =>
      TextOps.badwordsStats(docs(s, dir)).orderBy("doc_id")),

    // Per-source PII audit: which ingest sources leak how much — the
    // release-review companion to `redact_pii` (that query proves the
    // scrub byte-for-byte per doc; this one answers WHERE the spans
    // come from). Same staged regex counts, sparse fixture injection
    // (see [[piiDocs]]) so rates genuinely vary by source; one shuffle
    // on source with map-side combine. See
    // [[graft.pipeline.Corpus.piiReport]].
    "pii_report" -> ((s, dir) =>
      Corpus.piiReport(piiDocs(s, dir)).orderBy("source")),

    // Tokenizer-fit table per language: whitespace words, byte-BPE
    // token count (the committed 256-merge table), and the two
    // fertility ratios a multilingual tokenizer eval reads —
    // chars/BPE-token (compression) and BPE-tokens/word (fertility
    // proper; a language the vocab underserves shows fertility >> 1
    // and gets over-billed by every token budget downstream). The BPE
    // encode is the map-only replace chain; one map-side-combinable
    // shuffle on lang. Integer-exact sums, ratios at 6dp.
    // The id-space materialization of the tokenizer: per doc the
    // integer token-id sequence a trainer's embedding table indexes
    // (GPT-2 convention — byte value for base symbols, 256+rank for
    // merges), summarized as count / max id (the vocab-bound witness:
    // always < 256 + |Merges|) / an order-sensitive digest. Map-only;
    // the id mapping is bijective with the symbol string, so the
    // digest pins the exact sequence. See
    // [[graft.pipeline.Bpe.tokenIds]].
    // Merge-usage table for VOCAB PRUNING: per committed BPE merge id,
    // its corpus usage count — including ZERO-use rows, which are the
    // pruning candidates (a merge no document exercises pays vocab
    // space and embedding rows for nothing; the saturation-trained
    // table should show near-full usage on its own training corpus,
    // and usage decay on a NEW corpus is the retrain signal, the
    // tokenizer tier's sq8_drift). One encode pass (staged chain) +
    // one id-keyed count; the all-ids frame is a 2400-row range.
    "bpe_merge_usage" -> ((s, dir) => {
      val used = BpeChain.encoded(s, dir, docs(s, dir))
        .select(explode(Bpe.idsFromSymbols(col("bpe"))).as("token_id"))
        .where(col("token_id") >= 256)
        .groupBy("token_id").agg(count(lit(1)).as("n_uses"))
      s.range(256, 256 + graft.pipeline.Bpe.Merges.length)
        .select(col("id").cast("int").as("token_id"))
        .join(used, Seq("token_id"), "left")
        .select(col("token_id"),
          coalesce(col("n_uses"), lit(0L)).as("n_uses"),
          (coalesce(col("n_uses"), lit(0L)) > 0L).as("used"))
        .orderBy("token_id")
    }),

    "tokenizer_ids" -> ((s, dir) =>
      BpeChain.encoded(s, dir, docs(s, dir))
        .select(col("doc_id"), Bpe.idsFromSymbols(col("bpe")).as("_ids"))
        .select(
          col("doc_id"),
          size(col("_ids")).cast("bigint").as("n_ids"),
          array_max(col("_ids")).as("max_id"),
          md5(array_join(transform(col("_ids"), i => i.cast("string")), " "))
            .as("ids_md5"))
        .orderBy("doc_id")),

    "tokenizer_fertility" -> ((s, dir) =>
      BpeChain.encoded(s, dir, docs(s, dir)).select(
          col("lang"),
          col("nc"),
          col("nw"),
          length(col("bpe")).cast("bigint").as("nb"))
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
        .orderBy("lang")),

    // The SECOND tokenizer family — WordPiece (BERT): greedy
    // longest-match segmentation per word over the committed capped
    // vocabulary, `##` continuation pieces, byte-fallback. Per-doc
    // token accounting next to the BPE twin. One map-only kernel
    // pass; see [[graft.pipeline.Wordpiece]].
    "tokenizer_wordpiece" -> ((s, dir) => {
      val p = Wordpiece.pieces(col("text"))
      val words = filter(TextOps.tokens(col("text")), w => length(w) > 0)
      docs(s, dir).select(
          col("doc_id"),
          size(p).cast("bigint").as("wp_tokens"),
          size(words).cast("bigint").as("n_words"))
        .select(
          col("doc_id"), col("wp_tokens"), col("n_words"),
          when(col("n_words") > 0,
            round(col("wp_tokens").cast("double") / col("n_words"), 6))
            .as("fertility"))
        .orderBy("doc_id")
    }),

    // Greedy segmentation on OUT-OF-VOCABULARY words: each doc's
    // first two words glued into one unseen token (the saturated
    // vocab covers every corpus word as a single piece, so corpus
    // text no longer exercises multi-piece matching — this query
    // keeps the greedy longest-match + ##-continuation + lossless
    // byte-fallback path oracle-gated on words the trainer never
    // saw). Map-only kernel pass; deterministic word construction.
    "wordpiece_oov" -> ((s, dir) => {
      val toks = filter(TextOps.tokens(col("text")), w => length(w) > 0)
      val oov = concat(element_at(toks, 1), element_at(toks, 2))
      val p = Wordpiece.pieces(oov)
      docs(s, dir)
        .where(size(toks) >= 2)
        .select(col("doc_id"), oov.as("word"),
          size(p).cast("bigint").as("n_pieces"),
          array_join(p, " ").as("pieces_str"))
        .orderBy("doc_id")
    }),

    // BPE vocabulary-BUDGET curve: the same corpus encoded at four
    // training-order prefixes of the committed saturated table (any
    // prefix is a valid shallower vocab — training is deterministic),
    // read as compression (chars/symbol) and fertility (symbols/word)
    // against merge budget — the curve a vocab-size decision actually
    // reads. Four map-only kernel passes (rank-capped, presence-
    // skipped), one global agg each. See [[graft.pipeline.Bpe
    // .encodeBudget]].
    "bpe_budget_sweep" -> ((s, dir) => {
      val d = docs(s, dir)
      Seq(64, 256, 1024, 2400).map { b =>
        d.select(
            length(col("text")).cast("bigint").as("nc"),
            size(TextOps.tokens(col("text"))).cast("bigint").as("nw"),
            length(Bpe.encodeBudget(col("text"), b)).cast("bigint").as("nb"))
          .agg(
            sum("nc").as("n_chars"), sum("nw").as("n_words"),
            sum("nb").as("n_bpe_tokens"))
          .select(
            lit(b).as("budget"),
            col("n_chars"), col("n_words"), col("n_bpe_tokens"),
            round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)
              .as("chars_per_bpe"),
            round(col("n_bpe_tokens").cast("double") / col("n_words"), 6)
              .as("bpe_per_word"))
      }.reduce(_ unionAll _).orderBy("budget")
    }),

    // WordPiece vocabulary-BUDGET curve — the BERT vocab-size knob
    // measured: fertility against merge budget at training-order
    // prefixes of the saturated table (12/25/50/100 merges; the spec
    // pins any prefix as a valid shallower vocabulary). Capped
    // budgets exercise multi-piece greedy matching ON CORPUS words —
    // at saturation only OOV gluing does. Four map-only kernel
    // passes, one agg each. See [[graft.pipeline.Wordpiece
    // .piecesBudget]].
    "wordpiece_budget_sweep" -> ((s, dir) => {
      val d = docs(s, dir)
      Seq(12, 25, 50, 100).map { b =>
        val words = filter(TextOps.tokens(col("text")), w => length(w) > 0)
        d.select(
            size(words).cast("bigint").as("nw"),
            size(Wordpiece.piecesBudget(col("text"), b)).cast("bigint").as("np"))
          .agg(sum("nw").as("n_words"), sum("np").as("n_wp_tokens"))
          .select(
            lit(b).as("budget"), col("n_words"), col("n_wp_tokens"),
            round(col("n_wp_tokens").cast("double") / col("n_words"), 6)
              .as("wp_per_word"))
      }.reduce(_ unionAll _).orderBy("budget")
    }),

    // Unigram-LM (SentencePiece) tokenization — the THIRD tokenizer
    // family: per-word VITERBI max-log-prob segmentation over the
    // committed budgeted vocab (integer micro scores, so the DP is
    // exact and the oracle's path-enumeration argmax matches
    // bit-for-bit). Map-only kernel pass; same fertility accounting
    // as tokenizer_wordpiece. See [[graft.pipeline.Unigram]].
    "tokenizer_unigram" -> ((s, dir) => {
      val p = Unigram.pieces(col("text"))
      val words = filter(TextOps.tokens(col("text")), w => length(w) > 0)
      docs(s, dir).select(
          col("doc_id"),
          size(p).cast("bigint").as("uni_tokens"),
          size(words).cast("bigint").as("n_words"))
        .select(
          col("doc_id"), col("uni_tokens"), col("n_words"),
          when(col("n_words") > 0,
            round(col("uni_tokens").cast("double") / col("n_words"), 6))
            .as("fertility"))
        .orderBy("doc_id")
    }),

    // Corpus piece-usage distribution under the budgeted unigram
    // vocab — budget survivors serve whole words, everything else
    // pays per-char; the table a vocabulary-budget decision reads
    // next to wordpiece_piece_freq. One explode + one combinable agg.
    "unigram_piece_freq" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(Unigram.pieces(col("text"))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).cast("bigint").as("cnt"))
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(50)),

    // Viterbi on OUT-OF-VOCABULARY words: each doc's first two words
    // glued into one unseen token — the multi-piece lattice search
    // (top-budget pieces compete against char decompositions inside
    // one word) stays oracle-gated even where corpus words alone
    // would segment trivially. Mirrors wordpiece_oov.
    "unigram_oov" -> ((s, dir) => {
      val toks = filter(TextOps.tokens(col("text")), w => length(w) > 0)
      val oov = concat(element_at(toks, 1), element_at(toks, 2))
      val p = Unigram.pieces(oov)
      docs(s, dir)
        .where(size(toks) >= 2)
        .select(col("doc_id"), oov.as("word"),
          size(p).cast("bigint").as("n_pieces"),
          array_join(p, " ").as("pieces_str"))
        .orderBy("doc_id")
    }),

    // The word-bounded tokenizer pair priced against each other: per
    // source, WordPiece-at-saturation (fertility floor 1) vs the
    // BUDGETED unigram vocab — uni_delta_milli is what the vocabulary
    // budget costs in extra tokens per source. Two map-only kernels,
    // one source agg.
    "tokenizer_compare_unigram" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("source"),
          size(filter(TextOps.tokens(col("text")), w => length(w) > 0))
            .cast("bigint").as("nw"),
          Wordpiece.tokenCount(col("text")).as("nwp"),
          Unigram.tokenCount(col("text")).as("nuni"))
        .groupBy("source")
        .agg(
          count(lit(1)).cast("bigint").as("n_docs"),
          sum("nw").cast("bigint").as("n_words"),
          sum("nwp").cast("bigint").as("n_wp"),
          sum("nuni").cast("bigint").as("n_uni"))
        .select(
          col("source"), col("n_docs"), col("n_words"), col("n_wp"), col("n_uni"),
          round(col("n_wp").cast("double") / col("n_words"), 6).as("wp_per_word"),
          round(col("n_uni").cast("double") / col("n_words"), 6).as("uni_per_word"),
          expr("(n_uni - n_wp) * 1000 div n_wp").as("uni_delta_milli"))
        .orderBy("source")),

    // Cross-tokenizer accounting: per source, the SAME text mass
    // denominated in whitespace words, saturated-BPE symbols and
    // saturated-WordPiece pieces — the one-table read on the
    // tokenizer trade (BPE merges across word boundaries so it
    // compresses below 1 symbol/word; word-bounded WordPiece floors
    // at 1 piece/word at saturation). BPE rides the session-staged
    // BpeChain; WordPiece is one extra map-only kernel.
    "tokenizer_compare" -> ((s, dir) => {
      val enc = BpeChain.encoded(s, dir, docs(s, dir))
        .select(
          col("doc_id"), col("source"), col("nc"), col("nw"),
          length(col("bpe")).cast("bigint").as("nb"))
      val wp = docs(s, dir)
        .select(col("doc_id"), Wordpiece.tokenCount(col("text")).as("nwp"))
      enc.join(wp, "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).cast("bigint").as("n_docs"),
          sum("nc").cast("bigint").as("n_chars"),
          sum("nw").cast("bigint").as("n_words"),
          sum("nb").cast("bigint").as("n_bpe"),
          sum("nwp").cast("bigint").as("n_wp"))
        .select(
          col("source"), col("n_docs"), col("n_chars"), col("n_words"),
          col("n_bpe"), col("n_wp"),
          round(col("n_chars").cast("double") / col("n_bpe"), 6).as("chars_per_bpe"),
          round(col("n_chars").cast("double") / col("n_wp"), 6).as("chars_per_wp"),
          round(col("n_bpe").cast("double") / col("n_words"), 6).as("bpe_per_word"),
          round(col("n_wp").cast("double") / col("n_words"), 6).as("wp_per_word"))
        .orderBy("source")
    }),

    // Corpus-wide WordPiece piece distribution (top 50): what the
    // embedding table actually trains on — reads directly off the
    // kernel's piece arrays, one explode + combinable count.
    // The WordPiece analog of bpe_merge_usage: per committed vocab
    // piece its corpus usage INCLUDING zero-use rows (the pruning
    // candidates; where wordpiece_piece_freq is the used-top-50 view,
    // this is the full-vocab audit a pruning decision reads). Map-only
    // kernel + one piece-keyed count against the literal vocab frame.
    "wordpiece_vocab_usage" -> ((s, dir) => {
      import s.implicits._
      val used = docs(s, dir)
        .select(explode(Wordpiece.pieces(col("text"))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("n_uses"))
      graft.pipeline.Wordpiece.Vocab.map(_._1).toDF("piece")
        .join(used, Seq("piece"), "left")
        .select(col("piece"),
          coalesce(col("n_uses"), lit(0L)).as("n_uses"),
          (coalesce(col("n_uses"), lit(0L)) > 0L).as("used"))
        .orderBy("piece")
    }),

    "wordpiece_piece_freq" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(Wordpiece.pieces(col("text"))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).cast("bigint").as("cnt"))
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(50)),

    // Per-source vocabulary coverage: a word is IN-VOCAB iff greedy
    // segmentation returns one piece (equivalently, the whole word is
    // a word-initial vocab entry); coverage and mean fertility are
    // the two dials a vocab-budget decision reads. Kernel applied
    // per word occurrence (map-only), one groupBy(source).
    "wordpiece_coverage" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("source"),
          explode(filter(TextOps.tokens(col("text")), w => length(w) > 0)).as("w"))
        .select(col("source"), size(Wordpiece.pieces(col("w"))).as("np"))
        .groupBy("source")
        .agg(
          count(lit(1)).cast("bigint").as("n_words"),
          sum(col("np")).cast("bigint").as("wp_tokens"),
          sum(when(col("np") === 1, 1L).otherwise(0L)).cast("bigint").as("n_in_vocab"))
        .select(
          col("source"), col("n_words"), col("wp_tokens"), col("n_in_vocab"),
          round(col("n_in_vocab").cast("double") / col("n_words"), 6).as("coverage"),
          round(col("wp_tokens").cast("double") / col("n_words"), 6).as("fertility"))
        .orderBy("source")),

    // Code-switching / mixed-language detector: language-ID per
    // 32-token chunk, then per doc the chunk count, distinct chunk
    // languages, majority language (ties to the lexicographically
    // first) and its share — the screen that catches documents whose
    // DOC-level language vote hides a half-and-half mix (multilingual
    // curation drops or routes them). Chunking and lang-ID are
    // map-only; the per-doc windows partition on doc_id (bounded by
    // one doc's chunk-language rows).
    "lang_consistency" -> ((s, dir) => {
      val counts = Corpus.chunk(docs(s, dir), chunkSize = 32, stride = 32)
        .select(col("doc_id"), TextOps.langPred(col("chunk_text")).as("l"))
        .groupBy("doc_id", "l")
        .agg(count(lit(1)).as("c"))
      val byDoc = Window.partitionBy("doc_id")
      val rk = Window.partitionBy("doc_id").orderBy(col("c").desc, col("l").asc)
      counts
        .withColumn("_rk", row_number().over(rk))
        .withColumn("n_chunks", sum("c").over(byDoc))
        .withColumn("n_langs", count(lit(1)).over(byDoc))
        .where(col("_rk") === 1)
        .select(
          col("doc_id"), col("n_chunks"), col("n_langs"),
          col("l").as("majority_lang"),
          round(col("c").cast("double") / col("n_chunks"), 6)
            .as("majority_frac"),
          (col("n_langs") > 1).as("mixed"))
        .orderBy("doc_id")
    }),

    "doc_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("content_md5"),
        TextOps.hash32(col("text")).as("content_hash32"),
        TextOps.hash32(substring(col("text"), 1, 64)).as("prefix_hash32"),
        TextOps.polyHash(col("text")).as("rolling_hash"))
        .orderBy("doc_id")),

    // RAW-CRAWL FRONT DOOR (r19 verdict ask #2): synthetic-HTML
    // fixture -> native-expression extraction; roundtrip_ok is the
    // per-row self-proof that extraction re-derives the clean text.
    // Map-only — no shuffle before the presentation sort.
    "extract_html" -> ((s, dir) =>
      Html.extractDocs(
        docs(s, dir).select(col("doc_id"), col("source"), col("text"),
          Html.synthHtml(col("doc_id"), col("text")).as("html")))
        .select(col("doc_id"), col("extracted_text"),
          col("n_chars_html"), col("n_chars_extracted"),
          col("lines_total"), col("lines_kept"),
          (replace(col("extracted_text"), lit("\n"), lit(" ")) === col("text"))
            .as("roundtrip_ok"))
        .orderBy("doc_id")),

    // Per-source extraction-yield audit over the same fixture — the
    // C4-style "how much of the crawl survived the gates" report.
    // Integer sums + integer-div per-mille so the row is exact at any
    // scale.
    "html_extract_stats" -> ((s, dir) =>
      Html.extractDocs(
        docs(s, dir).select(col("doc_id"), col("source"), col("text"),
          Html.synthHtml(col("doc_id"), col("text")).as("html")))
        .withColumn("rt",
          replace(col("extracted_text"), lit("\n"), lit(" ")) === col("text"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("docs"),
          sum(when(col("rt"), 1L).otherwise(0L)).as("roundtrip_ok_docs"),
          sum(col("n_chars_html")).as("html_chars"),
          sum(col("n_chars_extracted")).as("extracted_chars"),
          sum(col("lines_total")).as("lines_total"),
          sum(col("lines_kept")).as("lines_kept"))
        .withColumn("yield_per_mille",
          expr("extracted_chars * 1000 div html_chars"))
        .orderBy("source")),

    // THE COMPOSED FRONT SEGMENT: crawl(HTML) → extract → quality /
    // language / token gates → split — the FineWeb front half in one
    // declarative query. The engine recovers the corpus FROM the
    // synthetic pages; the ORACLE computes the same gates on the
    // clean text directly, sharing zero extraction code with the
    // engine — a hash match proves the whole extract→prepare segment
    // is semantics-preserving end to end. Still map-only.
    "crawl_prepare" -> ((s, dir) => {
      val ex = Html.extractDocs(
        docs(s, dir).select(col("doc_id"), col("lang"),
          Html.synthHtml(col("doc_id"), col("text")).as("html")))
      ex.select(col("doc_id"), col("lang"),
          replace(col("extracted_text"), lit("\n"), lit(" ")).as("text"))
        .select(
          col("doc_id"),
          round(TextOps.qualityScore(col("text")), 6).as("q"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
          Corpus.gopherKeep().as("gopher_keep"),
          Corpus.splitCol(col("doc_id")).as("split"))
        .orderBy("doc_id")
    }),

    // Pre-dedup canonical normalization (case/control/whitespace) with
    // the post-normalization content hash; map-only.
    "normalize_text" -> ((s, dir) =>
      Corpus.normalize(docs(s, dir)).orderBy("doc_id")),

    "repetition_stats" -> ((s, dir) =>
      Corpus.repetitionStats(docs(s, dir))
        .select(
          col("doc_id"),
          round(col("dup_trigram_frac"), 6).as("dup_trigram_frac"),
          round(col("top_token_frac"), 6).as("top_token_frac"))
        .orderBy("doc_id")),

    "quality_filter" -> ((s, dir) =>
      Corpus.gopherFilter(docs(s, dir)).orderBy("doc_id")),

    // Quality-curriculum training order: every doc ranked by the
    // committed classifier's logit (best first) with its cumulative
    // token count along that order — the "train on the cleanest X
    // tokens first / anneal on the top slice last" schedule. Rank and
    // prefix sum both run distributed (rowNumberDistributed +
    // cumSumDistributedLong — no single-partition window); ranking on
    // the 6dp-rounded logit is the quality_deciles determinism seam.
    "pack_curriculum" -> ((s, dir) => {
      val scored = Corpus.qualityModelScore(docs(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("logit"))
      val ranked = graft.plans.Scale.rowNumberDistributed(
        scored, Seq(col("logit").desc, col("doc_id").asc), "curriculum_pos")
      graft.plans.Scale
        .cumSumDistributedLong(ranked, "n_tokens", "curriculum_pos", "cum_tokens")
        .select(col("doc_id"), col("n_tokens"), col("logit"),
          col("curriculum_pos"), col("cum_tokens"))
        .orderBy("curriculum_pos")
    }),

    // Classifier-based quality scoring: the committed 69-weight
    // linear model (hashed token buckets + text-shape features,
    // trained in-repo distilling the rule gate) applied as one
    // map-only dot product — keep = logit >= 0, no transcendentals.
    // See [[graft.pipeline.Corpus.qualityModelScore]].
    "quality_model_score" -> ((s, dir) =>
      Corpus.qualityModelScore(docs(s, dir)).orderBy("doc_id")),

    // Exact global quality ranking on the distributed two-pass plan
    // (Scale.rowNumberDistributed — range partition + local
    // row_number + count offsets; NO single-partition window): the
    // FineWeb-Edu selection shape "sort the corpus by classifier
    // score, keep the top X%", emitted as rank / decile / top-20%
    // columns. Ranks are computed on the 6dp-rounded score (ties to
    // the lower doc_id) so both engines order identically.
    "quality_deciles" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"),
        round(TextOps.qualityScore(col("text")), 6).as("quality_score"))
      // total comes from the rank plan's own partition-count offsets
      // job — ONE scan of the corpus projection, no separate count()
      val (ranked, n) = graft.plans.Scale.rowNumberDistributedWithTotal(
          d, Seq(col("quality_score").desc, col("doc_id").asc), "rank")
      ranked
        .select(
          col("doc_id"), col("quality_score"), col("rank"),
          expr(s"((rank - 1) * 10) div $n").as("decile"),
          (col("rank") <= (n + 4) / 5).as("top_20pct"))
        .orderBy("doc_id")
    }),

    // Cross-signal calibration: per quality-score decile (0 = best),
    // what fraction passes the independent Gopher rule gate. The
    // sanity table read before trusting EITHER signal for selection —
    // a score whose top decile fails the rule gate (or whose bottom
    // decile passes it) is mis-calibrated. Rank on the distributed
    // two-pass plan, gates map-only, one decile agg.
    "quality_calibration" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"),
        round(TextOps.qualityScore(col("text")), 6).as("quality_score"),
        Corpus.gopherKeep().as("keep"))
      val (ranked, nTot) = graft.plans.Scale.rowNumberDistributedWithTotal(
        d, Seq(col("quality_score").desc, col("doc_id").asc), "rank")
      ranked
        .select(expr(s"((rank - 1) * 10) div $nTot").as("decile"), col("keep"))
        .groupBy("decile")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("keep"), 1)).as("n_gopher_pass"))
        .select(
          col("decile"), col("n_docs"), col("n_gopher_pass"),
          round(col("n_gopher_pass").cast("double") / col("n_docs"), 6)
            .as("pass_rate"))
        .orderBy("decile")
    }),

    "ngram_counts" -> ((s, dir) =>
      Corpus.ngramCounts(docs(s, dir)).orderBy(col("cnt").desc, col("ngram").asc)),

    // Benchmark set = every 50th document (stands in for an eval
    // suite); 4-gram overlap so incidental collisions are possible but
    // rare — the result mixes true dups with a few single-gram hits.
    "decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(d, d.where(col("doc_id") % 50 === 0))
        .orderBy("doc_id")
    }),

    // The attribution view of the same leak: per BENCH doc, how many
    // non-bench corpus docs share a 4-gram and how many of its grams
    // leak — the per-eval-item report. See
    // [[graft.pipeline.Dedup.contaminationAttribution]].
    "decontaminate_attribution" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationAttribution(
          d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0))
        .orderBy("bench_id")
    }),

    // Span-level decontamination: instead of dropping a contaminated
    // document (decontaminate flags it), EDIT the leaked 4-gram spans
    // out and rebuild — a long doc quoting one eval question keeps
    // everything but the quoted span. Bench window-key set broadcasts;
    // rebuild is the shared linear run-merge tail. See
    // [[graft.pipeline.Corpus.decontaminateSpans]].
    "decontaminate_spans" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.decontaminateSpans(
          d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0))
        .orderBy("doc_id")
    }),

    // Bloom-filter decontamination over the same benchmark staging:
    // the bitmap is built once from the bench grams and rides along as
    // a literal — the probe is a map-only pass with no join, the shape
    // that ships a contamination check to every executor at 100 TB.
    // Round 16: the bitmap is SIZED from the bench gram count
    // (Dedup.bloomBitmapSized — ~20 bits/gram, k=7, ~10‰ doc-level
    // over-drop) after its own fp instrument measured the fixed 8 KB
    // bitmap at 307‰ over-drop at sf0.1; the 8 KB row survives as
    // decontaminate_bloom_fp_8kb. False positives remain part of the
    // contract; the oracle re-derives m with the same integer
    // arithmetic and reproduces the exact bit set, false positives
    // included.
    "decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      val (bm, m) = Dedup.bloomBitmapSized(d.where(col("doc_id") % 50 === 0))
      Dedup.bloomDecontaminate(d, bm, mBits = m, kHash = Dedup.BloomKSized)
        .orderBy("doc_id")
    }),

    // PII scrub: emails -> IPv4 -> phone numbers, fixed order, each
    // count taken on the previous stage's output. The corpus is
    // synthetic word soup with no organic PII, so the query plants a
    // deterministic doc_id-derived footer (one email, one IP, one
    // phone per doc) — the oracle must then reproduce the exact
    // redaction byte-for-byte (redacted_md5) and the exact counts.
    "redact_pii" -> ((s, dir) =>
      Corpus.redactPii(docs(s, dir).withColumn(
          "text",
          concat(
            col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or +1 555-01"),
            (col("doc_id") % 100).cast("string"),
            lit(" node 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), (col("doc_id") % 100).cast("string"))))
        .orderBy("doc_id")),

    // Fuzzy decontamination over the SAME benchmark staging: LSH band
    // collision against any benchmark signature flags the document,
    // with the signature-estimated Jaccard of the closest benchmark
    // match as evidence. Both sides read the session-staged signature
    // frame — text is never re-read (see Dedup.fuzzyContamination).
    // The price of the Bloom decontaminator, measured: doc-level
    // confusion of the Bloom verdict against the exact broadcast-semi
    // verdict on the SAME 4-gram definition — fp_per_mille is the
    // over-drop rate a curation run pays for the O(1)-memory probe,
    // and exact_only (Bloom false negatives) must read 0 by
    // construction or the bitmap is broken. Grades the SIZED bitmap
    // (the production gate since round 16); the retired fixed-8KB
    // bitmap keeps its own comparison row below. The zero-guard on
    // fp_per_mille covers the every-doc-contaminated corner where the
    // denominator is empty (Spark div would NULL while DuckDB //
    // raises — the guard makes both emit NULL).
    "decontaminate_bloom_fp" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.where(col("doc_id") % 50 === 0)
      val (bm, m) = Dedup.bloomBitmapSized(bench)
      bloomConfusion(
        Dedup.bloomDecontaminate(d, bm, mBits = m, kHash = Dedup.BloomKSized),
        Dedup.decontaminate(d, bench))
    }),

    // The RETIRED fixed-size bitmap's confusion row, kept so the sized
    // gate's gain is measured, not asserted: 8 KB at 2^16 bits
    // saturates at bench-suite scale (307‰ over-drop at sf0.1) — read
    // this next to decontaminate_bloom_fp's ~10‰ for the same probe
    // cost story at 1.5x the memory.
    "decontaminate_bloom_fp_8kb" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.where(col("doc_id") % 50 === 0)
      bloomConfusion(
        Dedup.bloomDecontaminate(d, Dedup.bloomBitmap(bench)),
        Dedup.decontaminate(d, bench))
    }),

    "decontaminate_fuzzy" -> ((s, dir) => {
      val d = docs(s, dir)
      val sigs = DedupChain.minhashSigs(s, dir, d)
      Dedup.fuzzyContamination(d, sigs, sigs.where(col("doc_id") % 50 === 0))
        .select(
          col("doc_id"), col("n_bench_candidates"),
          round(col("max_est_jaccard"), 6).as("max_est_jaccard"),
          col("contaminated"))
        .orderBy("doc_id")
    }),

    // The one-row dedup FUNNEL dashboard an operator reads after a
    // corpus pass: how much each dedup tier would remove — exact doc
    // copies, near-dup cluster non-canonicals (session-staged chain),
    // repeated 32-token paragraph units, exact-substring token
    // removals, and the winnow candidate graph (pairs + docs touched
    // by the df-capped shared-fingerprint generator). Every input is
    // an already-declared operator; the report is five 1-row
    // aggregates cross-joined (broadcast by construction — no
    // corpus-side join).
    "corpus_dedup_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val ex = d.agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dup"))
      val nd = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .agg(count(lit(1)).as("n_neardup_noncanonical"))
      val units = Corpus.chunk(d, chunkSize = 32, stride = 32)
        .select(col("doc_id"), col("chunk_id").as("para_idx"),
          col("chunk_text").as("para_text"))
      val pa = Corpus.paragraphDedupFilter(units)
        .agg(
          sum("n_paras").as("n_paragraph_units"),
          sum("n_dropped").as("n_paragraph_dropped"))
      val sb = Corpus.substringDedupFilter(d)
        .agg(sum("n_removed").as("n_substring_tokens_removed"))
      val wn = DedupChain.winnowPairs(s, dir, d)
        .select(explode(array(col("doc_a"), col("doc_b"))).as("wd"))
        .agg(
          (count(lit(1)) / 2).cast("bigint").as("n_winnow_pairs"),
          countDistinct(col("wd")).as("n_winnow_docs"))
      // the near-SUBSET tier: candidate pairs where either direction's
      // containment reaches 0.8 — absorption the jaccard tier misses.
      // r21: rides the staged candidate-pair projection instead of
      // re-running the band-explode self-join + distinct per query
      // (the dedup_containment stance).
      val ct = Dedup.containmentPairs(
          DedupChain.candidatePairs(s, dir, d), d)
        .where(greatest(col("containment_a"), col("containment_b")) >= 0.8)
        .agg(count(lit(1)).cast("bigint").as("n_containment_pairs"))
      ex.crossJoin(nd).crossJoin(pa).crossJoin(sb).crossJoin(wn).crossJoin(ct)
    }),

    // Token-denominated end-to-end YIELD funnel — the one artifact a
    // pipeline owner publishes: docs AND tokens remaining after each
    // SEQUENTIAL stage (exact dedup → near-dup → quality → language →
    // badwords → decontamination) with per-stage drop accounting. Where
    // corpus_dedup_report sizes each dedup tier independently and
    // gate_attribution adjudicates gate overlap, THIS is the ordered
    // composition — the number that becomes the training-token budget.
    // Stage flags reuse the declared gate spellings in ONE corpus scan
    // (plus the staged cluster labels); the funnel is one aggregate
    // unpivoted to six rows.
    "corpus_yield_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val dupIds = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical")).select(col("doc_id").as("dup_id"))
      val decon = Dedup.decontaminate(d, d.where(col("doc_id") % 50 === 0))
        .select(col("doc_id"), col("contaminated"))
      val flags = d.select(
          col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
          (TextOps.qualityScore(col("text")) >= 0.5).as("q_ok"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          (TextOps.badwordsRatioMicro(col("text")) <= 50000L).as("bw_ok"))
        .join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .join(decon, Seq("doc_id"))
      val c1 = col("is_exact_canonical")
      val c2 = c1 && col("dup_id").isNull
      val c3 = c2 && col("q_ok")
      val c4 = c3 && col("lang_ok")
      val c5 = c4 && col("bw_ok")
      // the final stage removes eval items AND their n-gram leaks —
      // bench docs (every 50th) are contaminated by construction
      val c6 = c5 && !col("contaminated")
      val aggs = Seq(c1, c2, c3, c4, c5, c6).zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(c, 1L).otherwise(0L)).as(s"d${i + 1}"),
          sum(when(c, col("n_tokens")).otherwise(0L)).as(s"t${i + 1}"))
      }
      val a = flags.agg(
        count(lit(1)).as("d0"), (sum(col("n_tokens")).as("t0") +: aggs): _*)
      val names = Seq("raw", "exact_dedup", "neardup_dedup", "quality",
        "language", "badwords", "decontaminate")
      val stageRows = names.zipWithIndex.map { case (nm, i) =>
        val dd = if (i == 0) lit(0L) else col(s"d${i - 1}") - col(s"d$i")
        val td = if (i == 0) lit(0L) else col(s"t${i - 1}") - col(s"t$i")
        struct(
          lit(i).as("stage"), lit(nm).as("gate"),
          col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"),
          dd.as("n_docs_dropped"), td.as("n_tokens_dropped"))
      }
      a.select(explode(array(stageRows: _*)).as("r")).select(col("r.*"))
        .orderBy("stage")
    }),

    // Embedding hygiene audit BEFORE any ANN/dedup pass trusts the
    // table: per label — counts, zero-norm vectors (cosine is
    // undefined on them: they surface as NaN pair scores downstream),
    // dim drift (min=max=64 or the ingest broke), and norm spread.
    // The mean is an exact integer-micro sum (the doc_logprob
    // convention) — a plain double sum would drift with partitioning.
    // One map-side-combinable shuffle on label.
    "embedding_stats" -> ((s, dir) => {
      val nrm = sqrt(graft.functions.dotF(col("embedding"), col("embedding")))
      embs(s, dir).select(
          col("label"),
          nrm.as("n"),
          round(nrm * 1e6, 0).cast("bigint").as("nm"),
          size(col("embedding")).as("dims"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_vecs"),
          count(when(col("nm") === 0L, 1)).as("n_zero_norm"),
          min(col("dims")).as("min_dims"),
          max(col("dims")).as("max_dims"),
          round(min(col("n")), 6).as("min_norm"),
          round(max(col("n")), 6).as("max_norm"),
          sum(col("nm")).as("_s"))
        .select(
          col("label"), col("n_vecs"), col("n_zero_norm"),
          col("min_dims"), col("max_dims"), col("min_norm"), col("max_norm"),
          round(col("_s").cast("double") / (col("n_vecs") * 1e6), 6)
            .as("mean_norm"))
        .orderBy("label")
    }),

    // Embedding-space decontamination: per benchmark vector (every
    // 50th, the decontaminate convention carried into vec_id space),
    // leak count at cosine >= 0.4 plus the nearest corpus vector and
    // its cosine — catches PARAPHRASED eval leakage the n-gram passes
    // above cannot see. Bench side broadcast, one map-only corpus
    // pass. See [[graft.pipeline.Similarity.semanticContamination]].
    "decontaminate_semantic" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.semanticContamination(
          e.where(col("vec_id") % 50 =!= 0), e.where(col("vec_id") % 50 === 0))
        .orderBy("bench_id")
    }),

    // The cell-bounded scale path for semantic decon: corpus vectors
    // sit in their nearest trained IVF cell, bench vectors probe
    // their 2 nearest, cosine verified only within shared cells —
    // approximate by design (the IVF recall trade), the brute query
    // above stays the correctness baseline. Session-staged centroids.
    "decontaminate_semantic_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.semanticContaminationIvf(
          e.where(col("vec_id") % 50 =!= 0), e.where(col("vec_id") % 50 === 0),
          graft.pipeline.IvfChain.centroids(s, dir, e))
        .orderBy("bench_id")
    }),

    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir)).orderBy("content_md5")),

    "dedup_minhash" -> ((s, dir) =>
      DedupChain.minhashSigs(s, dir, docs(s, dir)).orderBy("doc_id")),

    // Signature-estimated Jaccard over the SAME candidate pairs — the
    // verify step a 100 TB chain actually runs (joins the staged
    // O(9-int) signature frame, never re-reads text). The exact
    // dedup_jaccard twin quantifies the estimator's error on the same
    // pair set.
    "dedup_minhash_est" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashEstimate(
          DedupChain.candidatePairs(s, dir, d),
          DedupChain.minhashSigs(s, dir, d))
        .select(
          col("doc_a"), col("doc_b"), col("n_agree"),
          round(col("est_jaccard"), 6).as("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // b-bit minwise estimate (Li & König 2010) next to the full-width
    // one: the 64/b-fold sketch compression priced directly against
    // the 8×64-bit estimate on the same candidates — the bias
    // correction (subtract the 2^-b accidental-collision floor) is
    // what makes the compressed sketch usable. Same staged sigs, same
    // candidate-bounded join. See [[Dedup.minhashEstimateBbit]].
    "dedup_minhash_bbit" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashEstimateBbit(
          DedupChain.candidatePairs(s, dir, d),
          DedupChain.minhashSigs(s, dir, d))
        .select(
          col("doc_a"), col("doc_b"), col("n_agree_bbit"),
          round(col("est_jaccard_bbit"), 6).as("est_jaccard_bbit"))
        .orderBy("doc_a", "doc_b")
    }),

    // The five LSH-chain queries (pairs / jaccard / editdist /
    // clusters / corpus_filter) consume stages of one pipeline; the
    // shared stages are materialized once per (session, dir) by
    // DedupChain instead of re-derived from raw text per query.
    "dedup_lsh_pairs" -> ((s, dir) =>
      DedupChain.candidatePairs(s, dir, docs(s, dir)).orderBy("doc_a", "doc_b")),

    "dedup_jaccard" -> ((s, dir) =>
      DedupChain.jaccardPairs(s, dir, docs(s, dir))
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    // Asymmetric CONTAINMENT scores over the same LSH candidates
    // (Broder 1997): near-SUBSET detection — a short doc absorbed
    // into a long one scores ~1.0 on containment_a where symmetric
    // Jaccard under-scores it. Joins only candidate pairs; reuses the
    // session-staged signature chain. See [[Dedup.containmentPairs]].
    "dedup_containment" -> ((s, dir) => {
      val d = docs(s, dir)
      // r21: ride the session-staged candidate set (the jaccard
      // stage's projection — inner joins against the all-docs shingle
      // frame preserve every candidate pair, and dedup_lsh_pairs
      // already oracle-proves the staged set equals the from-scratch
      // LSH set) instead of re-running the band-explode self-join +
      // distinct per query.
      Dedup.containmentPairs(DedupChain.candidatePairs(s, dir, d), d)
        .select(
          col("doc_a"), col("doc_b"), col("n_common"),
          round(col("containment_a"), 6).as("containment_a"),
          round(col("containment_b"), 6).as("containment_b"))
        .orderBy("doc_a", "doc_b")
    }),

    // Fuzzy verification of the SAME LSH candidates by plain edit
    // distance (both engines ship classic Levenshtein; integer result,
    // exact cross-engine) — the alternative verifier to jaccard when
    // near-dups are character-level (OCR noise, template fills) rather
    // than token-level. Joins only the candidate pairs, so the O(len²)
    // DP runs on O(candidates) rows, never all pairs; reuses the
    // per-session staged chain.
    "dedup_editdist" -> ((s, dir) => {
      val d = docs(s, dir)
      val texts = d.select(col("doc_id"), col("text"))
      DedupChain.candidatePairs(s, dir, d)
        .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
        .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
        .select(
          col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb")).cast("bigint").as("edit_distance"),
          round(
            levenshtein(col("ta"), col("tb")).cast("double") /
              greatest(length(col("ta")), length(col("tb"))), 6).as("edit_ratio"))
        .orderBy("doc_a", "doc_b")
    }),

    // The three simhash queries fold the SAME md5 token hashes and the
    // same majority votes — they derive from the session-staged
    // signature frames (DedupChain.simhashes32/64, built over the
    // staged token-hash frame) so the corpus is hashed once and each
    // vote fold runs once, not per query.
    // Delta-ingest candidates: docs with doc_id % 10 == 0 play the
    // newly-arrived delta, the rest the snapshot. Old×old pairs are
    // never generated (the daily-run cost model); the oracle asserts
    // equality with the full pair set filtered to delta-touching
    // pairs. Both sides split off the session-staged signature frame.
    "dedup_incremental" -> ((s, dir) => {
      val sigs = DedupChain.minhashSigs(s, dir, docs(s, dir))
      val isNew = col("doc_id") % 10 === 0
      Dedup.incrementalCandidatePairs(sigs.where(!isNew), sigs.where(isNew))
        .orderBy("doc_a", "doc_b")
    }),

    // Incremental cluster-label MAINTENANCE, one step past
    // dedup_incremental's candidates: the base snapshot's labels (the
    // state a production dedup store holds) merge with the delta's
    // verified edges via star-edge CC — O(base docs + delta edges)
    // instead of re-running CC over the base pair graph. The oracle
    // is the FULL-REBUILD SQL (identical to dedup_clusters): the
    // declared contract is that incremental maintenance and a from-
    // scratch relabel can never disagree. See
    // [[Dedup.clustersIncremental]].
    "dedup_clusters_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val isNew = col("doc_id") % 10 === 0
      val sigs = DedupChain.minhashSigs(s, dir, d)
      // r21: the delta verify prunes the shingle-set frame to the
      // candidate-pair members (guide §3.2) — the O(delta) candidate
      // set no longer pays a full-corpus shingle + persist pass.
      val deltaEdges = Dedup.jaccardPairsPruned(
        Dedup.incrementalCandidatePairs(sigs.where(!isNew), sigs.where(isNew))
          .select(col("doc_a"), col("doc_b")), d)
        .where(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      Dedup.clustersIncremental(
        DedupChain.baseClusterLabels(s, dir, d), deltaEdges).orderBy("doc_id")
    }),

    "dedup_simhash" -> ((s, dir) =>
      DedupChain.simhashes32(s, dir, docs(s, dir)).orderBy("doc_id")),

    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairsFrom(DedupChain.simhashes32(s, dir, docs(s, dir)))
        .orderBy("doc_a", "doc_b")),

    "dedup_simhash64_pairs" -> ((s, dir) =>
      Dedup.simhashPairs64From(DedupChain.simhashes64(s, dir, docs(s, dir)))
        .orderBy("doc_a", "doc_b")),

    // LSH pairs -> jaccard-verified edges -> connected components ->
    // one canonical doc per cluster: the full distributed dedup chain.
    "dedup_clusters" -> ((s, dir) =>
      DedupChain.clusterLabels(s, dir, docs(s, dir)).orderBy("doc_id")),

    // The retention decision that ends the chain: one keeper per
    // near-dup cluster, longest doc wins (ties -> lowest doc_id).
    "dedup_representatives" -> ((s, dir) =>
      Dedup.representatives(
        DedupChain.clusterLabels(s, dir, docs(s, dir)), docs(s, dir))
        .orderBy("cluster_id")),

    // FineWeb-style sub-document dedup: near-identical paragraphs
    // reused ACROSS documents (boilerplate/templates) that
    // whole-document signatures dilute away. The synthetic corpus has
    // no paragraph boundaries (single-space text; Corpus.paragraphs
    // covers real corpora), so units are non-overlapping 32-token
    // blocks (chunk at stride = chunkSize) with unit id =
    // doc_id * 1000 + block idx; the unit frame then rides the SAME
    // MinHash/LSH + jaccard chain as the document-level queries.
    // Within-document pairs are excluded — internal repetition is
    // repetition_stats' signal, cross-document reuse is dedup's.
    // Exact paragraph dedup with document REBUILD, over the same
    // 32-token units as dedup_paragraphs: a unit repeated anywhere in
    // the corpus keeps only its first (doc_id, para_idx) occurrence
    // and later copies are edited out of their documents' text.
    "paragraph_dedup_filter" -> ((s, dir) => {
      val units = Corpus.chunk(docs(s, dir), chunkSize = 32, stride = 32)
        .select(
          col("doc_id"), col("chunk_id").as("para_idx"),
          col("chunk_text").as("para_text"))
      Corpus.paragraphDedupFilter(units).orderBy("doc_id")
    }),

    // The FULL FineWeb boilerplate pass: exact + near-dup paragraph
    // removal with document rebuild. Exact copies and >=0.5-Jaccard
    // near-dups of the same unit collapse into one cluster (exact star
    // edges UNION LSH-verified fuzzy edges -> connected components);
    // only the cluster's first (doc_id, para_idx) occurrence survives
    // the rebuild. Same 32-token units as dedup_paragraphs.
    "paragraph_neardedup_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      val units = Corpus.chunk(d, chunkSize = 32, stride = 32)
        .select(
          col("doc_id"), col("chunk_id").as("para_idx"),
          col("chunk_text").as("para_text"))
      // r21: the fuzzy layer rides the session-staged unit pair frame
      // (shared with dedup_paragraphs) instead of re-running the
      // unit-level MinHash/LSH + verify chain per query.
      Corpus.paragraphNearDedupFilter(units,
          fuzzyPairs = Some(DedupChain.paraPairs(s, dir,
            Corpus.chunk(d, chunkSize = 32, stride = 32).select(
              (col("doc_id") * 1000 + col("chunk_id")).as("doc_id"),
              col("chunk_text").as("text")))))
        .orderBy("doc_id")
    }),

    // WITHIN-document repeated-unit removal (CCNet-style line dedup):
    // a 32-token unit repeated inside the SAME document keeps its
    // first occurrence there; copies in other documents are untouched.
    // The pre-clean run BEFORE the corpus-wide passes — see
    // [[graft.pipeline.Corpus.intraDocDedupFilter]] for why the
    // doc-leading window is the right plan here and wrong corpus-wide.
    "dedup_intradoc" -> ((s, dir) => {
      val units = Corpus.chunk(docs(s, dir), chunkSize = 32, stride = 32)
        .select(
          col("doc_id"), col("chunk_id").as("para_idx"),
          col("chunk_text").as("para_text"))
      Corpus.intraDocDedupFilter(units).orderBy("doc_id")
    }),

    // Lee et al. 2022 exact SUBSTRING dedup with rebuild: repeated
    // >=8-token windows keep only their globally first (doc_id, pos)
    // occurrence; every later occurrence's token span is removed and
    // the doc re-joined (removal set = distinct position union, so
    // overlapping repeats need no interval merge). The granularity
    // complement to the paragraph passes above — catches repeats that
    // CROSS the 32-token unit boundaries they can't see.
    "dedup_substrings" -> ((s, dir) =>
      Corpus.substringDedupFilter(docs(s, dir)).orderBy("doc_id")),

    // Delta-ingest exact-substring dedup: docs with doc_id % 10 == 0
    // play the newly-arrived delta (the dedup_incremental convention),
    // the rest the snapshot — which enters ONLY as its first-occurrence
    // window-key state table, never re-hashed. The oracle asserts
    // equality with the full-corpus recompute filtered to delta docs.
    "dedup_substrings_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val isNew = col("doc_id") % 10 === 0
      Corpus.substringDedupFilterIncremental(
          Corpus.substringFirstOccurrences(d.where(!isNew)), d.where(isNew))
        .orderBy("doc_id")
    }),

    // The incremental pass SERVED FROM DISK: the snapshot's
    // first-occurrence state is written once per (JVM, dir) and every
    // later consumer — including bench passes in fresh sessions —
    // scans the parquet state table instead of re-hashing the
    // snapshot. Bit-exact round-trip is load-bearing: the oracle is
    // the full recompute, so any save/load drift goes red. See
    // [[graft.pipeline.DedupStateStore]].
    "dedup_substrings_incremental_loaded" -> ((s, dir) => {
      val d = docs(s, dir)
      val isNew = col("doc_id") % 10 === 0
      Corpus.substringDedupFilterIncremental(
          graft.pipeline.DedupStateStore.substringFirstsServed(
            s, dir, d.where(!isNew)),
          d.where(isNew))
        .orderBy("doc_id")
    }),

    // WITHIN-document substring dedup (self-repetition cleanup —
    // looping generated text, chorus lines): later occurrences of an
    // 8-token window repeated in the SAME doc are edited out;
    // cross-doc repeats untouched. See
    // [[graft.pipeline.Corpus.substringDedupFilterIntraDoc]].
    "dedup_substrings_intradoc" -> ((s, dir) =>
      Corpus.substringDedupFilterIntraDoc(docs(s, dir)).orderBy("doc_id")),

    // The instrument read BEFORE dedup_substrings: per-doc window /
    // duplicated-window counts and the longest duplicated run in
    // tokens (consecutive dup positions = gaps-and-islands on p) —
    // says whether repeats are short phrases or whole passages, i.e.
    // whether the fixed-n granularity trade is safe for this corpus.
    "substring_stats" -> ((s, dir) =>
      Corpus.substringStats(docs(s, dir)).orderBy("doc_id")),

    "dedup_paragraphs" -> ((s, dir) => {
      val units = Corpus.chunk(docs(s, dir), chunkSize = 32, stride = 32)
        .select(
          (col("doc_id") * 1000 + col("chunk_id")).as("doc_id"),
          col("chunk_text").as("text"))
      // r21: rides the session-staged unit pair frame (shared with
      // paragraph_neardedup_filter's fuzzy layer).
      DedupChain.paraPairs(s, dir, units)
        .where(expr("doc_a div 1000 <> doc_b div 1000"))
        .select(
          expr("doc_a div 1000").as("doc_a"),
          (col("doc_a") % 1000).as("para_a"),
          expr("doc_b div 1000").as("doc_b"),
          (col("doc_b") % 1000).as("para_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "para_a", "doc_b", "para_b")
    }),

    // The end-to-end curation decision a training-data pipeline makes
    // per document: exact-dup canonical AND near-dup-cluster canonical
    // AND quality gate AND language agreement. Every input is one of
    // the already-declared operators; composing them keeps the whole
    // chain map/shuffle-parallel (skew-safe groupBy+min join-back for
    // exact canonicals — Corpus.withExactCanonical inside the staged
    // DedupChain.exactCanonical frame — the CC labels joined back for
    // near-dup canonicals, pure projections for the two content gates).
    "corpus_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      val dupIds = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .select(col("doc_id").as("dup_id"))
      // r21: the exact-canonical flag rides the session-staged frame
      // (DedupChain.exactCanonical, shared by seven gate queries)
      // instead of a per-query md5 + groupBy + join-back.
      val base = d.select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("q"),
        (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"))
      base.join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .select(
          col("doc_id"),
          col("is_exact_canonical"),
          col("dup_id").isNull.as("is_neardup_canonical"),
          (col("q") >= 0.5).as("quality_ok"),
          col("lang_ok"),
          (col("is_exact_canonical") && col("dup_id").isNull &&
            col("q") >= 0.5 && col("lang_ok")).as("kept"))
        .orderBy("doc_id")
    }),

    // The END of the curation pipeline: every gate this library
    // declares separately (exact-dup canonical, near-dup-cluster
    // canonical, score+language agreement, the Gopher rule gate)
    // conjoined, and the surviving corpus handed to the reproducible
    // train/valid/test split with its token count — the table a
    // training run actually reads. Composes the session-staged chain
    // (cluster labels) with map-only gates, so the marginal cost over
    // corpus_filter is one broadcast-sized join and projections.
    // ONE corpus scan computes every text-derived gate inline
    // (content md5, quality, language agreement, Gopher keep via the
    // shared Corpus.gopherKeep column, token count) — the exact-dup
    // canonical agg+join-back and the tiny near-dup-id anti-join are
    // the only shuffles, and the split label is a pure column function. The
    // previous shape joined gopherFilter's frame back to the corpus
    // AND evaluated the kept subtree twice through a split join —
    // ~2x the corpus work for identical output.
    "corpus_prepare" -> ((s, dir) => {
      val d = docs(s, dir)
      val dupIds = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .select(col("doc_id").as("dup_id"))
      d.select(
          col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
          Corpus.gopherKeep().as("keep"))
        .join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .where(col("is_exact_canonical") && col("dup_id").isNull &&
          col("q") >= 0.5 && col("lang_ok") && col("keep"))
        .select(
          col("doc_id"),
          Corpus.splitCol(col("doc_id")).as("split"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),

    // corpus_prepare with the WINNOW near-dup gate: the LSH chain's
    // whole-document-similarity non-canonicals are replaced by the
    // winnow candidate graph's (shared-long-run) non-canonicals —
    // everything else identical. The two prepares bracket the dedup
    // design space: LSH catches globally-similar documents, winnow
    // catches verbatim shared runs (clone families, boilerplate
    // chains) the per-document Jaccard can dilute away; comparing
    // their kept sets is how a pipeline owner picks (or stacks) the
    // tiers. Same scale shape as corpus_prepare — the winnow graph is
    // banded by fingerprint with the df<=16 stop-list cap.
    "corpus_prepare_winnow" -> ((s, dir) => {
      val d = docs(s, dir)
      // r21: rides the session-staged winnow CC labels (shared with
      // dedup_winnow_clusters) instead of re-running label propagation.
      val dupIds = DedupChain.winnowClusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .select(col("doc_id").as("dup_id"))
      d.select(
          col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
          Corpus.gopherKeep().as("keep"))
        .join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .where(col("is_exact_canonical") && col("dup_id").isNull &&
          col("q") >= 0.5 && col("lang_ok") && col("keep"))
        .select(
          col("doc_id"),
          Corpus.splitCol(col("doc_id")).as("split"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),

    // Gate attribution: for EVERY curation gate this library declares
    // (exact-dup canonical, near-dup canonical, quality score,
    // language agreement, Gopher rules, learned classifier, domain
    // blocklist) — how many docs fail it, and how many fail ONLY it
    // (the marginal data cost of keeping that gate). The one-row
    // report a pipeline owner reads before relaxing a gate. One
    // corpus scan computes every text gate inline; the exact/near-dup
    // flags ride the same agg+join-back and staged-chain frames as
    // corpus_filter; the final rollup is a single partial-combining
    // aggregate.
    "gate_attribution" -> ((s, dir) => {
      val d = docs(s, dir)
      val dupIds = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .select(col("doc_id").as("dup_id"))
      val flags = d.select(
          col("doc_id"),
          (TextOps.qualityScore(col("text")) >= 0.5).as("q_ok"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          Corpus.gopherKeep().as("gopher_ok"),
          (Corpus.qualityModelLogit() >= 0).as("model_ok"),
          Corpus.domainGate().as("domain_ok"))
        .join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .select(
          col("is_exact_canonical").as("exact_ok"),
          col("dup_id").isNull.as("neardup_ok"),
          col("q_ok"), col("lang_ok"), col("gopher_ok"),
          col("model_ok"), col("domain_ok"))
      val gates = Seq("exact", "neardup", "q", "lang", "gopher", "model", "domain")
        .zip(Seq("exact_ok", "neardup_ok", "q_ok", "lang_ok", "gopher_ok",
          "model_ok", "domain_ok"))
      val failCols = gates.map { case (g, c) =>
        sum(when(!col(c), 1L).otherwise(0L)).as(s"fail_$g") }
      val soleCols = gates.map { case (g, c) =>
        val others = gates.filter(_._2 != c).map(o => col(o._2)).reduce(_ && _)
        sum(when(!col(c) && others, 1L).otherwise(0L)).as(s"sole_$g") }
      val keptCol = sum(
        when(gates.map(o => col(o._2)).reduce(_ && _), 1L).otherwise(0L))
        .as("n_kept")
      flags.agg(count(lit(1)).as("n_docs"), (failCols ++ soleCols :+ keptCol): _*)
    }),

    // corpus_prepare with the LEARNED gate: the committed classifier's
    // logit >= 0 replaces the Gopher rule conjunction (everything else
    // identical) — the production shape once a cheap distilled
    // classifier takes over from hand rules (DCLM/FineWeb-Edu). Still
    // ONE corpus scan: the logit is a pure column
    // (Corpus.qualityModelLogit), so the swap costs no extra pass.
    "corpus_prepare_model" -> ((s, dir) => {
      val d = docs(s, dir)
      val dupIds = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .select(col("doc_id").as("dup_id"))
      d.select(
          col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
          (Corpus.qualityModelLogit() >= 0).as("keep"))
        .join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .where(col("is_exact_canonical") && col("dup_id").isNull &&
          col("q") >= 0.5 && col("lang_ok") && col("keep"))
        .select(
          col("doc_id"),
          Corpus.splitCol(col("doc_id")).as("split"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),

    // URL canonicalization before URL-keyed dedup (the CC-index
    // convention): lowercase scheme/host, strip www. and default
    // ports (non-default KEPT), drop tracking params + fragment, sort
    // surviving params, empty path -> '/'. Map-only; url_key is the
    // md5 a URL-keyed merge groups on. See
    // [[graft.pipeline.Corpus.canonicalUrl]].
    "url_normalize" -> ((s, dir) =>
      Corpus.urlNormalize(docs(s, dir)).orderBy("doc_id")),

    // Per-registered-domain curation stats over the synthetic url
    // fixture (host extraction -> last-two-label domain -> one
    // map-side-combinable shuffle). See [[graft.pipeline.Corpus
    // .domainStats]]; every column is integer-exact or a ratio of
    // exact integers.
    "domain_stats" -> ((s, dir) =>
      Corpus.domainStats(docs(s, dir)).orderBy("domain")),

    // Empirical-Bayes shrunk per-domain quality (prior strength 20):
    // small-n domains pulled toward the global mean, so the ranking
    // trusts evidence in proportion to volume. Integer-micro sums —
    // engine-exact. See [[Corpus.domainQualityShrunk]].
    "domain_quality_shrunk" -> ((s, dir) =>
      Corpus.domainQualityShrunk(docs(s, dir)).orderBy("domain")),

    // CCNet/RefinedWeb head/middle/tail bucketing by cumulative token
    // share, on the distributed prefix plan (no single-partition
    // window); tier cuts are exact integer comparisons. See
    // [[graft.pipeline.Corpus.domainTiers]].
    "domain_tiers" -> ((s, dir) =>
      Corpus.domainTiers(docs(s, dir)).orderBy("domain")),

    // corpus_prepare with the RefinedWeb-style domain blocklist gate
    // composed in: one more map-only predicate (registered domain not
    // in the literal blocklist) inside the SAME single corpus scan —
    // the gate costs no extra pass and no shuffle.
    "corpus_prepare_gated" -> ((s, dir) => {
      val d = docs(s, dir)
      val dupIds = DedupChain.clusterLabels(s, dir, d)
        .where(!col("is_canonical"))
        .select(col("doc_id").as("dup_id"))
      d.select(
          col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"),
          (TextOps.langPred(col("text")) === col("lang")).as("lang_ok"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
          Corpus.gopherKeep().as("keep"),
          Corpus.domainGate().as("domain_ok"))
        .join(DedupChain.exactCanonical(s, dir, d), Seq("doc_id"))
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .where(col("is_exact_canonical") && col("dup_id").isNull &&
          col("q") >= 0.5 && col("lang_ok") && col("keep") && col("domain_ok"))
        .select(
          col("doc_id"),
          Corpus.splitCol(col("doc_id")).as("split"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),

    "embedding_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(embs(s, dir), 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")),

    // τ-calibration curve for semantic dedup: how many pairs each
    // candidate cosine threshold would merge — the instrument read
    // BEFORE committing a near-dup threshold (pick τ where the curve's
    // knee sits, not a folklore constant). One exact pair pass at the
    // loosest τ (the same tiled plan as embedding_neardup — the
    // sweep's marginal cost over it is a 7-row broadcast
    // nested-loop join + a 7-group agg); zero-pair thresholds still
    // emit (left join) so the curve has no holes.
    // τ-calibration for SEMANTIC dedup off the staged kNN graph: per
    // cosine threshold, qualifying graph edges and distinct touched
    // docs — the sweep an operator reads before picking the
    // embedding_neardup_graph cut, amortized over ONE staged
    // NN-descent build (edge count is n·k-bounded, so the sweep costs
    // two tiny aggs regardless of corpus size — the scale-sound
    // sibling of neardup_threshold_sweep's exact-pair grid).
    "semantic_threshold_sweep" -> ((s, dir) => {
      import s.implicits._
      val pairs = KnnChain.graph(s, dir, embs(s, dir))
        .select(
          least(col("vec_id"), col("neighbor_id")).as("a"),
          greatest(col("vec_id"), col("neighbor_id")).as("b"),
          col("cosine"))
        .distinct()
      val ts = broadcast(Seq(0.3, 0.4, 0.5, 0.6, 0.7).toDF("threshold"))
      val np = ts.join(pairs, col("cosine") >= col("threshold"), "left")
        .groupBy("threshold").agg(count(col("cosine")).as("n_pairs"))
      val eps = pairs.select(explode(array(col("a"), col("b"))).as("d"), col("cosine"))
      val nd = ts.join(eps, col("cosine") >= col("threshold"), "left")
        .groupBy("threshold").agg(countDistinct(col("d")).as("n_docs"))
      np.join(nd, Seq("threshold")).orderBy("threshold")
    }),

    "neardup_threshold_sweep" -> ((s, dir) => {
      import s.implicits._
      val pairs = Similarity.nearDupPairs(embs(s, dir), 0.3)
        .select(col("cosine"))
      val ts = broadcast(
        Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9).toDF("threshold"))
      ts.join(pairs, col("cosine") >= col("threshold"), "left")
        .groupBy("threshold")
        .agg(count(col("cosine")).as("n_pairs"))
        .orderBy("threshold")
    }),

    // The approximate (banded multi-table LSH) near-dup path, declared
    // separately so the scale plan is itself oracle-gated: the md5
    // planes make it fully deterministic, and the DuckDB mirror
    // computes the identical buckets, candidates and cosines. Recall
    // vs the exact query is a measured property of the corpus (19/59
    // qualifying pairs at sf0.01's τ=0.4 — see Similarity.nearDupPairs
    // Scaladoc for why no sound sub-quadratic plan exists down there).
    "embedding_neardup_lsh" -> ((s, dir) =>
      Similarity.nearDupPairsLsh(embs(s, dir), 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")),

    // The SCALE-sound half of the τ-calibration story: the sweep over
    // the banded-LSH candidate set, valid in the true near-dup regime
    // (τ >= ~0.7 where multi-table recall ≈ 1 — the nearDupPairsLsh
    // scaladoc's analysis) and sub-quadratic at any corpus size,
    // where neardup_threshold_sweep's exact tiled pass is the
    // small-τ/ground-truth instrument. Same 5-row broadcast sweep
    // tail.
    "neardup_threshold_sweep_lsh" -> ((s, dir) => {
      import s.implicits._
      val pairs = Similarity.nearDupPairsLsh(embs(s, dir), 0.5)
        .select(col("cosine"))
      val ts = broadcast(Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("threshold"))
      ts.join(pairs, col("cosine") >= col("threshold"), "left")
        .groupBy("threshold")
        .agg(count(col("cosine")).as("n_pairs"))
        .orderBy("threshold")
    }),

    // SemDeDup: cosine verification only within trained IVF cells
    // (nCells=2 recall knob), on the session-staged centroid table.
    // The semantic-dedup plan that survives 100 TB — quadratic work
    // drops to per-cell tiles.
    "embedding_neardup_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.semanticDupPairs(
          e, graft.pipeline.IvfChain.centroids(s, dir, e), 0.4, nCells = 2)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // Margin-based bitext mining (Artetxe & Schwenk ratio margin —
    // the CCMatrix/NLLB translation-pair miner): label parity stands
    // in for two language shards, candidates are cell-bounded on the
    // session-staged trained centroids (the SemDeDup frontier made
    // bipartite), each candidate cosine is scored against both
    // endpoints' candidate-top-4 neighborhood averages, and
    // mutual-best pairs at margin >= 1.0 are the mined bitext. See
    // [[graft.pipeline.Similarity.bitextMine]].
    "bitext_mine" -> ((s, dir) => {
      // r21: mine from the session-staged candidate frontier (built
      // once; ann_recall_bitext audits the same frame) — the mine IS
      // margins ∘ candidates, so the output is unchanged.
      Similarity.bitextMineFrom(
          graft.pipeline.IvfChain.bitextCandidates(s, dir, embs(s, dir)))
        .orderBy("src_id")
    }),

    // Recall instrument for the miner: per fixed src query, brute
    // top-1 over the full tgt side vs the cell candidate frontier
    // (hit_cand: did probing see the true counterpart?) and the mined
    // partner (hit_mined: did the margin/mutual-best policy pick it?
    // — a policy audit, not an error rate). See
    // [[graft.pipeline.Similarity.bitextRecall]].
    "ann_recall_bitext" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bitextRecallFrom(
        e, graft.pipeline.IvfChain.bitextCandidates(s, dir, e))
    }),

    // Recall@5 of the ADC/PQ index against the brute-force ground
    // truth — the compression-vs-recall table read before trusting
    // the 32x memory saving (separate from ann_recall so the PQ CTE
    // chain stays self-contained in the oracle). Measured: 0-0.6 on
    // this corpus — the honest isotropic-embedding result (uniform
    // random directions give the quantizer no cluster structure, so
    // 8-byte codes lose the tiny cosine gaps between near-uniform
    // distances; same regime analysis as the hyperplane-LSH note on
    // Similarity.nearDupPairs). On real embedding distributions —
    // which cluster heavily — PQ recall rises sharply; THIS table is
    // the instrument that shows where a deployment stands.
    "ann_recall_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
          graft.pipeline.TopKChain.exact(s, dir, e),
          Seq("pq" -> Similarity.topKPq(e, graft.pipeline.IvfChain.pqBooks(s, dir, e))))
        .orderBy("query_id")
    }),

    // PQ corpus codes: 64 floats -> 8 byte-range codes against the
    // session-staged per-subspace codebooks (long form; a sink packs
    // them). Map-only against the broadcast m*ksub book.
    "pq_codes" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.pqEncode(e, graft.pipeline.IvfChain.pqBooks(s, dir, e))
        .orderBy("vec_id", "sub")
    }),

    // ADC top-k: full-precision queries against the PQ-coded corpus —
    // the scan is m table lookups per candidate, never a float vector.
    // The 32x memory drop is what makes billion-vector search fit
    // executor memory at 100 TB.
    "ann_topk_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.topKPq(e, graft.pipeline.IvfChain.pqBooks(s, dir, e))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc_dist"), 6).as("adc_dist"))
        .orderBy("query_id", "rank")
    }),

    // ADC top-k in the parametric-OPQ basis (Ge et al. 2013): the
    // session-staged trained rotation re-expresses every vector before
    // the PQ split, so subspace quantizers see axis-aligned, variance-
    // balanced coordinates; distances are preserved exactly (R is
    // orthogonal), only quantization error changes. Oracle: the
    // trained rotation is dumped by Verify as a parquet fixture (the
    // eigensolve has no SQL spelling) and DuckDB applies it as a
    // matmul, then replays PQ training/encode/ADC from scratch in the
    // rotated basis; OpqSpec independently pins the rotation math
    // (orthogonality, distance preservation, recall >= plain PQ on an
    // anisotropic fixture).
    "ann_topk_opq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.topKPq(
          graft.pipeline.IvfChain.opqRotated(s, dir, e),
          graft.pipeline.IvfChain.opqBooks(s, dir, e))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc_dist"), 6).as("adc_dist"))
        .orderBy("query_id", "rank")
    }),

    // The full FAISS production recipe "OPQ,IVF,PQ": rotation first
    // (axis-aligned, variance-balanced basis), then IVF cells prune
    // WHICH rotated vectors to score and ADC over rotated-space PQ
    // codes decides HOW. All three artifacts are session-staged; both
    // trained stages live in the SAME rotated basis (cells assign
    // rotated vectors, codes quantize rotated subvectors). Oracle:
    // ann_topk_ivfpq's full SQL replay, rebased onto the
    // Verify-dumped rotation fixture (both trained stages re-derived
    // on rotated vectors in DuckDB).
    "ann_topk_opq_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.topKIvfPq(
          graft.pipeline.IvfChain.opqRotated(s, dir, e),
          graft.pipeline.IvfChain.opqCentroids(s, dir, e),
          graft.pipeline.IvfChain.opqBooks(s, dir, e))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc_dist"), 6).as("adc_dist"))
        .orderBy("query_id", "rank")
    }),

    // The SERVING path of the composed index: artifacts are trained
    // once per JVM, persisted through IndexStore (parquet: rotation,
    // centroids, books), and this query searches from the LOADED
    // copies — write-once/serve-many, the production index-server
    // shape. Bit-exact round-trip is load-bearing: the oracle replays
    // training from scratch, so any save/load drift goes red. In the
    // bench this query's min-of-passes is the MARGINAL serving cost
    // (later passes load instead of retraining), which is exactly the
    // number an index server pays per session.
    "ann_topk_opq_ivfpq_loaded" -> ((s, dir) => {
      val e = embs(s, dir)
      val idx = graft.pipeline.IvfChain.opqServed(s, dir, e)
      Similarity.topKIvfPq(
          graft.pipeline.Opq.rotate(e, idx.rotation.get),
          idx.centroids, idx.books)
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc_dist"), 6).as("adc_dist"))
        .orderBy("query_id", "rank")
    }),

    // Recall@5 of the OPQ index against the UN-rotated brute-force
    // ground truth (valid because the rotation preserves cosine order
    // exactly) — read next to ann_recall_pq at equal m/ksub: the
    // delta IS the rotation's contribution. On this corpus the
    // embeddings are isotropic, so the expected delta is ~0 — the
    // honest result, documented in PLANS.md's recall table; the
    // anisotropic OpqSpec fixture is where the gain shows.
    "ann_recall_opq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
          graft.pipeline.TopKChain.exact(s, dir, e),
          Seq("opq" -> Similarity.topKPq(
            graft.pipeline.IvfChain.opqRotated(s, dir, e),
            graft.pipeline.IvfChain.opqBooks(s, dir, e))))
        .orderBy("query_id")
    }),

    // FAISS-style IVF-PQ: IVF cells prune WHICH vectors to score
    // (nProbe=2 of 8 trained cells), ADC over PQ codes decides HOW
    // (m lookups, no float vectors). Both index artifacts are the
    // session-staged ones.
    "ann_topk_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.topKIvfPq(
          e,
          graft.pipeline.IvfChain.centroids(s, dir, e),
          graft.pipeline.IvfChain.pqBooks(s, dir, e))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc_dist"), 6).as("adc_dist"))
        .orderBy("query_id", "rank")
    }),

    "ann_topk" -> ((s, dir) =>
      // r21: the exact top-5 is session-staged (TopKChain) — seven
      // recall instruments grade against the same frame.
      graft.pipeline.TopKChain.exact(s, dir, embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // Scalar-quantized (SQ8) top-k — the faiss SQ8 index family:
    // candidate generation against the 8-bit-per-dim quantized corpus
    // (4x memory drop vs float32; PQ's 32x sibling with far lower
    // training cost — one min/max aggregate), exact cosine re-rank of
    // the top-20 shortlist. See [[Similarity.topKSq8]].
    "ann_topk_sq8" -> ((s, dir) =>
      Similarity.topKSq8(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // Binary (1-bit sign) quantized top-k — the extreme compact-
    // vector point: 8-byte sign fingerprints, integer Hamming
    // shortlist (bit_count(xor), codegen), exact re-rank of the
    // top-20. Zero trained artifact like MRL, 32x-per-float like PQ.
    // See [[Similarity.topKBinary]].
    "ann_topk_binary" -> ((s, dir) =>
      Similarity.topKBinary(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"), col("hamming"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // Matryoshka truncated-dimension top-k (Kusupati et al. 2022):
    // candidates scored over only the first 16 of 64 dims (4x scan-
    // byte drop, zero trained artifact), exact full-dim re-rank. See
    // [[Similarity.topKMrl]].
    "ann_topk_mrl" -> ((s, dir) =>
      Similarity.topKMrl(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // The all-nodes k-NN GRAPH via distributed NN-descent (Dong et
    // al. 2011): deterministic scattered-LCG seed + 3
    // neighbor-of-neighbor rounds on a WIDENED searchK=16 working
    // list (final artifact = top-4 prefix), each round bounded by
    // n*(2*searchK)^2 candidate edges — the scalable route to the
    // graph artifact that graph-ANN serving and semantic clustering
    // consume (brute force is n^2*d). Measured recall vs the
    // brute-force graph: 0.986 at n=500 (RecallSweep knn mode). See
    // [[Similarity.knnGraph]].
    "ann_knn_graph" -> ((s, dir) =>
      KnnChain.graph(s, dir, embs(s, dir))
        .select(
          col("vec_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("vec_id", "rank")),

    // Recall@4 of the NN-descent graph against the exact graph on a
    // FIXED 16-query frame (`vec_id < 16`, the bounded-sample stance
    // every ann_recall_* shares) — the tuning instrument for
    // searchK/iters, reading next to ann_recall_pq/opq/compact. At
    // 100 TB the brute ground truth only ever exists for a
    // constant-size query sample — never a corpus fraction, whose
    // brute pass grows as n²/const — while the descent graph side is
    // full-corpus. See [[Similarity.topK]] / [[Similarity.recallAtK]].
    "ann_recall_knn_graph" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
        Similarity.topK(e, numQueries = 16, k = 4),
        Seq("knng" -> KnnChain.graph(s, dir, e)
          .where(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"), col("neighbor_id"))))
        .orderBy("query_id")
    }),

    // GRAPH-clustered semantic dedup (SemDeDup's alternative
    // spelling): connected components over the kNN graph's edges at
    // cosine >= 0.4, reusing the SAME min-label-propagation CC as the
    // MinHash chain — the graph build is the only pairwise work, and
    // it is NN-descent-bounded, never n². Compare with
    // embedding_neardup_ivf (cell-tiled pairs): the graph spelling
    // finds the same high-cosine structure without training a
    // quantizer first. See [[Similarity.knnGraph]], [[Dedup.clusters]].
    "embedding_neardup_graph" -> ((s, dir) =>
      KnnChain.clusterLabels(s, dir, embs(s, dir))
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("is_canonical"))
        .orderBy("vec_id")),

    // The semantic funnel's DELIVERABLE: per graph cluster the MEDOID
    // — the member with the highest exact-micro sum of cosines to its
    // cluster peers (floor(cos·1e6 + 0.5) as BIGINT: float sums are
    // order-sensitive, integer micro sums are not — the repo's
    // determinism pattern), vec_id breaking ties. Completes the
    // representative-manifest trio (text dedup_representatives, media
    // media_representatives, embeddings here). Per-cluster quadratic
    // but near-dup clusters are diameter-bounded by construction
    // (cosine ≥ 0.4 edges); rides the staged KnnChain labels.
    "embedding_representatives" -> ((s, dir) => {
      val e = embs(s, dir)
      val labels = KnnChain.clusterLabels(s, dir, e)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
      def side(v: String, emb: String) = labels
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("cluster_id"), col("vec_id").as(v), col("embedding").as(emb))
      val cosP = graft.functions.dotF(col("ea"), col("eb")) /
        (sqrt(graft.functions.dotF(col("ea"), col("ea"))) *
          sqrt(graft.functions.dotF(col("eb"), col("eb"))))
      val scored = side("va", "ea").join(side("vb", "eb"), Seq("cluster_id"))
        .where(col("va") =!= col("vb"))
        .select(col("cluster_id"), col("va"),
          floor(cosP * lit(1000000d) + lit(0.5)).cast("bigint").as("cmicro"))
        .groupBy("cluster_id", "va")
        .agg(sum(col("cmicro")).as("score_micro"), count(lit(1)).as("n_peers"))
      val wKeep = Window.partitionBy("cluster_id")
        .orderBy(col("score_micro").desc, col("va").asc)
      scored
        .withColumn("rn", row_number().over(wKeep))
        .where(col("rn") === 1)
        .select(col("cluster_id"), col("va").as("keep_vec_id"),
          col("score_micro"), (col("n_peers") + 1).cast("bigint").as("cluster_size"))
        .orderBy("cluster_id")
    }),

    // GRAPH SERVING read path: greedy beam search over the staged
    // NN-descent graph — 8 fixed queries walk from entry node 0 in 5
    // expand-score-prune rounds (beam 16), the HNSW-family query-time
    // answer whose cost is O(hops·beam·degree) scored candidates per
    // query instead of a corpus scan. Serves on the FULL searchK=16
    // working list (navigability needs degree — HNSW's M), while the
    // published kNN artifact stays the top-4 prefix; both are
    // projections of the one KnnChain-staged frame. Streaming twin:
    // [[graft.streaming.Streaming.graphWalkStream]]. See
    // [[Similarity.graphSearch]].
    "ann_graph_walk" -> ((s, dir) => {
      // All four walk consumers rank/filter from ONE session-staged
      // frontier (WalkChain — the r21 optimization); graphSearch is
      // rankWalkOut ∘ servingFrontier, so the output is unchanged.
      Similarity.graphSearchFromFrontier(
          WalkChain.frontier(s, dir, embs(s, dir)))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // FILTERED graph serving (post-filter spelling of filtered ANN):
    // the same walk on the FULL graph — restricting navigation
    // disconnects it, the filtered-DiskANN finding — with the
    // attribute predicate (label parity as the metadata stand-in)
    // applied at the final ranking. Queries whose neighborhood holds
    // fewer matching nodes emit fewer rows — the honest answer. See
    // [[graft.pipeline.Similarity.graphSearchFiltered]].
    "ann_graph_walk_filtered" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.graphSearchFilteredFromFrontier(
          WalkChain.frontier(s, dir, e),
          e.where(pmod(col("label"), lit(2)) === 1))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // Graph HEALTH monitor — the "when to re-descend" instrument
    // (sq8_drift's sibling for the graph tier): edge reciprocity
    // (fraction of directed edges whose reverse is also published —
    // NN-descent converges toward symmetric neighborhoods, so decay
    // here means the graph has gone stale vs the corpus) and exact
    // per-rank cosine mass (integer micro sums — float avgs are
    // order-sensitive, these are not). One self-join on the published
    // O(n·k) edges + one aggregate; no corpus access at all.
    "ann_graph_health" -> ((s, dir) => {
      val g = KnnChain.graph(s, dir, embs(s, dir))
      val edges = g.select(col("vec_id"), col("neighbor_id"), col("rank"),
        floor(col("cosine") * lit(1000000d) + lit(0.5)).cast("bigint").as("cmicro"))
      val recip = edges.as("a").join(
          edges.select(col("vec_id").as("rv"), col("neighbor_id").as("ru")).as("b"),
          col("a.vec_id") === col("ru") && col("a.neighbor_id") === col("rv"),
          "left_semi")
        .agg(count(lit(1)).as("n_reciprocal"))
      val rankCols = (1 to 4).flatMap(r => Seq(
        sum(when(col("rank") === r, col("cmicro"))).cast("bigint").as(s"cos_micro_r$r")))
      edges.agg(count(lit(1)).cast("bigint").as("n_edges"), rankCols: _*)
        .crossJoin(recip)
        .select(col("n_edges"),
          col("n_reciprocal").cast("bigint").as("n_reciprocal"),
          round(col("n_reciprocal").cast("double") / col("n_edges"), 6).as("reciprocity"),
          col("cos_micro_r1"), col("cos_micro_r2"),
          col("cos_micro_r3"), col("cos_micro_r4"))
    }),

    // Graph DELETE repair — the other half of index maintenance
    // (ann_knn_graph_append is the insert): a ~1% tombstone set
    // (vec_id % 97 == 0) leaves the graph, and every surviving node
    // whose top-4 contained a tombstone REFILLS from the surviving
    // tail of its own searchK=16 working list — the reason the staged
    // artifact keeps the wide list, not just the published prefix: a
    // delete is one filter + one re-rank over O(affected·searchK)
    // rows, never a descent rebuild and never a walk. Affected set is
    // O(k·|deleted|) — broadcast-small by construction.
    "ann_knn_graph_delete" -> ((s, dir) => {
      val wl = KnnChain.workingList(s, dir, embs(s, dir))
      val affected = wl
        .where(col("rank") <= 4 && col("v") % 97 === 0 && col("u") % 97 =!= 0)
        .select(col("u")).distinct()
      val survivors = wl.where(col("u") % 97 =!= 0 && col("v") % 97 =!= 0)
      val w = Window.partitionBy("u").orderBy(col("cosine").desc, col("v").asc)
      survivors.join(broadcast(affected), Seq("u"), "left_semi")
        .withColumn("new_rank", row_number().over(w))
        .where(col("new_rank") <= 4)
        .select(col("u").as("vec_id"), col("new_rank").as("rank"),
          col("v").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("vec_id", "rank")
    }),

    // Recall@4 of the graph-serving WALK against brute force on the
    // same 8-query frame — grades the full serving path (descent
    // build quality × walk navigation) where ann_recall_knn_graph
    // grades the built artifact alone; the gap between the two
    // instruments isolates walk-induced loss. Rides the staged
    // KnnChain list. See [[Similarity.graphSearch]] /
    // [[Similarity.recallAtK]].
    "ann_recall_graph_walk" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
        Similarity.topK(e, numQueries = 8, k = 4),
        Seq("walk" -> Similarity.graphSearchFromFrontier(
            WalkChain.frontier(s, dir, e))
          .select(col("query_id"), col("neighbor_id"))))
        .orderBy("query_id")
    }),

    // Recall of the FILTERED walk vs the filtered brute ground truth
    // (top-4 among label-matching nodes only) — grades the post-filter
    // trade: a selective predicate shrinks the frontier's matching
    // population, and this is the instrument that says when to raise
    // beam/hops or pre-partition the index per attribute.
    "ann_recall_walk_filtered" -> ((s, dir) => {
      val e = embs(s, dir)
      val allowed = e.where(pmod(col("label"), lit(2)) === 1)
      Similarity.recallAtK(
        Similarity.topKFrom(e, allowed, numQueries = 8, k = 4),
        Seq("fwalk" -> Similarity.graphSearchFilteredFromFrontier(
            WalkChain.frontier(s, dir, e), allowed)
          .select(col("query_id"), col("neighbor_id"))))
        .orderBy("query_id")
    }),

    // INCREMENTAL graph append — the index-maintenance path: a 2%
    // delta (vec_id % 50 == 0) joins the BASE snapshot's kNN graph
    // without a rebuild. Delta vectors walk the base graph for their
    // own neighbors ('delta' rows); reverse edges re-rank only the
    // touched base nodes ('updated' rows). The full-rebuild bill is
    // n·(2·searchK)² per round; this is O(delta·hops·beam·degree) —
    // at 100 TB the difference between a nightly index and a
    // continuously-maintained one. See [[Similarity.knnGraphAppend]].
    "ann_knn_graph_append" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.knnGraphAppend(
        e.where(col("vec_id") % 50 =!= 0),
        e.where(col("vec_id") % 50 === 0),
        KnnChain.baseWorkingList(s, dir, e))
        .select(col("vec_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("part"))
        .orderBy("vec_id", "rank")
    }),

    // Filtered vector search: top-5 among SAME-LABEL vectors only
    // (per-tenant / same-language retrieval), predicate applied
    // BEFORE ranking. See [[Similarity.topKFiltered]].
    "ann_topk_filtered" -> ((s, dir) =>
      Similarity.topKFiltered(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"), col("label"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // Quantizer drift instrument — WHEN must the SQ8 quantizer
    // retrain? Train per-dim bounds on two disjoint snapshot halves
    // (even/odd vec_ids) and report the worst per-dim min/span shift
    // plus how many dims moved past a 0.01 tolerance. At 100 TB this
    // one-row check (two min/max aggregates) is what gates the
    // re-encode of a billion stored codes; the same stance as
    // corpus_snapshot_diff for the corpus itself.
    "sq8_drift" -> ((s, dir) => {
      val e = embs(s, dir)
      val pa = Similarity.sq8Params(e.where(col("vec_id") % 2 === 0))
        .select(col("mins").as("mins_a"), col("spans").as("spans_a"))
      val pb = Similarity.sq8Params(e.where(col("vec_id") % 2 =!= 0))
        .select(col("mins").as("mins_b"), col("spans").as("spans_b"))
      pa.crossJoin(pb)
        .select(
          zip_with(col("mins_a"), col("mins_b"), (x, y) => abs(x - y)).as("dm"),
          zip_with(col("spans_a"), col("spans_b"), (x, y) => abs(x - y)).as("ds"))
        .select(
          size(col("dm")).cast("bigint").as("n_dims"),
          round(array_max(col("dm")), 6).as("max_min_shift"),
          round(array_max(col("ds")), 6).as("max_span_shift"),
          size(filter(col("dm"), d => d > 0.01)).cast("bigint").as("n_min_shifted"),
          size(filter(col("ds"), d => d > 0.01)).cast("bigint").as("n_span_shifted"))
    }),

    // Recall@5 of the two compact-vector candidate generators (SQ8
    // dequantized scores, MRL 16-dim prefix scores) against brute-
    // force ground truth — read next to ann_recall_pq/opq: these two
    // trade quantizer training (SQ8: one aggregate; MRL: none) for
    // scan bytes, and this instrument is where that trade is graded.
    "ann_recall_compact" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
          graft.pipeline.TopKChain.exact(s, dir, e),
          Seq(
            "sq8" -> Similarity.topKSq8(e),
            "mrl" -> Similarity.topKMrl(e)))
        .orderBy("query_id")
    }),

    // Recall instrument for the 1-bit tier: binary-shortlist top-5 vs
    // the brute top-5 — read next to ann_recall_compact (SQ8/MRL):
    // together the three grade the full scan-byte/recall frontier
    // (8B binary / 16B MRL-prefix / 64B SQ8 per vector). See
    // [[Similarity.recallAtK]].
    "ann_recall_binary" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
          graft.pipeline.TopKChain.exact(s, dir, e),
          Seq("binary" -> Similarity.topKBinary(e)))
        .orderBy("query_id")
    }),

    // Hard-negative mining for contrastive data: top-k similar-but-
    // not-near-duplicate neighbors (cosine band < 0.5) per query —
    // same broadcast-queries plan as ann_topk with a free map-side
    // band predicate. See [[Similarity.hardNegatives]].
    "ann_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // Passage-level retrieval: BM25 over the SAME chunking the RAG/
    // eval pipeline consumes (chunk_docs: 32-token windows, stride
    // 24) — retrieval granularity is a pipeline choice, and the
    // engine expresses both by composing the two operators (the
    // chunker is map-only, so the probe shape is unchanged; the
    // postings key is (doc_id, chunk_id)).
    "bm25_chunks" -> ((s, dir) =>
      Corpus.bm25TopK(
        Corpus.chunk(docs(s, dir), chunkSize = 32, stride = 24)
          .withColumnRenamed("chunk_text", "text"),
        Seq("spark", "merge", "window"), 20,
        idCols = Seq("doc_id", "chunk_id"))
        .select(col("doc_id"), col("chunk_id"), col("n_terms_matched"),
          col("score_micro"))),

    // Do the engine's own gates agree? Pearson correlation between
    // the rule-based quality score and the DSIR target-likeness
    // ratio, from five EXACT integer sums over per-doc micro scores
    // (sums cast to double only for the final closed form, which
    // both engines evaluate identically). The instrument a curation
    // team reads before stacking gates: highly-correlated gates are
    // redundant, anti-correlated ones fight. Range note: micro²
    // summands are ~1e12, so the exact-integer sums stay below Long
    // range to ~9e6 docs; past that drop the per-doc scores to milli
    // units (summands ~1e6 → good to ~9e12 docs) — the statistic is
    // scale-invariant, only the fixed-point unit changes.
    "gate_correlation" -> ((s, dir) => {
      val d = docs(s, dir)
      val x = d.select(
        col("doc_id"),
        round(TextOps.qualityScore(col("text")) * 1e6, 0).cast("long")
          .as("x"))
      val y = graft.pipeline.DsirChain.weights(s, dir, d)
        .select(
          col("doc_id"),
          round(col("weight_micro").cast("double") / col("n_feats"), 0)
            .cast("long").as("y"))
      x.join(y, Seq("doc_id"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("y") * col("y")).cast("long").as("syy"))
        .select(
          col("n").as("n_docs"),
          round(
            (col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
              (sqrt(col("n").cast("double") * col("sxx") -
                col("sx").cast("double") * col("sx")) *
                sqrt(col("n").cast("double") * col("syy") -
                  col("sy").cast("double") * col("sy"))), 6)
            .as("r_quality_dsir"))
    }),

    // PMI collocations (Church & Hanks) with min support 5 — the
    // multi-word-unit screen. Vocab-keyed equi-joins after the
    // support filter; never broadcasts the vocabulary. See
    // [[Corpus.collocationsPmi]].
    "collocations_pmi" -> ((s, dir) =>
      Corpus.collocationsPmi(docs(s, dir))),

    // Zipf slope of the top-200 token types — the head/tail-loss
    // drift instrument a curation dashboard tracks across cleaning
    // steps. See [[Corpus.vocabZipfSlope]].
    "vocab_zipf_slope" -> ((s, dir) =>
      Corpus.vocabZipfSlope(docs(s, dir))),

    // The contrastive-training manifest: per anchor, the top positive
    // (nearest neighbor — self-supervised, no labels) and the top
    // HARD negatives (banded below the near-dup line, the positive
    // itself excluded — on an isotropic space the top-1 can sit
    // inside the band). The (anchor, positive, negative) triplet
    // frame a dense-retrieval trainer consumes. Pure composition of
    // the two broadcast-query plans; one broadcast join stitches
    // them.
    "contrastive_triplets" -> ((s, dir) => {
      val e = embs(s, dir)
      val pos = graft.pipeline.TopKChain.exact(s, dir, e)
        .where(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("pos_id"),
          round(col("cosine"), 6).as("pos_cos"))
      val neg = Similarity.hardNegatives(e, numQueries = 5, k = 3)
        .select(col("query_id"), col("rank").as("neg_rank"),
          col("neighbor_id").as("neg_id"),
          round(col("cosine"), 6).as("neg_cos"))
      pos.join(neg, Seq("query_id"))
        .where(col("neg_id") =!= col("pos_id"))
        .orderBy("query_id", "neg_rank")
    }),

    "ann_topk_ivf" -> ((s, dir) =>
      Similarity.topKIvf(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    "ann_topk_lsh" -> ((s, dir) =>
      Similarity.topKBucketed(embs(s, dir))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")),

    // IVF training: 2 Lloyd iterations from the first-8 seed, emitted
    // in long form (cid, pos, v) — see
    // [[graft.pipeline.Similarity.kmeansCentroids]] for the
    // determinism seam (6dp rounding between iterations).
    "ivf_centroids" -> ((s, dir) =>
      graft.pipeline.IvfChain.centroids(s, dir, embs(s, dir))
        .select(col("cid"), posexplode(col("ce")).as(Seq("pos", "v")))
        .select(
          col("cid"), col("pos").cast("bigint").as("pos"),
          round(col("v"), 6).as("v"))
        .orderBy("cid", "pos")),

    // IVF search against the TRAINED centroids — same plan family as
    // ann_topk_ivf, better cells.
    "ann_topk_ivf_trained" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.topKIvfTrained(e, graft.pipeline.IvfChain.centroids(s, dir, e))
        .select(
          col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // Vectors per trained IVF cell — the balance diagnostic read
    // before trusting probe latency. See
    // [[graft.pipeline.Similarity.cellSizes]].
    "ivf_cell_stats" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.cellSizes(e, graft.pipeline.IvfChain.centroids(s, dir, e)).orderBy("cid")
    }),

    // Topic labels for the trained IVF cells: each cell's 3 most
    // DISTINCTIVE tokens by document-frequency lift (share of the
    // cell's docs containing the token vs corpus docs containing it —
    // the BERTopic class-TF-IDF idea with exact integer counts and a
    // single IEEE division, so no float-sum ordering seam). Plan:
    // broadcast-centroid cell assignment joined to the doc-token
    // pairs on doc_id, two map-side-combinable count aggs, one
    // token-keyed equi-join, and a per-cell top-3 (WindowGroupLimit
    // prunes before the cid shuffle).
    "cluster_top_terms" -> ((s, dir) => {
      val e = embs(s, dir)
      val cells = Similarity.cellAssignments(
        e, graft.pipeline.IvfChain.centroids(s, dir, e))
      val dt = docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
      val dfCorpus = dt.groupBy("token").agg(count(lit(1)).as("df_corpus"))
      val dfCell = dt.join(cells, col("doc_id") === col("vec_id"))
        .groupBy("cid", "token").agg(count(lit(1)).as("df_cell"))
      val scored = dfCell.join(dfCorpus, "token")
        .withColumn("score", col("df_cell").cast("double") / col("df_corpus"))
      val w = Window.partitionBy("cid")
        .orderBy(col("score").desc, col("token").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("cid"), col("rank"), col("token"),
          col("df_cell"), col("df_corpus"), round(col("score"), 6).as("score"))
        .orderBy("cid", "rank")
    }),

    // Training-convergence instrument: exact-micro inertia at the
    // seeds and after each Lloyd iteration — training is "done" when
    // the per-iteration drop flattens. Replaying iters 0..2 here is a
    // fixture convenience; production logs inertia DURING training
    // (the assignment pass already exists in the update step). See
    // [[graft.pipeline.Similarity.kmeansInertia]].
    "ivf_inertia" -> ((s, dir) => {
      // r21: ONE training run with per-iteration snapshots
      // (kmeansCentroidsTrace — snapshot i is bit-equal to training
      // iters=i from the same deterministic init) instead of three
      // independent trainings re-executing shared Lloyd prefixes.
      val e = embs(s, dir)
      Similarity.kmeansCentroidsTrace(e, k = 8, iters = 2)
        .zipWithIndex.map { case (c, i) =>
          Similarity.kmeansInertia(e, c)
            .select(lit(i).as("iter"), col("n_vecs"), col("inertia_micro"))
        }.reduce(_ union _).orderBy("iter")
    }),

    // Recall@k of the two approximate indexes against the brute-force
    // ground truth — the table that tunes nProbe / plane count. See
    // [[graft.pipeline.Similarity.recallAtK]].
    "ann_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
        graft.pipeline.TopKChain.exact(s, dir, e),
        Seq(
          "ivf" -> Similarity.topKIvf(e),
          "ivft" -> Similarity.topKIvfTrained(
            e, graft.pipeline.IvfChain.centroids(s, dir, e)),
          "lsh" -> Similarity.topKBucketed(e)))
        .orderBy("query_id")
    }),

    // Sample-trained IVF parity — the 100 TB training reality
    // (centroids from a deterministic hash-sample serve the full
    // corpus; only assignment touches every vector) measured against
    // the full-corpus-trained cells on the same brute ground truth.
    // Reading this table answers "can I train on 1/4 of the data":
    // at parity, sample training removes the only full-corpus pass
    // from IVF build. See
    // [[graft.pipeline.Similarity.kmeansCentroidsSampled]].
    // Semantic OUTLIER audit: vectors far even from their own home
    // centroid are embedding-space junk (encoder failures, empty
    // inputs, off-distribution media) — rank the corpus by home-cell
    // cosine and flag the bottom decile. Map-only assignment vs the
    // broadcast staged centroids + the distributed exact-rank plan
    // (range partition + broadcast offsets, no SinglePartition
    // window). See [[graft.pipeline.Similarity.homeCells]].
    // Embedding variance spectrum — the rank-collapse detector run
    // before trusting an embedding column: variance per trained
    // eigen-direction (the session-staged OPQ rotation — eigensolve
    // cost sunk) in exact integer micros, with per-mille shares and
    // the cumulative energy curve. One map-only rotate + one d-sum
    // aggregate; ranking touches 64 rows. Oracle replays from the
    // Verify-dumped rotation fixture ({OPQROT}).
    "embedding_spectrum" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.embeddingSpectrum(
        e, graft.pipeline.IvfChain.opqRotation(s, dir, e))
    }),

    // 1-row intrinsic-dimension summary of the spectrum: participation
    // ratio (1 = collapsed, 64 = isotropic; on this deliberately
    // isotropic fixture it reads near 64 — the honest value), dims
    // covering 90% of energy, top direction's share.
    "embedding_intrinsic_dim" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.embeddingIntrinsicDim(
        e, graft.pipeline.IvfChain.opqRotation(s, dir, e))
    }),

    "embedding_outliers" -> ((s, dir) => {
      val e = embs(s, dir)
      val hc = Similarity.homeCells(
        e, graft.pipeline.IvfChain.centroids(s, dir, e))
      val (ranked, n) = graft.plans.Scale.rowNumberDistributedWithTotal(
        hc, Seq(col("ccos").asc, col("vec_id").asc), "rk")
      ranked
        .select(
          col("vec_id"), col("cid"),
          round(col("ccos"), 6).as("home_cos"),
          col("rk"),
          expr(s"(rk - 1) * 10 div $n").as("decile"))
        .withColumn("is_outlier", col("decile") === 0L)
        .orderBy("vec_id")
    }),

    // IVF index drift monitor (the sq8_drift stance for the cell
    // structure): under the FROZEN serving centroids, compare each
    // cell's population share between the base half (what the index
    // was built for) and the delta half (new ingest) — a cell whose
    // share shifts >100 per-mille is the retrain trigger, read per
    // cell so the operator sees WHERE the corpus moved. Map-only
    // assignment vs broadcast staged centroids + one 8-row agg.
    "ivf_cell_drift" -> ((s, dir) => {
      val e = embs(s, dir)
      val asg = Similarity.cellAssignments(
          e, graft.pipeline.IvfChain.centroids(s, dir, e))
        .withColumn("is_delta", col("vec_id") % 2 === 1)
      val agg = asg.groupBy("cid").agg(
        sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
      val tot = broadcast(agg.agg(
        sum("n_base").as("tb"), sum("n_delta").as("td")))
      agg.crossJoin(tot)
        .select(
          col("cid"), col("n_base"), col("n_delta"),
          expr("n_base * 1000 div tb").as("base_pm"),
          expr("n_delta * 1000 div td").as("delta_pm"))
        .withColumn("drift_pm", abs(col("base_pm") - col("delta_pm")))
        .withColumn("retrain", col("drift_pm") > 100L)
        .orderBy("cid")
    }),

    "ann_recall_ivf_sampled" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
        graft.pipeline.TopKChain.exact(s, dir, e),
        Seq(
          "ivft" -> Similarity.topKIvfTrained(
            e, graft.pipeline.IvfChain.centroids(s, dir, e)),
          "ivfs" -> Similarity.topKIvfTrained(
            e, Similarity.kmeansCentroidsSampled(e))))
        .orderBy("query_id")
    }),

    // Recall@5 of the COMPOSED IVF-PQ index — the number actually read
    // before deploying ann_topk_ivfpq, since its misses are the union
    // of IVF's pruning misses and PQ's quantization misses; comparing
    // this row against ann_recall (IVF alone) and ann_recall_pq (PQ
    // alone) attributes which stage loses the neighbors.
    "ann_recall_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
        graft.pipeline.TopKChain.exact(s, dir, e),
        Seq("ivfpq" -> Similarity.topKIvfPq(
          e,
          graft.pipeline.IvfChain.centroids(s, dir, e),
          graft.pipeline.IvfChain.pqBooks(s, dir, e))))
        .orderBy("query_id")
    }),

    // Fixed-size token chunking with overlap (size=32, stride=24,
    // 8-token overlap) — see [[graft.pipeline.Corpus.chunk]] for the
    // operator (map-only explode, no shuffle at any scale).
    "chunk_docs" -> ((s, dir) =>
      Corpus.chunk(docs(s, dir), chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")),

    // GPT-style sequence packing offsets (ctx=512) — see
    // [[graft.pipeline.Corpus.packOffsets]]. Integer-exact on both
    // engines; the global running sum executes on the two-pass
    // distributed prefix plan (Scale.cumSumDistributedLong), so the
    // declared plan has NO single-partition exchange.
    "pack_sequences" -> ((s, dir) =>
      Corpus.packOffsets(docs(s, dir), ctx = 512L)
        .orderBy("doc_id")),

    // In-Context-Pretraining packing order (Shi et al. 2023): docs
    // ordered by staged IVF home cell so related documents share
    // context windows; same distributed prefix plan as pack_sequences
    // over the composite (cell, doc_id) key. See
    // [[graft.pipeline.Corpus.packSemanticOrder]].
    "pack_semantic_order" -> ((s, dir) => {
      val e = embs(s, dir)
      val cells = Similarity.cellAssignments(
          e, graft.pipeline.IvfChain.centroids(s, dir, e))
        .select(col("vec_id").as("doc_id"), col("cid"))
      Corpus.packSemanticOrder(docs(s, dir), cells, ctx = 512L)
        .orderBy("doc_id")
    }),

    // The 1-row gain instrument for semantic packing: adjacent
    // same-cell fraction, semantic order (closed form n - cells) vs
    // ingest order (one distributed lag). See
    // [[graft.pipeline.Corpus.packSemanticGain]].
    "pack_semantic_gain" -> ((s, dir) => {
      val e = embs(s, dir)
      val cells = Similarity.cellAssignments(
          e, graft.pipeline.IvfChain.centroids(s, dir, e))
        .select(col("vec_id").as("doc_id"), col("cid"))
      Corpus.packSemanticGain(docs(s, dir), cells)
    }),

    // Padding-waste audit: concat-split vs per-doc-pad vs bucket-pad,
    // priced in exact per-micro wasted compute — the table read BEFORE
    // choosing how to pack a corpus. One aggregate over the packOffsets
    // frame, unpivoted to three strategy rows. See
    // [[graft.pipeline.Corpus.packPaddingAudit]].
    "pack_padding_audit" -> ((s, dir) =>
      Corpus.packPaddingAudit(docs(s, dir), ctx = 512L)
        .orderBy("strategy")),

    // pack_sequences with tokenizer-faithful accounting: the same
    // distributed-prefix packing plan denominated in [[Bpe]] subword
    // tokens (committed fixture merge table) instead of the whitespace
    // proxy — what a real budget fill is actually measured in. The
    // whitespace variant stays declared for oracle continuity.
    "pack_sequences_bpe" -> ((s, dir) =>
      Corpus.packOffsets(
          BpeChain.encoded(s, dir, docs(s, dir)), ctx = 512L,
          textCol = "bpe", tokenCount = t => length(t).cast("bigint"))
        .orderBy("doc_id")),

    // The third tokenizer denomination of the packing plan: WordPiece
    // subword counts from the map-only greedy kernel — whichever
    // tokenizer the trainer bills in, the packing math is the same
    // distributed prefix plan, and a denomination swap must never
    // change the plan shape (the shard_assign_bpe argument).
    "pack_sequences_wordpiece" -> ((s, dir) =>
      Corpus.packOffsets(
          docs(s, dir).select(
            col("doc_id"), Wordpiece.pieces(col("text")).as("wp")),
          ctx = 512L, textCol = "wp",
          tokenCount = t => size(t).cast("bigint"))
        .orderBy("doc_id")),

    // The inverted (window -> docs) index of the packing: which
    // documents each fixed 512-token context window reads, summarized
    // per window — see [[graft.pipeline.Corpus.packWindows]]. Inherits
    // the distributed prefix plan; the explode is map-only.
    "pack_windows" -> ((s, dir) =>
      Corpus.packWindows(docs(s, dir), ctx = 512L)
        .groupBy("window_id")
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("window_id")),

    // Epoch-0 training order over the packed windows: md5 shuffle key
    // per window + the global 1-based position on the distributed
    // rank plan (no single-partition window). The per-epoch reshuffle
    // with no RNG state — see [[graft.pipeline.Corpus.packShuffle]].
    "pack_shuffle" -> ((s, dir) =>
      Corpus.packShuffle(docs(s, dir), ctx = 512L, epoch = 0)
        .orderBy("window_id")),

    // THE END PRODUCT of the packing tier: the epoch-0 batch manifest
    // a data loader walks — materialized windows grouped into batches
    // of 8 by shuffled train_pos, each batch carrying its window
    // count, token count, and an order-sensitive content digest
    // (md5 of the window md5s in train order). One equi-join of two
    // window-row frames (both inherit the distributed prefix plan) +
    // one batch agg whose groups are 8 rows by construction.
    "pack_batches" -> ((s, dir) => {
      val d = docs(s, dir)
      // the session-staged window table (PackChain): materialize once
      // per snapshot, every manifest derives from it
      val mat = PackChain.materialized(s, dir, d)._2
        .select("window_id", "n_tokens", "window_md5")
      // train order derived from the materialized window set (the
      // same set packShuffle ranks — stream packing leaves no empty
      // window): one prefix plan instead of two, no join back
      val keyed = mat.withColumn("shuffle_key",
        TextOps.hash32(concat(lit("shuffle_0_"), col("window_id").cast("string"))))
      graft.plans.Scale.rowNumberDistributed(
          keyed, Seq(col("shuffle_key").asc, col("window_id").asc),
          "train_pos", 32)
        .select(
          expr("(train_pos - 1) div 8").as("batch_id"),
          col("n_tokens"), col("window_md5"), col("train_pos"))
        .groupBy("batch_id")
        .agg(
          count(lit(1)).as("n_windows"),
          sum("n_tokens").as("n_tokens"),
          md5(array_join(
            transform(
              array_sort(collect_list(struct(col("train_pos"), col("window_md5")))),
              s => s.getField("window_md5")),
            "")).as("batch_md5"))
        .orderBy("batch_id")
    }),

    // Multi-epoch batch manifests: mix_epochs' sqrt-temperature epoch
    // allocation composed with the packing tier — per epoch, sources
    // participate per their epochs_permille (partial epochs are a
    // deterministic hash-selected doc subset), windows repack and
    // reshuffle on the epoch-salted key, batches stamp (epoch,
    // batch_id). One distributed prefix plan PER EPOCH, never a
    // single-partition window. See
    // [[graft.pipeline.Corpus.packBatchesEpochs]].
    "pack_batches_epochs" -> ((s, dir) =>
      Corpus.packBatchesEpochs(docs(s, dir), ctx = 512L,
          fullMat = Some(PackChain.materialized(s, dir, docs(s, dir))))
        .orderBy("epoch", "batch_id")),

    // The packed windows MATERIALIZED — the training-batch content
    // itself (per 512-token window: contributing docs, token count,
    // md5 of the space-joined token slice). One join back to the
    // corpus + one window_id shuffle of the sliced pieces — see
    // [[graft.pipeline.Corpus.packMaterialize]].
    "pack_materialize" -> ((s, dir) =>
      PackChain.materialized(s, dir, docs(s, dir))._2
        .orderBy("window_id")),

    // The BPE-denominated materialization: window content is a
    // substring slice of the doc-order concatenation of encoded
    // symbol strings (every symbol = one token; Bpe.decode of a
    // window's symbols is its byte-exact text) — the batch a trainer
    // actually reads. See [[graft.pipeline.Corpus.packMaterializeBpe]].
    "pack_materialize_bpe" -> ((s, dir) =>
      Corpus.packMaterializeBpeFrom(
          BpeChain.encoded(s, dir, docs(s, dir)).select("doc_id", "bpe"),
          ctx = 512L)
        .orderBy("window_id")),

    // Padding-waste accounting per source: sequences and wasted token
    // slots if each doc were packed ALONE into fixed 512-token
    // sequences — the number that justifies stream packing. See
    // [[graft.pipeline.Corpus.packPaddingStats]].
    "pack_padding_stats" -> ((s, dir) =>
      Corpus.packPaddingStats(docs(s, dir), ctx = 512L).orderBy("source")),

    // Deterministic hash-based train/valid/test assignment — see
    // [[graft.pipeline.Corpus.splitAssign]] (map-only at any scale).
    "corpus_split" -> ((s, dir) =>
      Corpus.splitAssign(docs(s, dir)).orderBy("doc_id")),

    // LEAKAGE-SAFE train/valid/test split: the split key is the
    // near-dup CLUSTER, not the document — a doc-keyed split puts
    // near-copies of one document on both sides of the train/eval
    // fence, which is exactly the contamination the dedup tier
    // exists to stop (split_novelty measures it; this op prevents
    // it). Docs outside any cluster key by their own id. Rides the
    // staged chain: one broadcast-sized label join over the corpus.
    "corpus_split_leakage_safe" -> ((s, dir) => {
      val d = docs(s, dir)
      val labels = DedupChain.clusterLabels(s, dir, d)
        .select(col("doc_id"), col("cluster_id"))
      d.select("doc_id").join(labels, Seq("doc_id"), "left")
        .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
        .select(
          col("doc_id"), col("split_key"),
          Corpus.splitBucket(col("split_key")).as("bucket_pct"),
          Corpus.splitCol(col("split_key")).as("split"))
        .orderBy("doc_id")
    }),

    // Exactly-N LEAKAGE-SAFE eval cut — corpus_sample_fixed_n at
    // CLUSTER granularity: sample 50 near-dup clusters by salted
    // cluster-key hash (TakeOrdered partial top-N), serve the
    // min-doc_id member as the eval item, and report how many
    // near-dup siblings must be EXCLUDED from train for the cut to be
    // leak-free (an eval doc whose near-dup trains is contamination
    // by construction — the corpus_split_leakage_safe argument, here
    // for fixed-size eval sets). Staged CC labels; singleton docs are
    // their own clusters.
    "eval_cut_leakage_safe" -> ((s, dir) => {
      val d = docs(s, dir)
      val labels = DedupChain.clusterLabels(s, dir, d)
        .select(col("doc_id"), col("cluster_id"))
      val keyed = d.select("doc_id").join(labels, Seq("doc_id"), "left")
        .withColumn("ckey", coalesce(col("cluster_id"), col("doc_id")))
      val clusters = keyed.groupBy("ckey")
        .agg(min(col("doc_id")).as("eval_doc_id"),
          count(lit(1)).as("cluster_size"))
        .withColumn("pick_key",
          TextOps.hash32(concat(lit("evalcut:"), col("ckey").cast("string"))))
      clusters
        .orderBy(col("pick_key").asc, col("ckey").asc)
        .limit(50)
        .select(
          col("eval_doc_id"), col("ckey"), col("cluster_size"),
          (col("cluster_size") - 1L).as("n_excluded_train"),
          col("pick_key"))
        .orderBy("eval_doc_id")
    }),

    // Winnowing fingerprint profile (the MOSS sub-sampling): per doc
    // the k-gram count, selected fingerprint count, density (expected
    // 2/(w+1)) and an order-sensitive fingerprint digest. See
    // [[graft.pipeline.Corpus.winnowFingerprints]].
    "doc_winnow" -> ((s, dir) =>
      Corpus.winnowFingerprints(docs(s, dir)).orderBy("doc_id")),

    // Incremental winnow candidates off the disk-served fingerprint
    // index (delta = doc_id % 10 == 0, the dedup_incremental
    // convention): snapshot enters only as stored (doc_id, h) rows.
    // See [[graft.pipeline.Corpus.winnowIncrementalPairs]].
    "dedup_winnow_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val isNew = col("doc_id") % 10 === 0
      Corpus.winnowIncrementalPairs(
          graft.pipeline.DedupStateStore.winnowRowsServed(
            s, dir, d.where(!isNew)),
          d.where(isNew))
        .orderBy("doc_a", "doc_b")
    }),

    // CC clusters over the winnow candidate graph — the winnow path
    // run to completion (fingerprints → pairs → components →
    // canonicals). No verify stage needed BY CONSTRUCTION: a shared
    // selected fingerprint is an exact shared-8-token-run witness
    // (md5-collision odds aside), unlike MinHash candidates which
    // require the Jaccard pass. Same pointer-jumping CC as the LSH
    // chain; only docs with at least one shared run appear.
    "dedup_winnow_clusters" -> ((s, dir) =>
      // r21: session-staged CC labels (corpus_prepare_winnow gates on
      // the same frame).
      DedupChain.winnowClusterLabels(s, dir, docs(s, dir))
        .orderBy("doc_id")),

    // Winnow-keyed candidate pairs: docs sharing a selected
    // fingerprint (boilerplate fingerprints stop-listed at df>16) —
    // the exact-long-run candidate generator off the ~2/(w+1)-sized
    // index. See [[graft.pipeline.Corpus.winnowCandidatePairs]].
    "dedup_winnow_pairs" -> ((s, dir) =>
      DedupChain.winnowPairs(s, dir, docs(s, dir))
        .orderBy("doc_a", "doc_b")),

    // Snapshot-vs-current ingest drift per source (old = the
    // dedup_incremental snapshot split): doc/token counts both sides
    // and the token-share delta in exact per-mille — the monitoring
    // table that catches a source silently exploding or vanishing
    // between corpus versions. Two combinable aggs + a broadcast
    // 1-row total each; all-integer arithmetic.
    "corpus_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"),
        (col("doc_id") % 10 =!= 0).as("is_old"))
      val agg = d.groupBy("source").agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).as("n_docs_old"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_docs_new"),
        sum(when(col("is_old"), col("n_tok")).otherwise(0L)).as("n_tokens_old"),
        sum(when(!col("is_old"), col("n_tok")).otherwise(0L)).as("n_tokens_new"))
      val tot = broadcast(agg.agg(
        sum("n_tokens_old").cast("long").as("_to"),
        sum("n_tokens_new").cast("long").as("_tn")))
      agg.crossJoin(tot)
        .select(
          col("source"),
          col("n_docs_old"), col("n_docs_new"),
          col("n_tokens_old"), col("n_tokens_new"),
          // per-mille token share on each side, then the drift
          expr("(n_tokens_old * 1000) div _to").as("share_old_permille"),
          expr("(n_tokens_new * 1000) div _tn").as("share_new_permille"),
          (expr("(n_tokens_new * 1000) div _tn") -
            expr("(n_tokens_old * 1000) div _to")).as("share_drift_permille"))
        .orderBy("source")
    }),

    // Per-source exact-duplicate rate (docs minus distinct content
    // hashes, in exact per-mille) — the first-look curation
    // diagnostic that tells which source needs dedup most. One
    // combinable agg (count + countDistinct partial-aggregate).
    "dedup_rate_by_source" -> ((s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct_contents"))
        .select(
          col("source"), col("n_docs"), col("n_distinct_contents"),
          expr("((n_docs - n_distinct_contents) * 1000) div n_docs")
            .as("dup_rate_permille"))
        .orderBy("source")),

    // Inter-source text-overlap matrix: distinct shared 8-token
    // windows per source pair — the provenance diagnostic that scopes
    // dedup across sources. See
    // [[graft.pipeline.Corpus.sourceWindowOverlap]].
    "source_overlap" -> ((s, dir) =>
      Corpus.sourceWindowOverlap(docs(s, dir))
        .orderBy("source_a", "source_b")),

    // Vocabulary coverage curve: share of corpus token OCCURRENCES
    // covered by the top-K most frequent token types — the
    // tokenizer-design instrument (how big must a word-level vocab be
    // before <unk> is rare). Token counts are one combinable shuffle;
    // the global frequency rank runs on the distributed two-pass
    // plan (no single-partition window); the K-sweep is a 3-row
    // broadcast join over the vocab-sized rank frame.
    "vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val counts = docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_occ"))
      val (ranked, nVocab) = graft.plans.Scale.rowNumberDistributedWithTotal(
        counts, Seq(col("n_occ").desc, col("token").asc), "rank")
      val tot = broadcast(counts.agg(sum("n_occ").cast("long").as("_tot")))
      val ks = broadcast(Seq(100L, 1000L, 10000L).toDF("k"))
      ks.join(ranked, col("rank") <= col("k"), "left")
        .groupBy("k")
        .agg(
          count(col("token")).as("n_in_vocab"),
          coalesce(sum("n_occ"), lit(0L)).cast("long").as("covered_occ"))
        .crossJoin(tot)
        .select(
          col("k"), lit(nVocab).as("n_vocab_total"), col("n_in_vocab"),
          col("covered_occ"), col("_tot").as("total_occ"),
          round(col("covered_occ").cast("double") / col("_tot"), 6)
            .as("coverage"))
        .orderBy("k")
    }),

    // URL-keyed crawl merge: two deterministic sightings per doc (the
    // raw synthetic url + a tracking-parameter/fragment variant of
    // it) collapse to one canonical URL group — the
    // repeated-crawl-of-the-same-page merge a URL-keyed ingest runs,
    // and a live check that canonicalization actually merges what it
    // claims (a broken canonicalUrl leaves singleton groups). One
    // map-only canonicalization + one combinable groupBy(url_key).
    "dedup_urls" -> ((s, dir) => {
      val d = docs(s, dir)
      // 1-3 sightings per doc (group sizes vary, so the merge count is
      // a real data-dependent check, not a constant): the raw url
      // always; a tracking-param/fragment variant for 2 of 3 docs; a
      // www-prefixed second variant for 1 in 5.
      val u0 = d.select(
        (col("doc_id") * 3).as("sighting_id"),
        Corpus.synthUrl(col("doc_id"), col("source")).as("url"))
      val u1 = d.where(col("doc_id") % 3 =!= 2).select(
        (col("doc_id") * 3 + 1).as("sighting_id"),
        concat(
          Corpus.synthUrl(col("doc_id"), col("source")),
          when(col("doc_id") % 2 === 0, lit("&utm_source=share"))
            .otherwise(lit("?utm_source=share")),
          lit("#frag")).as("url"))
      val u2 = d.where(col("doc_id") % 5 === 0).select(
        (col("doc_id") * 3 + 2).as("sighting_id"),
        concat(
          regexp_replace(
            Corpus.synthUrl(col("doc_id"), col("source")),
            "^https://(www\\.)?", "https://www."),
          when(col("doc_id") % 2 === 0, lit("&fbclid=x"))
            .otherwise(lit("?fbclid=x"))).as("url"))
      u0.union(u1).union(u2)
        .select(col("sighting_id"), Corpus.canonicalUrl(col("url")).as("canon"))
        .groupBy(md5(col("canon")).as("url_key"))
        .agg(
          count(lit(1)).as("n_sightings"),
          min("sighting_id").as("canonical_sighting"),
          min("canon").as("url_canonical"))
        .orderBy("url_key")
    }),

    // Token-balanced contiguous output-shard plan (write-side of a
    // curated materialization): shard = exclusive-prefix token offset
    // · S div total, on the distributed prefix plan. See
    // [[graft.pipeline.Corpus.shardAssign]].
    "shard_assign" -> ((s, dir) =>
      Corpus.shardAssign(docs(s, dir)).orderBy("doc_id")),

    // The JSONL delivery sink made a DECLARED surface: shards are
    // WRITTEN once per JVM (gzip JSONL, one repartition-aligned task
    // per shard directory — graft.sources.ShardStore serving
    // tools/ExportShards' write shape), then this query READS the
    // files back with an explicit schema and digests their content
    // per shard. The oracle replays the shard plan from the parquet
    // source and never sees the files, so any write-side loss
    // (escaping, truncation, mis-sharding, a dropped row) goes red —
    // the end-to-end sink integrity check a delivery pipeline runs
    // before handing shards to a trainer. The content digest is an
    // ORDER-FREE exact fold: bit_xor of a per-doc 60-bit hash
    // (15 hex chars of md5(doc_id ':' md5(text))) — constant
    // aggregation-buffer memory per shard group regardless of shard
    // size (a 100 TB shard holds millions of docs; a collect_list
    // digest would buffer them all per reducer), order-independent so
    // no sort is needed, and exact for any ODD-multiplicity change:
    // a lost, altered, or once-duplicated doc flips the xor and goes
    // red against the oracle's identical fold. Even-multiplicity
    // corruptions (a doc written an even number of extra times, or a
    // dup+drop pair whose hashes xor-cancel) are invisible to the xor
    // alone, so a second order-free fold rides next to it:
    // content_checksum = sum(dh mod 1e9+7) — same constant group
    // state, permutation-invariant, and any multiset change the xor
    // misses shifts the modular sum unless the colliding docs are
    // ALSO congruent mod p (IoSpec pins the dup+drop case the xor
    // alone is blind to). p = 1e9+7 keeps every addend < 2^30, so the
    // BIGINT sum cannot overflow below ~2^33 docs per shard — no
    // wrap-semantics divergence between engines at any real scale.
    // n_docs/n_tokens stay alongside as the cheap count witnesses.
    "shard_export_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val dataDir = graft.sources.ShardStore.dataDir(s, dir)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      graft.sources.Io.readJson(s, dataDir, schema)
        .withColumn("_dh",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            md5(col("text")))), 1, 15), 16, 10).cast("bigint"))
        .groupBy(col("shard").cast("bigint").as("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast("bigint")).as("n_tokens"),
          min(col("doc_id")).as("first_doc_id"),
          max(col("doc_id")).as("last_doc_id"),
          expr("bit_xor(_dh)").as("content_digest"),
          sum(col("_dh") % 1000000007L).as("content_checksum"))
        .orderBy("shard")
    }),

    // Right-to-be-forgotten IMPACT report: given a delete set (the
    // doc_id % 97 fixture — a real run feeds the request list), how
    // far does the deletion propagate through the SERVING artifacts?
    // One row per tier: raw docs, token mass, JSONL shards to rewrite,
    // IVF cells whose population changes, near-dup clusters losing a
    // member — each an exact count with the blast-radius share in
    // per-mille. Every tier is the tiny delete set probed against a
    // session-staged artifact (broadcast-size semi-join or a map-only
    // conditional agg); nothing rescans beyond the artifacts the
    // pipeline already maintains. The operational read: docs/tokens
    // price the data loss, shards price the rewrite, cells and
    // clusters say which indexes must refresh.
    "deletion_impact_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val e = embs(s, dir)
      val isDel = col("doc_id") % 97 === 0
      def row(tier: String, hit: Column, total: Column, src: DataFrame) =
        src.agg(hit.as("_h"), total.as("_t"))
          .select(
            lit(tier).as("tier"), col("_h").as("n_hit"), col("_t").as("n_total"),
            expr("_h * 1000 div _t").as("share_pm"))
      val nTok = size(TextOps.tokens(col("text"))).cast("bigint")
      val docsRow = row("1_docs",
        sum(when(isDel, 1L).otherwise(0L)), count(lit(1)), d)
      val tokRow = row("2_tokens",
        sum(when(isDel, nTok).otherwise(0L)), sum(nTok), d)
      val shardRow = row("3_shards",
        countDistinct(when(isDel, col("shard"))), countDistinct(col("shard")),
        Corpus.shardAssign(d))
      val cellRow = row("4_ivf_cells",
        countDistinct(when(col("vec_id") % 97 === 0, col("cid"))),
        countDistinct(col("cid")),
        Similarity.cellAssignments(e, graft.pipeline.IvfChain.centroids(s, dir, e)))
      val clRow = row("5_neardup_clusters",
        countDistinct(when(isDel, col("cluster_id"))),
        countDistinct(col("cluster_id")),
        DedupChain.clusterLabels(s, dir, d))
      docsRow.unionAll(tokRow).unionAll(shardRow).unionAll(cellRow)
        .unionAll(clRow).orderBy("tier")
    }),

    // LEAKAGE-SAFE shard plan: near-dup cluster members land in ONE
    // shard (an eval/train shard boundary between two near-dups is
    // cross-shard leakage — corpus_split_leakage_safe's argument
    // applied to the write side), and shards stay token-balanced by
    // running the SAME distributed prefix plan at the CLUSTER level:
    // per-key token sums → shardAssign over keys → members join their
    // key's shard. Staged labels; one extra keyed agg + join over the
    // plain plan.
    "shard_assign_cluster_safe" -> ((s, dir) => {
      val d = docs(s, dir)
      val labels = DedupChain.clusterLabels(s, dir, d)
        .select(col("doc_id"), col("cluster_id"))
      val keyed = d.select(
          col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"))
        .join(labels, Seq("doc_id"), "left")
        .withColumn("shard_key", coalesce(col("cluster_id"), col("doc_id")))
      val groups = keyed.groupBy("shard_key")
        .agg(sum(col("n_tok")).as("g_tok"))
      val shards = Corpus.shardAssign(
          groups.select(col("shard_key").as("doc_id"), col("g_tok")),
          tokenCount = _ => col("g_tok"))
        .select(col("doc_id").as("shard_key"), col("shard"))
      keyed.join(shards, Seq("shard_key"))
        .select(col("doc_id"), col("shard_key"),
          col("n_tok").as("n_tokens"), col("shard"))
        .orderBy("doc_id")
    }),

    // The shard plan denominated in BPE subword tokens — a curated
    // materialization balances its output files in the tokens the
    // TRAINER will count, not whitespace words (the
    // corpus_budget_sample_bpe argument applied to the write side).
    // Same distributed prefix plan; only the per-doc counter changes.
    "shard_assign_bpe" -> ((s, dir) =>
      Corpus.shardAssign(
          BpeChain.encoded(s, dir, docs(s, dir))
            .select(col("doc_id"), col("bpe").as("text")),
          tokenCount = t => length(t).cast("bigint"))
        .orderBy("doc_id")),

    // The balance audit of the shard plan — per shard its doc count,
    // token sum, id range, and deviation from the ideal S-th of the
    // corpus in exact per-mille (integer arithmetic; no float shares).
    // One map-side-combinable agg over shard_assign's frame.
    "shard_stats" -> ((s, dir) => {
      val a = Corpus.shardAssign(docs(s, dir))
      val tot = broadcast(a.agg(sum("n_tokens").cast("long").as("_tot")))
      a.groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("n_tokens"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .crossJoin(tot)
        .select(
          col("shard"), col("n_docs"), col("n_tokens"),
          col("first_doc"), col("last_doc"),
          // shard size in per-mille of the IDEAL total/S share (1000 =
          // perfectly balanced). Numerator kept non-negative so Spark's
          // truncating div and DuckDB's flooring // agree.
          expr("(n_tokens * 8000) div _tot").as("permille_of_ideal"))
        .orderBy("shard")
    }),

    // Deterministic stratified sample: N docs per source, chosen by
    // md5-hash order — the reproducible per-stratum downsampling step
    // of a training-mix builder. Executes as per-partition partial
    // top-k (WindowGroupLimit) before the per-source shuffle, like the
    // ANN rankers.
    "corpus_sample_stratified" -> ((s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(TextOps.hash32(concat(lit("sample_"), col("doc_id").cast("string"))).asc,
          col("doc_id").asc)
      docs(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("sample_rank", row_number().over(w))
        .where(col("sample_rank") <= 5)
        .orderBy("source", "sample_rank")
    }),

    // Map-only per-source rate downsampling: md5-bucket membership vs
    // a literal CASE rate table — no shuffle, no join; reproducible
    // across runs and NESTING across rate changes (a doc kept at 25%
    // stays kept at 50%). The first four sources are cut to
    // 10/25/50/75%, the rest pass. See
    // [[graft.pipeline.Corpus.rateSample]].
    "corpus_sample_rate" -> ((s, dir) =>
      Corpus.rateSample(docs(s, dir),
          Map("src0" -> 1000, "src1" -> 2500, "src2" -> 5000, "src3" -> 7500))
        .orderBy("doc_id")),

    // Per-source corpus composition: doc/token/type counts and
    // type-token ratio. Distinct aggregates shuffle once on source
    // with partial distinct combining.
    "source_stats" -> ((s, dir) => {
      val tok = docs(s, dir).select(
        col("doc_id"), col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      tok.groupBy("source")
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("token")).as("n_types"),
          round(countDistinct(col("token")).cast("double") / count(lit(1)), 6)
            .as("type_token_ratio"))
        .orderBy("source")
    }),

    // Robust per-source length stats: median token count and the
    // median absolute deviation around it — the outlier-insensitive
    // screen for source-level length anomalies (a source whose MAD
    // explodes is mixing content types). Two passes: medians, join
    // back, deviation medians; both exact percentile (quantile_cont
    // parity proven by bar_quantiles). The 100 TB spelling is the
    // DECLARED source_robust_stats_sketch below — per-source bounded
    // sample, measured error — not an undeclared approx_percentile.
    "source_robust_stats" -> ((s, dir) => {
      val base = docs(s, dir).select(
        col("source"), size(TextOps.tokens(col("text"))).cast("double").as("n_tok"))
      val med = base.groupBy("source")
        .agg(expr("percentile(n_tok, 0.5)").as("median_tokens"))
      base.join(med, Seq("source"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(first(col("median_tokens")), 6).as("median_tokens"),
          round(expr("percentile(abs(n_tok - median_tokens), 0.5)"), 6).as("mad_tokens"))
        .orderBy("source")
    }),

    // The 100 TB spelling of source_robust_stats — per-GROUP sampled
    // quantiles (the sketch card's bottom-k-by-hash trick, grouped):
    // median and MAD per source computed from the deterministic
    // bottom-128-by-md5-hash sample WITHIN each source, with the exact
    // figures as witness columns and the relative errors the operator
    // reports (the approx_quantiles_sample instrument stance). k=128
    // (not the card's 256) so the fixture's 250-doc sources are
    // genuinely SAMPLED at every scale — at k=256 the sample covers
    // each whole group and the measured error is vacuously zero. The
    // per-source rank executes as a WindowGroupLimit partial top-k
    // before the shuffle, so state per source is 128 rows regardless
    // of source size — the bounded-memory property the exact 2-pass
    // plan lacks (its percentile buffers every doc of a source per
    // reducer). The MAD's second pass runs over the SAMPLE only
    // (≤128 rows/source, broadcast-joined medians); a 100 TB run
    // drops the witness columns, leaving one WindowGroupLimit shuffle
    // + two sample-sized aggregates.
    "source_robust_stats_sketch" -> ((s, dir) => {
      val base = docs(s, dir).select(
        col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("double").as("n_tok"))
      val w = Window.partitionBy("source")
        .orderBy(
          TextOps.hash32(concat(lit("srq_"), col("doc_id").cast("string"))).asc,
          col("doc_id").asc)
      val samp = base.withColumn("_rn", row_number().over(w))
        .where(col("_rn") <= 128)
      val med = samp.groupBy("source")
        .agg(
          count(lit(1)).as("n_sample"),
          expr("percentile(n_tok, 0.5)").as("med_s"))
      val sk = samp.join(broadcast(med), Seq("source"))
        .groupBy("source")
        .agg(
          first(col("n_sample")).as("n_sample"),
          first(col("med_s")).as("med_s"),
          expr("percentile(abs(n_tok - med_s), 0.5)").as("mad_s"))
      val medX = base.groupBy("source")
        .agg(expr("percentile(n_tok, 0.5)").as("med_x"))
      val exact = base.join(broadcast(medX), Seq("source"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          first(col("med_x")).as("med_x"),
          expr("percentile(abs(n_tok - med_x), 0.5)").as("mad_x"))
      sk.join(exact, Seq("source"))
        .select(
          col("source"), col("n_docs"), col("n_sample"),
          round(col("med_s"), 6).as("median_tokens_est"),
          round(col("med_x"), 6).as("median_tokens_exact"),
          round(abs(col("med_s") - col("med_x")) /
            greatest(abs(col("med_x")), lit(1e-9)), 6).as("median_rel_err"),
          round(col("mad_s"), 6).as("mad_tokens_est"),
          round(col("mad_x"), 6).as("mad_tokens_exact"),
          round(abs(col("mad_s") - col("mad_x")) /
            greatest(abs(col("mad_x")), lit(1e-9)), 6).as("mad_rel_err"))
        .orderBy("source")
    }),

    // Per-document robust length-outlier flag (CCNet-style length
    // screening with MAD instead of stddev, so one 10M-token doc
    // cannot drag its own threshold): |n_tok − median_src| > 4·MAD_src.
    // Two tiny per-source aggs broadcast back over one corpus scan;
    // docs in a degenerate source (MAD = 0) flag only when they
    // differ from the median at all.
    "length_outliers" -> ((s, dir) => {
      val base = docs(s, dir).select(
        col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("double").as("n_tok"))
      val med = base.groupBy("source")
        .agg(expr("percentile(n_tok, 0.5)").as("med"))
      val withMed = base.join(broadcast(med), Seq("source"))
      val mad = withMed.groupBy("source")
        .agg(expr("percentile(abs(n_tok - med), 0.5)").as("mad"))
      withMed.join(broadcast(mad), Seq("source"))
        .select(
          col("doc_id"), col("source"),
          col("n_tok").cast("long").as("n_tokens"),
          round(col("med"), 6).as("median_tokens"),
          round(col("mad"), 6).as("mad_tokens"),
          (abs(col("n_tok") - col("med")) > col("mad") * 4).as("outlier"))
        .orderBy("doc_id")
    }),

    // Bigram novelty of the valid split vs the train split (splits by
    // the corpus_split hash): the share of distinct valid-set bigrams
    // never seen in train — the standard held-out-contamination /
    // distribution-shift screen run before trusting an eval split. One
    // anti-join on the bigram key; both sides shuffle once.
    // ONE corpus explode + ONE shuffle on the bigram: per-bigram
    // split-membership flags replace the previous two distinct
    // subtrees + anti-join (which exploded the corpus per branch).
    // n_valid = distinct valid bigrams, n_unseen = those with no
    // train occurrence — identical numbers, one pass.
    "split_novelty" -> ((s, dir) => {
      val bucket = pmod(
        TextOps.hash32(concat(lit("split_"), col("doc_id").cast("string"))), lit(100L))
      val flags = docs(s, dir)
        .withColumn("bucket", bucket)
        .select(col("bucket"), explode(TextOps.shingles(col("text"), 2)).as("bg"))
        .groupBy("bg")
        .agg(
          max(when(col("bucket") < 80, 1).otherwise(0)).as("in_train"),
          max(when(col("bucket") >= 80 && col("bucket") < 90, 1).otherwise(0))
            .as("in_valid"))
      flags
        .agg(
          coalesce(sum(col("in_valid")), lit(0)).cast("bigint").as("n_valid_bigrams"),
          coalesce(sum(col("in_valid") * (lit(1) - col("in_train"))), lit(0))
            .cast("bigint").as("n_unseen"))
        .select(
          col("n_valid_bigrams"),
          col("n_unseen"),
          // guard the empty-valid-split case: 0.0/0 is NaN in Spark but
          // follows different div-by-zero semantics in DuckDB — both
          // sides return NULL instead (matching CASE in the oracle)
          when(col("n_valid_bigrams") > 0,
            round(col("n_unseen").cast("double") / col("n_valid_bigrams"), 6))
            .as("novelty_ratio"))
    }),

    // Exact per-symbol close-price quantiles (linear interpolation).
    // Exact percentile buffers each group's values — fine for bounded
    // per-symbol bar counts; at unbounded group sizes the declared
    // per-group sampled spelling applies (approx_quantiles_sample on
    // events, source_robust_stats_sketch on docs — WindowGroupLimit
    // bounded state, measured error).
    "bar_quantiles" -> ((s, dir) =>
      graft.sources.Bars.fromEvents(s, dir)
        .groupBy("symbol")
        .agg(
          count(lit(1)).as("n_bars"),
          round(expr("percentile(close, 0.25)"), 6).as("p25"),
          round(expr("percentile(close, 0.5)"), 6).as("p50"),
          round(expr("percentile(close, 0.75)"), 6).as("p75"),
          round(expr("percentile(close, 0.9)"), 6).as("p90"),
          round(expr("percentile(close, 0.99)"), 6).as("p99"))
        .orderBy("symbol")),

    // Unigram corpus log-probability per document — the classic cheap
    // "fluency" signal for pipeline filtering (docs of rare tokens
    // score low). Same shape as TF-IDF: one token shuffle for the
    // vocabulary, broadcast back, per-doc aggregate. The per-token
    // log-probs are summed in exact integer MICRO units (round(logp *
    // 1e6) as BIGINT): a double sum's value depends on partial-agg
    // order, which differs between Spark and DuckDB and would make the
    // 6-dp hash compare flaky; integer summation is order-independent
    // and exact.
    "doc_logprob" -> ((s, dir) => {
      // tokenize once: tok feeds the corpus total, the vocabulary AND
      // the probe join — three lineages that would each re-explode the
      // corpus. Cache lifecycle is harness-owned (clearCache), as for
      // the LSH signature persists.
      val tok = docs(s, dir).select(
        col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .persist()
      val total = broadcast(tok.agg(count(lit(1)).cast("double").as("n_total")))
      val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        .crossJoin(total)
        .select(
          col("token"),
          round(log(col("cnt") / col("n_total")) * 1e6, 0).cast("bigint").as("logp_micro"))
      tok.join(broadcast(vocab), Seq("token"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(col("logp_micro")).as("logprob_micro"))
        .orderBy("doc_id")
    }),

    // Bigram-LM fluency: Σ ln P(w2|w1) per document, with
    // P(w2|w1) = c(w1 w2) / c(w1 ·) both counted over the corpus
    // bigram table (the denominator is bigram-initial counts, so the
    // model is properly normalized without tracking end-of-doc). Same
    // exact-integer-micro summation as doc_logprob — double sums are
    // partial-agg-order-dependent across engines, integer sums aren't.
    // One bigram shuffle for the model, broadcast back, per-doc agg.
    // Self-trained bigram-LM fluency: model and probe share one
    // persisted exploded-bigram frame; the operators are
    // [[graft.pipeline.Corpus.bigramModel]] / [[Corpus.bigramScore]]
    // (the score join is deliberately un-hinted — model is
    // corpus-scale at 100 TB; AQE broadcasts it when small).
    "doc_bigram_logprob" -> ((s, dir) => {
      // r21: the scored frame is session-staged (BigramChain.scored) —
      // ppl_buckets re-ran the same bigram explode + score join.
      import graft.pipeline.BigramChain
      BigramChain.scored(s, dir, docs(s, dir)).orderBy("doc_id")
    }),

    // CCNet-style perplexity buckets: docs ranked by per-bigram mean
    // logprob under the self-trained LM (best first), bucketed
    // head/middle/tail at exact integer thirds of cumulative BIGRAM
    // mass (the budget-tier convention — the crossing doc stays in
    // the richer bucket). The fluency tier CCNet routes through
    // different cleaning pipelines. Distributed prefix plan; ordering
    // on the IEEE-exact micro ratio with doc_id tiebreak.
    "ppl_buckets" -> ((s, dir) => {
      import graft.pipeline.BigramChain
      val scored = BigramChain.scored(s, dir, docs(s, dir))
        .select(col("doc_id"), col("n_bigrams"),
          (col("logprob_micro").cast("double") / col("n_bigrams"))
            .as("avg_lp_micro"))
        .withColumn("_ord",
          struct((-col("avg_lp_micro")).as("a"), col("doc_id").as("d")))
      val cum = graft.plans.Scale
        .cumSumDistributedLong(scored, "n_bigrams", "_ord", "cum_bigrams")
      val tot = broadcast(cum.agg(sum("n_bigrams").cast("long").as("_tot")))
      cum.crossJoin(tot)
        .select(
          col("doc_id"), col("n_bigrams"),
          round(col("avg_lp_micro"), 6).as("avg_lp_micro"),
          when((col("cum_bigrams") - col("n_bigrams")) * 3 < col("_tot"), "head")
            .when((col("cum_bigrams") - col("n_bigrams")) * 3 < col("_tot") * 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    }),

    // Cluster-size histogram over the near-dup components — the
    // dedup-audit view (how much of the corpus is duplicated, and in
    // what clump sizes). Rides the staged chain: two tiny aggregates
    // over the memoized CC labels.
    "dedup_cluster_sizes" -> ((s, dir) =>
      DedupChain.clusterLabels(s, dir, docs(s, dir))
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")),

    "tfidf_top_tokens" -> ((s, dir) =>
      Corpus.topTfidfTokens(docs(s, dir))
        .select(col("doc_id"), col("top_token"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id")),

    // BM25 keyword retrieval over the corpus — inverted-probe shape
    // (only query-term postings leave the scan; broadcast df + corpus
    // constants; TakeOrderedAndProject top-k). Integer-micro posting
    // contributions make the per-doc sum order-free, so the ranking is
    // bit-deterministic across engines. See [[Corpus.bm25TopK]].
    "bm25_topk" -> ((s, dir) =>
      Corpus.bm25TopK(docs(s, dir), Seq("spark", "merge", "window"), 20)
        .select(col("doc_id"), col("n_terms_matched"), col("score_micro"))),

    // Hybrid retrieval: Reciprocal Rank Fusion (Cormack et al. 2009,
    // the standard RAG-stack merge) of the lexical BM25 top-20 and
    // the vector top-20 — RRF_micro = Σ floor(1e6/(60+rank)) over the
    // lists a doc appears in, exact integers so the fused order is
    // engine-stable. Both input lists are k-bounded BEFORE fusion, so
    // the two rank windows run on ≤20-row frames (the corpus-side
    // work is the two underlying retrievals, both already scale-
    // shaped); missing-from-one-list docs contribute 0, not NULL.
    "hybrid_search_rrf" -> ((s, dir) => {
      val lex = Corpus.bm25TopK(docs(s, dir), Seq("spark", "merge", "window"), 20)
        .withColumn("bm25_rank", row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("bm25_rank"))
      val vec = Similarity.topK(embs(s, dir), numQueries = 1, k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("ann_rank"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf_micro",
          coalesce(expr("1000000 div (60 + bm25_rank)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + ann_rank)"), lit(0L)))
        .withColumn("fused_rank", row_number().over(
          Window.orderBy(col("rrf_micro").desc, col("doc_id").asc)))
        .where(col("fused_rank") <= 10)
        .orderBy("fused_rank")
    }),

    // Ordered conversion FUNNEL (view → click → signup → purchase):
    // a user reaches step k only via an event strictly after their
    // step-(k-1) time AND within the 6-hour conversion window (the
    // standard funnel attribution bound) — the chained-min spelling (three user-keyed
    // equi-joins + four map-side-combinable min aggs; each stage frame
    // is ≤ one row per user). Exact per-mille conversions, zero-guard
    // shared with the oracle. The sessionize/retention sibling every
    // event log serves.
    // Event-rate spike detector: per (event_type, hour), the count
    // against the trailing 3-hour mean — exact integer per-mille
    // (cnt·prev_n·1000 div prev_sum), anomaly gate at 1.5x. Windows
    // partition by event_type (parallel across types, linear within);
    // at 100 TB the hourly pre-agg collapses the stream to
    // types×hours rows before any window runs.
    "events_rate_anomaly" -> ((s, dir) => {
      val ev = events(s, dir)
      val hourly = ev
        .select(col("event_type"),
          graft.sources.Bars.eventTimeMicros(ev).as("us"))
        .withColumn("hour", expr("us div 3600000000"))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-3, -1)
      hourly
        .withColumn("prev_sum", sum("cnt").over(w))
        .withColumn("prev_n", count(lit(1)).over(w))
        .select(
          col("event_type"), col("hour"), col("cnt"),
          col("prev_sum"), col("prev_n"),
          when(col("prev_n") > 0,
            expr("cnt * prev_n * 1000 div prev_sum")).as("rate_pm"))
        .withColumn("anomaly",
          coalesce(col("rate_pm") > 1500L, lit(false)))
        .orderBy("event_type", "hour")
    }),

    // Exact-N uniform sample ("give me exactly 100 eval docs"): rank
    // every doc by a salted content-free hash of its id and take the
    // N smallest — a deterministic draw no rate-based sampler can
    // promise (rates give BINOMIAL sizes). Plan is TakeOrdered:
    // per-partition partial top-N, one N-row merge — no global sort,
    // no single-partition window, at any corpus size.
    "corpus_sample_fixed_n" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          TextOps.hash32(concat(lit("fixn:"), col("doc_id").cast("string")))
            .as("pick_key"))
        .orderBy(col("pick_key").asc, col("doc_id").asc)
        .limit(100)),

    // Last-touch revenue attribution: each purchase's value goes to
    // the channel (the props integer — a campaign-id proxy) of the
    // most recent SAME-USER click within the 6h window; purchases
    // with no qualifying click land in channel -1 (priced, not
    // dropped). The click join is keyed on (user_id, 6h time bucket),
    // NOT bare user_id: a purchase probes its own bucket and the
    // previous one (any click within 6h before pus lives in exactly
    // those two, since the bucket width equals the window), so one
    // bot user with 10^6 clicks stays window-bounded per key instead
    // of going quadratic-per-user (round-15 verdict; hot-user witness
    // in ScaleSmoke). Bucket index by FLOOR division
    // ([[graft.sources.Bars.timeBucket]]) — a double division could
    // round across a bucket edge, and truncating `div` would land a
    // pre-1970 (negative-micros) event one bucket high and silently
    // drop its attribution. Then one per-purchase max-struct agg +
    // one channel rollup; money in exact integer cents.
    "events_attribution" -> ((s, dir) => {
      val ev = events(s, dir)
      val e = ev.select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        graft.sources.Bars.eventTimeMicros(ev).as("us"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("channel"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("us").as("pus"),
          floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("us").as("cus"), col("event_id").as("cid"),
          col("channel"))
      val w = lit(21600000000L) // 6h in micros
      val clicksB = clicks.withColumn("bkt",
        graft.sources.Bars.timeBucket("cus", 21600000000L))
      val probes = purchases.withColumn("pbkt",
        graft.sources.Bars.timeBucket("pus", 21600000000L))
        .withColumn("bkt", explode(array(col("pbkt"), col("pbkt") - 1)))
      val best = probes.join(clicksB, Seq("user_id", "bkt"))
        .where(col("cus") < col("pus") && col("pus") - col("cus") <= w)
        .groupBy("pid")
        .agg(max(struct(col("cus"), col("cid"), col("channel"))).as("b"))
        .select(col("pid"), col("b.channel").as("channel"))
      purchases.join(best, Seq("pid"), "left")
        .select(coalesce(col("channel"), lit(-1)).as("channel"), col("cents"))
        .groupBy("channel")
        .agg(
          count(lit(1)).cast("bigint").as("n_purchases"),
          sum(col("cents")).as("attributed_cents"))
        .orderBy("channel")
    }),

    "events_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
      val e = ev.select(col("user_id"), col("event_type"),
        graft.sources.Bars.eventTimeMicros(ev).as("us"))
      val s1 = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val w = lit(21600000000L) // 6-hour conversion window (micros)
      val s2 = e.where(col("event_type") === "click").join(s1, "user_id")
        .where(col("us") > col("t1") && col("us") - col("t1") <= w)
        .groupBy("user_id").agg(min(col("us")).as("t2"))
      val s3 = e.where(col("event_type") === "signup").join(s2, "user_id")
        .where(col("us") > col("t2") && col("us") - col("t2") <= w)
        .groupBy("user_id").agg(min(col("us")).as("t3"))
      val s4 = e.where(col("event_type") === "purchase").join(s3, "user_id")
        .where(col("us") > col("t3") && col("us") - col("t3") <= w)
        .groupBy("user_id").agg(min(col("us")).as("t4"))
      val c = s1.agg(count(lit(1)).as("n1"))
        .crossJoin(s2.agg(count(lit(1)).as("n2")))
        .crossJoin(s3.agg(count(lit(1)).as("n3")))
        .crossJoin(s4.agg(count(lit(1)).as("n4")))
      val names = Seq("view", "click", "signup", "purchase")
      val rows = names.zipWithIndex.map { case (nm, i) =>
        val k = i + 1
        val prev = if (i == 0) s"n1" else s"n$i"
        struct(
          lit(k).as("step"), lit(nm).as("event_type"),
          col(s"n$k").as("n_users"),
          expr(s"CASE WHEN $prev = 0 THEN 0 ELSE (n$k * 1000) div $prev END")
            .as("conv_prev_pm"),
          expr(s"CASE WHEN n1 = 0 THEN 0 ELSE (n$k * 1000) div n1 END")
            .as("conv_first_pm"))
      }
      c.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
        .orderBy("step")
    }),

    // Weekly retention cohorts — the product-analytics read every
    // event log serves: cohort = a user's first active epoch-week,
    // rows = (cohort, week offset) with distinct active users and
    // exact per-mille retention. Two user-keyed aggregations (both
    // map-side combinable after the distinct) + one tiny cohort-sized
    // join; epoch-week is integer µs division so the bucketing is
    // engine-exact.
    // RFM user segmentation — the product-analytics companion of the
    // retention cohorts: per user recency (last event), frequency
    // (event count), monetary (purchase cents), each quartiled on the
    // distributed two-pass rank plan (the quality_deciles pattern —
    // range partition + local row_number + offsets, NO SinglePartition
    // window), then rolled up to the ≤64 (r,f,m) segments. The three
    // rank passes run over the POST-AGG users frame (|users| ≪
    // |events|), so the corpus-scale cost is the one events groupBy.
    "events_rfm_segments" -> ((s, dir) => {
      val ev = events(s, dir)
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
      val r3 = graft.plans.Scale.rowNumberDistributed(
        r2, Seq(col("cents").desc, col("user_id").asc), "_mr")
      r3.select(
          expr(s"((_rr - 1) * 4) div $n").as("r_q"),
          expr(s"((_fr - 1) * 4) div $n").as("f_q"),
          expr(s"((_mr - 1) * 4) div $n").as("m_q"),
          col("cents"), col("n_events"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("cents")).as("total_cents"),
          sum(col("n_events")).as("total_events"))
        .orderBy("r_q", "f_q", "m_q")
    }),

    "events_retention_cohorts" -> ((s, dir) => {
      val ev = events(s, dir)
      val uw = ev.select(
          col("user_id"), graft.sources.Bars.eventTimeMicros(ev).as("us"))
        .select(col("user_id"), expr("us div 604800000000").as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohort.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_users"))
      uw.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(sizes, Seq("cohort_wk"))
        .select(
          col("cohort_wk"), col("week_offset"), col("n_active"),
          col("cohort_users"),
          expr("(n_active * 1000) div cohort_users").as("retained_pm"))
        .orderBy("cohort_wk", "week_offset")
    }),

    "sessionize" -> ((s, dir) =>
      Sessionize.sessions(events(s, dir))
        .orderBy("user_id", "session_idx")),

    // Per-user event rollup via the two-phase SALTED aggregation
    // (graft.plans.Scale.saltedAgg) — the skew-proof plan for
    // power-law keys: phase 1 spreads each user over 8 (key, salt)
    // reducers, phase 2 merges the algebraic partials. Results are
    // identical to a plain groupBy (the oracle IS the plain groupBy),
    // which is exactly the point: same answer, no hot reducer.
    "events_user_stats_salted" -> ((s, dir) =>
      graft.plans.Scale.saltedAgg(
        events(s, dir), "user_id", col("event_id"), 8,
        Seq(count(lit(1)).as("_n"), sum(col("value")).as("_sv")),
        Seq(
          sum(col("_n")).cast("bigint").as("n_events"),
          round(sum(col("_sv")), 6).as("sum_value")))
        .orderBy(col("n_events").desc, col("user_id").asc)
        .limit(50)),

    // The SKEWED-key salted witness (r18 verdict): the same two-phase
    // plan keyed on the LOW-cardinality column join_skew_plan measures
    // (event_type — 5 keys over the whole stream, so every key is
    // "hot" relative to a single reducer), with the salt count wired
    // to the keySkewPlan RECOMMENDATION (a 1-row bounded collect of
    // three map-side-combinable aggregates), floored at 8 because this
    // fixture is deliberately near-uniform (skew_milli ~1008; the
    // planner alone would answer 1 and the witness would never spread)
    // — a production power-law stream drives the factor itself. The
    // oracle is the plain ONE-stage groupBy: salting must be invisible
    // in the result. SaltSpec asserts the declared plan's two-stage
    // shape (partial exchange on (event_type, _salt), final on
    // event_type alone).
    "events_hotkey_stats_salted" -> ((s, dir) => {
      val ev = events(s, dir)
      val recommended = graft.plans.Scale.keySkewPlan(ev, Seq("event_type"))
        .select("salt_factor").head().getLong(0).toInt
      // The value sum is EXACT-INTEGER (floor to micro-units, then a
      // bigint sum): each of the 5 keys sums ~n/5 of the whole stream,
      // so a double sum's accumulation-order error would sit right on
      // the oracle's 6dp rounding grid at larger SF — the two-phase
      // salted association differs from DuckDB's single pass by
      // construction, and this witness must stay green at ANY scale.
      // floor(value*1e6) is bit-identical IEEE in both engines (the
      // topKSq8 floor(+0.5) argument); min/max are order-independent.
      graft.plans.Scale.saltedAgg(
        ev, "event_type", col("event_id"), math.max(recommended, 8),
        Seq(count(lit(1)).as("_n"),
          sum(floor(col("value") * 1000000).cast("long")).as("_sv"),
          min(col("value")).as("_mn"), max(col("value")).as("_mx")),
        Seq(
          sum(col("_n")).cast("bigint").as("n_events"),
          sum(col("_sv")).cast("bigint").as("sum_value_micro"),
          min(col("_mn")).as("min_value"),
          max(col("_mx")).as("max_value")))
        .orderBy("event_type")
    }),

    // The batched per-partition decode seam (mapPartitions, the
    // mapInPandas shape) run end-to-end with the deterministic fake
    // decoder; its hash-derived dimensions are reproduced byte-exactly
    // by the oracle (Java Arrays.hashCode emulated with wrapped 32-bit
    // arithmetic), so the WHOLE seam — Dataset encoding, batching,
    // decode contract, schema — is correctness-gated, not just assumed.
    "multimodal_decode" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(s, docs(s, dir)))
        .toDF()
        .select(
          col("id").as("doc_id"),
          col("modality"),
          col("n_bytes"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
        .orderBy("doc_id")),

    // REAL decode, not the stub: deterministic grayscale PNGs (dims
    // and pixels are pure functions of doc_id) are ENCODED with
    // javax.imageio on executors, then DECODED back through the same
    // batched seam by Multimodal.ImageIODecoder; the emitted 16-bin
    // pixel histogram counts only match if actual PNG bytes
    // round-tripped through the real codec — the oracle reproduces
    // them arithmetically from the pixel formula.
    "multimodal_decode_image" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.syntheticImages(s, docs(s, dir)),
        Multimodal.ImageIODecoder).toDF()
      val n = col("width").cast("long") * col("height").cast("long")
      val bins = (0 until 16).map(b =>
        round(element_at(col("features"), b + 1) * n).cast("bigint").as(s"h$b"))
      feats.select(Seq(
          col("id").as("doc_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames")) ++ bins: _*)
        .orderBy("doc_id")
    }),

    // The decode -> RESIZE -> featurize chain (the slot a production
    // pipeline uses to normalize model input dims): real PNGs decoded
    // by javax.imageio, nearest-neighbor resized to 8x8 inside the
    // same batched seam, then histogrammed. Every resampled pixel is
    // an exact integer function of doc_id (src index (i*srcLen)//64
    // into the (id*31+j)%256 grid), so the oracle predicts the full
    // 16-bin histogram of the RESIZED payload arithmetically.
    "multimodal_resize" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.syntheticImages(s, docs(s, dir)),
        Multimodal.ImageIODecoder,
        resizeTo = Some((8, 8))).toDF()
      val bins = (0 until 16).map(b =>
        round(element_at(col("features"), b + 1) * 64).cast("bigint").as(s"h$b"))
      feats.select(Seq(
          col("id").as("doc_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height")) ++ bins: _*)
        .orderBy("doc_id")
    }),

    // Perceptual-hash image dedup: aHash (decode → 8×8 NN-resize →
    // mean-threshold bits) over the REAL-PNG synthetic corpus, then
    // the exact-hash group/canonical pattern — the image mirror of
    // the text md5 tier. The oracle replays decode+resize+threshold
    // ARITHMETICALLY (the multimodal_resize stance), so the whole
    // seam is correctness-gated. See [[Multimodal.aHash]].
    "multimodal_phash_dedup" -> ((s, dir) => {
      val h = graft.pipeline.AHashChain.imageHashes(s, dir, docs(s, dir))
      val g = h.groupBy("ahash").agg(
        count(lit(1)).as("n_same"),
        min(col("doc_id")).as("_canon"))
      h.join(g, Seq("ahash"))
        .select(
          col("doc_id"), col("ahash"), col("n_same"),
          (col("doc_id") === col("_canon")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // Near-duplicate image PAIRS by aHash Hamming distance — the
    // text simhash64 tier run verbatim on the packed perceptual hash
    // (8×8-bit banded equi-join, exhaustive ≤ hamming 3, never
    // all-pairs). See [[Multimodal.aHashPairs]].
    "multimodal_phash_pairs" -> ((s, dir) =>
      Multimodal.aHashPairs(
        graft.pipeline.AHashChain.imageHashes(s, dir, docs(s, dir)),
        maxHamming = 3)
        .orderBy("doc_a", "doc_b")),

    // Near-duplicate AUDIO pairs by aHash Hamming distance — the
    // banded tier completing the audio path the way phash_pairs
    // completes images: re-encoded/re-sampled audio shifts a few
    // envelope bits, which exact-hash grouping
    // (multimodal_audio_dedup) can never catch. Same 8×8-bit banded
    // equi-join, exhaustive ≤ hamming 3 by pigeonhole.
    "multimodal_audio_pairs" -> ((s, dir) =>
      // r21: the audio hash + banded pair graph is session-staged
      // (AHashChain.audioPairs) — four audio consumers previously each
      // re-ran the PCM decode pass, and the CC query re-ran this join.
      graft.pipeline.AHashChain.audioPairs(s, dir, docs(s, dir))
        .orderBy("doc_a", "doc_b")),

    // CC over the audio perceptual pair graph — cluster labels +
    // canonicals, completing the audio tier (hash → pairs → clusters)
    // exactly as multimodal_phash_clusters completes images.
    "multimodal_audio_clusters" -> ((s, dir) =>
      Dedup.clusters(
        graft.pipeline.AHashChain.audioPairs(s, dir, docs(s, dir))
          .select(col("doc_a"), col("doc_b")))
        .orderBy("doc_id")),

    // Connected components over the perceptual pair graph — image
    // cluster labels + canonicals, completing the image tier
    // (hash → pairs → clusters) with the SAME CC machinery the text
    // tiers use. Rides the staged hash frame.
    "multimodal_phash_clusters" -> ((s, dir) =>
      graft.pipeline.AHashChain.clusterLabels(s, dir, docs(s, dir))
        .orderBy("doc_id")),

    // The image funnel's DELIVERABLE: per perceptual cluster, the
    // canonical image to KEEP — highest resolution wins, doc_id
    // breaks ties — plus the cluster size, the dedup_representatives
    // manifest for the media tier. Resolution is the stored-metadata
    // rank every image pipeline has (here the synthetic corpus' id→
    // (w,h) metadata function); one window over the O(clustered docs)
    // label frame, riding the staged AHashChain hashes.
    "media_representatives" -> ((s, dir) => {
      val labels = graft.pipeline.AHashChain.clusterLabels(s, dir, docs(s, dir))
        .select(col("doc_id"), col("cluster_id"))
      val wKeep = Window.partitionBy("cluster_id")
        .orderBy(col("pixels").desc, col("doc_id").asc)
      labels
        .withColumn("pixels", Multimodal.imagePixels(col("doc_id")))
        .withColumn("rn", row_number().over(wKeep))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster_id")).cast("bigint"))
        .where(col("rn") === 1)
        .select(
          col("cluster_id"), col("doc_id").as("keep_doc_id"),
          col("pixels").as("keep_pixels"), col("cluster_size"))
        .orderBy("cluster_id")
    }),

    // The one-row media-dedup dashboard: image and audio perceptual
    // duplication in one glance (distinct hashes, docs in dup
    // groups, largest group) — the corpus_dedup_report stance for
    // the non-text modalities. Two bounded aggregates cross-joined
    // (1-row frames, broadcast by construction).
    "media_dedup_report" -> ((s, dir) => {
      val img = graft.pipeline.AHashChain.imageHashes(s, dir, docs(s, dir))
      val aud = graft.pipeline.AHashChain.audioHashes(s, dir, docs(s, dir))
      def tier(h: DataFrame, prefix: String): DataFrame = {
        val g = h.groupBy("ahash").agg(count(lit(1)).as("n"))
        g.agg(
          sum(col("n")).cast("long").as(s"n_${prefix}"),
          count(lit(1)).cast("long").as(s"n_${prefix}_hashes"),
          sum(when(col("n") > 1, col("n")).otherwise(lit(0L))).cast("long")
            .as(s"n_${prefix}_in_dup_groups"),
          max(col("n")).cast("long").as(s"max_${prefix}_group"))
      }
      tier(img, "images").crossJoin(tier(aud, "audio"))
    }),

    // The same perceptual tier for AUDIO: aHash over the 8-bit PCM
    // blobs (resize's 1-D degenerate case resamples the waveform to
    // 64 points; mean-threshold bits fingerprint the envelope — a
    // chromaprint-shaped stand-in), then exact-hash grouping. One
    // kernel serves both modalities, which is the point of the
    // decode-seam contract.
    "multimodal_audio_dedup" -> ((s, dir) => {
      val h = graft.pipeline.AHashChain.audioHashes(s, dir, docs(s, dir))
      val g = h.groupBy("ahash").agg(
        count(lit(1)).as("n_same"),
        min(col("doc_id")).as("_canon"))
      h.join(g, Seq("ahash"))
        .select(
          col("doc_id"), col("ahash"), col("n_same"),
          (col("doc_id") === col("_canon")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // VIDEO near-dup by frame fingerprints: per-frame aHash through
    // the same batched decode seam, then Jaccard over each video's
    // frame-hash SET with a df-cap on hub frames (black frames / intro
    // cards never generate pairs) — the re-cut/re-encode detector a
    // video corpus runs, on a synthetic series corpus whose overlap
    // structure is exact (variants d apart share 8−d of 8+d frames).
    // See [[graft.pipeline.Multimodal.videoDupPairs]].
    "multimodal_video_dedup" -> ((s, dir) =>
      // r21: the pair graph is session-staged (VideoChain.dupPairs) —
      // the CC consumer re-ran the same frame-set Jaccard join.
      graft.pipeline.VideoChain.dupPairs(s, dir, docs(s, dir))
        .orderBy("id_a", "id_b")),

    // CC over the video near-dup pair graph — cluster labels +
    // canonicals off the staged chain, completing the video tier
    // (frames → hashes → pairs → clusters) like every other modality.
    "multimodal_video_clusters" -> ((s, dir) =>
      graft.pipeline.VideoChain.clusterLabels(s, dir, docs(s, dir))
        .orderBy("doc_id")),

    // The canonical-per-cluster manifest for video (the
    // media_representatives deliverable): per cluster keep the video
    // with the LARGEST distinct-frame set (the least-truncated cut;
    // ties to the lowest id) — the row a curation job materializes
    // when it drops the other re-cuts. Staged labels + one set-size
    // agg + two windows.
    "multimodal_video_representatives" -> ((s, dir) => {
      // r22: set sizes off the staged SET table (the distinct ran per
      // query before)
      val sz = graft.pipeline.VideoChain.sets(s, dir, docs(s, dir))
        .select(col("video_id").as("doc_id"), col("ahash"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hashes"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_hashes").desc, col("doc_id").asc)
      graft.pipeline.VideoChain.clusterLabels(s, dir, docs(s, dir))
        .select("doc_id", "cluster_id")
        .join(sz, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster_id")))
        .where(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("keep_video_id"),
          col("n_hashes").as("keep_n_frames"), col("cluster_size"))
        .orderBy("cluster_id")
    }),

    // Ingest-time video dedup maintenance: the base corpus serves its
    // stored frame-hash SETS (decode never re-paid), only the delta
    // (every 10th video — the dedup_incremental convention) hashes its
    // frames, and the pair join runs delta × all. Contract: equals the
    // full rebuild restricted to delta-touching pairs — the oracle IS
    // the full chain plus that restriction. See
    // [[graft.pipeline.Multimodal.videoDupPairsIncremental]].
    "multimodal_video_dedup_incremental" -> ((s, dir) => {
      // the staged SET table serves both sides (r22): base videos read
      // their stored sets, the delta's sets are a filter of the same
      // staged frame, and base ∪ delta IS the frame — so the union +
      // distinct the generic entry point rebuilds per call collapses
      // to two filters of the session-staged artifact (% 10 on the
      // video id is the split; the declared result is spec-pinned
      // equal to the full rebuild restricted to delta pairs).
      val sets = graft.pipeline.VideoChain.sets(s, dir, docs(s, dir))
      Multimodal.videoDupPairsIncrementalFromSets(
          sets, sets.where(expr("video_id % 10 = 0")))
        .orderBy("id_a", "id_b")
    }),

    // Audio modality: synthetic 8-bit PCM blobs resampled to HALF the
    // source rate (1-D NN — resize's degenerate case) and featurized
    // through the same batched seam; histogram counts recovered as
    // integers. The oracle predicts the resampled waveform
    // arithmetically like multimodal_resize does for pixels.
    "multimodal_audio" -> ((s, dir) => {
      val feats = Multimodal.resampleFeatures(
        Multimodal.syntheticAudio(s, docs(s, dir)), 1, 2).toDF()
      val bins = (0 until 16).map(b =>
        round(element_at(col("features"), b + 1) * col("width"))
          .cast("bigint").as(s"h$b"))
      feats.select(Seq(
          col("id").as("doc_id"),
          col("n_bytes").as("n_samples"),
          col("width").cast("bigint").as("n_out")) ++ bins: _*)
        .orderBy("doc_id")
    }),

    // Frame sampling for video-modality records (keep every 3rd frame
    // index): the documents table plays a video corpus through the
    // deterministic fake decoder, whose hash-derived frame count the
    // oracle reproduces with the same wrapped-32-bit Arrays.hashCode
    // arithmetic as multimodal_decode; the sampled-index set is then
    // exact integer math (ceil(n/3) indexes, last = 3*(count-1)).
    "multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      val vids = docs(s, dir).select(
          col("doc_id").as("id"), lit("video").as("modality"),
          col("text").cast("binary").as("blob"), col("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.sampleFrameIndexes(
          Multimodal.extractFeatures(vids).toDF(), everyK = 3)
        .select(
          col("id").as("doc_id"),
          col("n_frames").cast("bigint").as("n_frames"),
          size(col("sampled_frames")).cast("bigint").as("n_sampled"),
          element_at(col("sampled_frames"), -1).cast("bigint").as("last_sampled"))
        .orderBy("doc_id")
    }),

    // Image-text ALIGNMENT gate (the LAION/CLIP-filter shape): per
    // image-caption pair, cosine between the image's feature vector
    // and a projection of the text embedding, thresholded — the pair
    // filter a multimodal corpus runs before training. Honest stance
    // per the Multimodal charter: the image features are the REAL
    // javax.imageio decode + 16-bin histogram (a model-based encoder
    // binds at the same batched seam) and the text projection is the
    // embedding's 16-dim prefix (the MRL-prefix convention); the
    // plumbing — decode seam, id-keyed pair join, guarded cosine,
    // integer-exact keep — is the deployable part. Pairs = docs with
    // an embedding row (partial coverage is the production reality).
    "media_text_alignment" -> ((s, dir) => {
      import graft.functions.dotF
      val feats = Multimodal.extractFeatures(
          Multimodal.syntheticImages(s, docs(s, dir)),
          Multimodal.ImageIODecoder).toDF()
        .select(col("id").as("doc_id"), col("features"))
      val txt = embs(s, dir).select(
        col("vec_id").as("doc_id"), slice(col("embedding"), 1, 16).as("e16"))
      val dn = sqrt(dotF(col("features"), col("features"))) *
        sqrt(dotF(col("e16"), col("e16")))
      feats.join(txt, Seq("doc_id"))
        .withColumn("score",
          when(dn > 0, dotF(col("features"), col("e16")) / dn)
            .otherwise(lit(0.0)))
        .select(
          col("doc_id"), round(col("score"), 6).as("alignment"),
          (round(col("score") * 1e6, 0).cast("bigint") >= 0L).as("keep"))
        .orderBy("doc_id")
    }),

    "multimodal_meta" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          col("text").cast("binary").as("blob"),
          col("source"))
        .select(
          col("doc_id"),
          length(col("blob")).cast("bigint").as("blob_len"),
          md5(col("blob")).as("blob_md5"),
          col("source"),
          lit("text").as("modality"))
        .orderBy("doc_id")),

    // Per-source vocabulary estimates from the bounded-state KMV
    // sketch aggregate (expressions/KmvSketch) — the deterministic
    // approx-distinct that CAN pass the hash-strict oracle, unlike
    // HLL. n_types/rel_err are the exact-witness columns a 100 TB run
    // drops (see Corpus.kmvTypes scaladoc).
    "approx_distinct_kmv" -> ((s, dir) =>
      Corpus.kmvTypes(docs(s, dir), 64).orderBy("source")),

    // Bounded-state quantile estimation completing the sketch trio
    // (KMV distinct, CMS counts, THIS for quantiles): per event type,
    // p50/p90 estimated from the deterministic bottom-128-by-hash
    // priority sample, with the EXACT percentiles as witness columns
    // and the relative errors the operator reports. The sample is
    // md5-ordered (reproducible across engines and runs); the
    // per-group top-k executes as a WindowGroupLimit partial rank
    // before the shuffle, so state per group is 128 rows regardless
    // of group size — the bounded-memory property a 100 TB quantile
    // pass needs.
    "approx_quantiles_sample" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
      val w = Window.partitionBy("event_type")
        .orderBy(
          TextOps.hash32(concat(lit("qs_"), col("event_id").cast("string"))).asc,
          col("event_id").asc)
      val samp = ev.withColumn("_rn", row_number().over(w))
        .where(col("_rn") <= 128)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_sample"),
          expr("percentile(value, 0.5)").as("p50_est"),
          expr("percentile(value, 0.9)").as("p90_est"))
      val exact = ev.groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          expr("percentile(value, 0.5)").as("p50_exact"),
          expr("percentile(value, 0.9)").as("p90_exact"))
      samp.join(exact, "event_type")
        .select(
          col("event_type"), col("n_events"), col("n_sample"),
          round(col("p50_est"), 6).as("p50_est"),
          round(col("p50_exact"), 6).as("p50_exact"),
          round(abs(col("p50_est") - col("p50_exact")) /
            greatest(abs(col("p50_exact")), lit(1e-9)), 6).as("p50_rel_err"),
          round(col("p90_est"), 6).as("p90_est"),
          round(col("p90_exact"), 6).as("p90_exact"),
          round(abs(col("p90_est") - col("p90_exact")) /
            greatest(abs(col("p90_exact")), lit(1e-9)), 6).as("p90_rel_err"))
        .orderBy("event_type")
    }),

    // Length-weighted deterministic sample (Efraimidis–Spirakis keys
    // from md5 draws): map-only key projection + TakeOrdered top-50,
    // no corpus shuffle.
    "corpus_sample_weighted" -> ((s, dir) =>
      Corpus.weightedSample(docs(s, dir), 50)),

    // sqrt-temperature source mixing shares for training-mix
    // composition; one corpus aggregation + a broadcast 1-row
    // denominator.
    "source_mix_weights" -> ((s, dir) =>
      Corpus.mixWeights(docs(s, dir)).orderBy("source")),

    // The mT5/mC4 temperature-sampling generalization (α=0.3): small
    // sources upsampled relative to proportional, big sources damped;
    // upsample_factor reads as effective epochs under a one-corpus-
    // pass budget. Map-only at any scale. See
    // [[Corpus.mixWeightsTemperature]].
    "source_mix_temperature" -> ((s, dir) =>
      Corpus.mixWeightsTemperature(docs(s, dir), 0.3).orderBy("source")),

    // Temperature mixing over SEMANTIC clusters instead of provenance
    // — the balancing step when source labels are unreliable, absent,
    // or too coarse (one "web" source hiding many topics): the staged
    // IVF cell assignment labels each embedded doc, docs WITHOUT an
    // embedding land in cluster -1 (partial embedding coverage is the
    // production reality, and the mix must account for that mass, not
    // drop it), then the same sqrt-family temperature reweighting as
    // source_mix_temperature. Broadcast centroids + one lang-sized
    // shuffle; the doc↔embedding join is id-keyed.
    "source_mix_semantic" -> ((s, dir) => {
      val e = embs(s, dir)
      val cells = Similarity.cellAssignments(
          e, graft.pipeline.IvfChain.centroids(s, dir, e))
        .select(col("vec_id").as("doc_id"), col("cid"))
      val labeled = docs(s, dir).join(cells, Seq("doc_id"), "left")
        .select(coalesce(col("cid"), lit(-1)).as("source"), col("text"))
      Corpus.mixWeightsTemperature(labeled, 0.3)
        .withColumnRenamed("source", "cluster")
        .orderBy("cluster")
    }),

    // The multi-epoch reading of the mix (LLaMA-style): at a training
    // budget of 4x the corpus, each source's sqrt-temperature token
    // allocation expressed as EPOCHS over its own data (per-mille),
    // capped at 4 — the repeat-small-high-quality-sources rule, with
    // the cap flag showing which sources saturate it. Same single
    // aggregation as source_mix_weights plus integer arithmetic.
    "mix_epochs" -> ((s, dir) => {
      val mw = Corpus.mixWeights(docs(s, dir))
      val tot = broadcast(mw.agg(sum("n_tokens").cast("long").as("_tot")))
      mw.crossJoin(tot)
        .select(
          col("source"), col("n_docs"), col("n_tokens"), col("mix_weight"),
          floor(col("mix_weight") * (col("_tot") * 4).cast("double"))
            .cast("long").as("alloc_tokens"))
        .withColumn("epochs_permille",
          least(expr("(alloc_tokens * 1000) div n_tokens"), lit(4000L)))
        .withColumn("capped",
          expr("(alloc_tokens * 1000) div n_tokens") > 4000L)
        .orderBy("source")
    }),

    // Materialize the mix: fill a 2000-token budget per mix_weight
    // shares, keeping hash-ordered docs per source until each source's
    // budget is spent. Broadcast weights + one window shuffle on
    // source.
    "corpus_budget_sample" -> ((s, dir) =>
      Corpus.budgetSample(docs(s, dir), 2000L)
        .orderBy("source", "cum_tokens", "doc_id")),

    // Budget fill denominated in BPE tokens (mix weights AND per-doc
    // counts both re-expressed through [[Bpe.tokenCount]] — a budget
    // mixes correctly only if numerator and denominator use the same
    // tokenizer). Same broadcast-weights + one-window plan.
    "corpus_budget_sample_bpe" -> ((s, dir) =>
      Corpus.budgetSample(
          BpeChain.encoded(s, dir, docs(s, dir))
            .select(col("doc_id"), col("source"), col("bpe").as("text")),
          2000L, t => length(t).cast("long"))
        .orderBy("source", "cum_tokens", "doc_id")),

    // DSIR (Xie et al. 2023) importance weights: hashed unigram+bigram
    // bag log-likelihood ratio of a target distribution (source src1
    // plays the "high-quality target") vs the raw corpus. Both models
    // are fixed 128-bucket broadcast tables at any corpus size; the
    // log-ratio is integer-micro per bucket so the per-doc sum is
    // order-free. See [[Corpus.dsirWeights]].
    "dsir_weights" -> ((s, dir) =>
      graft.pipeline.DsirChain.weights(s, dir, docs(s, dir))
        .select(
          col("doc_id"), col("n_feats"), col("weight_micro"),
          round(col("weight_micro").cast("double") / col("n_feats") / 1e6, 6)
            .as("avg_logratio"))
        .orderBy("doc_id")),

    // The resampling step: fill a 2000-token global budget with the
    // most target-like documents first — distributed prefix sum over
    // the (-avg_logratio, doc_id) total order, no SinglePartition
    // window. See [[Corpus.dsirSample]].
    "corpus_sample_dsir" -> ((s, dir) =>
      Corpus.dsirSampleFromWeights(
          graft.pipeline.DsirChain.weights(s, dir, docs(s, dir)),
          docs(s, dir), 2000L)
        .orderBy("cum_tokens", "doc_id")),

    // The co-located join: doc token stats ⋈ embedding norms, both
    // served from the write-once BUCKETED doc_id layout
    // ([[graft.pipeline.BucketStore]]) — the repeated-join family's
    // 100 TB shape, where the partitioning shuffle was paid once at
    // write time and the join itself runs exchange-free
    // (BucketingSpec asserts the plan). The oracle is the plain join:
    // storage layout must be invisible in the result.
    "colocated_join_stats" -> ((s, dir) => {
      val (dTab, eTab) = graft.pipeline.BucketStore.tables(s, dir)
      s.table(dTab).join(s.table(eTab), Seq("doc_id"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"),
          round(sum(col("norm_micro")).cast("double") / count(lit(1)) / 1e6, 6)
            .as("avg_norm"))
        .orderBy("source")
    }),

    // Count-min sketch frequency estimates for the top-50 tokens, with
    // exact-count witness columns (dropped at 100 TB like kmvTypes'
    // n_types). The sketch exchange is <= d*w rows total; the finished
    // sketch broadcasts.
    "approx_counts_cms" -> ((s, dir) =>
      Corpus.cmsCounts(docs(s, dir))
        .orderBy(col("cnt").desc, col("token").asc)),

    // Z-ORDER layout effectiveness (the Delta/Iceberg OPTIMIZE ZORDER
    // tradeoff, measured): Morton-curve files vs leading-column-sorted
    // files over events(user_id, value), per-file min/max footer
    // stats, 8 range probes per dimension — the scan fraction a
    // pushed-down range predicate would actually read under each
    // layout. See [[graft.sources.Zorder.skippingStats]].
    "zorder_layout_stats" -> ((s, dir) =>
      graft.sources.Zorder.skippingStats(
          events(s, dir), col("user_id"), col("value"))
        .orderBy("layout", "probe_dim")),

    // SOFT dedup via cluster-size-weighted sampling: instead of hard
    // dropping near-duplicates, keep each doc with probability
    // 1/|cluster| and carry weight = |cluster| (Horvitz-Thompson —
    // expected content mass unbiased, duplicated content downweighted;
    // the middle ground between corpus_filter's hard drop and keeping
    // everything). Keep rule is exact-integer ((h % 1e6) * size < 1e6)
    // so both engines agree bit-for-bit; singletons always pass with
    // weight 1. Reuses the session-staged cluster labels.
    "corpus_sample_dedup_weighted" -> ((s, dir) => {
      val d = docs(s, dir)
      val labels = DedupChain.clusterLabels(s, dir, d).select("doc_id", "cluster_id")
      val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      d.join(labels.join(sizes, "cluster_id"), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          coalesce(col("sz"), lit(1L)).as("cluster_size"),
          (TextOps.hash32(concat(lit("dwsample|"), col("doc_id").cast("string"))) % 1000000)
            .as("u"))
        .where(col("u") * col("cluster_size") < 1000000)
        .select(
          col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("cluster_size").cast("double").as("weight"))
        .orderBy("doc_id")
    }),

    // Horvitz-Thompson sampling balanced by SEMANTIC cluster —
    // corpus_sample_dedup_weighted's spelling with staged IVF cells as
    // the cluster key: inclusion probability 1/|cell|, weight |cell|,
    // so dominant topics stop drowning the mix while the
    // weighted estimator stays unbiased (the SemDeDup-era
    // diversity-sampling read). Unembedded docs are their own
    // singleton cluster (kept with probability 1, weight 1).
    "corpus_sample_cluster_balanced" -> ((s, dir) => {
      val e = embs(s, dir)
      val cells = Similarity.cellAssignments(
          e, graft.pipeline.IvfChain.centroids(s, dir, e))
        .select(col("vec_id").as("doc_id"), col("cid"))
      val sizes = cells.groupBy("cid").agg(count(lit(1)).as("sz"))
      docs(s, dir).join(cells.join(sizes, "cid"), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("cid").cast("bigint"), col("doc_id")).as("cluster_id"),
          coalesce(col("sz"), lit(1L)).as("cluster_size"),
          (TextOps.hash32(concat(lit("cbsample|"), col("doc_id").cast("string"))) % 1000000)
            .as("u"))
        .where(col("u") * col("cluster_size") < 1000000)
        .select(
          col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("cluster_size").cast("double").as("weight"))
        .orderBy("doc_id")
    }),

    // The LSH S-curve parameter planner: for every (bands x rows)
    // split of the 8-hash signature budget, the threshold similarity
    // s* = (1/b)^(1/r) and candidate probabilities 1-(1-s^r)^b at a
    // similarity grid — the closed-form table one consults before
    // committing a banding config at corpus scale (more bands = higher
    // recall + more candidate volume; the shipped 4x2 config is
    // flagged). Pure config-space math, no corpus scan.
    "lsh_param_plan" -> ((s, dir) => {
      import s.implicits._
      val grid = Seq((8, 1), (4, 2), (2, 4), (1, 8)).toDF("bands", "rows_per_band")
      def pAt(sv: Double) =
        round(lit(1.0) - pow(lit(1.0) - pow(lit(sv), col("rows_per_band")), col("bands")), 6)
      grid.select(
          col("bands"), col("rows_per_band"),
          (col("bands") === 4 && col("rows_per_band") === 2).as("is_current"),
          round(pow(lit(1.0) / col("bands"), lit(1.0) / col("rows_per_band")), 6).as("s_star"),
          pAt(0.3).as("p_at_030"), pAt(0.5).as("p_at_050"),
          pAt(0.7).as("p_at_070"), pAt(0.9).as("p_at_090"))
        .orderBy(col("bands").desc)
    }),

    // Snapshot CHANGELOG — the membership complement of BOTH existing
    // snapshot monitors: corpus_snapshot_diff tracks token-VOLUME
    // share drift (no id join, no content hashes) and
    // source_drift_report tracks quality/dup-rate STATS; neither can
    // say WHICH documents changed. This one can: between two
    // snapshots, per source, how many docs were ADDED, REMOVED,
    // MODIFIED (same id, different content hash), or unchanged, with
    // the churn rate in per-mille of the union. Fixture snapshots derive from the one table (A drops
    // doc_id%10==0, B drops %10==1 and revises %13==0's text); a real
    // ingest keys them by snapshot date. ONE full-outer join on doc_id
    // (equi-join, linear at any scale — membership diff is the one
    // question that genuinely needs both snapshots keyed side by side)
    // + one source rollup.
    "snapshot_diff_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val a = d.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("source"), md5(col("text")).as("ha"))
      val b = d.where(col("doc_id") % 10 =!= 1)
        .select(col("doc_id"), col("source").as("source_b"),
          md5(when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text"))).as("hb"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(
          coalesce(col("source"), col("source_b")).as("source"),
          col("ha"), col("hb"))
        .groupBy("source")
        .agg(
          sum(when(col("ha").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("hb").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("ha").isNotNull && col("hb").isNotNull &&
            col("ha") =!= col("hb"), 1L).otherwise(0L)).as("n_modified"),
          sum(when(col("ha") === col("hb"), 1L).otherwise(0L)).as("n_unchanged"),
          count(lit(1)).as("n_union"))
        .withColumn("churn_pm",
          expr("(n_added + n_removed + n_modified) * 1000 div n_union"))
        .orderBy("source")
    }),

    // Datasheet CHANGELOG — the release-card delta between two
    // snapshots, completing the governance trio: snapshot_diff_report
    // says WHICH docs changed, source_drift_report says WHICH sources
    // moved, THIS says what the published card fields did — docs,
    // token/char mass, dup rate, gopher pass rate, mean quality, and
    // the token-length p50/p90, each as (a, b, delta). The fixture
    // snapshots are snapshot_diff_report's own convention (A drops
    // doc_id%10==0, B drops %10==1 and revises %13==0's text), so the
    // membership diff and this field diff describe the SAME release
    // pair. Two 1-row card aggregates (each one corpus scan with
    // map-side partial combine) cross-joined broadcast — no keyed
    // join exists to pay for at any scale.
    "datasheet_diff" -> ((s, dir) => {
      def card(d: DataFrame) = {
        val nTok = size(TextOps.tokens(col("text"))).cast("bigint")
        d.select(
            nTok.as("nt"),
            length(col("text")).cast("bigint").as("nc"),
            md5(col("text")).as("h"),
            Corpus.gopherKeep().as("keep"),
            floor(TextOps.qualityScore(col("text")) * 1000000 + 0.5)
              .cast("bigint").as("q"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("nt")).as("n_tokens"),
            sum(col("nc")).as("n_chars"),
            countDistinct(col("h")).as("_nd"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("_gp"),
            sum(col("q")).as("_qs"),
            expr("percentile(nt, 0.5)").as("_p50"),
            expr("percentile(nt, 0.9)").as("_p90"))
          .select(
            col("n_docs"), col("n_tokens"), col("n_chars"),
            expr("(n_docs - _nd) * 1000 div n_docs").as("dup_pm"),
            expr("_gp * 1000 div n_docs").as("gopher_pass_pm"),
            expr("_qs div n_docs").as("mean_quality_micro"),
            col("_p50").as("p50_tokens"),
            col("_p90").as("p90_tokens"))
      }
      val d0 = docs(s, dir)
      val a = card(d0.where(col("doc_id") % 10 =!= 0).select(col("text")))
      val b = card(d0.where(col("doc_id") % 10 =!= 1).select(
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text")))
      def tag(df: DataFrame, t: String) =
        df.columns.foldLeft(df)((acc, c) => acc.withColumnRenamed(c, s"${c}_$t"))
      val ints = Seq("n_docs", "n_tokens", "n_chars", "dup_pm",
        "gopher_pass_pm", "mean_quality_micro")
      val dbls = Seq("p50_tokens", "p90_tokens")
      tag(a, "a").crossJoin(broadcast(tag(b, "b")))
        .select(
          ints.flatMap(f => Seq(
            col(s"${f}_a"), col(s"${f}_b"),
            (col(s"${f}_b") - col(s"${f}_a")).as(s"${f}_delta"))) ++
          dbls.flatMap(f => Seq(
            round(col(s"${f}_a"), 6).as(s"${f}_a"),
            round(col(s"${f}_b"), 6).as(s"${f}_b"),
            round(col(s"${f}_b") - col(s"${f}_a"), 6).as(s"${f}_delta"))): _*)
    }),

    // Per-source INGEST DRIFT report (the ivf_cell_drift stance for
    // the text pipeline): between the base half and the delta-ingest
    // half of each source, the three signals that regress first when
    // an upstream crawler breaks — volume share, mean quality score,
    // exact-dup rate — each with an exact integer per-mille delta.
    // ONE corpus scan: a single groupBy(source, is_delta) computes
    // both halves' stats (round 16 — the per-side spelling scanned the
    // unpersisted frame twice, the dominant cost at 100 TB), then a
    // 2-rows-per-source conditional-max pivot assembles the report.
    // The quality score is the committed single-source-of-truth
    // column. A real deployment keys the halves by snapshot date; the
    // fixture uses the doc_id parity proxy.
    "source_drift_report" -> ((s, dir) => {
      // hash-keyed halves: doc_id parity correlates with source in the
      // fixture (block id assignment), which would degenerate every
      // per-source split to one empty side
      val half = (TextOps.hash32(
        concat(lit("drift:"), col("doc_id").cast("string"))) % 2 === 1)
        .as("is_delta")
      val st = docs(s, dir).select(
        col("source"), half,
        floor(TextOps.qualityScore(col("text")) * 1000000 + 0.5)
          .cast("bigint").as("q_micro"),
        md5(col("text")).as("h"))
      val sides = st.groupBy("source", "is_delta")
        .agg(
          count(lit(1)).as("_n"),
          sum(col("q_micro")).as("_qs"),
          countDistinct(col("h")).as("_nd"))
        .select(
          col("source"), col("is_delta"), col("_n"),
          expr("_qs div _n").as("_q"),
          expr("(_n - _nd) * 1000 div _n").as("_dup"))
      def pick(d: Boolean, c: String) =
        coalesce(max(when(col("is_delta") === d, col(c))), lit(0L))
      sides.groupBy("source")
        .agg(
          pick(d = false, "_n").as("base_docs"),
          pick(d = true, "_n").as("delta_docs"),
          pick(d = false, "_q").as("base_q_micro"),
          pick(d = true, "_q").as("delta_q_micro"),
          pick(d = false, "_dup").as("base_dup_pm"),
          pick(d = true, "_dup").as("delta_dup_pm"))
        .withColumn("q_drift_micro", abs(col("delta_q_micro") - col("base_q_micro")))
        .withColumn("dup_drift_pm", abs(col("delta_dup_pm") - col("base_dup_pm")))
        .orderBy("source")
    }),

    // Shuffle-key skew planner over the event stream's two natural
    // join keys: measured max/avg imbalance in exact per-mille and
    // the saltedAgg salt factor that would level the hot key — the
    // table read BEFORE keying a 100 TB join. See
    // [[graft.plans.Scale.keySkewPlan]].
    "join_skew_plan" -> ((s, dir) =>
      graft.plans.Scale.keySkewPlan(
          events(s, dir), Seq("user_id", "event_type"))
        .orderBy("key_col")),

    // IVF sizing planner — lsh_param_plan's counterpart for the
    // trained-cell tier, derived from the CORPUS (one count agg, no
    // scan): per nlist rule (the shipped 8, the sqrt-n heuristics, the
    // bounded-cell n/64), average cell population, scan fraction at
    // nprobe 1/2/4 in exact per-mille, the per-Lloyd-iteration
    // training bill (n·nlist distance evals), and the broadcast
    // centroid-table bytes. The table an operator reads before
    // retraining cells at a new corpus size — the "cells track corpus"
    // rule made quantitative.
    "ivf_param_plan" -> ((s, dir) => {
      import s.implicits._
      val n = embs(s, dir).agg(count(lit(1)).as("n"))
      val grid = Seq("current_8", "sqrt_n", "4sqrt_n", "n_over_64").toDF("rule")
      val nlist = when(col("rule") === "current_8", lit(8L))
        .when(col("rule") === "sqrt_n", ceil(sqrt(col("n"))))
        .when(col("rule") === "4sqrt_n", ceil(sqrt(col("n"))) * 4)
        .otherwise(greatest(lit(1L), expr("n div 64")))
      broadcast(n).crossJoin(grid)
        .withColumn("nlist", nlist.cast("bigint"))
        .select(
          col("rule"), col("nlist"),
          (col("nlist") === 8L).as("is_current"),
          expr("(n * 1000) div nlist").as("avg_cell_milli"),
          least(lit(1000L), expr("1000 div nlist")).as("scanned_pm_p1"),
          least(lit(1000L), expr("2000 div nlist")).as("scanned_pm_p2"),
          least(lit(1000L), expr("4000 div nlist")).as("scanned_pm_p4"),
          (col("n") * col("nlist")).as("train_mults"),
          (col("nlist") * 512L).as("centroid_bytes"))
        .orderBy("rule")
    }),

    // Corpus n-gram diversity (type-token ratio at n=1,2,3) per
    // source — the cross-document repetitiveness dial (a self-BLEU
    // proxy): templated/boilerplate-heavy sources show low TTR at
    // higher n. Complements repetition_stats (intra-doc) and
    // approx_distinct_kmv (the sketch spelling of the same distinct
    // count, which is what replaces the exact countDistinct at
    // 100 TB). One union of three shingle explodes, one grouped
    // distinct aggregate.
    "ngram_diversity" -> ((s, dir) =>
      Corpus.ngramDiversity(docs(s, dir)).orderBy("source", "n")),

    // The 100 TB spelling of the release card: same composition row as
    // corpus_datasheet, with every figure whose exact form needs an
    // unbounded shuffle or buffer replaced by its bounded-state sketch
    // — distinct documents via the KMV sketch
    // ([[graft.functions.kmvSketch]]: O(k) aggregation state, the key
    // space never shuffles), token-length p50/p90 via the
    // deterministic bottom-256-by-md5-hash priority sample
    // (TakeOrdered: per-partition top-k then a 256-row driver merge —
    // the approx_quantiles_sample spelling at corpus scope). Sources
    // and langs stay exact countDistinct (cardinality ~10: partial
    // aggregation bounds the exchange regardless of corpus size).
    // Exact witnesses ride alongside at test scale — `exact_dup_pm`
    // next to `est_dup_pm`, exact percentiles next to the sampled
    // ones — so the sketch error is MEASURED per run, not asserted;
    // a 100 TB run drops the witness columns, which removes the only
    // full-width distinct shuffle and the exact-percentile buffer.
    // k = 256 (vs approx_distinct_kmv's 64) because the dup rate is
    // this card's headline: a k-sketch resolves dup rates only down
    // to ~1/sqrt(k) of the corpus (~60‰ at k=64, ~30‰ at k=256) —
    // at sf0.1 the true rate is 1‰, so est_dup_pm mostly reports the
    // sketch's own noise; the witness column makes that visible
    // rather than hiding it (measured r17 at sf0.1: est −7‰ vs
    // exact 1‰ at k=256; −64‰ at k=64).
    "corpus_datasheet_sketch" -> ((s, dir) => {
      import graft.functions.kmvSketch
      val k = 256
      // 60-bit hash space for the KMV (15 hex chars of md5, the same
      // width the vocab sketch uses): a 32-bit space saturates near
      // 2^32 distinct keys — ~11% low at 1e9 docs, i.e. exactly the
      // corpus size this card exists for. 60 bits keeps expected
      // collisions <1 up to ~10^9 keys. The EXACT witness counts full md5
      // strings — the same figure corpus_datasheet publishes
      // (CrossInvariantSpec pins the equality), never a hash-width
      // approximation.
      val d = docs(s, dir).select(
        col("source"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("nt"),
        length(col("text")).cast("bigint").as("nc"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("bigint")
          .as("h"),
        md5(col("text")).as("hx"),
        TextOps.hash32(concat(lit("dsq_"), col("doc_id").cast("string")))
          .as("sh"),
        col("doc_id"))
      val head = d.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("nt")).as("n_tokens"),
          sum(col("nc")).as("n_chars"),
          kmvSketch(col("h"), k).as("kmv"),
          countDistinct(col("hx")).as("_nd"),
          expr("percentile(nt, 0.5)").as("_p50x"),
          expr("percentile(nt, 0.9)").as("_p90x"))
        .withColumn("_est",
          when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(
              lit((k - 1).toDouble * 1152921504606846976.0) /
                element_at(col("kmv"), k).cast("double")))
      val samp = d.orderBy(col("sh").asc, col("doc_id").asc).limit(256)
        .agg(
          expr("percentile(nt, 0.5)").as("_p50s"),
          expr("percentile(nt, 0.9)").as("_p90s"))
      head.crossJoin(samp)
        .select(
          col("n_docs"), col("n_sources"), col("n_langs"),
          col("n_tokens"), col("n_chars"),
          round(col("_est"), 6).as("est_distinct_docs"),
          round((col("n_docs").cast("double") - col("_est")) * 1000.0 /
            col("n_docs").cast("double"), 6).as("est_dup_pm"),
          expr("(n_docs - _nd) * 1000 div n_docs").as("exact_dup_pm"),
          round(col("_p50s"), 6).as("p50_tokens_est"),
          round(col("_p90s"), 6).as("p90_tokens_est"),
          round(col("_p50x"), 6).as("p50_tokens_exact"),
          round(col("_p90x"), 6).as("p90_tokens_exact"))
    }),

    // The witness-FREE release card — corpus_datasheet_sketch with the
    // measuring instruments removed: this is the DECLARED plan a
    // 100 TB run actually executes, and R18PlanProbe/PipelineSpec
    // assert the optimized plan carries NO exact distinct aggregate,
    // NO Expand, and NO percentile outside the bounded 256-row sample
    // — the properties the sketch tier exists for, gated instead of
    // claimed. Every figure is bounded-state: exact counters (plain
    // sums, partial-combined), KMV k=256 estimates for distinct docs
    // AND the source/lang cardinalities (which the witnessed card
    // still counted exactly via countDistinct — that pair of
    // distincts is what forced its Expand; at cardinality << k the
    // KMV array is the exact distinct-hash set, so nothing is lost),
    // and sample percentiles over the deterministic
    // bottom-256-by-md5-hash draw (TakeOrdered: per-partition top-k,
    // 256-row merge). Sketch error stays measured WHERE the witnesses
    // live — corpus_datasheet_sketch; this row is the production
    // spelling those measurements license.
    "corpus_datasheet_sketch_pure" -> ((s, dir) => {
      import graft.functions.kmvSketch
      val k = 256
      def h60(c: Column) =
        conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")
      def est(kmv: Column) =
        when(size(kmv) < k, size(kmv).cast("double"))
          .otherwise(
            lit((k - 1).toDouble * 1152921504606846976.0) /
              element_at(kmv, k).cast("double"))
      val d = docs(s, dir).select(
        size(TextOps.tokens(col("text"))).cast("bigint").as("nt"),
        length(col("text")).cast("bigint").as("nc"),
        h60(col("text")).as("h"),
        h60(col("source")).as("hs"),
        h60(col("lang")).as("hl"),
        TextOps.hash32(concat(lit("dsq_"), col("doc_id").cast("string")))
          .as("sh"),
        col("doc_id"))
      val head = d.agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(col("nc")).as("n_chars"),
        kmvSketch(col("h"), k).as("kmv"),
        kmvSketch(col("hs"), k).as("kmvs"),
        kmvSketch(col("hl"), k).as("kmvl"))
      val samp = d.orderBy(col("sh").asc, col("doc_id").asc).limit(256)
        .agg(
          expr("percentile(nt, 0.5)").as("_p50s"),
          expr("percentile(nt, 0.9)").as("_p90s"))
      head.crossJoin(samp)
        .select(
          col("n_docs"), col("n_tokens"), col("n_chars"),
          round(est(col("kmv")), 6).as("est_distinct_docs"),
          round((col("n_docs").cast("double") - est(col("kmv"))) * 1000.0 /
            col("n_docs").cast("double"), 6).as("est_dup_pm"),
          round(est(col("kmvs")), 6).as("est_sources"),
          round(est(col("kmvl")), 6).as("est_langs"),
          round(col("_p50s"), 6).as("p50_tokens_est"),
          round(col("_p90s"), 6).as("p90_tokens_est"))
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracles
  // ------------------------------------------------------------------

  /** DuckDB equivalent of TextOps.hash32. */
  private def h32(c: String) = s"CAST(concat('0x', substr(md5($c), 1, 8)) AS BIGINT)"

  /** Oracle mirror of [[graft.pipeline.Html.cleanLine]] over a line
    * expression `l` — the one spelling both html oracles interpolate
    * (inside list lambdas, so it must be a closed expression; the
    * 'g' flags match Spark's replace-all default).
    */
  private def htmlCleanSql(l: String): String =
    "trim(regexp_replace(" +
      "replace(replace(replace(replace(replace(replace(replace(" +
      "replace(replace(replace(replace(" +
      s"regexp_replace($l, '<[^>]*>', ' ', 'g'), " +
      "'&#113;', 'q'), '&#39;', chr(39)), '&apos;', chr(39)), " +
      "'&quot;', '\"'), " +
      "'&lt;', '<'), '&gt;', '>'), '&nbsp;', ' '), '&middot;', ' '), " +
      "'&mdash;', ' '), '&copy;', ' '), '&amp;', '&'), " +
      "' +', ' ', 'g'))"

  /** Oracle mirror of [[graft.pipeline.Html.keepLine]] (lambda var
    * `x` is the raw line): letter present, 5·links ≤ words,
    * 10·non-[a-z ] ≤ 3·len — integer gates, no float.
    */
  private def htmlKeepSql: String = {
    val c = htmlCleanSql("x")
    s"regexp_matches($c, '[a-z]') AND " +
      s"(len(string_split(x, '<a ')) - 1) * 5 <= len(string_split($c, ' ')) AND " +
      s"len(regexp_replace($c, '[a-z ]', '', 'g')) * 10 <= len($c) * 3"
  }

  /** Shared CTE chain for the two html-front-door oracles: the
    * deterministic page fixture (midpoint cut, entity encode, head/
    * nav/script/footer framing — mirrors [[graft.pipeline.Html
    * .synthHtml]]) then the extraction passes (head/script/style
    * dotall removal, line gates, newline join — mirrors
    * [[graft.pipeline.Html.extractDocs]]). Ends with relation
    * `he(doc_id, source, text, html, body, kept, extracted_text)`.
    */
  private val HtmlCtes: String =
    s"""hf AS (
       |  SELECT doc_id, source, text,
       |    CAST(floor(length(text) / 2) AS INT) AS mid,
       |    strpos(substr(text, CAST(floor(length(text) / 2) AS INT) + 1), ' ') AS sp
       |  FROM read_parquet('{SFDIR}/documents.parquet')),
       |hp AS (
       |  SELECT doc_id, source, text,
       |    replace(replace(CASE WHEN sp > 0 THEN substr(text, 1, mid + sp - 1) ELSE text END,
       |      '&', '&amp;'), 'q', '&#113;') AS p1,
       |    replace(replace(CASE WHEN sp > 0 THEN substr(text, mid + sp + 1) ELSE '' END,
       |      '&', '&amp;'), 'q', '&#113;') AS p2
       |  FROM hf),
       |hh AS (
       |  SELECT doc_id, source, text, concat_ws(chr(10),
       |    '<html>',
       |    concat('<head><title>doc ', CAST(doc_id AS VARCHAR), '</title>'),
       |    concat('<script type="text/javascript">var id = ', CAST(doc_id AS VARCHAR), ' &amp;&amp; 1;</script>'),
       |    '<style>',
       |    '.nav a { color: #00f; }',
       |    '</style>',
       |    '</head>',
       |    '<body>',
       |    '<div class="nav"><a href="/">home</a> &middot; <a href="/about">about</a> &middot; <a href="/contact">contact</a></div>',
       |    concat('<p>', p1, '</p>'),
       |    '<script>',
       |    concat('track(', CAST(doc_id AS VARCHAR), ');'),
       |    '</script>',
       |    concat('<p>', p2, '</p>'),
       |    '<div class="footer">&copy; 2026 corpus &mdash; <a href="/tos">terms</a> <a href="/privacy">privacy</a></div>',
       |    '</body>',
       |    '</html>') AS html
       |  FROM hp),
       |hb AS (
       |  SELECT doc_id, source, text, html,
       |    regexp_replace(regexp_replace(regexp_replace(html,
       |      '(?s)<head>.*?</head>', ' ', 'g'),
       |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
       |      '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS body
       |  FROM hh),
       |hk AS (
       |  SELECT doc_id, source, text, html, body,
       |    list_filter(string_split(body, chr(10)), x -> $htmlKeepSql) AS kept
       |  FROM hb),
       |he AS (
       |  SELECT doc_id, source, text, html, body, kept,
       |    array_to_string(list_transform(kept, x -> ${htmlCleanSql("x")}), chr(10)) AS extracted_text
       |  FROM hk)""".stripMargin

  private val Toks = "string_split(text, ' ')"

  /** Oracle mirror of [[piiDocs]] — same sparse fixture arithmetic,
    * same concatenation, so engine and oracle count the SAME spans.
    */
  private def piiFixtureSql: String =
    s"""SELECT doc_id, source, concat(text,
       |  CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@mail.example.com') ELSE '' END,
       |  CASE WHEN doc_id % 5 = 0 THEN concat(' or +1 555-01', CAST(doc_id % 100 AS VARCHAR)) ELSE '' END,
       |  CASE WHEN doc_id % 7 = 0 THEN concat(' node 10.0.', CAST(doc_id % 256 AS VARCHAR), '.', CAST(doc_id % 100 AS VARCHAR)) ELSE '' END) AS text
       |FROM read_parquet('{SFDIR}/documents.parquet')""".stripMargin

  /** DuckDB word n-gram shingles of a text column. */
  private def shinglesSql(n: Int): String =
    s"list_transform(range(1, len($Toks) - ${n - 2}), i -> array_to_string(list_slice($Toks, i, i + ${n - 1}), ' '))"

  /** DuckDB 3-gram shingles of a text column. */
  private val Shingles = shinglesSql(3)

  /** The Bloom-verdict CTE chain shared by the decontaminate_bloom
    * oracles: bench bit positions (`bp`) and the per-(doc, gram) probe
    * (`gp`). `sized = true` re-derives the bitmap width m from the
    * bench gram count with the SAME integer arithmetic as
    * [[Dedup.sizedMBits]] (a float log₂ spelling could differ by an
    * ulp between engines and flip every position), `false` keeps the
    * retired fixed 2¹⁶-bit width. Emitted without margin chars: this
    * block is interpolated into stripMargin strings, which would eat
    * any inner `|` prefixes.
    */
  private def bloomVerdictCtes(sized: Boolean): String = {
    val k = if (sized) Dedup.BloomKSized else Dedup.BloomKHash
    val m = if (sized) "(SELECT m FROM prm)" else Dedup.BloomMBits.toString
    val benchGrams = s"SELECT unnest(${shinglesSql(Dedup.BloomN)}) AS s\n" +
      "FROM read_parquet('{SFDIR}/documents.parquet')\nWHERE doc_id % 50 = 0"
    val prm = if (sized)
      s"prm AS (\nSELECT greatest(32, ((count(DISTINCT s) * ${Dedup.BloomBitsPerGram} + 31) // 32) * 32) AS m\n" +
        s"FROM ($benchGrams)),\n"
    else ""
    s"""hset AS (SELECT unnest(range(0, $k)) AS h),
$prm bp AS (
SELECT DISTINCT ${h32("concat('bloom', CAST(h AS VARCHAR), '_', s)")} % $m AS p
FROM ($benchGrams), hset),
gp AS (
SELECT doc_id, s,
bool_and(${h32("concat('bloom', CAST(h AS VARCHAR), '_', s)")} % $m
IN (SELECT p FROM bp)) AS hit
FROM (SELECT doc_id, unnest(list_distinct(${shinglesSql(Dedup.BloomN)})) AS s
FROM read_parquet('{SFDIR}/documents.parquet')), hset
GROUP BY doc_id, s)"""
  }

  /** Tail of the Bloom-vs-exact confusion oracle, shared by the sized
    * fp instrument and the retired fixed-8KB comparison row (the CTE
    * prefix differs only through [[bloomVerdictCtes]]).
    */
  private def bloomConfusionSql(sized: Boolean): String =
    s"""WITH ${bloomVerdictCtes(sized)},
bh AS (SELECT doc_id, CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS nh FROM gp GROUP BY doc_id),
bl AS (
SELECT d.doc_id, coalesce(bh.nh, 0) > 0 AS bloom_hit
FROM read_parquet('{SFDIR}/documents.parquet') d LEFT JOIN bh USING (doc_id)),
g AS (
SELECT doc_id, unnest(list_transform(${shinglesSql(4)}, s -> ${h32("s")})) AS g
FROM read_parquet('{SFDIR}/documents.parquet')),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
eh AS (
SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS nh
FROM g WHERE g IN (SELECT g FROM bench) GROUP BY doc_id),
ex AS (
SELECT d.doc_id, coalesce(eh.nh, 0) > 0 AS exact_hit
FROM read_parquet('{SFDIR}/documents.parquet') d LEFT JOIN eh USING (doc_id)),
j AS (SELECT bl.bloom_hit, ex.exact_hit FROM bl JOIN ex USING (doc_id)),
a AS (
SELECT CAST(count(*) AS BIGINT) AS n_docs,
CAST(sum(CASE WHEN bloom_hit AND exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS both_hit,
CAST(sum(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_only,
CAST(sum(CASE WHEN NOT bloom_hit AND exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS exact_only,
CAST(sum(CASE WHEN NOT bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS neither
FROM j)
SELECT n_docs, both_hit, bloom_only, exact_only, neither,
CASE WHEN (bloom_only + neither) > 0
THEN bloom_only * 1000 // (bloom_only + neither) END AS fp_per_mille
FROM a"""

  private def minhashSql(i: Int): String = {
    val (a, b) = TextOps.MinhashParams(i)
    s"list_min(list_transform(sh, s -> (${h32("s")} * $a + $b) % 1000000007))"
  }

  /** DuckDB sequential-fold dot product over the first `n` dims of two
    * float lists, matching DotProductF over a `slice(..., 1, n)`
    * prefix (same left-to-right double accumulation).
    */
  private def dotSqlN(a: String, b: String, n: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, ${n + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  /** DuckDB sequential-fold dot product matching DotProductF. */
  private def dotSql(a: String, b: String): String = dotSqlN(a, b, 64)

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Float-list × double-list dot, matching DotProductFD's fold. */
  private def dotMixedSql(fa: String, dl: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST($fa[i] AS DOUBLE) * $dl[i])), (acc, x) -> acc + x)"

  /** Double-list norm, matching `sqrt(aggregate(ce, 0.0, a + x*x))`. */
  private def normDblSql(dl: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($dl, x -> x * x)), (acc, x) -> acc + x))"

  /** WordPiece oracle CTE chain mirroring
    * [[graft.pipeline.Wordpiece]]'s greedy longest-match kernel.
    * Greedy matching has a DETERMINISTIC successor (pos -> pos +
    * best-step), so it is SQL-expressible as a non-recursive best-step
    * table (distinct-word × position × vocab, conditional max) plus a
    * LINEAR recursive-CTE walk — one row per emitted piece, not a
    * search; queries embedding this chain must spell the clause
    * `WITH RECURSIVE`. Defines: wpvocab (the committed vocabulary as
    * literals), wpwords (distinct corpus words — the same
    * work-dedup the 100 TB plan uses), wpbest, wpwalk, wpcounts
    * (word -> piece count), wppieces (word -> emitted pieces).
    */
  private def wordpieceCtes: String = wordpieceCtesOver(
    s"""SELECT DISTINCT w AS word FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w
       |    FROM read_parquet('{SFDIR}/documents.parquet'))
       |  WHERE len(w) > 0""".stripMargin)

  /** [[wordpieceCtes]] with the word frame parameterized — the OOV
    * segmentation oracle feeds glued word pairs instead of corpus
    * words; everything downstream (best-step table, linear walk) is
    * identical.
    */
  private def wordpieceCtesOver(wordsSel: String): String =
    wordpieceCtesBudget("wp", Int.MaxValue, wordsSel)

  /** [[wordpieceCtesOver]] with CTE names prefixed and the vocabulary
    * capped to all single-char symbols + the first `budget` merges —
    * the training-order-prefix semantics the budget sweep reads.
    * `budget = Int.MaxValue` reproduces the full chain byte-for-byte
    * (the committed table IS singles ++ merges in order).
    */
  private def wordpieceCtesBudget(pfx: String, budget: Int, wordsSel: String): String = {
    val all = graft.pipeline.Wordpiece.Vocab.map(_._1)
    val (singles, merges) = all.partition(p => p.replace("##", "").length == 1)
    val vocabVals = (singles ++ merges.take(budget)).map(p => s"('$p')").mkString(", ")
    s"""${pfx}vocab AS (
       |  SELECT CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS ptext,
       |         piece LIKE '##%' AS is_cont
       |  FROM (VALUES $vocabVals) v(piece)),
       |${pfx}words AS MATERIALIZED (
       |  $wordsSel),
       |${pfx}best AS MATERIALIZED (
       |  SELECT w.word, p.pos,
       |    coalesce(max(CASE WHEN v.is_cont = (p.pos > 1)
       |                       AND substr(w.word, p.pos, len(v.ptext)) = v.ptext
       |                      THEN len(v.ptext) END), 1) AS step
       |  FROM ${pfx}words w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(w.word))) AS pos) p,
       |  ${pfx}vocab v
       |  GROUP BY w.word, p.pos),
       |${pfx}walk(word, pos, n, piece) AS (
       |  SELECT word, CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS VARCHAR) FROM ${pfx}words
       |  UNION ALL
       |  SELECT w.word, w.pos + b.step, w.n + 1,
       |    CASE WHEN w.pos > 1 THEN '##' || substr(w.word, w.pos, b.step)
       |         ELSE substr(w.word, w.pos, b.step) END
       |  FROM ${pfx}walk w JOIN ${pfx}best b ON b.word = w.word AND b.pos = w.pos),
       |${pfx}counts AS (SELECT word, max(n) AS n_pieces FROM ${pfx}walk GROUP BY word),
       |${pfx}pieces AS (SELECT word, piece FROM ${pfx}walk WHERE piece IS NOT NULL)""".stripMargin
  }

  /** Unigram oracle CTE chain mirroring [[graft.pipeline.Unigram]]'s
    * Viterbi kernel. Viterbi has NO deterministic successor (the best
    * piece at a position depends on the whole suffix), so unlike the
    * WordPiece walk the oracle ENUMERATES every segmentation path —
    * bounded here by short corpus words (≤ 2^(len−1) paths/word;
    * positions are generated per word with a lateral generate_series,
    * so no fixed length cap can silently drop a long glued word) —
    * and argmaxes `ORDER BY score DESC, lens DESC`,
    * which the kernel's right-to-left DP tie rule provably equals
    * (equal-total paths share prefixes up to their first diverging
    * boundary, so suffix-lexicographic = full-lens-lexicographic).
    * `lens` encodes each piece length as `chr(64+len)`; the linear
    * `ugwalk` re-derives the pieces from the winning lens string.
    * Defines: ugvocab (committed (piece, score_micro) literals),
    * ugwords, ugsteps (vocab edges + byte-fallback edges on chars
    * outside the vocab), ugpaths, ugbest, ugcounts (word -> piece
    * count), ugpieces (word -> emitted pieces). Queries embedding
    * this chain must spell `WITH RECURSIVE`.
    */
  private def unigramCtes: String = unigramCtesOver(
    s"""SELECT DISTINCT w AS word FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w
       |    FROM read_parquet('{SFDIR}/documents.parquet'))
       |  WHERE len(w) > 0""".stripMargin)

  private def unigramCtesOver(wordsSel: String): String = {
    val vocabVals = graft.pipeline.Unigram.Vocab
      .map { case (p, sc) => s"('$p', $sc)" }.mkString(", ")
    val fb = graft.pipeline.Unigram.FallbackMicro
    s"""ugvocab AS (SELECT piece, CAST(sc AS BIGINT) AS sc FROM (VALUES $vocabVals) v(piece, sc)),
       |ugwords AS MATERIALIZED (
       |  $wordsSel),
       |ugsteps AS MATERIALIZED (
       |  SELECT w.word, p.pos, len(v.piece) AS l, v.sc
       |  FROM ugwords w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(w.word))) AS pos) p,
       |  ugvocab v
       |  WHERE substr(w.word, p.pos, len(v.piece)) = v.piece
       |  UNION ALL
       |  SELECT w.word, p.pos, 1, CAST($fb AS BIGINT)
       |  FROM ugwords w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(w.word))) AS pos) p
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM ugvocab v WHERE v.piece = substr(w.word, p.pos, 1))),
       |ugpaths(word, pos, score, lens) AS (
       |  SELECT word, 1, CAST(0 AS BIGINT), '' FROM ugwords
       |  UNION ALL
       |  SELECT p.word, p.pos + s.l, p.score + s.sc, p.lens || chr(CAST(64 + s.l AS INTEGER))
       |  FROM ugpaths p JOIN ugsteps s ON s.word = p.word AND s.pos = p.pos),
       |ugbest AS MATERIALIZED (
       |  SELECT word, lens, score FROM (
       |    SELECT word, lens, score,
       |      row_number() OVER (PARTITION BY word ORDER BY score DESC, lens DESC) AS rn
       |    FROM ugpaths WHERE pos = len(word) + 1)
       |  WHERE rn = 1),
       |ugcounts AS (SELECT word, CAST(len(lens) AS BIGINT) AS n_pieces, score FROM ugbest),
       |ugwalk(word, k, pos, piece) AS (
       |  SELECT word, CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS VARCHAR) FROM ugbest
       |  UNION ALL
       |  SELECT w.word, w.k + 1,
       |    w.pos + ascii(substr(b.lens, CAST(w.k + 1 AS INTEGER), 1)) - 64,
       |    substr(b.word, CAST(w.pos AS INTEGER), ascii(substr(b.lens, CAST(w.k + 1 AS INTEGER), 1)) - 64)
       |  FROM ugwalk w JOIN ugbest b ON b.word = w.word
       |  WHERE w.k < len(b.lens)),
       |ugpieces AS (SELECT word, k, piece FROM ugwalk WHERE piece IS NOT NULL)""".stripMargin
  }

  /** CTE chain mirroring [[graft.pipeline.Similarity.topKSq8]]: final
    * CTE `sq8` carries (query_id, rank, neighbor_id, cosine). Expects
    * a CTE `e(vec_id, embedding)`. The encode spelling `floor(... +
    * 0.5)` (not `round`) is shared with the Spark side because the two
    * engines' `round` disagree on .5 ties; `code[i] / 255` is DuckDB
    * float division, matching Spark's fractional `/` on a long code.
    */
  private def sq8Ctes: String =
    s"""sq8stats AS (
       |  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn, max(CAST(embedding[i] AS DOUBLE)) AS mx
       |  FROM e, range(1, 65) t(i) GROUP BY i),
       |sq8p AS (SELECT list(mn ORDER BY i) AS mins, list(mx - mn ORDER BY i) AS spans FROM sq8stats),
       |sq8code AS (
       |  SELECT e.vec_id, list_transform(range(1, 65), i ->
       |    CASE WHEN p.spans[i] > 0 THEN floor((CAST(e.embedding[i] AS DOUBLE) - p.mins[i]) / p.spans[i] * 255 + 0.5) ELSE 0 END) AS code
       |  FROM e, sq8p p),
       |sq8r AS MATERIALIZED (
       |  SELECT c.vec_id AS neighbor_id, recon, ${normDblSql("recon")} AS rnorm
       |  FROM (SELECT c.vec_id, list_transform(range(1, 65), i -> p.mins[i] + c.code[i] / 255 * p.spans[i]) AS recon
       |        FROM sq8code c, sq8p p) c),
       |sq8cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, r.neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dotMixedSql("q.embedding", "r.recon")} / (sqrt(${dotSql("q.embedding", "q.embedding")}) * r.rnorm) DESC,
       |        r.neighbor_id ASC) AS crank
       |    FROM e q JOIN sq8r r ON q.vec_id < 5 AND q.vec_id <> r.neighbor_id)
       |  WHERE crank <= 20),
       |sq8 AS (
       |  SELECT query_id, rank, neighbor_id, cosine FROM (
       |    SELECT c.query_id, c.neighbor_id, ${cosSql("q.embedding", "n.embedding")} AS cosine,
       |      CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.neighbor_id ASC) AS INTEGER) AS rank
       |    FROM sq8cand c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id)
       |  WHERE rank <= 5)""".stripMargin

  /** CTE chain mirroring [[graft.pipeline.Similarity.topKMrl]]: final
    * CTE `mrl` carries (query_id, rank, neighbor_id, cosine). Expects
    * a CTE `e(vec_id, embedding)`; candidate scores fold only the
    * first 16 dims, exactly as the Spark side's `slice(..., 1, 16)`.
    */
  private def mrlCtes: String = {
    def dot16(a: String, b: String) = dotSqlN(a, b, 16)
    s"""mrlcand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dot16("q.embedding", "n.embedding")} / (sqrt(${dot16("q.embedding", "q.embedding")}) * sqrt(${dot16("n.embedding", "n.embedding")})) DESC,
       |        n.vec_id ASC) AS crank
       |    FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
       |  WHERE crank <= 20),
       |mrl AS (
       |  SELECT query_id, rank, neighbor_id, cosine FROM (
       |    SELECT c.query_id, c.neighbor_id, ${cosSql("q.embedding", "n.embedding")} AS cosine,
       |      CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.neighbor_id ASC) AS INTEGER) AS rank
       |    FROM mrlcand c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id)
       |  WHERE rank <= 5)""".stripMargin
  }

  /** CTE chain mirroring [[graft.pipeline.Similarity.topKBinary]]:
    * final CTE `bin` carries (query_id, rank, neighbor_id, hamming,
    * cosine). Expects a CTE `e(vec_id, embedding)`. The engine packs
    * sign bits into one BIGINT and counts `bit_count(xor)`; the
    * oracle counts sign DISAGREEMENTS dim-by-dim — the same integer
    * by construction, with no bit packing to desynchronize on.
    */
  private def binCtes: String =
    s"""binham AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |    CAST(len(list_filter(range(1, 65), i -> (q.embedding[i] > 0) <> (n.embedding[i] > 0))) AS BIGINT) AS hamming
       |  FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
       |bincand AS (
       |  SELECT query_id, neighbor_id, hamming FROM (
       |    SELECT query_id, neighbor_id, hamming,
       |      row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS crank
       |    FROM binham)
       |  WHERE crank <= 20),
       |bin AS (
       |  SELECT query_id, rank, neighbor_id, hamming, cosine FROM (
       |    SELECT c.query_id, c.neighbor_id, c.hamming, ${cosSql("q.embedding", "n.embedding")} AS cosine,
       |      CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.neighbor_id ASC) AS INTEGER) AS rank
       |    FROM bincand c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id)
       |  WHERE rank <= 5)""".stripMargin

  /** K-means training CTE chain mirroring
    * [[graft.pipeline.Similarity.kmeansCentroids]] (k=8, 2 Lloyd
    * iterations, 6dp rounding between iterations — the `+ 0` on each
    * internal round maps DuckDB's −0.0 to Spark's +0.0 INSIDE the
    * iteration, not just at output). Ends in centroid table `c2`.
    */
  private def kmeansCtesFrom(eCte: String): String = {
    def assign(cPrev: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS rk
         |    FROM e, $cPrev c) WHERE rk = 1)""".stripMargin
    def update(aName: String, cPrev: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT p.cid, coalesce(u.ce, p.ce) AS ce
         |  FROM $cPrev p LEFT JOIN (
         |    SELECT cid, list(cv ORDER BY i) AS ce FROM (
         |      SELECT cid, i, round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) + 0 AS cv
         |      FROM $aName, range(64) t(i) GROUP BY cid, i)
         |    GROUP BY cid) u ON p.cid = u.cid)""".stripMargin
    Seq(
      eCte,
      "c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce FROM e WHERE vec_id < 8)",
      assign("c0", "a1"), update("a1", "c0", "c1"),
      assign("c1", "a2"), update("a2", "c1", "c2")).mkString(",\n")
  }

  private val KmeansCtes: String = kmeansCtesFrom(
    "e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet'))")

  /** CTE chain mirroring [[graft.pipeline.Similarity.bitextMine]]
    * (expects the KmeansCtes prefix): label-parity sides, asymmetric
    * cell-bounded bipartite candidates (`cand`), both endpoints' top-4
    * neighborhood integer sums, the one double margin expression, and
    * the ranked frame `rk` — bitext_mine filters it to mutual-best,
    * ann_recall_bitext grades it against brute.
    */
  private def bitextCtes: String =
    s"""el AS (SELECT vec_id, label % 2 AS side FROM read_parquet('{SFDIR}/embeddings.parquet')),
       |basg AS MATERIALIZED (
       |  SELECT a.vec_id, a.embedding, a.cell, a.crank, el.side FROM (
       |    SELECT vec_id, embedding, cid AS cell, crank FROM (
       |      SELECT vec_id, embedding, cid,
       |        row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
       |      FROM (SELECT e.vec_id, e.embedding, c.cid,
       |              ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
       |            FROM e, c2 c))) a
       |  JOIN el ON el.vec_id = a.vec_id),
       |cand AS MATERIALIZED (
       |  SELECT src_id, tgt_id, cosv, CAST(round(cosv * 1e6, 0) AS BIGINT) AS cos_micro FROM (
       |    SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
       |      ${cosSql("a.embedding", "b.embedding")} AS cosv
       |    FROM basg a JOIN basg b ON a.cell = b.cell
       |      AND a.side = 0 AND a.crank <= 2 AND b.side = 1 AND b.crank = 1)),
       |fstats AS (
       |  SELECT src_id, CAST(sum(cos_micro) AS BIGINT) AS fsum, CAST(count(*) AS BIGINT) AS fcnt FROM (
       |    SELECT src_id, cos_micro,
       |      row_number() OVER (PARTITION BY src_id ORDER BY cos_micro DESC, tgt_id ASC) AS r
       |    FROM cand) WHERE r <= 4 GROUP BY src_id),
       |bstats AS (
       |  SELECT tgt_id, CAST(sum(cos_micro) AS BIGINT) AS bsum, CAST(count(*) AS BIGINT) AS bcnt FROM (
       |    SELECT tgt_id, cos_micro,
       |      row_number() OVER (PARTITION BY tgt_id ORDER BY cos_micro DESC, src_id ASC) AS r
       |    FROM cand) WHERE r <= 4 GROUP BY tgt_id),
       |mrg AS (
       |  SELECT c.src_id, c.tgt_id, c.cosv,
       |    CAST(c.cos_micro AS DOUBLE) /
       |      ((CAST(f.fsum AS DOUBLE) / f.fcnt + CAST(b.bsum AS DOUBLE) / b.bcnt) / 2.0) AS margin
       |  FROM cand c JOIN fstats f USING (src_id) JOIN bstats b USING (tgt_id)),
       |rk AS (
       |  SELECT src_id, tgt_id, cosv, margin,
       |    row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS fwd_rank,
       |    row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id ASC) AS bwd_rank
       |  FROM mrg)""".stripMargin

  /** PQ CTE chain mirroring [[graft.pipeline.Similarity.pqCodebooks]]
    * (m=8 subspaces × ksub=16 centroids, 2 L2 Lloyd iterations with
    * 6dp rounding + the `+ 0` −0.0 seam, as KmeansCtes) and
    * [[graft.pipeline.Similarity.pqEncode]]. Distances are the
    * expanded ‖x−c‖² = x·x − 2·x·c + c·c with every term a sequential
    * list_reduce fold — the bit-exact mirror of the codegen'd
    * dotF/dotFD kernels. Ends with tables `books` (sub, cid, ce),
    * `subv` (vec_id, sub, sv) and `codes` (vec_id, sub, code).
    */
  private def pqCtesFrom(embCte: String): String = {
    def xx8(a: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))), (acc, x) -> acc + x)"
    def xc8(a: String, c: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), i -> CAST($a[i] AS DOUBLE) * $c[i])), (acc, x) -> acc + x)"
    def cc8(c: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($c, x -> x * x)), (acc, x) -> acc + x)"
    def d2(a: String, c: String) =
      s"((${xx8(a)} - 2.0 * ${xc8(a, c)}) + ${cc8(c)})"
    def perSub(j: Int): String = {
      def assign(cPrev: String, name: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT cid, sv FROM (
           |    SELECT e.vec_id, e.sv, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${d2("e.sv", "c.ce")} ASC, c.cid ASC) AS rk
           |    FROM e$j e, $cPrev c) WHERE rk = 1)""".stripMargin
      def update(aName: String, cPrev: String, name: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT p.cid, coalesce(u.ce, p.ce) AS ce
           |  FROM $cPrev p LEFT JOIN (
           |    SELECT cid, list(cv ORDER BY i) AS ce FROM (
           |      SELECT cid, i, round(avg(CAST(sv[i + 1] AS DOUBLE)), 6) + 0 AS cv
           |      FROM $aName, range(8) t(i) GROUP BY cid, i)
           |    GROUP BY cid) u ON p.cid = u.cid)""".stripMargin
      Seq(
        s"e$j AS MATERIALIZED (SELECT vec_id, list_slice(embedding, ${j * 8 + 1}, ${j * 8 + 8}) AS sv FROM emb)",
        s"c${j}_0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, list_transform(sv, x -> CAST(x AS DOUBLE)) AS ce FROM e$j WHERE vec_id < 16)",
        assign(s"c${j}_0", s"a${j}_1"), update(s"a${j}_1", s"c${j}_0", s"c${j}_1"),
        assign(s"c${j}_1", s"a${j}_2"), update(s"a${j}_2", s"c${j}_1", s"c${j}_2")
      ).mkString(",\n")
    }
    val books = (0 until 8)
      .map(j => s"SELECT $j AS sub, cid, ce FROM c${j}_2")
      .mkString(" UNION ALL ")
    (Seq(embCte) ++
      (0 until 8).map(perSub) ++
      Seq(
        s"books AS MATERIALIZED ($books)",
        """subv AS MATERIALIZED (
          |  SELECT vec_id, j.sub AS sub,
          |    list_slice(embedding, j.sub * 8 + 1, j.sub * 8 + 8) AS sv
          |  FROM emb, (SELECT unnest(range(0, 8)) AS sub) j)""".stripMargin,
        s"""codes AS MATERIALIZED (
           |  SELECT vec_id, sub, cid AS code FROM (
           |    SELECT s.vec_id, s.sub, b.cid,
           |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY ${d2("s.sv", "b.ce")} ASC, b.cid ASC) AS rk
           |    FROM subv s JOIN books b ON s.sub = b.sub) WHERE rk = 1)""".stripMargin))
      .mkString(",\n")
  }

  private val PqCtes: String = pqCtesFrom(
    "emb AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet'))")

  /** OPQ-rotated embedding CTE chain: reads the trained 64×64 rotation
    * dumped by Verify as a parquet fixture ({OPQROT} — the
    * deterministic output of [[graft.pipeline.Opq.trainRotation]],
    * exact doubles) and re-expresses every vector in the rotated basis
    * exactly as [[graft.pipeline.Opq.rotate]] does: element r =
    * CAST(dotFD(embedding, row_r) AS REAL), sequential double fold per
    * row. Ends in `remb` (vec_id, embedding REAL[]) plus `eraw` (the
    * UN-rotated table the recall ground truth reads — rotation
    * preserves cosine order in exact arithmetic, but the engine scores
    * ground truth on raw vectors, so the oracle must too). The
    * eigensolve itself is NOT replayed (a 64×64 Jacobi sweep has no
    * SQL spelling); the rotation is a trained artifact like the
    * KmeansCtes seed, and OpqSpec pins its orthogonality / distance
    * preservation independently. Everything DOWNSTREAM of the fixture
    * — rotated PQ training, encode, ADC, ranking — is replayed from
    * scratch in SQL.
    */
  private val OpqRembCtes: String =
    s"""eraw AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
       |rot AS MATERIALIZED (SELECT r, rrow FROM read_parquet('{OPQROT}/*.parquet')),
       |remb AS MATERIALIZED (
       |  SELECT e.vec_id, list(CAST(${dotMixedSql("e.embedding", "rot.rrow")} AS REAL) ORDER BY rot.r) AS embedding
       |  FROM eraw e, rot GROUP BY e.vec_id)""".stripMargin

  /** Spectrum CTEs shared by embedding_spectrum /
    * embedding_intrinsic_dim: per (vector, eigen-direction) projection
    * through the Verify-dumped rotation fixture with the ENGINE's
    * float cast ([[graft.pipeline.Opq.rotate]] casts each rotated
    * coordinate to REAL before anything reads it), per-dim
    * exact-integer micro second moments, the 64-row rank/cum frame
    * (`srk`: dim, sq, n, rank, cum_sq) and the total (`stot`). Emitted
    * without margin chars (interpolated into plain strings).
    */
  private val SpectrumCtes: String =
    s"""eraw AS (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
rot AS (SELECT r, rrow FROM read_parquet('{OPQROT}/*.parquet')),
proj AS (
SELECT rot.r AS dim,
CAST(CAST(${dotMixedSql("e.embedding", "rot.rrow")} AS REAL) AS DOUBLE) AS x
FROM eraw e, rot),
ssq AS (
SELECT dim, CAST(count(*) AS BIGINT) AS n,
CAST(sum(CAST(floor(x * x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sq
FROM proj GROUP BY dim),
stot AS (SELECT CAST(sum(sq) AS BIGINT) AS tot FROM ssq),
srk AS (
SELECT dim, sq, n,
CAST(row_number() OVER (ORDER BY sq DESC, dim ASC) AS BIGINT) AS rank,
CAST(sum(sq) OVER (ORDER BY sq DESC, dim ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_sq
FROM ssq)"""

  /** Shared by ann_topk_opq_ivfpq and its disk-served _loaded twin
    * (one spelling of the composed-index replay, two engine paths).
    */
  private lazy val OpqIvfPqSql: String =
      s"""WITH $OpqRembCtes,
         |${kmeansCtesFrom("e AS MATERIALIZED (SELECT vec_id, embedding FROM remb)")},
         |${pqCtesFrom("emb AS MATERIALIZED (SELECT vec_id, embedding FROM remb)")},
         |iasg AS MATERIALIZED (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c)),
         |ccells AS (SELECT vec_id AS neighbor_id, cid AS cell FROM iasg WHERE crank = 1),
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM iasg WHERE vec_id < 5 AND crank <= 2),
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT p.query_id, cc.neighbor_id, q.sub, q.d2
         |        FROM probes p
         |        JOIN ccells cc ON p.cell = cc.cell AND p.query_id <> cc.neighbor_id
         |        JOIN codes c ON c.vec_id = cc.neighbor_id
         |        JOIN qd q ON q.query_id = p.query_id AND q.sub = c.sub AND q.cid = c.code)
         |  GROUP BY query_id, neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM adc)
         |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** PQ query-distance-table + ADC tail shared only by ann_topk_pq. */
  private def pqD2Sql(a: String, c: String): String = {
    def xx8 =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))), (acc, x) -> acc + x)"
    def xc8 =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), i -> CAST($a[i] AS DOUBLE) * $c[i])), (acc, x) -> acc + x)"
    def cc8 =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($c, x -> x * x)), (acc, x) -> acc + x)"
    s"(($xx8 - 2.0 * $xc8) + $cc8)"
  }

  /** The 32-bit majority-vote simhash over a token-hash list `th`. */
  private val SimhashSum: String =
    (0 until 32).map(j =>
      s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  /** 64-bit majority-vote simhash over TWO token-hash lists `t1`/`t2`
    * (bits 0–31 / 32–63), OR-composed so the sign bit (a CAST'd
    * min-BIGINT literal — DuckDB's negate of 2^63 would promote to
    * HUGEINT) never enters checked addition. Mirrors
    * graft.pipeline.Dedup.simhash64 bit for bit.
    */
  private val Simhash64Expr: String = {
    def terms(lst: String, off: Int) = (0 until 32).map { j =>
      val bitLit =
        if (off + j == 63) "CAST('-9223372036854775808' AS BIGINT)"
        else s"(1::BIGINT << ${off + j})"
      s"(CASE WHEN list_sum(list_transform($lst, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN $bitLit ELSE 0::BIGINT END)"
    }
    (terms("t1", 0) ++ terms("t2", 32)).mkString(" | ")
  }

  /** Shared CTE chain: minhash signatures -> LSH bands -> candidate
    * pairs — the ONE spelling of the banding arithmetic every
    * LSH-chain oracle extends (lsh_pairs, editdist, jaccard, clusters,
    * corpus_filter, and via [[lshCandCtesFrom]] the paragraph-unit
    * chain), so the engines cannot drift on the candidate set.
    * `src` is any relation providing (doc_id, text).
    */
  private def lshCandCtesFrom(src: String): String =
    s"""sigs AS MATERIALIZED (
       |  SELECT doc_id, ${(0 until 8).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
       |  FROM (SELECT doc_id, $Shingles AS sh FROM $src)),
       |bands AS (
       |  SELECT doc_id, b.band, CASE b.band
       |    WHEN 0 THEN (m0 * 31 + m1) % 1000000007
       |    WHEN 1 THEN (m2 * 31 + m3) % 1000000007
       |    WHEN 2 THEN (m4 * 31 + m5) % 1000000007
       |    ELSE (m6 * 31 + m7) % 1000000007 END AS v
       |  FROM sigs, (SELECT unnest(range(0, 4)) AS band) b),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id)""".stripMargin

  private val LshCandCtes: String =
    lshCandCtesFrom("read_parquet('{SFDIR}/documents.parquet')")

  /** [[LshCandCtes]] + the distinct shingle sets the jaccard verifier
    * reads (dedup_jaccard, dedup_clusters, corpus_filter).
    */
  private val LshPairCtes: String =
    s"""$LshCandCtes,
       |sets AS MATERIALIZED (SELECT doc_id, list_distinct($Shingles) AS sh FROM read_parquet('{SFDIR}/documents.parquet'))""".stripMargin

  /** CC chain over jaccard>=0.5 LSH pairs (extends [[LshPairCtes]];
    * caller must open with WITH RECURSIVE). Shared by dedup_clusters
    * and corpus_filter so the two can never disagree about components.
    */
  private val CcCtes: String =
    s"""$LshPairCtes,
       |ej AS (
       |  SELECT p.doc_a, p.doc_b
       |  FROM pairs p JOIN sets a ON p.doc_a = a.doc_id JOIN sets b ON p.doc_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM ej UNION SELECT doc_b, doc_a FROM ej),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT rr.src, e.dst FROM reach rr JOIN edges e ON rr.dst = e.src)""".stripMargin

  /** Shared NN-descent CTE chain (e → nnc → seed → nb0 → nb1 → nb2 →
    * nb3) mirroring [[graft.pipeline.Similarity.knnWorkingList]]
    * exactly: scattered-LCG seed `(u*48271 + j*1999) % n` with j in
    * 1..16, THREE neighbor-of-neighbor rounds on a searchK=16 working
    * list. One descent round: reverse-cap, candidate join, binary
    * PREFILTER (candK=128 hamming-strongest per node), then rank
    * `pool`(u,v) by cosine, keep
    * top-16 (cos computed once in the inner select). Interpolated by
    * ann_knn_graph, ann_recall_knn_graph and embedding_neardup_graph
    * so the three oracles can never disagree about the graph.
    *
    * Dedup is explicit (`SELECT DISTINCT` over `UNION ALL`), never
    * implicit bag-semantics `UNION`: under a `WITH RECURSIVE`
    * statement (the CC consumer) DuckDB 1.0.0 stops deduplicating
    * plain `UNION` inside the non-recursive CTEs, and duplicate pool
    * rows consume row_number rank slots — measured as triplicated
    * working-list rows pushing true neighbors past the rank-16 cut.
    */
  private def knnCtesFrom(where: String): String = {
    def ranked(pool: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT u, v, cos, rk FROM (
         |    SELECT u, v, cos,
         |      CAST(row_number() OVER (PARTITION BY u ORDER BY cos DESC, v ASC) AS INTEGER) AS rk
         |    FROM (
         |      SELECT p.u, p.v, ${cosSql("a.embedding", "b.embedding")} AS cos
         |      FROM $pool p JOIN e a ON a.vec_id = p.u JOIN e b ON b.vec_id = p.v))
         |  WHERE rk <= 16)""".stripMargin
    // reverse edges are CAPPED at the searchK strongest per node
    // (cos DESC, id ASC) before the neighbor-of-neighbor join — the
    // deterministic reverse-neighbor sampling that keeps every g
    // degree ≤ 2·searchK (mirrors Similarity.knnWorkingList round 18);
    // candidates are then PREFILTERED to the candK=8·searchK=128
    // hamming-strongest per node against the 1-bit sign fingerprints
    // (hamming ASC, id ASC — mirrors the round-19 binary prefilter;
    // the sign-disagreement count over the 64 dims IS
    // bit_count(signBits ^ signBits), the binCtes identity) before
    // the exact cosine ranking sees them
    // NEW-FLAG rounds (mirrors the round-20 incremental NN-descent):
    // from round 2 on, candidates join only pairs with ≥1 edge NEW vs
    // the previous round's g (set-difference, then the two one-sided
    // joins). Round 1 keeps the full self-join — no baseline, all new.
    // Full self-join every round — mirrors the shipped
    // `incremental = false` default. Round 20 measured Dong et al.'s
    // new-flag rounds (only pairs with ≥1 new edge from round 2 on)
    // a NEGATIVE at iters=3 post-prefilter (+17% cpu at the 100×
    // tier, per-round churn 0.45-0.6 — see
    // Similarity.knnWorkingList), so the engine and this oracle both
    // stay on the full spelling.
    def round_(prev: String, g: String, c: String, p: String, out: String) =
      s"""$g AS (SELECT DISTINCT u, v FROM (
         |  SELECT u, v FROM $prev
         |  UNION ALL
         |  SELECT u, v FROM (
         |    SELECT v AS u, u AS v, rr FROM (
         |      SELECT u, v, row_number() OVER (PARTITION BY v ORDER BY cos DESC, u ASC) AS rr
         |      FROM $prev)) WHERE rr <= 16)),
         |$c AS (SELECT u, v FROM (
         |  SELECT cc.u, cc.v,
         |    row_number() OVER (PARTITION BY cc.u ORDER BY
         |      len(list_filter(range(1, 65), i -> (a.embedding[i] > 0) <> (b.embedding[i] > 0))) ASC,
         |      cc.v ASC) AS hr
         |  FROM (SELECT DISTINCT a.u, b.v FROM $g a JOIN $g b ON a.v = b.u WHERE a.u <> b.v) cc
         |  JOIN e a ON a.vec_id = cc.u JOIN e b ON b.vec_id = cc.v)
         |  WHERE hr <= 128),
         |$p AS (SELECT DISTINCT u, v FROM (SELECT u, v FROM $prev UNION ALL SELECT u, v FROM $c)),
         |${ranked(p, out)}""".stripMargin
    s"""e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')$where),
       |nnc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM e),
       |seed AS (SELECT DISTINCT u, v FROM (
       |  SELECT e.vec_id AS u, (e.vec_id * 48271 + j.j * 1999) % nnc.nn AS v
       |  FROM e, range(1, 17) j(j), nnc) WHERE u <> v),
       |${ranked("seed", "nb0")},
       |${round_("nb0", "g1", "c1", "p1", "nb1")},
       |${round_("nb1", "g2", "c2", "p2", "nb2")},
       |${round_("nb2", "g3", "c3", "p3", "nb3")}""".stripMargin
  }

  private val KnnCtes: String = knnCtesFrom("")

  /** [[KnnCtes]] + the cosine ≥ 0.4 top-4 edges and the recursive-CC
    * reach over them (caller opens with WITH RECURSIVE) — shared by
    * embedding_neardup_graph and embedding_representatives so the two
    * can never disagree about semantic components.
    */
  private val KnnCcCtes: String =
    s"""$KnnCtes,
       |ge AS (
       |  SELECT DISTINCT least(u, v) AS doc_a, greatest(u, v) AS doc_b
       |  FROM nb3 WHERE rk <= 4 AND cos >= 0.4),
       |gedges AS (SELECT doc_a AS src, doc_b AS dst FROM ge UNION SELECT doc_b, doc_a FROM ge),
       |greach(src, dst) AS (
       |  SELECT src, dst FROM gedges
       |  UNION
       |  SELECT rr.src, ed.dst FROM greach rr JOIN gedges ed ON rr.dst = ed.src)""".stripMargin

  /** One beam-search round of the graph walk (shared by ann_graph_walk
    * and ann_knn_graph_append): candidates = beam ∪ beam's graph
    * out-neighbors (dedup explicit — the [[knnCtesFrom]] stance),
    * scored against the query frame `gq`, top-16 kept (cos DESC, node
    * ASC). Expects CTEs `gg(u, v)` (the serving edges) and
    * `gq(query_id, embedding)`.
    */
  private def walkRoundSql(prev: String, c: String, out: String): String =
    s"""$c AS (SELECT DISTINCT query_id, node FROM (
       |  SELECT query_id, node FROM $prev
       |  UNION ALL
       |  SELECT f.query_id, g.v AS node FROM $prev f JOIN gg g ON g.u = f.node)),
       |$out AS MATERIALIZED (
       |  SELECT query_id, node, cos FROM (
       |    SELECT query_id, node, cos,
       |      CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node ASC) AS INTEGER) AS rk
       |    FROM (
       |      SELECT cc.query_id, cc.node, ${cosSql("q.embedding", "b.embedding")} AS cos
       |      FROM $c cc JOIN gq q ON q.query_id = cc.query_id JOIN e b ON b.vec_id = cc.node))
       |  WHERE rk <= 16)""".stripMargin

  /** Shared aHash-replay CTE chain (d → px → sm → bits → parts → sh):
    * the arithmetic rebuild of the packed 64-bit perceptual hash as a
    * signed BIGINT (two 32-bit halves, hi recentred so the top bit
    * lands as the sign) — interpolated by multimodal_phash_pairs,
    * multimodal_phash_clusters and media_representatives so the image
    * tier's oracles share one hash spelling.
    */
  private val PhashShCtes: String =
    s"""d AS (
       |  SELECT doc_id,
       |    16 + doc_id % 16 AS w,
       |    16 + (doc_id // 16) % 16 AS h
       |  FROM read_parquet('{SFDIR}/documents.parquet')),
       |px AS (
       |  SELECT doc_id, t.i AS i,
       |    (doc_id * 31 + ((t.i * (w * h)) // 64)) % 256 AS v
       |  FROM d, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
       |sm AS (SELECT doc_id, sum(v) AS s FROM px GROUP BY doc_id),
       |bits AS (
       |  SELECT px.doc_id AS doc_id, i,
       |    CASE WHEN v * 64 > s THEN 1 ELSE 0 END AS b
       |  FROM px JOIN sm ON px.doc_id = sm.doc_id),
       |parts AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN i < 32
       |      THEN b * CAST(round(pow(2, 31 - i), 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS hi,
       |    CAST(sum(CASE WHEN i >= 32
       |      THEN b * CAST(round(pow(2, 63 - i), 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS lo
       |  FROM bits GROUP BY doc_id),
       |sh AS (
       |  SELECT doc_id,
       |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
       |      * 4294967296 + lo AS simhash
       |  FROM parts)""".stripMargin

  /** [[PhashShCtes]] + hamming≤3 pairs + the recursive-CC reach over
    * them (caller opens with WITH RECURSIVE) — shared by
    * multimodal_phash_clusters and media_representatives so the two
    * can never disagree about image components.
    */
  private val PhashCcCtes: String =
    s"""$PhashShCtes,
       |wp AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= 3),
       |wedges AS (SELECT doc_a AS src, doc_b AS dst FROM wp
       |           UNION SELECT doc_b, doc_a FROM wp),
       |wreach(src, dst) AS (
       |  SELECT src, dst FROM wedges
       |  UNION
       |  SELECT rr.src, e.dst FROM wreach rr JOIN wedges e ON rr.dst = e.src)""".stripMargin

  /** AUDIO aHash CTE chain ending in `sh(doc_id, simhash)` — the
    * PhashShCtes packing on the audio waveform formula; shared by
    * multimodal_audio_pairs and multimodal_audio_clusters.
    */
  private val AudioShCtes: String =
    s"""ad AS (
       |  SELECT doc_id, 256 + doc_id % 512 AS n
       |  FROM read_parquet('{SFDIR}/documents.parquet')),
       |px AS (
       |  SELECT doc_id, t.i AS i,
       |    (doc_id * 17 + ((t.i * n) // 64) * 7) % 256 AS v
       |  FROM ad, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
       |sm AS (SELECT doc_id, sum(v) AS s FROM px GROUP BY doc_id),
       |bits AS (
       |  SELECT px.doc_id AS doc_id, i,
       |    CASE WHEN v * 64 > s THEN 1 ELSE 0 END AS b
       |  FROM px JOIN sm ON px.doc_id = sm.doc_id),
       |parts AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN i < 32
       |      THEN b * CAST(round(pow(2, 31 - i), 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS hi,
       |    CAST(sum(CASE WHEN i >= 32
       |      THEN b * CAST(round(pow(2, 63 - i), 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS lo
       |  FROM bits GROUP BY doc_id),
       |sh AS (
       |  SELECT doc_id,
       |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
       |      * 4294967296 + lo AS simhash
       |  FROM parts)""".stripMargin

  /** [[AudioShCtes]] + hamming≤3 pairs + recursive-CC reach (caller
    * opens with WITH RECURSIVE) — the PhashCcCtes shape for audio.
    */
  private val AudioCcCtes: String =
    s"""$AudioShCtes,
       |wp AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= 3),
       |wedges AS (SELECT doc_a AS src, doc_b AS dst FROM wp
       |           UNION SELECT doc_b, doc_a FROM wp),
       |wreach(src, dst) AS (
       |  SELECT src, dst FROM wedges
       |  UNION
       |  SELECT rr.src, e.dst FROM wreach rr JOIN wedges e ON rr.dst = e.src)""".stripMargin

  /** VIDEO frame-dedup CTE chain ending in
    * `vpairs(id_a, id_b, n_shared, n_union, jaccard_micro)` and the
    * per-video set sizes `vsz(video_id, sz)` — mirrors
    * syntheticVideoFrames + aHash + videoDupPairs; shared by all four
    * video-tier oracles so they can never disagree.
    */
  private val VideoPairCtes: String =
    """vd AS (
      |  SELECT doc_id FROM read_parquet('{SFDIR}/documents.parquet')),
      |vfr AS (
      |  SELECT doc_id, t.f AS f, doc_id // 4 AS series, doc_id % 4 + t.f AS s
      |  FROM vd, LATERAL (SELECT unnest(range(0, 8)) AS f) t),
      |vpx AS (
      |  SELECT doc_id, f, t.i AS i,
      |    (series * 29 + s * 17 + (1 + 2 * ((series * 13 + s * 5) % 64)) * t.i) % 256 AS v
      |  FROM vfr, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
      |vsm AS (SELECT doc_id, f, sum(v) AS sv FROM vpx GROUP BY doc_id, f),
      |vbits AS (
      |  SELECT vpx.doc_id AS doc_id, vpx.f AS f, i,
      |    CASE WHEN v * 64 > sv THEN 1 ELSE 0 END AS b
      |  FROM vpx JOIN vsm ON vpx.doc_id = vsm.doc_id AND vpx.f = vsm.f),
      |vbytes AS (
      |  SELECT doc_id, f, i // 8 AS k,
      |    CAST(sum(b * CAST(round(pow(2, 7 - (i % 8)), 0) AS BIGINT)) AS BIGINT) AS byte
      |  FROM vbits GROUP BY doc_id, f, i // 8),
      |vhx AS (
      |  SELECT doc_id, f, string_agg(printf('%02x', byte), '' ORDER BY k) AS ahash
      |  FROM vbytes GROUP BY doc_id, f),
      |vsets AS (SELECT DISTINCT doc_id AS video_id, ahash FROM vhx),
      |vsz AS (SELECT video_id, CAST(count(*) AS BIGINT) AS sz FROM vsets GROUP BY video_id),
      |vhdf AS (SELECT ahash, count(*) AS df FROM vsets GROUP BY ahash),
      |vfr2 AS (SELECT v.video_id, v.ahash FROM vsets v JOIN vhdf USING (ahash) WHERE df <= 64),
      |vsh AS (
      |  SELECT a.video_id AS id_a, b.video_id AS id_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM vfr2 a JOIN vfr2 b ON a.ahash = b.ahash AND a.video_id < b.video_id
      |  GROUP BY a.video_id, b.video_id),
      |vpairs AS (
      |  SELECT id_a, id_b, n_shared,
      |    sa.sz + sb.sz - n_shared AS n_union,
      |    CAST(floor(n_shared * 1000000.0 / (sa.sz + sb.sz - n_shared) + 0.5) AS BIGINT) AS jaccard_micro
      |  FROM vsh JOIN vsz sa ON vsh.id_a = sa.video_id JOIN vsz sb ON vsh.id_b = sb.video_id
      |  WHERE CAST(floor(n_shared * 1000000.0 / (sa.sz + sb.sz - n_shared) + 0.5) AS BIGINT) >= 500000)""".stripMargin

  /** Synthetic-url / host / registered-domain SQL — single source of
    * truth mirroring Corpus.synthUrl / urlHost / registeredDomain.
    */
  /** Shared winnow CTE chain (t -> h -> sel -> fp: token arrays, gram
    * hashes, rightmost-min window selections, distinct selected
    * positions) — interpolated by doc_winnow AND dedup_winnow_pairs so
    * the two oracles share one selection spelling.
    */
  private val WinnowCtes: String = {
    val n = Corpus.SubstringN
    val w = 4
    s"""t AS (SELECT doc_id, $Toks AS tk FROM read_parquet('{SFDIR}/documents.parquet')),
       |h AS (
       |  SELECT doc_id,
       |    list_transform(range(0, len(tk) - ${n - 1}),
       |      p -> ${h32(s"array_to_string(list_slice(tk, p + 1, p + $n), ' ')")}) AS hs
       |  FROM t),
       |sel AS (
       |  SELECT doc_id, hs,
       |    list_transform(
       |      range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - $w, 0) + 1 END),
       |      j -> list_reduce(
       |        list_prepend({'h': CAST(9223372036854775807 AS BIGINT), 'p': -1},
       |          list_transform(range(j, least(j + $w, len(hs))),
       |            p -> {'h': hs[p + 1], 'p': CAST(p AS INT)})),
       |        (st, x) -> CASE WHEN x.h <= st.h THEN x ELSE st END)) AS sl
       |  FROM h),
       |fp AS (
       |  SELECT doc_id, hs,
       |    list_sort(list_distinct(list_transform(sl, x -> x.p))) AS fps
       |  FROM sel)""".stripMargin
  }

  /** Shared t/f/z CTE chain computing the committed linear quality
    * model's logit per doc (ends with CTE `z(doc_id, n, logit)`) —
    * interpolated by quality_model_score AND the curriculum rank so
    * the two oracles cannot drift from each other or from
    * Corpus.qualityModelScore.
    */
  private val QualityLogitCtes: String = {
    val wList = Corpus.QualityModelWMicro.mkString("[", ", ", "]")
    val wd = Corpus.QualityModelDenseWMicro
    val bm = Corpus.QualityModelBiasMicro
    s"""t AS (
       |  SELECT doc_id, text, $Toks AS toks
       |  FROM read_parquet('{SFDIR}/documents.parquet')),
       |f AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, tk ->
       |      CAST(list_extract($wList,
       |        CAST(${h32("concat('qm_', tk)")} % 64 AS INT) + 1) AS BIGINT))),
       |      (a, x) -> a + x) AS zh,
       |    CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mwl,
       |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(toks) AS af,
       |    CAST(len(list_distinct(list_filter(toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
       |    CASE WHEN len($Shingles) = 0 THEN 0.0
       |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
       |  FROM t),
       |z AS (
       |  SELECT doc_id, n,
       |    CAST(zh AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
       |      + (CAST(least(n, 1000) AS DOUBLE) / 1000.0) * (CAST(${wd(0)} AS DOUBLE) / 1000000.0)
       |      + (mwl / 10.0) * (CAST(${wd(1)} AS DOUBLE) / 1000000.0)
       |      + af * (CAST(${wd(2)} AS DOUBLE) / 1000000.0)
       |      + (CAST(ns AS DOUBLE) / 5.0) * (CAST(${wd(3)} AS DOUBLE) / 1000000.0)
       |      + df * (CAST(${wd(4)} AS DOUBLE) / 1000000.0)
       |      + CAST($bm AS DOUBLE) / 1000000.0 AS logit
       |  FROM f)""".stripMargin
  }

  private val UrlSql: String =
    s"""concat('https://',
       |      CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END,
       |      source,
       |      CASE WHEN doc_id % 4 = 0 THEN '.org' ELSE '.com' END,
       |      CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END,
       |      '/doc/', CAST(doc_id AS VARCHAR),
       |      CASE WHEN doc_id % 2 = 0 THEN '?ref=feed' ELSE '' END)""".stripMargin
  private val HostSql: String =
    s"lower(regexp_extract($UrlSql, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)', 1))"
  // The committed public-suffix fixture, shared verbatim with
  // Corpus.PublicSuffixes so engine and oracle cannot drift; the PSL
  // longest-match replays as list lambdas (filter matching suffixes,
  // max label count), the fallback and suffix-is-host cases mirror
  // Corpus.registeredDomain exactly.
  private val PslListSql: String =
    Corpus.PublicSuffixes.map(s => s"'$s'").mkString("[", ", ", "]")
  private def pslBestSql(h: String): String =
    s"coalesce(list_max(list_transform(list_filter($PslListSql, s -> $h = s OR ends_with($h, '.' || s)), s -> len(string_split(s, '.')))), 0)"
  private def domainSql(h: String): String =
    s"""CASE WHEN ${pslBestSql(h)} = 0 THEN
       |       (CASE WHEN len(string_split($h, '.')) >= 2 THEN concat(string_split($h, '.')[-2], '.', string_split($h, '.')[-1]) ELSE $h END)
       |     WHEN len(string_split($h, '.')) <= ${pslBestSql(h)} THEN $h
       |     ELSE array_to_string(list_slice(string_split($h, '.'), -(${pslBestSql(h)} + 1), -1), '.')
       |END""".stripMargin
  private val BlocklistSql: String =
    Corpus.DomainBlocklist.mkString("('", "', '", "')")

  /** Quality score / language prediction SQL — single source of truth
    * mirroring TextOps.qualityScore / TextOps.langPred.
    */
  private val QualitySql: String =
    s"""least(len($Toks) / 100.0, 1.0) * 0.5 +
       |    least(CAST(len(list_filter($Toks, t -> t IN ('the','a','of','to','and'))) AS DOUBLE) / len($Toks) * 10, 1.0) * 0.5""".stripMargin
  /** Shared CTEs of the lang_id_model oracles: hashed-token bucket
    * list (one md5 per token, 1-based for list_extract) and the five
    * per-language exact-integer score folds — each the engine's
    * aggregate-from-bias spelling (list_reduce over a prepended bias,
    * same left-to-right integer adds). Weight literals interpolate
    * from the committed Scala arrays, so engine and oracle cannot
    * drift. Emitted without margin chars (interpolated into
    * stripMargin strings).
    */
  private val LangIdCtes: String = {
    val scoreCols = Corpus.LangIdLangs.zipWithIndex.map { case (l, i) =>
      val wList = Corpus.LangIdWMicro(i).mkString("[", ", ", "]")
      s"list_reduce(list_prepend(CAST(${Corpus.LangIdBiasMicro(i)} AS BIGINT), " +
        s"list_transform(bk, j -> CAST(list_extract($wList, j) AS BIGINT))), " +
        s"(a, x) -> a + x) AS score_${l}_micro"
    }.mkString(",\n")
    s"""t AS (
SELECT doc_id, lang, text,
list_transform($Toks, tk -> CAST(${h32("concat('li_', tk)")} % ${Corpus.LangIdBuckets} AS INT) + 1) AS bk
FROM read_parquet('{SFDIR}/documents.parquet')),
sc AS (
SELECT doc_id, lang, text,
$scoreCols
FROM t),
pr AS (
SELECT *,
list_sort([${Corpus.LangIdLangs.map(l => s"{'ns': -score_${l}_micro, 'l': '$l'}").mkString(", ")}])[1].l AS lang_pred_model
FROM sc)"""
  }

  private val LangPredSql: String =
    s"""CASE WHEN len(list_filter($Toks, t -> t IN ('the','a','of','to','and'))) > len(list_filter($Toks, t -> t IN ('el','la','de','y','que'))) THEN 'en'
       |          WHEN len(list_filter($Toks, t -> t IN ('el','la','de','y','que'))) > len(list_filter($Toks, t -> t IN ('the','a','of','to','and'))) THEN 'es'
       |          ELSE 'und' END""".stripMargin

  /** Full-corpus exact-substring dedup replay, optionally restricted
    * by `where` over the final per-doc frame (alias `t`) — shared by
    * the batch oracle and the incremental oracle (whose operator
    * contract is exactly "the full recompute filtered to the delta").
    */
  private def substringDedupSql(where: String): String = {
    val n = Corpus.SubstringN
    s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
       |wins AS (
       |  SELECT doc_id, p, md5(array_to_string(list_slice(t, p + 1, p + $n), ' ')) AS wkey
       |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - ${n - 1}, 0))) AS p FROM toks)),
       |rk AS (
       |  SELECT doc_id, p, row_number() OVER (PARTITION BY wkey ORDER BY doc_id, p) AS rn FROM wins),
       |rem AS (
       |  SELECT DISTINCT doc_id, p + ds.d AS pos
       |  FROM rk, (SELECT unnest(range(0, $n)) AS d) ds WHERE rn > 1),
       |ragg AS (SELECT doc_id, list(pos) AS rem FROM rem GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.t) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(len(r.rem), 0) AS BIGINT) AS n_removed,
       |  round(CAST(coalesce(len(r.rem), 0) AS DOUBLE) / greatest(len(t.t), 1), 6) AS removed_frac,
       |  md5(coalesce(array_to_string(
       |    list_transform(
       |      list_filter(range(0, len(t.t)), i -> NOT coalesce(list_contains(r.rem, i), false)),
       |      i -> t.t[i + 1]), ' '), '')) AS text_sub_md5,
       |  coalesce(len(r.rem), 0) > 0 AS changed
       |FROM toks t LEFT JOIN ragg r USING (doc_id) $where ORDER BY t.doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($Toks) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_computed,
         |  round(CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks), 6) AS avg_token_len,
         |  round(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_token_est,
         |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS bpe_regex_tokens,
         |  round($QualitySql, 6) AS quality_score
         |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      s"""SELECT doc_id, lang,
         |  CAST(len(list_filter($Toks, t -> t IN ('the','a','of','to','and'))) AS BIGINT) AS en_score,
         |  CAST(len(list_filter($Toks, t -> t IN ('el','la','de','y','que'))) AS BIGINT) AS es_score,
         |  $LangPredSql AS lang_pred
         |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin,

    "lang_id_model" ->
      s"""WITH $LangIdCtes
SELECT doc_id, lang, ${Corpus.LangIdLangs.map(l => s"score_${l}_micro").mkString(", ")}, lang_pred_model
FROM pr ORDER BY doc_id""",

    "lang_id_agreement" ->
      s"""WITH $LangIdCtes,
j AS (
SELECT lang, lang_pred_model AS pm, $LangPredSql AS ps FROM pr),
a AS (
SELECT CAST(count(*) AS BIGINT) AS n_docs,
CAST(sum(CASE WHEN pm = lang THEN 1 ELSE 0 END) AS BIGINT) AS model_correct,
CAST(sum(CASE WHEN ps = lang THEN 1 ELSE 0 END) AS BIGINT) AS stop_correct,
CAST(sum(CASE WHEN ps <> 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_decided,
CAST(sum(CASE WHEN ps <> 'und' AND pm = ps THEN 1 ELSE 0 END) AS BIGINT) AS n_agree_decided
FROM j)
SELECT n_docs, model_correct, stop_correct,
model_correct * 1000 // n_docs AS model_acc_pm,
stop_correct * 1000 // n_docs AS stop_acc_pm,
n_stop_decided,
CASE WHEN n_stop_decided > 0
THEN n_agree_decided * 1000 // n_stop_decided END AS agree_decided_pm
FROM a""",

    // Mirrors TextOps.badwordsStats: the lexicon IN-list interpolates
    // from the same Scala constant, so engine and oracle cannot drift.
    "quality_badwords" -> {
      val lex = graft.pipeline.TextOps.Badwords.map(w => s"'$w'").mkString(", ")
      val blocked = s"len(list_filter($Toks, t -> t IN ($lex)))"
      s"""SELECT doc_id,
         |  CAST(len($Toks) AS BIGINT) AS n_tokens,
         |  CAST($blocked AS BIGINT) AS n_blocked,
         |  CAST(floor($blocked * 1000000.0 / len($Toks) + 0.5) AS BIGINT) AS ratio_micro,
         |  CAST(floor($blocked * 1000000.0 / len($Toks) + 0.5) AS BIGINT) <= 50000 AS keep
         |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin
    },

    // Staged counts exactly as the redact_pii oracle (email on raw,
    // IP on email-scrubbed, phone on IP-scrubbed), aggregated by
    // source over the sparse fixture.
    "pii_report" ->
      s"""WITH piid AS ($piiFixtureSql),
         |s1 AS (SELECT doc_id, source, text,
         |         regexp_replace(text, '${Corpus.EmailRe}', '<EMAIL>', 'g') AS e1
         |       FROM piid),
         |s2 AS (SELECT *, regexp_replace(e1, '${Corpus.IpRe}', '<IP>', 'g') AS e2 FROM s1),
         |st AS (SELECT source,
         |         len(regexp_extract_all(text, '${Corpus.EmailRe}')) AS ne,
         |         len(regexp_extract_all(e1, '${Corpus.IpRe}')) AS ni,
         |         len(regexp_extract_all(e2, '${Corpus.PhoneRe}')) AS np
         |       FROM s2)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
         |  CAST(sum(ne) AS BIGINT) AS emails,
         |  CAST(sum(ni) AS BIGINT) AS ips,
         |  CAST(sum(np) AS BIGINT) AS phones,
         |  CAST(sum(ne) + sum(ni) + sum(np) AS BIGINT) AS pii_total,
         |  CAST(floor(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) * 1000000.0 / count(*) + 0.5) AS BIGINT) AS pii_doc_micro
         |FROM st GROUP BY source ORDER BY source""".stripMargin,

    "lang_consistency" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |ch AS (
         |  SELECT doc_id, list_slice(t, chunk_id * 32 + 1, chunk_id * 32 + 32) AS ct
         |  FROM (SELECT doc_id, t,
         |          unnest(range(0, greatest((len(t) - 32 + 31) // 32, 0) + 1)) AS chunk_id
         |        FROM d)),
         |lp AS (
         |  SELECT doc_id,
         |    CASE WHEN len(list_filter(ct, t -> t IN ('the','a','of','to','and'))) > len(list_filter(ct, t -> t IN ('el','la','de','y','que'))) THEN 'en'
         |         WHEN len(list_filter(ct, t -> t IN ('el','la','de','y','que'))) > len(list_filter(ct, t -> t IN ('the','a','of','to','and'))) THEN 'es'
         |         ELSE 'und' END AS l
         |  FROM ch),
         |cnt AS (SELECT doc_id, l, CAST(count(*) AS BIGINT) AS c FROM lp GROUP BY doc_id, l),
         |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
         |          CAST(count(*) AS BIGINT) AS n_langs FROM cnt GROUP BY doc_id),
         |mj AS (SELECT doc_id, l, c,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, l ASC) AS rk FROM cnt)
         |SELECT t.doc_id, t.n_chunks, t.n_langs, m.l AS majority_lang,
         |  round(CAST(m.c AS DOUBLE) / t.n_chunks, 6) AS majority_frac,
         |  t.n_langs > 1 AS mixed
         |FROM tot t JOIN mj m USING (doc_id) WHERE m.rk = 1 ORDER BY t.doc_id""".stripMargin,

    // The tokenizer_ids id mapping exploded and counted per merge id;
    // the all-ids frame is a range over the committed table length.
    "bpe_merge_usage" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |ids AS (
         |  SELECT doc_id,
         |    list_transform(range(1, length(bpe) + 1), i ->
         |      CASE WHEN unicode(substr(bpe, i, 1)) < 256
         |           THEN unicode(substr(bpe, i, 1))
         |           ELSE 256 + unicode(substr(bpe, i, 1)) - 57344 END) AS v
         |  FROM enc),
         |u AS (
         |  SELECT CAST(t.tv AS INTEGER) AS token_id, CAST(count(*) AS BIGINT) AS n_uses
         |  FROM ids, LATERAL (SELECT unnest(v) AS tv) t
         |  WHERE t.tv >= 256 GROUP BY t.tv),
         |allm AS (
         |  SELECT CAST(t.i AS INTEGER) AS token_id
         |  FROM (SELECT unnest(range(256, ${256 + graft.pipeline.Bpe.Merges.length})) AS i) t)
         |SELECT a.token_id, coalesce(u.n_uses, 0) AS n_uses,
         |  coalesce(u.n_uses, 0) > 0 AS used
         |FROM allm a LEFT JOIN u USING (token_id) ORDER BY token_id""".stripMargin,

    "tokenizer_ids" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |ids AS (
         |  SELECT doc_id,
         |    list_transform(range(1, length(bpe) + 1), i ->
         |      CASE WHEN unicode(substr(bpe, i, 1)) < 256
         |           THEN unicode(substr(bpe, i, 1))
         |           ELSE 256 + unicode(substr(bpe, i, 1)) - 57344 END) AS v
         |  FROM enc)
         |SELECT doc_id,
         |  CAST(len(v) AS BIGINT) AS n_ids,
         |  CAST(list_max(v) AS INTEGER) AS max_id,
         |  md5(array_to_string(v, ' ')) AS ids_md5
         |FROM ids ORDER BY doc_id""".stripMargin,

    "tokenizer_fertility" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |j AS (
         |  SELECT d.lang,
         |    CAST(length(d.text) AS BIGINT) AS nc,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nw,
         |    CAST(length(e.bpe) AS BIGINT) AS nb
         |  FROM read_parquet('{SFDIR}/documents.parquet') d JOIN enc e USING (doc_id))
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(sum(nw) AS BIGINT) AS n_words,
         |  CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(nc) AS DOUBLE) / sum(nb), 6) AS chars_per_bpe,
         |  round(CAST(sum(nb) AS DOUBLE) / sum(nw), 6) AS bpe_per_word
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,

    "tokenizer_wordpiece" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |docw AS (
         |  SELECT d.doc_id, t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0),
         |agg AS (
         |  SELECT doc_id, CAST(sum(c.n_pieces) AS BIGINT) AS wp_tokens,
         |    CAST(count(*) AS BIGINT) AS n_words
         |  FROM docw JOIN wpcounts c ON c.word = docw.w GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(a.wp_tokens, 0) AS wp_tokens,
         |  coalesce(a.n_words, 0) AS n_words,
         |  CASE WHEN coalesce(a.n_words, 0) > 0
         |       THEN round(CAST(a.wp_tokens AS DOUBLE) / a.n_words, 6) END AS fertility
         |FROM read_parquet('{SFDIR}/documents.parquet') d
         |LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "wordpiece_oov" -> {
      val oovWords =
        s"""SELECT DISTINCT t[1] || t[2] AS word FROM (
           |    SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
           |    FROM read_parquet('{SFDIR}/documents.parquet'))
           |  WHERE len(t) >= 2""".stripMargin
      s"""WITH RECURSIVE ${wordpieceCtesOver(oovWords)},
         |dw AS (
         |  SELECT doc_id, t[1] || t[2] AS word FROM (
         |    SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
         |    FROM read_parquet('{SFDIR}/documents.parquet'))
         |  WHERE len(t) >= 2),
         |wps AS (
         |  SELECT word, array_to_string(list(piece ORDER BY n), ' ') AS pieces_str
         |  FROM wpwalk WHERE piece IS NOT NULL GROUP BY word)
         |SELECT dw.doc_id AS doc_id, dw.word AS word, c.n_pieces AS n_pieces,
         |  s.pieces_str AS pieces_str
         |FROM dw JOIN wpcounts c ON c.word = dw.word JOIN wps s ON s.word = dw.word
         |ORDER BY doc_id""".stripMargin
    },

    // The budget points are LAYER BOUNDARIES of the one layered
    // replace chain (64 merges per CTE layer), so the four budgeted
    // encodes are intermediate CTEs of a single replay — enc_0 = 64,
    // enc_3 = 256, enc_15 = 1024, enc = the saturated 2400.
    "bpe_budget_sweep" -> {
      def row(budget: Int, encCte: String) =
        s"""SELECT CAST($budget AS INTEGER) AS budget,
           |  CAST(sum(b.nc) AS BIGINT) AS n_chars,
           |  CAST(sum(b.nw) AS BIGINT) AS n_words,
           |  CAST(sum(length(e.bpe)) AS BIGINT) AS n_bpe_tokens,
           |  round(CAST(sum(b.nc) AS DOUBLE) / sum(length(e.bpe)), 6) AS chars_per_bpe,
           |  round(CAST(sum(length(e.bpe)) AS DOUBLE) / sum(b.nw), 6) AS bpe_per_word
           |FROM bsbase b JOIN $encCte e USING (doc_id)""".stripMargin
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |bsbase AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
         |    CAST(len($Toks) AS BIGINT) AS nw
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT * FROM (
         |${row(64, "enc_0")}
         |UNION ALL
         |${row(256, "enc_3")}
         |UNION ALL
         |${row(1024, "enc_15")}
         |UNION ALL
         |${row(2400, "enc")})
         |ORDER BY budget""".stripMargin
    },

    "wordpiece_budget_sweep" -> {
      val wordsSel =
        s"""SELECT DISTINCT w AS word FROM (
           |    SELECT unnest(string_split(text, ' ')) AS w
           |    FROM read_parquet('{SFDIR}/documents.parquet'))
           |  WHERE len(w) > 0""".stripMargin
      val budgets = Seq(12, 25, 50, 100)
      val chains = budgets
        .map(b => wordpieceCtesBudget(s"w$b", b, wordsSel)).mkString(",\n")
      val rows = budgets.map { b =>
        s"""SELECT CAST($b AS INTEGER) AS budget,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(c.n_pieces) AS BIGINT) AS n_wp_tokens,
           |  round(CAST(sum(c.n_pieces) AS DOUBLE) / count(*), 6) AS wp_per_word
           |FROM docw JOIN w${b}counts c ON c.word = docw.w""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE $chains,
         |docw AS (
         |  SELECT t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0)
         |SELECT * FROM (
         |$rows)
         |ORDER BY budget""".stripMargin
    },

    "tokenizer_unigram" ->
      s"""WITH RECURSIVE $unigramCtes,
         |docw AS (
         |  SELECT d.doc_id, t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0),
         |agg AS (
         |  SELECT doc_id, CAST(sum(c.n_pieces) AS BIGINT) AS uni_tokens,
         |    CAST(count(*) AS BIGINT) AS n_words
         |  FROM docw JOIN ugcounts c ON c.word = docw.w GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(a.uni_tokens, 0) AS uni_tokens,
         |  coalesce(a.n_words, 0) AS n_words,
         |  CASE WHEN coalesce(a.n_words, 0) > 0
         |       THEN round(CAST(a.uni_tokens AS DOUBLE) / a.n_words, 6) END AS fertility
         |FROM read_parquet('{SFDIR}/documents.parquet') d
         |LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "unigram_piece_freq" ->
      s"""WITH RECURSIVE $unigramCtes,
         |docw AS (
         |  SELECT t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0)
         |SELECT p.piece, CAST(count(*) AS BIGINT) AS cnt
         |FROM docw JOIN ugpieces p ON p.word = docw.w
         |GROUP BY p.piece ORDER BY cnt DESC, piece ASC LIMIT 50""".stripMargin,

    "unigram_oov" -> {
      val oovWords =
        s"""SELECT DISTINCT t[1] || t[2] AS word FROM (
           |    SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
           |    FROM read_parquet('{SFDIR}/documents.parquet'))
           |  WHERE len(t) >= 2""".stripMargin
      s"""WITH RECURSIVE ${unigramCtesOver(oovWords)},
         |dw AS (
         |  SELECT doc_id, t[1] || t[2] AS word FROM (
         |    SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
         |    FROM read_parquet('{SFDIR}/documents.parquet'))
         |  WHERE len(t) >= 2),
         |ups AS (
         |  SELECT word, array_to_string(list(piece ORDER BY k), ' ') AS pieces_str
         |  FROM ugwalk WHERE piece IS NOT NULL GROUP BY word)
         |SELECT dw.doc_id AS doc_id, dw.word AS word, c.n_pieces AS n_pieces,
         |  s.pieces_str AS pieces_str
         |FROM dw JOIN ugcounts c ON c.word = dw.word JOIN ups s ON s.word = dw.word
         |ORDER BY doc_id""".stripMargin
    },

    "tokenizer_compare_unigram" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |$unigramCtes,
         |docw AS (
         |  SELECT d.doc_id, d.source, t.w
         |  FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0),
         |agg AS (
         |  SELECT source,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |    CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(wc.n_pieces) AS BIGINT) AS n_wp,
         |    CAST(sum(uc.n_pieces) AS BIGINT) AS n_uni
         |  FROM docw
         |  JOIN wpcounts wc ON wc.word = docw.w
         |  JOIN ugcounts uc ON uc.word = docw.w
         |  GROUP BY source)
         |SELECT source, n_docs, n_words, n_wp, n_uni,
         |  round(CAST(n_wp AS DOUBLE) / n_words, 6) AS wp_per_word,
         |  round(CAST(n_uni AS DOUBLE) / n_words, 6) AS uni_per_word,
         |  (n_uni - n_wp) * 1000 // n_wp AS uni_delta_milli
         |FROM agg ORDER BY source""".stripMargin,

    "tokenizer_compare" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |docw AS (
         |  SELECT d.doc_id, t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0),
         |wpdoc AS (
         |  SELECT doc_id, CAST(sum(c.n_pieces) AS BIGINT) AS nwp
         |  FROM docw JOIN wpcounts c ON c.word = docw.w GROUP BY doc_id),
         |j AS (
         |  SELECT d.source,
         |    CAST(length(d.text) AS BIGINT) AS nc,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nw,
         |    CAST(length(e.bpe) AS BIGINT) AS nb,
         |    w.nwp AS nwp
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  JOIN enc e USING (doc_id) JOIN wpdoc w USING (doc_id))
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(sum(nw) AS BIGINT) AS n_words,
         |  CAST(sum(nb) AS BIGINT) AS n_bpe,
         |  CAST(sum(nwp) AS BIGINT) AS n_wp,
         |  round(CAST(sum(nc) AS DOUBLE) / sum(nb), 6) AS chars_per_bpe,
         |  round(CAST(sum(nc) AS DOUBLE) / sum(nwp), 6) AS chars_per_wp,
         |  round(CAST(sum(nb) AS DOUBLE) / sum(nw), 6) AS bpe_per_word,
         |  round(CAST(sum(nwp) AS DOUBLE) / sum(nw), 6) AS wp_per_word
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "wordpiece_piece_freq" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |docw AS (
         |  SELECT t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0)
         |SELECT p.piece, CAST(count(*) AS BIGINT) AS cnt
         |FROM docw JOIN wppieces p ON p.word = docw.w
         |GROUP BY p.piece ORDER BY cnt DESC, piece ASC LIMIT 50""".stripMargin,

    // The piece_freq usage join against the FULL literal vocab (the
    // bpe_merge_usage spelling for WordPiece).
    "wordpiece_vocab_usage" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |docw AS (
         |  SELECT t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0),
         |pu AS (
         |  SELECT p.piece, CAST(count(*) AS BIGINT) AS n_uses
         |  FROM docw JOIN wppieces p ON p.word = docw.w GROUP BY p.piece),
         |vv AS (SELECT CASE WHEN is_cont THEN '##' || ptext ELSE ptext END AS piece
         |       FROM wpvocab)
         |SELECT vv.piece, coalesce(u.n_uses, 0) AS n_uses,
         |  coalesce(u.n_uses, 0) > 0 AS used
         |FROM vv LEFT JOIN pu u USING (piece) ORDER BY piece""".stripMargin,

    "wordpiece_coverage" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |docw AS (
         |  SELECT d.source, t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0)
         |SELECT docw.source,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(c.n_pieces) AS BIGINT) AS wp_tokens,
         |  CAST(sum(CASE WHEN c.n_pieces = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
         |  round(CAST(sum(CASE WHEN c.n_pieces = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS coverage,
         |  round(CAST(sum(c.n_pieces) AS DOUBLE) / count(*), 6) AS fertility
         |FROM docw JOIN wpcounts c ON c.word = docw.w
         |GROUP BY docw.source ORDER BY docw.source""".stripMargin,

    "doc_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS content_md5,
         |  ${h32("text")} AS content_hash32,
         |  ${h32("substr(text, 1, 64)")} AS prefix_hash32,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT), list_transform($Toks, t -> ${h32("t")})),
         |    (acc, h) -> (acc * 1000003 + h) % 1000000007) AS rolling_hash
         |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin,

    "repetition_stats" ->
      s"""SELECT doc_id,
         |  round(CASE WHEN len($Shingles) = 0 THEN 0.0
         |             ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END, 6) AS dup_trigram_frac,
         |  round(CAST(list_max(list_transform(list_distinct($Toks), w -> len(list_filter($Toks, x -> x = w)))) AS DOUBLE) / len($Toks), 6) AS top_token_frac
         |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin,

    // Rule booleans compare the UNROUNDED doubles (matching the Spark
    // side); only the reported signals round to 6dp.
    "quality_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT doc_id, n_words,
         |  round(mwl, 6) AS mean_word_len,
         |  round(af, 6) AS alpha_word_frac,
         |  ns AS n_stop_distinct,
         |  round(df, 6) AS dup_trigram_frac,
         |  (n_words >= 30 AND n_words <= 10000) AS r_words,
         |  (mwl >= 4.0 AND mwl <= 10.0) AS r_word_len,
         |  (af >= 0.8) AS r_alpha,
         |  (ns >= 2) AS r_stop,
         |  (df <= 0.1) AS r_rep,
         |  ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |    AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
         |FROM t ORDER BY doc_id""".stripMargin,

    "quality_model_score" ->
      s"""WITH $QualityLogitCtes
         |SELECT doc_id, n AS n_tokens, round(logit, 6) AS logit, logit >= 0 AS keep
         |FROM z ORDER BY doc_id""".stripMargin,

    "pack_curriculum" ->
      s"""WITH $QualityLogitCtes,
         |r AS (
         |  SELECT doc_id, n AS n_tokens, round(logit, 6) + 0 AS l6,
         |    CAST(row_number() OVER (ORDER BY round(logit, 6) + 0 DESC, doc_id ASC)
         |      AS BIGINT) AS curriculum_pos
         |  FROM z)
         |SELECT doc_id, n_tokens, l6 AS logit, curriculum_pos,
         |  CAST(sum(n_tokens) OVER (ORDER BY curriculum_pos ROWS UNBOUNDED PRECEDING)
         |    AS BIGINT) AS cum_tokens
         |FROM r ORDER BY curriculum_pos""".stripMargin,

    "quality_deciles" ->
      s"""WITH q AS (
         |  SELECT doc_id, round($QualitySql, 6) AS quality_score
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |r AS (
         |  SELECT doc_id, quality_score,
         |    row_number() OVER (ORDER BY quality_score DESC, doc_id ASC) AS rank,
         |    count(*) OVER () AS n
         |  FROM q)
         |SELECT doc_id, quality_score, rank,
         |  ((rank - 1) * 10) // n AS decile,
         |  rank <= (n + 4) // 5 AS top_20pct
         |FROM r ORDER BY doc_id""".stripMargin,

    // Same Gopher-rule and quality-micro spellings as the calibration
    // oracle; medians via quantile_cont (the pinned Spark-percentile
    // interpolation twin).
    "corpus_datasheet" ->
      s"""WITH b AS (
         |  SELECT source, lang,
         |    CAST(len($Toks) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    md5(text) AS h,
         |    CAST(floor(($QualitySql) * 1000000 + 0.5) AS BIGINT) AS q,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |k AS (
         |  SELECT *,
         |    ((nt >= 30 AND nt <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
         |  FROM b),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(nc) AS BIGINT) AS n_chars,
         |    CAST(count(DISTINCT h) AS BIGINT) AS nd,
         |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS gp,
         |    CAST(sum(q) AS BIGINT) AS qs,
         |    quantile_cont(nt, 0.5) AS p50,
         |    quantile_cont(nt, 0.9) AS p90
         |  FROM k)
         |SELECT n_docs, n_sources, n_langs, n_tokens, n_chars,
         |  (n_docs - nd) * 1000 // n_docs AS exact_dup_pm,
         |  gp * 1000 // n_docs AS gopher_pass_pm,
         |  qs // n_docs AS mean_quality_micro,
         |  round(p50, 6) AS p50_tokens,
         |  round(p90, 6) AS p90_tokens
         |FROM a""".stripMargin,

    // Sketch-tier release card: the KMV estimator replayed exactly
    // (the k=256 smallest DISTINCT 60-bit doc-content hashes,
    // kth-smallest in the denominator, the same exact-integer-inputs
    // double expression) and the sampled percentiles replayed over the
    // SAME deterministic bottom-256-by-md5-hash sample (hash then
    // doc_id tiebreak, so the sample SET is engine-independent);
    // quantile_cont mirrors the pinned Spark-percentile interpolation.
    // Exact witnesses recomputed alongside over FULL md5 strings —
    // the corpus_datasheet figures verbatim.
    "corpus_datasheet_sketch" ->
      s"""WITH b AS (
         |  SELECT source, lang, doc_id,
         |    CAST(len($Toks) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h,
         |    md5(text) AS hx,
         |    ${h32("concat('dsq_', CAST(doc_id AS VARCHAR))")} AS sh
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |rk AS (SELECT h, row_number() OVER (ORDER BY h) AS r
         |       FROM (SELECT DISTINCT h FROM b)),
         |sk AS (SELECT CAST(count(*) AS BIGINT) AS kmv_k, max(h) AS kth
         |       FROM rk WHERE r <= 256),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(nc) AS BIGINT) AS n_chars,
         |    CAST(count(DISTINCT hx) AS BIGINT) AS nd,
         |    quantile_cont(nt, 0.5) AS p50x,
         |    quantile_cont(nt, 0.9) AS p90x
         |  FROM b),
         |smp AS (SELECT nt FROM b ORDER BY sh, doc_id LIMIT 256),
         |sq AS (SELECT quantile_cont(nt, 0.5) AS p50s,
         |              quantile_cont(nt, 0.9) AS p90s FROM smp),
         |e AS (SELECT *,
         |        CASE WHEN kmv_k < 256 THEN CAST(kmv_k AS DOUBLE)
         |             ELSE 255.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)
         |        END AS est
         |      FROM a, sk, sq)
         |SELECT n_docs, n_sources, n_langs, n_tokens, n_chars,
         |  round(est, 6) AS est_distinct_docs,
         |  round((CAST(n_docs AS DOUBLE) - est) * 1000.0 / CAST(n_docs AS DOUBLE), 6) AS est_dup_pm,
         |  (n_docs - nd) * 1000 // n_docs AS exact_dup_pm,
         |  round(p50s, 6) AS p50_tokens_est,
         |  round(p90s, 6) AS p90_tokens_est,
         |  round(p50x, 6) AS p50_tokens_exact,
         |  round(p90x, 6) AS p90_tokens_exact
         |FROM e""".stripMargin,

    // Witness-free card: the same KMV replay (k smallest DISTINCT
    // 60-bit hashes, kth in the denominator, size-below-k exact
    // branch) applied to all three key spaces (content, source,
    // lang), the same bottom-256 sample — and nothing else. The
    // estimator CASE and the double expression are byte-identical to
    // the witnessed card's so the two rows can never drift apart.
    "corpus_datasheet_sketch_pure" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(len($Toks) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h,
         |    CAST(concat('0x', substr(md5(source), 1, 15)) AS BIGINT) AS hs,
         |    CAST(concat('0x', substr(md5(lang), 1, 15)) AS BIGINT) AS hl,
         |    ${h32("concat('dsq_', CAST(doc_id AS VARCHAR))")} AS sh
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |skh AS (SELECT CAST(count(*) AS BIGINT) AS k_h, max(h) AS kth_h
         |        FROM (SELECT h, row_number() OVER (ORDER BY h) AS r
         |              FROM (SELECT DISTINCT h FROM b)) WHERE r <= 256),
         |sks AS (SELECT CAST(count(*) AS BIGINT) AS k_s, max(hs) AS kth_s
         |        FROM (SELECT hs, row_number() OVER (ORDER BY hs) AS r
         |              FROM (SELECT DISTINCT hs FROM b)) WHERE r <= 256),
         |skl AS (SELECT CAST(count(*) AS BIGINT) AS k_l, max(hl) AS kth_l
         |        FROM (SELECT hl, row_number() OVER (ORDER BY hl) AS r
         |              FROM (SELECT DISTINCT hl FROM b)) WHERE r <= 256),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(nc) AS BIGINT) AS n_chars
         |  FROM b),
         |smp AS (SELECT nt FROM b ORDER BY sh, doc_id LIMIT 256),
         |sq AS (SELECT quantile_cont(nt, 0.5) AS p50s,
         |              quantile_cont(nt, 0.9) AS p90s FROM smp),
         |e AS (SELECT *,
         |        CASE WHEN k_h < 256 THEN CAST(k_h AS DOUBLE)
         |             ELSE 255.0 * 1152921504606846976.0 / CAST(kth_h AS DOUBLE)
         |        END AS est_h,
         |        CASE WHEN k_s < 256 THEN CAST(k_s AS DOUBLE)
         |             ELSE 255.0 * 1152921504606846976.0 / CAST(kth_s AS DOUBLE)
         |        END AS est_s,
         |        CASE WHEN k_l < 256 THEN CAST(k_l AS DOUBLE)
         |             ELSE 255.0 * 1152921504606846976.0 / CAST(kth_l AS DOUBLE)
         |        END AS est_l
         |      FROM a, skh, sks, skl, sq)
         |SELECT n_docs, n_tokens, n_chars,
         |  round(est_h, 6) AS est_distinct_docs,
         |  round((CAST(n_docs AS DOUBLE) - est_h) * 1000.0 / CAST(n_docs AS DOUBLE), 6) AS est_dup_pm,
         |  round(est_s, 6) AS est_sources,
         |  round(est_l, 6) AS est_langs,
         |  round(p50s, 6) AS p50_tokens_est,
         |  round(p90s, 6) AS p90_tokens_est
         |FROM e""".stripMargin,

    "quality_calibration" ->
      s"""WITH b AS (
         |  SELECT doc_id, round($QualitySql, 6) AS qs,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |k AS (
         |  SELECT doc_id, qs,
         |    ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
         |  FROM b),
         |r AS (
         |  SELECT keep,
         |    row_number() OVER (ORDER BY qs DESC, doc_id ASC) AS rank,
         |    count(*) OVER () AS n
         |  FROM k)
         |SELECT ((rank - 1) * 10) // n AS decile,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_gopher_pass,
         |  round(CAST(count(*) FILTER (WHERE keep) AS DOUBLE) / count(*), 6) AS pass_rate
         |FROM r GROUP BY decile ORDER BY decile""".stripMargin,

    "ngram_counts" ->
      s"""WITH g AS (
         |  SELECT unnest(${shinglesSql(2)}) AS ngram
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
         |FROM g GROUP BY ngram
         |ORDER BY cnt DESC, ngram ASC LIMIT 50""".stripMargin,

    "decontaminate" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(list_transform(${shinglesSql(4)}, s -> ${h32("s")})) AS g
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
         |hits AS (
         |  SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_hits
         |  FROM g WHERE g IN (SELECT g FROM bench) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  coalesce(h.n_hits, 0) > 0 AS contaminated
         |FROM read_parquet('{SFDIR}/documents.parquet') d
         |LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin,

    "decontaminate_bloom_fp" -> bloomConfusionSql(sized = true),
    "decontaminate_bloom_fp_8kb" -> bloomConfusionSql(sized = false),
    "decontaminate_attribution" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(list_transform(${shinglesSql(4)}, s -> ${h32("s")})) AS g
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |b AS (SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 50 = 0),
         |c AS (SELECT doc_id AS corpus_id, g FROM g WHERE doc_id % 50 <> 0),
         |hits AS (
         |  SELECT b.bench_id,
         |    CAST(count(DISTINCT c.corpus_id) AS BIGINT) AS n_leaking_docs,
         |    CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_grams
         |  FROM b JOIN c ON b.g = c.g GROUP BY b.bench_id)
         |SELECT d.doc_id AS bench_id,
         |  coalesce(h.n_leaking_docs, 0) AS n_leaking_docs,
         |  coalesce(h.n_shared_grams, 0) AS n_shared_grams
         |FROM read_parquet('{SFDIR}/documents.parquet') d
         |LEFT JOIN hits h ON d.doc_id = h.bench_id
         |WHERE d.doc_id % 50 = 0 ORDER BY bench_id""".stripMargin,

    // The bit set is reproduced exactly: a position is "set" iff some
    // bench gram hashes to it, so membership in the distinct-position
    // CTE IS the bitmap lookup — false positives (a non-bench gram
    // whose k salted hashes all collide with set bits) match the
    // engine's by construction. The bitmap width m is re-derived from
    // the bench gram count with the engine's integer arithmetic
    // (bloomVerdictCtes sized = true).
    "decontaminate_bloom" ->
      s"""WITH ${bloomVerdictCtes(sized = true)},
hits AS (
SELECT doc_id, CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS n_hit_grams
FROM gp GROUP BY doc_id)
SELECT d.doc_id, coalesce(h.n_hit_grams, 0) AS n_hit_grams,
coalesce(h.n_hit_grams, 0) > 0 AS contaminated
FROM read_parquet('{SFDIR}/documents.parquet') d
LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""",

    "redact_pii" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    concat(text, ' contact user', CAST(doc_id AS VARCHAR),
         |      '@mail.example.com or +1 555-01', CAST(doc_id % 100 AS VARCHAR),
         |      ' node 10.0.', CAST(doc_id % 256 AS VARCHAR), '.',
         |      CAST(doc_id % 100 AS VARCHAR)) AS text
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |s1 AS (SELECT doc_id, text,
         |         regexp_replace(text, '${Corpus.EmailRe}', '<EMAIL>', 'g') AS e1
         |       FROM t),
         |s2 AS (SELECT *, regexp_replace(e1, '${Corpus.IpRe}', '<IP>', 'g') AS e2 FROM s1),
         |s3 AS (SELECT *, regexp_replace(e2, '${Corpus.PhoneRe}', '<PHONE>', 'g') AS e3 FROM s2)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Corpus.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(e1, '${Corpus.IpRe}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(e2, '${Corpus.PhoneRe}')) AS BIGINT) AS n_phones,
         |  md5(e3) AS redacted_md5
         |FROM s3 ORDER BY doc_id""".stripMargin,

    // Same sigs/bands spelling as every LSH oracle (LshCandCtes); the
    // benchmark side is the doc_id % 50 staging, self-pairs excluded.
    "decontaminate_fuzzy" ->
      s"""WITH $LshCandCtes,
         |fcand AS (
         |  SELECT DISTINCT l.doc_id AS doc_id, r.doc_id AS bench_id
         |  FROM bands l JOIN bands r ON l.band = r.band AND l.v = r.v
         |    AND r.doc_id % 50 = 0 AND l.doc_id <> r.doc_id),
         |fest AS (
         |  SELECT c.doc_id,
         |    CAST(${(0 until 8).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")} AS DOUBLE) / 8 AS est_jaccard
         |  FROM fcand c JOIN sigs a ON c.doc_id = a.doc_id JOIN sigs b ON c.bench_id = b.doc_id),
         |fagg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_candidates,
         |    max(est_jaccard) AS max_est_jaccard
         |  FROM fest GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(f.n_bench_candidates, 0) AS n_bench_candidates,
         |  round(coalesce(f.max_est_jaccard, 0.0), 6) AS max_est_jaccard,
         |  coalesce(f.n_bench_candidates, 0) > 0 AS contaminated
         |FROM read_parquet('{SFDIR}/documents.parquet') d
         |LEFT JOIN fagg f USING (doc_id) ORDER BY doc_id""".stripMargin,

    "corpus_dedup_report" -> {
      val n = Corpus.SubstringN
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dup
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_neardup_noncanonical FROM dups),
         |punits AS (
         |  SELECT doc_id, chunk_id AS para_idx,
         |    array_to_string(list_slice(t, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ') AS ptext
         |  FROM (
         |    SELECT doc_id, t,
         |      unnest(range(0, greatest((len(t) - 32 + 31) // 32, 0) + 1)) AS chunk_id
         |    FROM (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')))),
         |pk AS (
         |  SELECT row_number() OVER (PARTITION BY md5(ptext) ORDER BY doc_id, para_idx) = 1 AS keep
         |  FROM punits),
         |pa AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_paragraph_units,
         |    CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_paragraph_dropped
         |  FROM pk),
         |toks AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |wins AS (
         |  SELECT doc_id, p, md5(array_to_string(list_slice(t, p + 1, p + $n), ' ')) AS wkey
         |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - ${n - 1}, 0))) AS p FROM toks)),
         |wrk AS (
         |  SELECT doc_id, p, row_number() OVER (PARTITION BY wkey ORDER BY doc_id, p) AS rn FROM wins),
         |srem AS (
         |  SELECT DISTINCT doc_id, p + ds.d AS pos
         |  FROM wrk, (SELECT unnest(range(0, $n)) AS d) ds WHERE rn > 1),
         |sb AS (SELECT CAST(count(*) AS BIGINT) AS n_substring_tokens_removed FROM srem),
         |$WinnowCtes,
         |rows_ AS (
         |  SELECT DISTINCT doc_id, hs[p + 1] AS h
         |  FROM (SELECT doc_id, hs, unnest(fps) AS p FROM fp)),
         |keep AS (
         |  SELECT h FROM (SELECT h, count(*) AS c FROM rows_ GROUP BY h)
         |  WHERE c <= 16),
         |k AS (SELECT doc_id, h FROM rows_ JOIN keep USING (h)),
         |wpair AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |wn AS (
         |  SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM wpair) AS n_winnow_pairs,
         |    (SELECT CAST(count(DISTINCT dd) AS BIGINT) FROM
         |      (SELECT doc_a AS dd FROM wpair UNION ALL SELECT doc_b FROM wpair))
         |      AS n_winnow_docs),
         |cont AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_containment_pairs
         |  FROM pairs p JOIN sets a ON p.doc_a = a.doc_id JOIN sets b ON p.doc_b = b.doc_id
         |  WHERE greatest(
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh),
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh)) >= 0.8)
         |SELECT * FROM ex, nd, pa, sb, wn, cont""".stripMargin
    },

    // Mirrors the corpus_yield_report funnel: the gate_attribution
    // flag spellings composed as cumulative conjunctions, one
    // aggregate, unpivoted by UNION ALL.
    "corpus_yield_report" -> {
      val lex = graft.pipeline.TextOps.Badwords.map(w => s"'$w'").mkString(", ")
      val stages = Seq("raw", "exact_dedup", "neardup_dedup", "quality",
        "language", "badwords", "decontaminate")
      val sel = stages.zipWithIndex.map { case (nm, i) =>
        val dd = if (i == 0) "CAST(0 AS BIGINT)" else s"d${i - 1} - d$i"
        val td = if (i == 0) "CAST(0 AS BIGINT)" else s"t${i - 1} - t$i"
        s"SELECT CAST($i AS INTEGER) AS stage, '$nm' AS gate, d$i AS n_docs, " +
          s"t$i AS n_tokens, $dd AS n_docs_dropped, $td AS n_tokens_dropped FROM a"
      }.mkString("\n|  UNION ALL ")
      val cnt = (1 to 6).map(i =>
        s"CAST(count(*) FILTER (WHERE c$i) AS BIGINT) AS d$i, " +
          s"CAST(coalesce(sum(n_tokens) FILTER (WHERE c$i), 0) AS BIGINT) AS t$i")
        .mkString(",\n|    ")
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |yg AS (
         |  SELECT doc_id, unnest(list_transform(${shinglesSql(4)}, s -> ${h32("s")})) AS g
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |ybench AS (SELECT DISTINCT g FROM yg WHERE doc_id % 50 = 0),
         |yhits AS (
         |  SELECT DISTINCT doc_id FROM yg WHERE g IN (SELECT g FROM ybench)),
         |base AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens,
         |    (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS exact_ok,
         |    ($QualitySql) >= 0.5 AS q_ok,
         |    ($LangPredSql) = lang AS lang_ok,
         |    CAST(floor(len(list_filter($Toks, t -> t IN ($lex))) * 1000000.0 / len($Toks) + 0.5) AS BIGINT) <= 50000 AS bw_ok
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |f AS (
         |  SELECT n_tokens,
         |    exact_ok AS c1,
         |    exact_ok AND nd_ok AS c2,
         |    exact_ok AND nd_ok AND q_ok AS c3,
         |    exact_ok AND nd_ok AND q_ok AND lang_ok AS c4,
         |    exact_ok AND nd_ok AND q_ok AND lang_ok AND bw_ok AS c5,
         |    exact_ok AND nd_ok AND q_ok AND lang_ok AND bw_ok AND dc_ok AS c6
         |  FROM (SELECT *,
         |          doc_id NOT IN (SELECT doc_id FROM dups) AS nd_ok,
         |          doc_id NOT IN (SELECT doc_id FROM yhits) AS dc_ok
         |        FROM base)),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS d0,
         |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t0,
         |    $cnt
         |  FROM f)
         |SELECT * FROM (
         |  $sel
         |) ORDER BY stage""".stripMargin
    },

    "embedding_stats" ->
      s"""WITH n AS (
         |  SELECT label,
         |    sqrt(${dotSql("embedding", "embedding")}) AS nrm,
         |    CAST(round(sqrt(${dotSql("embedding", "embedding")}) * 1e6, 0) AS BIGINT) AS nm,
         |    len(embedding) AS dims
         |  FROM read_parquet('{SFDIR}/embeddings.parquet'))
         |SELECT label,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(count(*) FILTER (WHERE nm = 0) AS BIGINT) AS n_zero_norm,
         |  CAST(min(dims) AS INTEGER) AS min_dims,
         |  CAST(max(dims) AS INTEGER) AS max_dims,
         |  round(min(nrm), 6) AS min_norm,
         |  round(max(nrm), 6) AS max_norm,
         |  round(CAST(sum(nm) AS DOUBLE) / (count(*) * 1e6), 6) AS mean_norm
         |FROM n GROUP BY label ORDER BY label""".stripMargin,

    // Full-precision cosine ranks the nearest neighbor (rounding only
    // at output); ties break to the lower corpus id, mirroring the
    // engine's negated-id max-struct.
    "decontaminate_semantic" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |sc AS (
         |  SELECT b.vec_id AS bench_id, c.vec_id AS corp_id,
         |    ${cosSql("c.embedding", "b.embedding")} AS cosv
         |  FROM e b JOIN e c ON b.vec_id % 50 = 0 AND c.vec_id % 50 <> 0),
         |ag AS (
         |  SELECT bench_id,
         |    CAST(count(*) FILTER (WHERE cosv >= 0.4) AS BIGINT) AS n_leaks
         |  FROM sc GROUP BY bench_id),
         |nr AS (
         |  SELECT bench_id, corp_id AS nearest_id, cosv,
         |    row_number() OVER (PARTITION BY bench_id ORDER BY cosv DESC, corp_id ASC) AS rn
         |  FROM sc)
         |SELECT a.bench_id, a.n_leaks, n.nearest_id,
         |  round(n.cosv, 6) AS nearest_cosine, a.n_leaks > 0 AS leaked
         |FROM ag a JOIN nr n USING (bench_id) WHERE n.rn = 1
         |ORDER BY bench_id""".stripMargin,

    // Same removal/rebuild spelling as dedup_substrings at n=4, with
    // "later occurrence of a repeated key" replaced by "key present
    // in the benchmark window set".
    "decontaminate_spans" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |cw AS (
         |  SELECT doc_id, p, md5(array_to_string(list_slice(t, p + 1, p + 4), ' ')) AS wkey
         |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - 3, 0))) AS p
         |        FROM toks WHERE doc_id % 50 <> 0)),
         |bk AS (
         |  SELECT DISTINCT md5(array_to_string(list_slice(t, p + 1, p + 4), ' ')) AS wkey
         |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - 3, 0))) AS p
         |        FROM toks WHERE doc_id % 50 = 0)),
         |rem AS (
         |  SELECT DISTINCT doc_id, p + ds.d AS pos
         |  FROM cw JOIN bk USING (wkey), (SELECT unnest(range(0, 4)) AS d) ds),
         |ragg AS (SELECT doc_id, list(pos) AS rem FROM rem GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(len(r.rem), 0) AS BIGINT) AS n_removed,
         |  round(CAST(coalesce(len(r.rem), 0) AS DOUBLE) / greatest(len(t.t), 1), 6) AS removed_frac,
         |  md5(coalesce(array_to_string(
         |    list_transform(
         |      list_filter(range(0, len(t.t)), i -> NOT coalesce(list_contains(r.rem, i), false)),
         |      i -> t.t[i + 1]), ' '), '')) AS text_sub_md5,
         |  coalesce(len(r.rem), 0) > 0 AS changed
         |FROM toks t LEFT JOIN ragg r USING (doc_id)
         |WHERE t.doc_id % 50 <> 0 ORDER BY t.doc_id""".stripMargin,

    // Corpus assignments keep crank = 1, bench probes crank <= 2;
    // every (bench, corpus) pair meets at most once, so aggregates
    // need no distinct. Bench rows with no cell-shared candidate
    // surface with zero counts and null nearest columns.
    "decontaminate_semantic_ivf" ->
      s"""WITH $KmeansCtes,
         |casg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT vec_id, embedding, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |    FROM (SELECT e.vec_id, e.embedding, c.cid,
         |            ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |          FROM e, c2 c WHERE e.vec_id % 50 <> 0))
         |  WHERE crank = 1),
         |basg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT vec_id, embedding, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |    FROM (SELECT e.vec_id, e.embedding, c.cid,
         |            ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |          FROM e, c2 c WHERE e.vec_id % 50 = 0))
         |  WHERE crank <= 2),
         |sc AS (
         |  SELECT b.vec_id AS bench_id, a.vec_id AS corp_id,
         |    ${cosSql("a.embedding", "b.embedding")} AS cosv
         |  FROM casg a JOIN basg b ON a.cell = b.cell),
         |ag AS (
         |  SELECT bench_id, CAST(count(*) AS BIGINT) AS n_candidates,
         |    CAST(count(*) FILTER (WHERE cosv >= 0.4) AS BIGINT) AS n_leaks
         |  FROM sc GROUP BY bench_id),
         |nr AS (
         |  SELECT bench_id, corp_id, cosv,
         |    row_number() OVER (PARTITION BY bench_id ORDER BY cosv DESC, corp_id ASC) AS rn
         |  FROM sc)
         |SELECT b.vec_id AS bench_id,
         |  CAST(coalesce(a.n_candidates, 0) AS BIGINT) AS n_candidates,
         |  CAST(coalesce(a.n_leaks, 0) AS BIGINT) AS n_leaks,
         |  n.corp_id AS nearest_id,
         |  round(n.cosv, 6) AS nearest_cosine,
         |  coalesce(a.n_leaks, 0) > 0 AS leaked
         |FROM e b
         |LEFT JOIN ag a ON b.vec_id = a.bench_id
         |LEFT JOIN (SELECT * FROM nr WHERE rn = 1) n ON b.vec_id = n.bench_id
         |WHERE b.vec_id % 50 = 0
         |ORDER BY bench_id""".stripMargin,

    "extract_html" ->
      s"""WITH $HtmlCtes
         |SELECT doc_id, extracted_text,
         |  CAST(length(html) AS BIGINT) AS n_chars_html,
         |  CAST(length(extracted_text) AS BIGINT) AS n_chars_extracted,
         |  CAST(len(string_split(body, chr(10))) AS BIGINT) AS lines_total,
         |  CAST(len(kept) AS BIGINT) AS lines_kept,
         |  replace(extracted_text, chr(10), ' ') = text AS roundtrip_ok
         |FROM he ORDER BY doc_id""".stripMargin,

    "html_extract_stats" ->
      s"""WITH $HtmlCtes
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS docs,
         |  CAST(sum(CASE WHEN replace(extracted_text, chr(10), ' ') = text THEN 1 ELSE 0 END) AS BIGINT) AS roundtrip_ok_docs,
         |  CAST(sum(length(html)) AS BIGINT) AS html_chars,
         |  CAST(sum(length(extracted_text)) AS BIGINT) AS extracted_chars,
         |  CAST(sum(len(string_split(body, chr(10)))) AS BIGINT) AS lines_total,
         |  CAST(sum(len(kept)) AS BIGINT) AS lines_kept,
         |  CAST(sum(length(extracted_text)) * 1000 // sum(length(html)) AS BIGINT) AS yield_per_mille
         |FROM he GROUP BY source ORDER BY source""".stripMargin,

    // Deliberately NOT built on HtmlCtes: the oracle gates the CLEAN
    // text while the engine gates the text it recovered from the
    // synthetic pages — the two sides share no extraction code, so
    // the hash compare is an end-to-end semantics-preservation proof
    // for the whole crawl→corpus front segment.
    "crawl_prepare" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT doc_id,
         |  round($QualitySql, 6) AS q,
         |  ($LangPredSql = lang) AS lang_ok,
         |  n_words AS n_tokens,
         |  ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |    AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS gopher_keep,
         |  CASE WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM t ORDER BY doc_id""".stripMargin,

    "normalize_text" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g')) AS text_norm
        |  FROM read_parquet('{SFDIR}/documents.parquet'))
        |SELECT doc_id, text_norm, md5(text_norm) AS norm_md5,
        |  CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  CAST(length(text_norm) AS BIGINT) AS n_chars_norm,
        |  text_norm <> text AS changed
        |FROM n ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_md5,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS canonical_doc_id
        |FROM read_parquet('{SFDIR}/documents.parquet') GROUP BY 1 ORDER BY content_md5""".stripMargin,

    "dedup_minhash" ->
      s"""SELECT doc_id, ${(0 until 8).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
         |FROM (SELECT doc_id, $Shingles AS sh FROM read_parquet('{SFDIR}/documents.parquet')) ORDER BY doc_id""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH $LshCandCtes
         |SELECT doc_a, doc_b FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_incremental" ->
      s"""WITH $LshCandCtes
         |SELECT doc_a, doc_b,
         |  CAST((CASE WHEN doc_a % 10 = 0 THEN 1 ELSE 0 END)
         |     + (CASE WHEN doc_b % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         |FROM pairs
         |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_bbit" -> {
      val agree = (0 until 8)
        .map(i => s"(CASE WHEN a.m$i % 4 = b.m$i % 4 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $LshCandCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST($agree AS BIGINT) AS n_agree_bbit,
         |  round(greatest(0.0, (CAST($agree AS DOUBLE) / 8 - 0.25) / 0.75), 6) AS est_jaccard_bbit
         |FROM pairs p
         |JOIN sigs a ON p.doc_a = a.doc_id
         |JOIN sigs b ON p.doc_b = b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "dedup_minhash_est" -> {
      val agree = (0 until 8)
        .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $LshCandCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST($agree AS BIGINT) AS n_agree,
         |  round(CAST($agree AS DOUBLE) / 8, 6) AS est_jaccard
         |FROM pairs p
         |JOIN sigs a ON p.doc_a = a.doc_id
         |JOIN sigs b ON p.doc_b = b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "dedup_jaccard" ->
      s"""WITH $LshPairCtes
         |SELECT p.doc_a, p.doc_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         |FROM pairs p JOIN sets a ON p.doc_a = a.doc_id JOIN sets b ON p.doc_b = b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_containment" ->
      s"""WITH $LshPairCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS containment_a,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6) AS containment_b
         |FROM pairs p JOIN sets a ON p.doc_a = a.doc_id JOIN sets b ON p.doc_b = b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_editdist" ->
      s"""WITH $LshCandCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
         |  round(CAST(levenshtein(a.text, b.text) AS DOUBLE) /
         |        greatest(length(a.text), length(b.text)), 6) AS edit_ratio
         |FROM pairs p
         |JOIN read_parquet('{SFDIR}/documents.parquet') a ON p.doc_a = a.doc_id
         |JOIN read_parquet('{SFDIR}/documents.parquet') b ON p.doc_b = b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH sh AS MATERIALIZED (
         |  SELECT doc_id, $SimhashSum AS simhash
         |  FROM (SELECT doc_id, list_transform($Toks, t -> ${h32("t")}) AS th FROM read_parquet('{SFDIR}/documents.parquet'))),
         |sbands AS (
         |  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS v
         |  FROM sh, (SELECT unnest(range(0, 4)) AS band) b)
         |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
         |FROM sbands l JOIN sbands r ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash64_pairs" ->
      s"""WITH sh AS MATERIALIZED (
         |  SELECT doc_id, $Simhash64Expr AS simhash
         |  FROM (SELECT doc_id,
         |          list_transform($Toks, t -> ${h32("t")}) AS t1,
         |          list_transform($Toks, t -> ${h32("concat('s64_', t)")}) AS t2
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |sbands AS (
         |  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS v
         |  FROM sh, (SELECT unnest(range(0, 8)) AS band) b)
         |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
         |FROM sbands l JOIN sbands r ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $CcCtes
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    // DELIBERATELY the full-rebuild SQL: the incremental query's
    // contract is exact agreement with relabeling from scratch.
    "dedup_clusters_incremental" ->
      s"""WITH RECURSIVE $CcCtes
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    "dedup_representatives" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |ld AS (
         |  SELECT l.cluster_id, l.doc_id, d.n_chars
         |  FROM labels l JOIN read_parquet('{SFDIR}/documents.parquet') d USING (doc_id)),
         |rk AS (
         |  SELECT cluster_id, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cluster_id) AS cs
         |  FROM ld)
         |SELECT cluster_id, doc_id AS keep_doc_id, n_chars AS keep_chars,
         |  CAST(cs AS BIGINT) AS cluster_size
         |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    "paragraph_dedup_filter" ->
      s"""WITH punits AS (
         |  SELECT doc_id, chunk_id AS para_idx,
         |    array_to_string(list_slice(t, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ') AS ptext
         |  FROM (
         |    SELECT doc_id, t,
         |      unnest(range(0, greatest((len(t) - 32 + 31) // 32, 0) + 1)) AS chunk_id
         |    FROM (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')))),
         |k AS (
         |  SELECT doc_id, para_idx, ptext,
         |    row_number() OVER (PARTITION BY md5(ptext) ORDER BY doc_id, para_idx) = 1 AS keep
         |  FROM punits)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_paras,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
         |  round(CAST(count(*) FILTER (WHERE NOT keep) AS DOUBLE) / count(*), 6) AS drop_frac,
         |  coalesce(array_to_string(list(ptext ORDER BY para_idx) FILTER (WHERE keep), ' '), '') AS text_clean,
         |  count(*) FILTER (WHERE NOT keep) > 0 AS changed
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same rebuild as paragraph_dedup_filter, but first-occurrence is
    // ranked PER DOCUMENT (partition leads with doc_id): only
    // within-document copies drop.
    "dedup_intradoc" ->
      s"""WITH punits AS (
         |  SELECT doc_id, chunk_id AS para_idx,
         |    array_to_string(list_slice(t, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ') AS ptext
         |  FROM (
         |    SELECT doc_id, t,
         |      unnest(range(0, greatest((len(t) - 32 + 31) // 32, 0) + 1)) AS chunk_id
         |    FROM (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')))),
         |k AS (
         |  SELECT doc_id, para_idx, ptext,
         |    row_number() OVER (PARTITION BY doc_id, md5(ptext) ORDER BY para_idx) = 1 AS keep
         |  FROM punits)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_paras,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
         |  round(CAST(count(*) FILTER (WHERE NOT keep) AS DOUBLE) / count(*), 6) AS drop_frac,
         |  coalesce(array_to_string(list(ptext ORDER BY para_idx) FILTER (WHERE keep), ' '), '') AS text_clean,
         |  count(*) FILTER (WHERE NOT keep) > 0 AS changed
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Window-key ranking mirrors the engine's min-struct first
    // occurrence; the removal set is the DISTINCT union of duplicated
    // window spans (overlaps collapse by construction); the rebuild
    // filters 0-based token positions against that set.
    "dedup_substrings" -> substringDedupSql(""),

    // The incremental operator's contract IS this filter: the full
    // recompute over snapshot ∪ delta, restricted to the delta docs.
    "dedup_substrings_incremental" ->
      substringDedupSql("WHERE t.doc_id % 10 = 0"),

    // Identical contract served from the persisted state table — any
    // parquet round-trip drift of the (wkey, first) rows goes red.
    "dedup_substrings_incremental_loaded" ->
      substringDedupSql("WHERE t.doc_id % 10 = 0"),

    // The corpus-wide spelling with first-occurrence ranked PER
    // DOCUMENT (partition leads with doc_id).
    "dedup_substrings_intradoc" -> {
      val n = Corpus.SubstringN
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |wins AS (
         |  SELECT doc_id, p, md5(array_to_string(list_slice(t, p + 1, p + $n), ' ')) AS wkey
         |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - ${n - 1}, 0))) AS p FROM toks)),
         |rk AS (
         |  SELECT doc_id, p, row_number() OVER (PARTITION BY doc_id, wkey ORDER BY p) AS rn FROM wins),
         |rem AS (
         |  SELECT DISTINCT doc_id, p + ds.d AS pos
         |  FROM rk, (SELECT unnest(range(0, $n)) AS d) ds WHERE rn > 1),
         |ragg AS (SELECT doc_id, list(pos) AS rem FROM rem GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(len(r.rem), 0) AS BIGINT) AS n_removed,
         |  round(CAST(coalesce(len(r.rem), 0) AS DOUBLE) / greatest(len(t.t), 1), 6) AS removed_frac,
         |  md5(coalesce(array_to_string(
         |    list_transform(
         |      list_filter(range(0, len(t.t)), i -> NOT coalesce(list_contains(r.rem, i), false)),
         |      i -> t.t[i + 1]), ' '), '')) AS text_sub_md5,
         |  coalesce(len(r.rem), 0) > 0 AS changed
         |FROM toks t LEFT JOIN ragg r USING (doc_id) ORDER BY t.doc_id""".stripMargin
    },

    "substring_stats" -> {
      val n = Corpus.SubstringN
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |wins AS (
         |  SELECT doc_id, p, md5(array_to_string(list_slice(t, p + 1, p + $n), ' ')) AS wkey
         |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - ${n - 1}, 0))) AS p FROM toks)),
         |rk AS (
         |  SELECT doc_id, p, row_number() OVER (PARTITION BY wkey ORDER BY doc_id, p) AS rn FROM wins),
         |isl AS (
         |  SELECT doc_id, p, p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
         |  FROM rk WHERE rn > 1),
         |runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM isl GROUP BY doc_id, g),
         |agg AS (
         |  SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_dup_windows,
         |    CAST(max(len) + ${n - 1} AS BIGINT) AS longest_dup_run
         |  FROM runs GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(greatest(len(t.t) - ${n - 1}, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(a.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(a.longest_dup_run, 0) AS BIGINT) AS longest_dup_run
         |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin
    },

    // Exact star edges (min-uid per md5 group) UNION LSH-verified
    // fuzzy edges over the same 32-token units -> recursive-CTE
    // connected components -> keep = singleton or component min-uid ->
    // the same per-document rebuild as paragraph_dedup_filter.
    "paragraph_neardedup_filter" ->
      s"""WITH RECURSIVE punits AS MATERIALIZED (
         |  SELECT doc_id, chunk_id AS para_idx,
         |    doc_id * 1000 + chunk_id AS uid,
         |    array_to_string(list_slice(t, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ') AS ptext
         |  FROM (
         |    SELECT doc_id, t,
         |      unnest(range(0, greatest((len(t) - 32 + 31) // 32, 0) + 1)) AS chunk_id
         |    FROM (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')))),
         |pu2 AS MATERIALIZED (SELECT uid AS doc_id, ptext AS text FROM punits),
         |${lshCandCtesFrom("pu2")},
         |sets AS MATERIALIZED (SELECT doc_id, list_distinct($Shingles) AS sh FROM pu2),
         |fz AS (
         |  SELECT p.doc_a, p.doc_b
         |  FROM pairs p JOIN sets a ON p.doc_a = a.doc_id JOIN sets b ON p.doc_b = b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         |ex AS (
         |  SELECT root AS doc_a, uid AS doc_b FROM (
         |    SELECT uid, min(uid) OVER (PARTITION BY md5(ptext)) AS root FROM punits)
         |  WHERE uid <> root),
         |ej2 AS (SELECT doc_a, doc_b FROM fz UNION SELECT doc_a, doc_b FROM ex),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM ej2 UNION SELECT doc_b, doc_a FROM ej2),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT rr.src, e.dst FROM reach rr JOIN edges e ON rr.dst = e.src),
         |labels AS (SELECT src AS uid, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
         |k AS (
         |  SELECT p.doc_id, p.para_idx, p.ptext,
         |    l.cluster_id IS NULL OR l.cluster_id = p.uid AS keep
         |  FROM punits p LEFT JOIN labels l ON p.uid = l.uid)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_paras,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
         |  round(CAST(count(*) FILTER (WHERE NOT keep) AS DOUBLE) / count(*), 6) AS drop_frac,
         |  coalesce(array_to_string(list(ptext ORDER BY para_idx) FILTER (WHERE keep), ' '), '') AS text_clean,
         |  count(*) FILTER (WHERE NOT keep) > 0 AS changed
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_paragraphs" ->
      s"""WITH punits AS MATERIALIZED (
         |  SELECT doc_id * 1000 + chunk_id AS doc_id,
         |    array_to_string(list_slice(t, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ') AS text
         |  FROM (
         |    SELECT doc_id, t,
         |      unnest(range(0, greatest((len(t) - 32 + 31) // 32, 0) + 1)) AS chunk_id
         |    FROM (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')))),
         |${lshCandCtesFrom("punits")},
         |sets AS MATERIALIZED (SELECT doc_id, list_distinct($Shingles) AS sh FROM punits)
         |SELECT p.doc_a // 1000 AS doc_a, p.doc_a % 1000 AS para_a,
         |  p.doc_b // 1000 AS doc_b, p.doc_b % 1000 AS para_b,
         |  round(jac, 6) AS jaccard
         |FROM (
         |  SELECT p.doc_a, p.doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(a.sh, b.sh))) AS jac
         |  FROM pairs p JOIN sets a ON p.doc_a = a.doc_id JOIN sets b ON p.doc_b = b.doc_id) p
         |WHERE jac >= 0.5 AND p.doc_a // 1000 <> p.doc_b // 1000
         |ORDER BY doc_a, para_a, doc_b, para_b""".stripMargin,

    "dedup_simhash" ->
      s"""SELECT doc_id, $SimhashSum AS simhash
         |FROM (SELECT doc_id, list_transform($Toks, t -> ${h32("t")}) AS th FROM read_parquet('{SFDIR}/documents.parquet'))
         |ORDER BY doc_id""".stripMargin,

    "embedding_neardup" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet'))
         |SELECT id_a, id_b, round(cosv, 6) AS cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (acc, x) -> acc + x) /
         |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)) *
         |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (acc, x) -> acc + x))) AS cosv
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cosv >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "neardup_threshold_sweep" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |p AS MATERIALIZED (
         |  SELECT cosv FROM (
         |    SELECT ${cosSql("a.embedding", "b.embedding")} AS cosv
         |    FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |  WHERE cosv >= 0.3),
         |t(threshold) AS (VALUES (0.3),(0.4),(0.5),(0.6),(0.7),(0.8),(0.9))
         |SELECT threshold, CAST(count(p.cosv) AS BIGINT) AS n_pairs
         |FROM t LEFT JOIN p ON p.cosv >= t.threshold
         |GROUP BY threshold ORDER BY threshold""".stripMargin,

    "embedding_neardup_lsh" -> {
      def planeSql(p: Int, d: Int) =
        s"((${h32(s"'plane_${p}_$d'")} % 1000) / 500.0 - 1.0)"
      def bucketSql(t: Int, nbits: Int, tbl: String) =
        (0 until nbits).map { i =>
          val dot = (0 until 64)
            .map(d => s"CAST($tbl.embedding[${d + 1}] AS DOUBLE) * ${planeSql(t * nbits + i, d)}")
            .mkString(" + ")
          s"(CASE WHEN $dot > 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
      // An OR-of-tables join emits each qualifying pair once, matching
      // the Spark side's union + distinct across per-table joins.
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    ${bucketSql(0, 4, "embeddings")} AS b0,
         |    ${bucketSql(1, 4, "embeddings")} AS b1
         |  FROM read_parquet('{SFDIR}/embeddings.parquet') embeddings)
         |SELECT id_a, id_b, round(cosv, 6) AS cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.embedding", "b.embedding")} AS cosv
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1))
         |WHERE cosv >= 0.4
         |ORDER BY id_a, id_b""".stripMargin
    },

    "neardup_threshold_sweep_lsh" -> {
      def planeSql(p: Int, d: Int) =
        s"((${h32(s"'plane_${p}_$d'")} % 1000) / 500.0 - 1.0)"
      def bucketSql(t: Int, nbits: Int, tbl: String) =
        (0 until nbits).map { i =>
          val dot = (0 until 64)
            .map(d => s"CAST($tbl.embedding[${d + 1}] AS DOUBLE) * ${planeSql(t * nbits + i, d)}")
            .mkString(" + ")
          s"(CASE WHEN $dot > 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    ${bucketSql(0, 4, "embeddings")} AS b0,
         |    ${bucketSql(1, 4, "embeddings")} AS b1
         |  FROM read_parquet('{SFDIR}/embeddings.parquet') embeddings),
         |p AS MATERIALIZED (
         |  SELECT cosv FROM (
         |    SELECT ${cosSql("a.embedding", "b.embedding")} AS cosv
         |    FROM e a JOIN e b ON a.vec_id < b.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1))
         |  WHERE cosv >= 0.5),
         |t(threshold) AS (VALUES (0.5),(0.6),(0.7),(0.8),(0.9))
         |SELECT threshold, CAST(count(p.cosv) AS BIGINT) AS n_pairs
         |FROM t LEFT JOIN p ON p.cosv >= t.threshold
         |GROUP BY threshold ORDER BY threshold""".stripMargin
    },

    "ann_topk" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))), (acc, x) -> acc + x) /
         |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)) *
         |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))), (acc, x) -> acc + x))) AS cosine
         |  FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "ann_knn_graph" ->
      s"""WITH $KnnCtes
         |SELECT u AS vec_id, rk AS rank, v AS neighbor_id, round(cos, 6) AS cosine
         |FROM nb3 WHERE rk <= 4 ORDER BY vec_id, rank""".stripMargin,

    "ann_recall_knn_graph" ->
      s"""WITH $KnnCtes,
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q JOIN e n ON q.vec_id < 16 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 4),
         |knng AS (SELECT u AS query_id, v AS neighbor_id FROM nb3 WHERE rk <= 4 AND u < 16)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(g.neighbor_id) AS BIGINT) AS knng_hits,
         |  round(CAST(count(g.neighbor_id) AS DOUBLE) / count(*), 6) AS knng_recall
         |FROM brute b
         |LEFT JOIN knng g ON g.query_id = b.query_id AND g.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    "semantic_threshold_sweep" ->
      s"""WITH $KnnCtes,
         |pairsq AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b, cos FROM nb3 WHERE rk <= 4),
         |grid(threshold) AS (VALUES (0.3), (0.4), (0.5), (0.6), (0.7)),
         |np AS (SELECT threshold, CAST(count(p.cos) AS BIGINT) AS n_pairs
         |       FROM grid g LEFT JOIN pairsq p ON p.cos >= g.threshold GROUP BY threshold),
         |eps AS (SELECT a AS d, cos FROM pairsq UNION ALL SELECT b AS d, cos FROM pairsq),
         |nd AS (SELECT threshold, CAST(count(DISTINCT e.d) AS BIGINT) AS n_docs
         |       FROM grid g LEFT JOIN eps e ON e.cos >= g.threshold GROUP BY threshold)
         |SELECT np.threshold, n_pairs, n_docs
         |FROM np JOIN nd USING (threshold) ORDER BY threshold""".stripMargin,

    "embedding_neardup_graph" ->
      s"""WITH RECURSIVE $KnnCcCtes
         |SELECT src AS vec_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM greach GROUP BY src ORDER BY vec_id""".stripMargin,

    "embedding_representatives" ->
      s"""WITH RECURSIVE $KnnCcCtes,
         |glabels AS (
         |  SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
         |  FROM greach GROUP BY src),
         |gmem AS (
         |  SELECT l.cluster_id, l.vec_id, e.embedding
         |  FROM glabels l JOIN e ON e.vec_id = l.vec_id),
         |gsc AS (
         |  SELECT a.cluster_id, a.vec_id AS va,
         |    CAST(sum(CAST(floor(${cosSql("a.embedding", "b.embedding")} * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro,
         |    CAST(count(*) AS BIGINT) AS n_peers
         |  FROM gmem a JOIN gmem b
         |    ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
         |  GROUP BY a.cluster_id, a.vec_id)
         |SELECT cluster_id, va AS keep_vec_id, score_micro,
         |  n_peers + 1 AS cluster_size FROM (
         |  SELECT cluster_id, va, score_micro, n_peers,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY score_micro DESC, va ASC) AS rn
         |  FROM gsc)
         |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    "ann_graph_walk" ->
      s"""WITH $KnnCtes,
         |gg AS (SELECT u, v FROM nb3 WHERE rk <= 16),
         |gq AS (SELECT vec_id AS query_id, embedding FROM e WHERE vec_id < 8),
         |f0 AS (SELECT query_id, CAST(0 AS BIGINT) AS node FROM gq),
         |${walkRoundSql("f0", "wc1", "w1")},
         |${walkRoundSql("w1", "wc2", "w2")},
         |${walkRoundSql("w2", "wc3", "w3")},
         |${walkRoundSql("w3", "wc4", "w4")},
         |${walkRoundSql("w4", "wc5", "w5")}
         |SELECT query_id, rank, node AS neighbor_id, round(cos, 6) AS cosine FROM (
         |  SELECT query_id, node, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node ASC) AS INTEGER) AS rank
         |  FROM w5 WHERE node <> query_id)
         |WHERE rank <= 4 ORDER BY query_id, rank""".stripMargin,

    // The ann_graph_walk chain with the label-parity predicate
    // semi-joined into the final ranking (post-filter).
    "ann_graph_walk_filtered" ->
      s"""WITH $KnnCtes,
         |gg AS (SELECT u, v FROM nb3 WHERE rk <= 16),
         |gq AS (SELECT vec_id AS query_id, embedding FROM e WHERE vec_id < 8),
         |f0 AS (SELECT query_id, CAST(0 AS BIGINT) AS node FROM gq),
         |${walkRoundSql("f0", "wc1", "w1")},
         |${walkRoundSql("w1", "wc2", "w2")},
         |${walkRoundSql("w2", "wc3", "w3")},
         |${walkRoundSql("w3", "wc4", "w4")},
         |${walkRoundSql("w4", "wc5", "w5")},
         |fel AS (SELECT vec_id FROM read_parquet('{SFDIR}/embeddings.parquet')
         |        WHERE label % 2 = 1)
         |SELECT query_id, rank, node AS neighbor_id, round(cos, 6) AS cosine FROM (
         |  SELECT query_id, node, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node ASC) AS INTEGER) AS rank
         |  FROM w5 JOIN fel ON fel.vec_id = w5.node
         |  WHERE node <> query_id)
         |WHERE rank <= 4 ORDER BY query_id, rank""".stripMargin,

    "ann_graph_health" ->
      s"""WITH $KnnCtes,
         |he AS (
         |  SELECT u, v, rk,
         |    CAST(floor(cos * 1000000 + 0.5) AS BIGINT) AS cmicro
         |  FROM nb3 WHERE rk <= 4),
         |hr AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_reciprocal
         |  FROM he a WHERE EXISTS (
         |    SELECT 1 FROM he b WHERE b.u = a.v AND b.v = a.u))
         |SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |  hr.n_reciprocal AS n_reciprocal,
         |  round(CAST(hr.n_reciprocal AS DOUBLE) / count(*), 6) AS reciprocity,
         |  CAST(sum(CASE WHEN rk = 1 THEN cmicro END) AS BIGINT) AS cos_micro_r1,
         |  CAST(sum(CASE WHEN rk = 2 THEN cmicro END) AS BIGINT) AS cos_micro_r2,
         |  CAST(sum(CASE WHEN rk = 3 THEN cmicro END) AS BIGINT) AS cos_micro_r3,
         |  CAST(sum(CASE WHEN rk = 4 THEN cmicro END) AS BIGINT) AS cos_micro_r4
         |FROM he, hr GROUP BY hr.n_reciprocal""".stripMargin,

    "ann_knn_graph_delete" ->
      s"""WITH $KnnCtes,
         |aff AS (SELECT DISTINCT u FROM nb3 WHERE rk <= 4 AND v % 97 = 0 AND u % 97 <> 0),
         |surv AS (SELECT u, v, cos FROM nb3 WHERE u % 97 <> 0 AND v % 97 <> 0),
         |rr AS (
         |  SELECT s.u, s.v, s.cos,
         |    CAST(row_number() OVER (PARTITION BY s.u ORDER BY s.cos DESC, s.v ASC) AS INTEGER) AS new_rank
         |  FROM surv s JOIN aff a ON a.u = s.u)
         |SELECT u AS vec_id, new_rank AS rank, v AS neighbor_id, round(cos, 6) AS cosine
         |FROM rr WHERE new_rank <= 4 ORDER BY vec_id, rank""".stripMargin,

    "ann_recall_graph_walk" ->
      s"""WITH $KnnCtes,
         |gg AS (SELECT u, v FROM nb3 WHERE rk <= 16),
         |gq AS (SELECT vec_id AS query_id, embedding FROM e WHERE vec_id < 8),
         |f0 AS (SELECT query_id, CAST(0 AS BIGINT) AS node FROM gq),
         |${walkRoundSql("f0", "wc1", "w1")},
         |${walkRoundSql("w1", "wc2", "w2")},
         |${walkRoundSql("w2", "wc3", "w3")},
         |${walkRoundSql("w3", "wc4", "w4")},
         |${walkRoundSql("w4", "wc5", "w5")},
         |walkr AS (
         |  SELECT query_id, node AS neighbor_id FROM (
         |    SELECT query_id, node,
         |      CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node ASC) AS INTEGER) AS rank
         |    FROM w5 WHERE node <> query_id)
         |  WHERE rank <= 4),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q JOIN e n ON q.vec_id < 8 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 4)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(w.neighbor_id) AS BIGINT) AS walk_hits,
         |  round(CAST(count(w.neighbor_id) AS DOUBLE) / count(*), 6) AS walk_recall
         |FROM brute b
         |LEFT JOIN walkr w ON w.query_id = b.query_id AND w.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    // The walk-recall chain with the label predicate on BOTH sides:
    // the walk post-filtered, the brute restricted to matching nodes.
    "ann_recall_walk_filtered" ->
      s"""WITH $KnnCtes,
         |gg AS (SELECT u, v FROM nb3 WHERE rk <= 16),
         |gq AS (SELECT vec_id AS query_id, embedding FROM e WHERE vec_id < 8),
         |f0 AS (SELECT query_id, CAST(0 AS BIGINT) AS node FROM gq),
         |${walkRoundSql("f0", "wc1", "w1")},
         |${walkRoundSql("w1", "wc2", "w2")},
         |${walkRoundSql("w2", "wc3", "w3")},
         |${walkRoundSql("w3", "wc4", "w4")},
         |${walkRoundSql("w4", "wc5", "w5")},
         |fel AS (SELECT vec_id FROM read_parquet('{SFDIR}/embeddings.parquet')
         |        WHERE label % 2 = 1),
         |walkr AS (
         |  SELECT query_id, node AS neighbor_id FROM (
         |    SELECT query_id, node,
         |      CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node ASC) AS INTEGER) AS rank
         |    FROM w5 JOIN fel ON fel.vec_id = w5.node
         |    WHERE node <> query_id)
         |  WHERE rank <= 4),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q
         |    JOIN (SELECT e.* FROM e JOIN fel USING (vec_id)) n
         |      ON q.vec_id < 8 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 4)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(w.neighbor_id) AS BIGINT) AS fwalk_hits,
         |  round(CAST(count(w.neighbor_id) AS DOUBLE) / count(*), 6) AS fwalk_recall
         |FROM brute b
         |LEFT JOIN walkr w ON w.query_id = b.query_id AND w.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    "ann_knn_graph_append" ->
      s"""WITH ${knnCtesFrom(" WHERE vec_id % 50 <> 0")},
         |gg AS (SELECT u, v FROM nb3),
         |gq AS (SELECT vec_id AS query_id, embedding
         |       FROM read_parquet('{SFDIR}/embeddings.parquet') WHERE vec_id % 50 = 0),
         |f0 AS (SELECT query_id, CAST(1 AS BIGINT) AS node FROM gq),
         |${walkRoundSql("f0", "wc1", "w1")},
         |${walkRoundSql("w1", "wc2", "w2")},
         |${walkRoundSql("w2", "wc3", "w3")},
         |${walkRoundSql("w3", "wc4", "w4")},
         |${walkRoundSql("w4", "wc5", "w5")},
         |dans AS (
         |  SELECT query_id, rank, node, cos FROM (
         |    SELECT query_id, node, cos,
         |      CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node ASC) AS INTEGER) AS rank
         |    FROM w5 WHERE node <> query_id)
         |  WHERE rank <= 4),
         |rev AS (SELECT node AS u, query_id AS v, cos FROM dans),
         |b4 AS (SELECT u, v, cos FROM nb3 WHERE rk <= 4),
         |upd AS (
         |  SELECT u, v, cos, rank FROM (
         |    SELECT u, v, cos,
         |      CAST(row_number() OVER (PARTITION BY u ORDER BY cos DESC, v ASC) AS INTEGER) AS rank
         |    FROM (SELECT u, v, cos FROM b4 UNION ALL SELECT u, v, cos FROM rev))
         |  WHERE rank <= 4),
         |chg AS (SELECT DISTINCT u FROM upd WHERE v % 50 = 0)
         |SELECT vec_id, rank, neighbor_id, cosine, part FROM (
         |  SELECT u AS vec_id, rank, v AS neighbor_id, round(cos, 6) AS cosine,
         |    'updated' AS part
         |  FROM upd WHERE u IN (SELECT u FROM chg)
         |  UNION ALL
         |  SELECT query_id AS vec_id, rank, node AS neighbor_id, round(cos, 6) AS cosine,
         |    'delta' AS part
         |  FROM dans)
         |ORDER BY vec_id, rank""".stripMargin,

    "ann_topk_filtered" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, label FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label AS label,
         |    ${cosSql("q.embedding", "n.embedding")} AS cosine
         |  FROM e q JOIN e n ON q.vec_id < 5 AND q.label = n.label AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, label, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, label, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "ann_topk_sq8" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |$sq8Ctes
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM sq8 ORDER BY query_id, rank""".stripMargin,

    "ann_topk_mrl" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |$mrlCtes
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM mrl ORDER BY query_id, rank""".stripMargin,

    "ann_topk_binary" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |$binCtes
         |SELECT query_id, rank, neighbor_id, hamming, round(cosine, 6) AS cosine
         |FROM bin ORDER BY query_id, rank""".stripMargin,

    "ann_recall_binary" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5),
         |$binCtes
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(s.neighbor_id) AS BIGINT) AS binary_hits,
         |  round(CAST(count(s.neighbor_id) AS DOUBLE) / count(*), 6) AS binary_recall
         |FROM brute b
         |LEFT JOIN bin s ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    "sq8_drift" -> {
      def stats(par: String, mAs: String, sAs: String) =
        s"""(SELECT list(mn ORDER BY i) AS $mAs, list(mx - mn ORDER BY i) AS $sAs FROM (
           |  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn, max(CAST(embedding[i] AS DOUBLE)) AS mx
           |  FROM read_parquet('{SFDIR}/embeddings.parquet'), range(1, 65) t(i)
           |  WHERE vec_id % 2 $par GROUP BY i))""".stripMargin
      s"""WITH pa AS ${stats("= 0", "mins_a", "spans_a")},
         |pb AS ${stats("<> 0", "mins_b", "spans_b")},
         |d AS (
         |  SELECT
         |    list_transform(range(1, 65), i -> abs(mins_a[i] - mins_b[i])) AS dm,
         |    list_transform(range(1, 65), i -> abs(spans_a[i] - spans_b[i])) AS ds
         |  FROM pa, pb)
         |SELECT CAST(len(dm) AS BIGINT) AS n_dims,
         |  round(list_max(dm), 6) AS max_min_shift,
         |  round(list_max(ds), 6) AS max_span_shift,
         |  CAST(len(list_filter(dm, x -> x > 0.01)) AS BIGINT) AS n_min_shifted,
         |  CAST(len(list_filter(ds, x -> x > 0.01)) AS BIGINT) AS n_span_shifted
         |FROM d""".stripMargin
    },

    "ann_recall_compact" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5),
         |$sq8Ctes,
         |$mrlCtes
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(s.neighbor_id) AS BIGINT) AS sq8_hits,
         |  CAST(count(m.neighbor_id) AS BIGINT) AS mrl_hits,
         |  round(CAST(count(s.neighbor_id) AS DOUBLE) / count(*), 6) AS sq8_recall,
         |  round(CAST(count(m.neighbor_id) AS DOUBLE) / count(*), 6) AS mrl_recall
         |FROM brute b
         |LEFT JOIN sq8 s ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
         |LEFT JOIN mrl m ON m.query_id = b.query_id AND m.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    "contrastive_triplets" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |scored AS MATERIALIZED (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    ${cosSql("q.embedding", "n.embedding")} AS cosine
         |  FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
         |pos AS (
         |  SELECT query_id, neighbor_id AS pos_id, round(cosine, 6) AS pos_cos
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
         |        FROM scored)
         |  WHERE rn = 1),
         |neg AS (
         |  SELECT query_id, rn AS neg_rank, neighbor_id AS neg_id,
         |    round(cosine, 6) AS neg_cos
         |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rn
         |        FROM scored WHERE cosine < 0.5)
         |  WHERE rn <= 3)
         |SELECT p.query_id AS query_id, p.pos_id AS pos_id, p.pos_cos AS pos_cos,
         |  n.neg_rank AS neg_rank, n.neg_id AS neg_id, n.neg_cos AS neg_cos
         |FROM pos p JOIN neg n USING (query_id)
         |WHERE n.neg_id <> p.pos_id
         |ORDER BY query_id, neg_rank""".stripMargin,

    "ann_hard_negatives" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    ${cosSql("q.embedding", "n.embedding")} AS cosine
         |  FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
         |banded AS (SELECT * FROM scored WHERE cosine < 0.5),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM banded)
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "bm25_chunks" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |ch AS (
         |  SELECT doc_id, t,
         |    unnest(range(0, greatest((len(t) - 32 + 23) // 24, 0) + 1)) AS chunk_id
         |  FROM d),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, chunk_id,
         |    list_slice(t, chunk_id * 24 + 1, chunk_id * 24 + 32) AS t
         |  FROM ch),
         |corpus AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |         CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
         |  FROM tok),
         |p AS (SELECT doc_id, chunk_id, CAST(len(t) AS DOUBLE) AS dl,
         |             unnest(t) AS term FROM tok),
         |q AS (SELECT doc_id, chunk_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
         |      FROM p WHERE term IN ('spark', 'merge', 'window')
         |      GROUP BY doc_id, chunk_id, dl, term),
         |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
         |        FROM q GROUP BY term),
         |c AS (
         |  SELECT doc_id, chunk_id,
         |    CAST(round(
         |      ln(1 + (n - df + 0.5) / (df + 0.5)) *
         |      (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) * 1e6,
         |      0) AS BIGINT) AS c_micro
         |  FROM q JOIN dfq USING (term) CROSS JOIN corpus)
         |SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
         |  CAST(sum(c_micro) AS BIGINT) AS score_micro
         |FROM c GROUP BY doc_id, chunk_id
         |ORDER BY score_micro DESC, doc_id ASC, chunk_id ASC LIMIT 20""".stripMargin,

    "gate_correlation" ->
      s"""WITH fb AS MATERIALIZED (
         |  SELECT doc_id, is_t, ${h32("f")} % 128 AS b
         |  FROM (SELECT doc_id, source = 'src1' AS is_t,
         |          unnest(list_concat($Toks, ${shinglesSql(2)})) AS f
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |p AS MATERIALIZED (
         |  SELECT doc_id, is_t, b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM fb GROUP BY 1, 2, 3),
         |raw AS (SELECT b, sum(cnt) AS cr FROM p GROUP BY b),
         |tgt AS (SELECT b, sum(cnt) AS ct FROM p WHERE is_t GROUP BY b),
         |tots AS (SELECT sum(cnt) AS totr,
         |                sum(CASE WHEN is_t THEN cnt ELSE 0 END) AS tott FROM p),
         |r AS (SELECT raw.b AS b,
         |        CAST(round((ln((coalesce(ct, 0) + 1.0) / (tott + 128)) -
         |                    ln((cr + 1.0) / (totr + 128))) * 1e6, 0) AS BIGINT)
         |          AS lr_micro
         |      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots),
         |w AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
         |        CAST(sum(cnt * lr_micro) AS BIGINT) AS weight_micro
         |      FROM p JOIN r USING (b) GROUP BY doc_id),
         |xq AS (SELECT doc_id, CAST(round(($QualitySql) * 1e6, 0) AS BIGINT) AS x
         |       FROM read_parquet('{SFDIR}/documents.parquet')),
         |yq AS (SELECT doc_id,
         |         CAST(round(CAST(weight_micro AS DOUBLE) / n_feats, 0) AS BIGINT) AS y
         |       FROM w),
         |j AS (SELECT x, y FROM xq JOIN yq USING (doc_id)),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy,
         |        CAST(sum(x * x) AS BIGINT) AS sxx,
         |        CAST(sum(y * y) AS BIGINT) AS syy FROM j)
         |SELECT n AS n_docs,
         |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         |    (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
         |     sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         |    AS r_quality_dsir
         |FROM s""".stripMargin,

    "vocab_zipf_slope" ->
      s"""WITH cnt AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($Toks) AS w
         |        FROM read_parquet('{SFDIR}/documents.parquet')) GROUP BY w),
         |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT 200),
         |rk AS (SELECT c,
         |         CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT) AS rank
         |       FROM top),
         |m AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
         |             CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
         |      FROM rk),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy,
         |        CAST(sum(x * x) AS BIGINT) AS sxx FROM m)
         |SELECT k AS n_terms,
         |  round((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         |    (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS zipf_slope
         |FROM s""".stripMargin,

    "collocations_pmi" ->
      s"""WITH uni AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($Toks) AS w
         |        FROM read_parquet('{SFDIR}/documents.parquet')) GROUP BY w),
         |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n1 FROM uni),
         |bgall AS MATERIALIZED (
         |  SELECT bg, CAST(count(*) AS BIGINT) AS c12
         |  FROM (SELECT unnest(${shinglesSql(2)}) AS bg
         |        FROM read_parquet('{SFDIR}/documents.parquet')) GROUP BY bg),
         |n2 AS (SELECT CAST(sum(c12) AS BIGINT) AS n2 FROM bgall),
         |j AS (
         |  SELECT bg, c12,
         |    string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
         |  FROM bgall WHERE c12 >= 5)
         |SELECT j.bg AS bg, j.c12 AS c12,
         |  CAST(round(ln((CAST(j.c12 AS DOUBLE) / n2.n2) /
         |    ((CAST(u1.c AS DOUBLE) / n1.n1) * (CAST(u2.c AS DOUBLE) / n1.n1))) * 1e6,
         |    0) AS BIGINT) AS pmi_micro
         |FROM j JOIN uni u1 ON j.w1 = u1.w JOIN uni u2 ON j.w2 = u2.w
         |CROSS JOIN n1 CROSS JOIN n2
         |ORDER BY pmi_micro DESC, bg ASC LIMIT 50""".stripMargin,

    "ann_topk_ivf" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |cents AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce FROM e WHERE vec_id < 8),
         |asg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid, ccos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.ce")} AS ccos
         |        FROM e, cents c)),
         |corpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid AS cell FROM asg WHERE crank = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS qe, cid AS cell FROM asg WHERE vec_id < 5 AND crank <= 2),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM (SELECT p.query_id, c.neighbor_id, ${cosSql("p.qe", "c.ne")} AS cosine
         |        FROM probes p JOIN corpus c ON p.cell = c.cell AND p.query_id <> c.neighbor_id))
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "ann_topk_lsh" -> {
      def planeSql(p: Int, d: Int) =
        s"((${h32(s"'plane_${p}_$d'")} % 1000) / 500.0 - 1.0)"
      def dotSql(p: Int, tbl: String) =
        (0 until 64).map(d => s"CAST($tbl.embedding[${d + 1}] AS DOUBLE) * ${planeSql(p, d)}")
          .mkString(" + ")
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    ${(0 until 4).map(p => s"(CASE WHEN ${dotSql(p, "embeddings")} > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")} AS bucket
         |  FROM read_parquet('{SFDIR}/embeddings.parquet') embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))), (acc, x) -> acc + x) /
         |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)) *
         |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))), (acc, x) -> acc + x))) AS cosine
         |  FROM e q JOIN e n ON q.bucket = n.bucket AND q.vec_id < 5 AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "ivf_centroids" ->
      s"""WITH $KmeansCtes
         |SELECT cid, i AS pos, round(ce[i + 1], 6) AS v
         |FROM c2, range(64) t(i) ORDER BY cid, pos""".stripMargin,

    "ann_topk_ivf_trained" ->
      s"""WITH $KmeansCtes,
         |asg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid, ccos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, e.embedding, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c)),
         |corpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid AS cell FROM asg WHERE crank = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS qe, cid AS cell FROM asg WHERE vec_id < 5 AND crank <= 2),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM (SELECT p.query_id, c.neighbor_id, ${cosSql("p.qe", "c.ne")} AS cosine
         |        FROM probes p JOIN corpus c ON p.cell = c.cell AND p.query_id <> c.neighbor_id))
         |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "pq_codes" ->
      s"""WITH $PqCtes
         |SELECT vec_id, CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code
         |FROM codes ORDER BY vec_id, sub""".stripMargin,

    "ann_topk_pq" ->
      s"""WITH $PqCtes,
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id, q.sub, q.d2
         |        FROM codes c JOIN qd q ON c.sub = q.sub AND c.code = q.cid
         |        WHERE q.query_id <> c.vec_id)
         |  GROUP BY query_id, neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM adc)
         |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "ann_recall_pq" ->
      s"""WITH $PqCtes,
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id, q.sub, q.d2
         |        FROM codes c JOIN qd q ON c.sub = q.sub AND c.code = q.cid
         |        WHERE q.query_id <> c.vec_id)
         |  GROUP BY query_id, neighbor_id),
         |pq AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rank
         |    FROM adc) WHERE rank <= 5),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM emb q JOIN emb n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(p.neighbor_id) AS BIGINT) AS pq_hits,
         |  round(CAST(count(p.neighbor_id) AS DOUBLE) / count(*), 6) AS pq_recall
         |FROM brute b
         |LEFT JOIN pq p ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    "ann_topk_ivfpq" ->
      s"""WITH $KmeansCtes,
         |$PqCtes,
         |iasg AS MATERIALIZED (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c)),
         |ccells AS (SELECT vec_id AS neighbor_id, cid AS cell FROM iasg WHERE crank = 1),
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM iasg WHERE vec_id < 5 AND crank <= 2),
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT p.query_id, cc.neighbor_id, q.sub, q.d2
         |        FROM probes p
         |        JOIN ccells cc ON p.cell = cc.cell AND p.query_id <> cc.neighbor_id
         |        JOIN codes c ON c.vec_id = cc.neighbor_id
         |        JOIN qd q ON q.query_id = p.query_id AND q.sub = c.sub AND q.cid = c.code)
         |  GROUP BY query_id, neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM adc)
         |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // The ann_topk_ivfpq chain verbatim, reduced to its top-5 set and
    // joined against the brute-force ground truth (the ann_recall_pq
    // tail shape).
    "ann_recall_ivfpq" ->
      s"""WITH $KmeansCtes,
         |$PqCtes,
         |iasg AS MATERIALIZED (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c)),
         |ccells AS (SELECT vec_id AS neighbor_id, cid AS cell FROM iasg WHERE crank = 1),
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM iasg WHERE vec_id < 5 AND crank <= 2),
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT p.query_id, cc.neighbor_id, q.sub, q.d2
         |        FROM probes p
         |        JOIN ccells cc ON p.cell = cc.cell AND p.query_id <> cc.neighbor_id
         |        JOIN codes c ON c.vec_id = cc.neighbor_id
         |        JOIN qd q ON q.query_id = p.query_id AND q.sub = c.sub AND q.cid = c.code)
         |  GROUP BY query_id, neighbor_id),
         |ivfpq AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rank
         |    FROM adc) WHERE rank <= 5),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM emb q JOIN emb n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(p.neighbor_id) AS BIGINT) AS ivfpq_hits,
         |  round(CAST(count(p.neighbor_id) AS DOUBLE) / count(*), 6) AS ivfpq_recall
         |FROM brute b
         |LEFT JOIN ivfpq p ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    // The ann_topk_pq chain verbatim, trained and searched in the
    // OPQ-rotated basis ([[OpqRembCtes]] — the trained rotation comes
    // from the Verify-dumped fixture; PQ training/encode/ADC are
    // replayed from scratch on rotated vectors).
    "ann_topk_opq" ->
      s"""WITH $OpqRembCtes,
         |${pqCtesFrom("emb AS MATERIALIZED (SELECT vec_id, embedding FROM remb)")},
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id, q.sub, q.d2
         |        FROM codes c JOIN qd q ON c.sub = q.sub AND c.code = q.cid
         |        WHERE q.query_id <> c.vec_id)
         |  GROUP BY query_id, neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM adc)
         |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // ann_recall_pq's shape with the PQ chain in the rotated basis;
    // ground truth stays on the UN-rotated vectors (eraw) exactly as
    // the engine's Similarity.topK(e) does.
    "ann_recall_opq" ->
      s"""WITH $OpqRembCtes,
         |${pqCtesFrom("emb AS MATERIALIZED (SELECT vec_id, embedding FROM remb)")},
         |qd AS MATERIALIZED (
         |  SELECT s.vec_id AS query_id, s.sub, b.cid, ${pqD2Sql("s.sv", "b.ce")} AS d2
         |  FROM subv s JOIN books b ON s.sub = b.sub
         |  WHERE s.vec_id < 5),
         |adc AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2 ORDER BY sub)), (acc, x) -> acc + x) AS adc
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id, q.sub, q.d2
         |        FROM codes c JOIN qd q ON c.sub = q.sub AND c.code = q.cid
         |        WHERE q.query_id <> c.vec_id)
         |  GROUP BY query_id, neighbor_id),
         |opq AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rank
         |    FROM adc) WHERE rank <= 5),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM eraw q JOIN eraw n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(p.neighbor_id) AS BIGINT) AS opq_hits,
         |  round(CAST(count(p.neighbor_id) AS DOUBLE) / count(*), 6) AS opq_recall
         |FROM brute b
         |LEFT JOIN opq p ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    // The composed "OPQ,IVF,PQ" index: ann_topk_ivfpq's chain with
    // BOTH trained stages (IVF cells and PQ books) living in the
    // rotated basis, as in the engine (IvfChain.opqCentroids /
    // opqBooks both train on opqRotated). The _loaded twin shares the
    // SAME from-scratch replay: the oracle does not care whether the
    // engine staged its artifacts in memory or round-tripped them
    // through the IndexStore parquet — bit-exact serving is the claim.
    "ann_topk_opq_ivfpq" -> OpqIvfPqSql,
    "ann_topk_opq_ivfpq_loaded" -> OpqIvfPqSql,

    "embedding_neardup_ivf" ->
      s"""WITH $KmeansCtes,
         |asg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT vec_id, embedding, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |    FROM (SELECT e.vec_id, e.embedding, c.cid,
         |            ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |          FROM e, c2 c))
         |  WHERE crank <= 2)
         |SELECT id_a, id_b, round(cosv, 6) AS cosine FROM (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS cosv
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4)
         |ORDER BY id_a, id_b""".stripMargin,

    // Mirrors Similarity.bitextMine: the embedding_neardup_ivf
    // assignment CTE made bipartite on label parity, candidate
    // micro-cosines, both endpoints' top-4 neighborhood integer sums,
    // the one double margin expression, and the mutual-best filter.
    "bitext_mine" ->
      s"""WITH $KmeansCtes,
         |$bitextCtes
         |SELECT src_id, tgt_id, round(cosv, 6) AS cosine,
         |  CAST(round(margin * 1e6, 0) AS BIGINT) AS margin_micro
         |FROM rk WHERE fwd_rank = 1 AND bwd_rank = 1 AND margin >= 1.0
         |ORDER BY src_id""".stripMargin,

    // Mirrors Similarity.bitextRecall: brute top-1 over the full tgt
    // side for the fixed src frame, left-joined against the miner's
    // candidate frontier and mined partners from the shared CTEs.
    "ann_recall_bitext" ->
      s"""WITH $KmeansCtes,
         |$bitextCtes,
         |bq AS (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')
         |       WHERE label % 2 = 0 AND vec_id < 32),
         |bt AS (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')
         |       WHERE label % 2 = 1),
         |brute AS (
         |  SELECT src_id, tgt_id AS brute_tgt, round(cosine, 6) AS brute_cosine FROM (
         |    SELECT q.vec_id AS src_id, n.vec_id AS tgt_id,
         |      ${cosSql("q.embedding", "n.embedding")} AS cosine,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM bq q JOIN bt n ON q.vec_id <> n.vec_id)
         |  WHERE rank = 1),
         |minedq AS (
         |  SELECT src_id, tgt_id AS mined_tgt FROM rk
         |  WHERE fwd_rank = 1 AND bwd_rank = 1 AND margin >= 1.0)
         |SELECT b.src_id, b.brute_tgt, b.brute_cosine,
         |  c.tgt_id IS NOT NULL AS hit_cand,
         |  coalesce(m.mined_tgt, -1) AS mined_tgt,
         |  coalesce(m.mined_tgt = b.brute_tgt, false) AS hit_mined
         |FROM brute b
         |LEFT JOIN cand c ON c.src_id = b.src_id AND c.tgt_id = b.brute_tgt
         |LEFT JOIN minedq m ON m.src_id = b.src_id
         |ORDER BY b.src_id""".stripMargin,

    "ivf_cell_stats" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c))
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs
         |FROM asg WHERE crank = 1 GROUP BY cid ORDER BY cid""".stripMargin,

    "cluster_top_terms" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c)),
         |cell AS (SELECT vec_id, cid FROM asg WHERE crank = 1),
         |dt AS (
         |  SELECT doc_id, unnest(list_distinct($Toks)) AS token
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df_corpus FROM dt GROUP BY token),
         |dcell AS (
         |  SELECT c.cid, dt.token, CAST(count(*) AS BIGINT) AS df_cell
         |  FROM dt JOIN cell c ON dt.doc_id = c.vec_id GROUP BY c.cid, dt.token),
         |s AS (
         |  SELECT cid, token, df_cell, df_corpus,
         |    CAST(df_cell AS DOUBLE) / df_corpus AS score,
         |    CAST(row_number() OVER (PARTITION BY cid
         |      ORDER BY CAST(df_cell AS DOUBLE) / df_corpus DESC, token ASC)
         |      AS INTEGER) AS rank
         |  FROM dcell JOIN dfc USING (token))
         |SELECT cid, rank, token, df_cell, df_corpus, round(score, 6) AS score
         |FROM s WHERE rank <= 3 ORDER BY cid, rank""".stripMargin,

    "ivf_inertia" -> {
      def inertiaSql(cCte: String, iter: Int) =
        s"""i$iter AS (
           |  SELECT CAST($iter AS INTEGER) AS iter,
           |    CAST(count(*) AS BIGINT) AS n_vecs,
           |    CAST(sum(d) AS BIGINT) AS inertia_micro FROM (
           |    SELECT CAST(round((1 - max(${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}))) * 1e6, 0) AS BIGINT) AS d
           |    FROM e, $cCte c GROUP BY e.vec_id))""".stripMargin
      s"""WITH $KmeansCtes,
         |${inertiaSql("c0", 0)},
         |${inertiaSql("c1", 1)},
         |${inertiaSql("c2", 2)}
         |SELECT * FROM i0 UNION ALL SELECT * FROM i1 UNION ALL SELECT * FROM i2
         |ORDER BY iter""".stripMargin
    },

    // Recall@k: the brute / IVF / LSH CTE bodies are verbatim the three
    // ann_topk* oracles above, reduced to their (query, neighbor) sets,
    // then left-joined against the ground truth and counted per query.
    "ann_recall" -> {
      def planeSql(p: Int, d: Int) =
        s"((${h32(s"'plane_${p}_$d'")} % 1000) / 500.0 - 1.0)"
      def dotPlaneSql(p: Int, tbl: String) =
        (0 until 64).map(d => s"CAST($tbl.embedding[${d + 1}] AS DOUBLE) * ${planeSql(p, d)}")
          .mkString(" + ")
      s"""WITH $KmeansCtes,
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5),
         |tasg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid, ccos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, e.embedding, c.cid,
         |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
         |        FROM e, c2 c)),
         |tcorpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid AS cell FROM tasg WHERE crank = 1),
         |tprobes AS (SELECT vec_id AS query_id, embedding AS qe, cid AS cell FROM tasg WHERE vec_id < 5 AND crank <= 2),
         |ivft AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT p.query_id, c.neighbor_id,
         |      row_number() OVER (PARTITION BY p.query_id ORDER BY ${cosSql("p.qe", "c.ne")} DESC, c.neighbor_id ASC) AS rank
         |    FROM tprobes p JOIN tcorpus c ON p.cell = c.cell AND p.query_id <> c.neighbor_id)
         |  WHERE rank <= 5),
         |eb AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    ${(0 until 4).map(p => s"(CASE WHEN ${dotPlaneSql(p, "embeddings")} > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")} AS bucket
         |  FROM read_parquet('{SFDIR}/embeddings.parquet') embeddings),
         |lsh AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM eb q JOIN eb n ON q.bucket = n.bucket AND q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5),
         |cents AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce FROM e WHERE vec_id < 8),
         |asg AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid, ccos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
         |  FROM (SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.ce")} AS ccos
         |        FROM e, cents c)),
         |corpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid AS cell FROM asg WHERE crank = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS qe, cid AS cell FROM asg WHERE vec_id < 5 AND crank <= 2),
         |ivf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT p.query_id, c.neighbor_id,
         |      row_number() OVER (PARTITION BY p.query_id ORDER BY ${cosSql("p.qe", "c.ne")} DESC, c.neighbor_id ASC) AS rank
         |    FROM probes p JOIN corpus c ON p.cell = c.cell AND p.query_id <> c.neighbor_id)
         |  WHERE rank <= 5)
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(i.neighbor_id) AS BIGINT) AS ivf_hits,
         |  round(CAST(count(i.neighbor_id) AS DOUBLE) / count(*), 6) AS ivf_recall,
         |  CAST(count(t.neighbor_id) AS BIGINT) AS ivft_hits,
         |  round(CAST(count(t.neighbor_id) AS DOUBLE) / count(*), 6) AS ivft_recall,
         |  CAST(count(l.neighbor_id) AS BIGINT) AS lsh_hits,
         |  round(CAST(count(l.neighbor_id) AS DOUBLE) / count(*), 6) AS lsh_recall
         |FROM brute b
         |LEFT JOIN ivf i ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
         |LEFT JOIN ivft t ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
         |LEFT JOIN lsh l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
    },

    // Spectrum oracles: projections through the Verify-dumped rotation
    // fixture with the engine's exact float cast, per-dim exact-integer
    // micro second moments, 64-row rank/cum frame (SpectrumCtes).
    "embedding_spectrum" ->
      s"""WITH $SpectrumCtes
SELECT dim, rank, sq // n AS var_micro,
sq * 1000 // (SELECT tot FROM stot) AS share_pm,
cum_sq * 1000 // (SELECT tot FROM stot) AS cum_share_pm
FROM srk ORDER BY rank""",

    // PR folds run in dim order from 0.0 — the engine's aggregate()
    // over the dim-sorted collect_list, mirrored here by list_reduce
    // over list(... ORDER BY dim): identical IEEE sequences.
    "embedding_intrinsic_dim" ->
      s"""WITH $SpectrumCtes,
fold AS (
SELECT
max(n) AS n_vecs,
CAST(count(*) AS BIGINT) AS n_dims,
list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(sq AS DOUBLE) ORDER BY dim)),
(a, x) -> a + x) AS sd,
list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(sq AS DOUBLE) ORDER BY dim)),
(a, x) -> a + x * x) AS sq2,
min(CASE WHEN cum_sq * 1000 // (SELECT tot FROM stot) >= 900 THEN rank END) AS dims_for_90pct,
max(CASE WHEN rank = 1 THEN sq * 1000 // (SELECT tot FROM stot) END) AS top1_share_pm
FROM srk)
SELECT n_vecs, n_dims,
CAST(floor(sd * sd / sq2 * 1000000 + 0.5) AS BIGINT) AS participation_ratio_micro,
dims_for_90pct, top1_share_pm
FROM fold""",

    // Sample-trained vs full-trained IVF recall: the full-trained
    // chain is KmeansCtes verbatim; the sampled chain repeats the
    // same Lloyd spelling over the hash-sample with rank-of-sampled-id
    // init; both serve through the identical probe/rank block.
    "embedding_outliers" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid, ccos FROM (
         |    SELECT e.vec_id, c.cid,
         |      ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |r AS (SELECT vec_id, cid, ccos,
         |        CAST(row_number() OVER (ORDER BY ccos ASC, vec_id ASC) AS BIGINT) AS rk,
         |        CAST(count(*) OVER () AS BIGINT) AS n
         |      FROM asg)
         |SELECT vec_id, cid, round(ccos, 6) AS home_cos, rk,
         |  (rk - 1) * 10 // n AS decile,
         |  (rk - 1) * 10 // n = 0 AS is_outlier
         |FROM r ORDER BY vec_id""".stripMargin,

    "ivf_cell_drift" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |agg AS (
         |  SELECT cid,
         |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
         |  FROM asg GROUP BY cid),
         |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
         |               CAST(sum(n_delta) AS BIGINT) AS td FROM agg)
         |SELECT cid, n_base, n_delta,
         |  n_base * 1000 // tb AS base_pm,
         |  n_delta * 1000 // td AS delta_pm,
         |  abs(n_base * 1000 // tb - n_delta * 1000 // td) AS drift_pm,
         |  abs(n_base * 1000 // tb - n_delta * 1000 // td) > 100 AS retrain
         |FROM agg, tot ORDER BY cid""".stripMargin,

    "ann_recall_ivf_sampled" -> {
      def sAssign(cPrev: String, name: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT vec_id, embedding, cid FROM (
           |    SELECT e.vec_id, e.embedding, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS rk
           |    FROM es e, $cPrev c) WHERE rk = 1)""".stripMargin
      def sUpdate(aName: String, cPrev: String, name: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT p.cid, coalesce(u.ce, p.ce) AS ce
           |  FROM $cPrev p LEFT JOIN (
           |    SELECT cid, list(cv ORDER BY i) AS ce FROM (
           |      SELECT cid, i, round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) + 0 AS cv
           |      FROM $aName, range(64) t(i) GROUP BY cid, i)
           |    GROUP BY cid) u ON p.cid = u.cid)""".stripMargin
      def serve(cents: String, pfx: String) =
        s"""${pfx}asg AS MATERIALIZED (
           |  SELECT vec_id, embedding, cid, ccos,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
           |  FROM (SELECT e.vec_id, e.embedding, c.cid,
           |          ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) AS ccos
           |        FROM e, $cents c)),
           |${pfx}corpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid AS cell FROM ${pfx}asg WHERE crank = 1),
           |${pfx}probes AS (SELECT vec_id AS query_id, embedding AS qe, cid AS cell FROM ${pfx}asg WHERE vec_id < 5 AND crank <= 2),
           |${pfx}top AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT p.query_id, c.neighbor_id,
           |      row_number() OVER (PARTITION BY p.query_id ORDER BY ${cosSql("p.qe", "c.ne")} DESC, c.neighbor_id ASC) AS rank
           |    FROM ${pfx}probes p JOIN ${pfx}corpus c ON p.cell = c.cell AND p.query_id <> c.neighbor_id)
           |  WHERE rank <= 5)""".stripMargin
      s"""WITH $KmeansCtes,
         |es AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM e
         |  WHERE ${h32("concat('ivfsample_', CAST(vec_id AS VARCHAR))")} % 4 = 0),
         |cs0 AS (
         |  SELECT CAST(rn - 1 AS INTEGER) AS cid,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
         |  FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rn FROM es)
         |  WHERE rn <= 8),
         |${sAssign("cs0", "as1_")},
         |${sUpdate("as1_", "cs0", "cs1")},
         |${sAssign("cs1", "as2_")},
         |${sUpdate("as2_", "cs1", "cs2")},
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q JOIN e n ON q.vec_id < 5 AND q.vec_id <> n.vec_id)
         |  WHERE rank <= 5),
         |${serve("c2", "ft")},
         |${serve("cs2", "sm")}
         |SELECT b.query_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(t.neighbor_id) AS BIGINT) AS ivft_hits,
         |  round(CAST(count(t.neighbor_id) AS DOUBLE) / count(*), 6) AS ivft_recall,
         |  CAST(count(sv.neighbor_id) AS BIGINT) AS ivfs_hits,
         |  round(CAST(count(sv.neighbor_id) AS DOUBLE) / count(*), 6) AS ivfs_recall
         |FROM brute b
         |LEFT JOIN fttop t ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
         |LEFT JOIN smtop sv ON b.query_id = sv.query_id AND b.neighbor_id = sv.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
    },

    "corpus_prepare" ->
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |g0 AS (
         |  SELECT doc_id,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |g AS (
         |  SELECT doc_id, n_words AS n_tokens,
         |    ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
         |  FROM g0),
         |canon AS (
         |  SELECT doc_id, q, lang_ok,
         |    (doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AS is_exact
         |  FROM (SELECT doc_id, lang, md5(text) AS cmd5,
         |          $QualitySql AS q,
         |          ($LangPredSql) = lang AS lang_ok
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |kept AS (
         |  SELECT c.doc_id, g.n_tokens FROM canon c JOIN g ON c.doc_id = g.doc_id
         |  WHERE c.is_exact AND c.doc_id NOT IN (SELECT doc_id FROM dups)
         |    AND c.q >= 0.5 AND c.lang_ok AND g.keep)
         |SELECT doc_id,
         |  CASE WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split,
         |  n_tokens
         |FROM kept ORDER BY doc_id""".stripMargin,

    // The prepare body with the winnow CC graph supplying the
    // near-dup non-canonicals (wdups) — g0/g/canon/kept verbatim from
    // corpus_prepare.
    "corpus_prepare_winnow" ->
      s"""WITH RECURSIVE $WinnowCtes,
         |rows_ AS (
         |  SELECT DISTINCT doc_id, hs[p + 1] AS h
         |  FROM (SELECT doc_id, hs, unnest(fps) AS p FROM fp)),
         |keep_ AS (
         |  SELECT h FROM (SELECT h, count(*) AS c FROM rows_ GROUP BY h)
         |  WHERE c <= 16),
         |k AS (SELECT doc_id, h FROM rows_ JOIN keep_ USING (h)),
         |wp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |wedges AS (SELECT doc_a AS src, doc_b AS dst FROM wp
         |           UNION SELECT doc_b, doc_a FROM wp),
         |wreach(src, dst) AS (
         |  SELECT src, dst FROM wedges
         |  UNION
         |  SELECT rr.src, e.dst FROM wreach rr JOIN wedges e ON rr.dst = e.src),
         |wdups AS (SELECT src AS doc_id FROM wreach GROUP BY src HAVING least(src, min(dst)) <> src),
         |g0 AS (
         |  SELECT doc_id,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |g AS (
         |  SELECT doc_id, n_words AS n_tokens,
         |    ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
         |  FROM g0),
         |canon AS (
         |  SELECT doc_id, q, lang_ok,
         |    (doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AS is_exact
         |  FROM (SELECT doc_id, lang, md5(text) AS cmd5,
         |          $QualitySql AS q,
         |          ($LangPredSql) = lang AS lang_ok
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |kept AS (
         |  SELECT c.doc_id, g.n_tokens FROM canon c JOIN g ON c.doc_id = g.doc_id
         |  WHERE c.is_exact AND c.doc_id NOT IN (SELECT doc_id FROM wdups)
         |    AND c.q >= 0.5 AND c.lang_ok AND g.keep)
         |SELECT doc_id,
         |  CASE WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split,
         |  n_tokens
         |FROM kept ORDER BY doc_id""".stripMargin,

    "gate_attribution" -> {
      val gates = Seq("exact", "neardup", "q", "lang", "gopher", "model", "domain")
      val okCol = Map(
        "exact" -> "exact_ok", "neardup" -> "neardup_ok", "q" -> "q_ok",
        "lang" -> "lang_ok", "gopher" -> "gopher_ok", "model" -> "model_ok",
        "domain" -> "domain_ok")
      val fails = gates.map(g =>
        s"CAST(sum(CASE WHEN NOT ${okCol(g)} THEN 1 ELSE 0 END) AS BIGINT) AS fail_$g")
      val soles = gates.map { g =>
        val others = gates.filterNot(_ == g).map(okCol).mkString(" AND ")
        s"CAST(sum(CASE WHEN NOT ${okCol(g)} AND $others THEN 1 ELSE 0 END) AS BIGINT) AS sole_$g"
      }
      val kept = s"CAST(sum(CASE WHEN ${gates.map(okCol).mkString(" AND ")} " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept"
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |$QualityLogitCtes,
         |g0 AS (
         |  SELECT doc_id,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |g AS (
         |  SELECT doc_id,
         |    ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS gopher_ok
         |  FROM g0),
         |m AS (SELECT doc_id, logit >= 0 AS model_ok FROM z),
         |canon AS (
         |  SELECT doc_id, q_ok, lang_ok, domain_ok,
         |    (doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AS exact_ok
         |  FROM (SELECT doc_id, md5(text) AS cmd5,
         |          ($QualitySql) >= 0.5 AS q_ok,
         |          ($LangPredSql) = lang AS lang_ok,
         |          ${domainSql("host")} NOT IN $BlocklistSql AS domain_ok
         |        FROM (SELECT *, $HostSql AS host
         |              FROM read_parquet('{SFDIR}/documents.parquet')))),
         |fl AS (
         |  SELECT c.doc_id, c.exact_ok,
         |    c.doc_id NOT IN (SELECT doc_id FROM dups) AS neardup_ok,
         |    c.q_ok, c.lang_ok, g.gopher_ok, m.model_ok, c.domain_ok
         |  FROM canon c JOIN g USING (doc_id) JOIN m USING (doc_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  ${(fails ++ soles :+ kept).mkString(",\n  ")}
         |FROM fl""".stripMargin
    },

    "corpus_prepare_model" ->
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |$QualityLogitCtes,
         |g AS (SELECT doc_id, n AS n_tokens, logit >= 0 AS keep FROM z),
         |canon AS (
         |  SELECT doc_id, q, lang_ok,
         |    (doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AS is_exact
         |  FROM (SELECT doc_id, lang, md5(text) AS cmd5,
         |          $QualitySql AS q,
         |          ($LangPredSql) = lang AS lang_ok
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |kept AS (
         |  SELECT c.doc_id, g.n_tokens FROM canon c JOIN g ON c.doc_id = g.doc_id
         |  WHERE c.is_exact AND c.doc_id NOT IN (SELECT doc_id FROM dups)
         |    AND c.q >= 0.5 AND c.lang_ok AND g.keep)
         |SELECT doc_id,
         |  CASE WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split,
         |  n_tokens
         |FROM kept ORDER BY doc_id""".stripMargin,

    "url_normalize" -> {
      val tracking =
        Corpus.TrackingParams.map(p => s"'$p'").mkString("[", ", ", "]")
      s"""WITH u AS (
         |  SELECT doc_id, $UrlSql AS url
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, url,
         |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)', 1)), '^www\\.', '') AS host,
         |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:]+:([0-9]+)', 1) AS port,
         |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
         |    regexp_extract(url, '\\?([^#]*)', 1) AS query
         |  FROM u),
         |k AS (
         |  SELECT doc_id, url,
         |    scheme || '://' || host ||
         |    (CASE WHEN port <> '' AND port <> '80' AND port <> '443'
         |      THEN ':' || port ELSE '' END) ||
         |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
         |    (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS canon
         |  FROM (
         |    SELECT *,
         |      array_to_string(list_sort(list_filter(string_split(query, '&'),
         |        p -> p <> '' AND NOT list_contains($tracking,
         |          regexp_extract(p, '^([^=]*)', 1)))), '&') AS kept
         |    FROM c))
         |SELECT doc_id, url, canon AS url_canonical, md5(canon) AS url_key,
         |  url <> canon AS changed
         |FROM k ORDER BY doc_id""".stripMargin
    },

    "domain_stats" ->
      s"""WITH u AS (
         |  SELECT doc_id, text, $HostSql AS host
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |d AS (SELECT doc_id, text, host, ${domainSql("host")} AS domain FROM u)
         |SELECT domain,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($Toks)) AS BIGINT) AS n_tokens,
         |  round(CAST(sum(len($Toks)) AS DOUBLE) / count(*), 6) AS tokens_per_doc
         |FROM d GROUP BY domain ORDER BY domain""".stripMargin,

    "domain_quality_shrunk" ->
      s"""WITH u AS (
         |  SELECT text, $HostSql AS host
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |q AS (
         |  SELECT ${domainSql("host")} AS domain,
         |    CAST(round(($QualitySql) * 1e6, 0) AS BIGINT) AS q_micro
         |  FROM u),
         |d AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(q_micro) AS BIGINT) AS sum_q
         |      FROM q GROUP BY domain),
         |g AS (SELECT CAST(sum(n_docs) AS BIGINT) AS gn,
         |             CAST(sum(sum_q) AS BIGINT) AS gs FROM d)
         |SELECT domain, n_docs,
         |  round(CAST(sum_q AS DOUBLE) / n_docs / 1e6, 6) AS mean_quality,
         |  round((sum_q + (CAST(gs AS DOUBLE) / gn) * 20) / (n_docs + 20) / 1e6, 6)
         |    AS shrunk_quality
         |FROM d, g ORDER BY domain""".stripMargin,

    "domain_tiers" ->
      s"""WITH u AS (
         |  SELECT doc_id, text, $HostSql AS host
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |d AS (SELECT doc_id, text, ${domainSql("host")} AS domain FROM u),
         |s AS (SELECT domain, CAST(sum(len($Toks)) AS BIGINT) AS n_tokens FROM d GROUP BY domain),
         |c AS (
         |  SELECT domain, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, domain
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM s),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM s)
         |SELECT c.domain, c.n_tokens, c.cum_tokens,
         |  CASE WHEN (c.cum_tokens - c.n_tokens) * 10 < t.tot * 5 THEN 'head'
         |       WHEN (c.cum_tokens - c.n_tokens) * 10 < t.tot * 9 THEN 'middle'
         |       ELSE 'tail' END AS tier
         |FROM c, t ORDER BY c.domain""".stripMargin,

    // corpus_prepare's replay + the domain blocklist predicate in the
    // kept gate (host/domain recomputed in the canon CTE from the same
    // synthetic-url spelling).
    "corpus_prepare_gated" ->
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |g0 AS (
         |  SELECT doc_id,
         |    CAST(len($Toks) AS BIGINT) AS n_words,
         |    CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
         |    CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
         |    CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
         |    CASE WHEN len($Shingles) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |g AS (
         |  SELECT doc_id, n_words AS n_tokens,
         |    ((n_words >= 30 AND n_words <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
         |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
         |  FROM g0),
         |canon AS (
         |  SELECT doc_id, q, lang_ok, dom,
         |    (doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AS is_exact
         |  FROM (SELECT doc_id, lang, md5(text) AS cmd5,
         |          $QualitySql AS q,
         |          ($LangPredSql) = lang AS lang_ok,
         |          ${domainSql("host")} AS dom
         |        FROM (SELECT *, $HostSql AS host
         |              FROM read_parquet('{SFDIR}/documents.parquet')))),
         |kept AS (
         |  SELECT c.doc_id, g.n_tokens FROM canon c JOIN g ON c.doc_id = g.doc_id
         |  WHERE c.is_exact AND c.doc_id NOT IN (SELECT doc_id FROM dups)
         |    AND c.q >= 0.5 AND c.lang_ok AND g.keep
         |    AND c.dom NOT IN $BlocklistSql)
         |SELECT doc_id,
         |  CASE WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split,
         |  n_tokens
         |FROM kept ORDER BY doc_id""".stripMargin,

    "corpus_filter" ->
      s"""WITH RECURSIVE $CcCtes,
         |dups AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING least(src, min(dst)) <> src),
         |base AS (
         |  SELECT doc_id, lang, md5(text) AS cmd5,
         |    $QualitySql AS q,
         |    ($LangPredSql) = lang AS lang_ok
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT doc_id,
         |  (doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AS is_exact_canonical,
         |  (doc_id NOT IN (SELECT doc_id FROM dups)) AS is_neardup_canonical,
         |  (q >= 0.5) AS quality_ok,
         |  lang_ok,
         |  ((doc_id = min(doc_id) OVER (PARTITION BY cmd5)) AND
         |   (doc_id NOT IN (SELECT doc_id FROM dups)) AND q >= 0.5 AND lang_ok) AS kept
         |FROM base ORDER BY doc_id""".stripMargin,

    "bar_quantiles" ->
      s"""${Queries.BarsCte}
         |SELECT symbol,
         |  CAST(count(*) AS BIGINT) AS n_bars,
         |  round(quantile_cont(close, 0.25), 6) AS p25,
         |  round(quantile_cont(close, 0.5), 6) AS p50,
         |  round(quantile_cont(close, 0.75), 6) AS p75,
         |  round(quantile_cont(close, 0.9), 6) AS p90,
         |  round(quantile_cont(close, 0.99), 6) AS p99
         |FROM bars GROUP BY symbol ORDER BY symbol""".stripMargin,

    "chunk_docs" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, t,
         |    unnest(range(0, greatest((len(t) - 32 + 23) // 24, 0) + 1)) AS chunk_id
         |  FROM d)
         |SELECT doc_id, chunk_id,
         |  array_to_string(list_slice(t, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ') AS chunk_text,
         |  CAST(len(list_slice(t, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT) AS n_chunk_tokens
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // Shared cell-assignment CTEs with every IVF oracle; skey mirrors
    // the engine's (cell+1)*2^32 + doc_id composite order key.
    "pack_semantic_order" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |d AS (
         |  SELECT d.doc_id, CAST(coalesce(a.cid, -1) AS BIGINT) AS cell,
         |    CAST(len($Toks) AS BIGINT) AS n_tokens,
         |    (CAST(coalesce(a.cid, -1) AS BIGINT) + 1) * 4294967296 + d.doc_id AS skey
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN asg a ON a.vec_id = d.doc_id),
         |c AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (ORDER BY skey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, cell, n_tokens,
         |  cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_window,
         |  (cum - 1) // 512 AS last_window,
         |  ((cum - n_tokens) // 512) <> ((cum - 1) // 512) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    "pack_semantic_gain" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |d AS (
         |  SELECT d.doc_id, CAST(coalesce(a.cid, -1) AS BIGINT) AS cell
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN asg a ON a.vec_id = d.doc_id),
         |lg AS (SELECT cell, lag(cell) OVER (ORDER BY doc_id) AS prev FROM d),
         |ido AS (SELECT CAST(coalesce(sum(CASE WHEN cell = prev THEN 1 ELSE 0 END), 0) AS BIGINT) AS id_same FROM lg),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(count(DISTINCT cell) AS BIGINT) AS n_cells FROM d)
         |SELECT n_docs, n_cells,
         |  n_docs - n_cells AS sem_same,
         |  id_same,
         |  (n_docs - n_cells) * 1000 // (n_docs - 1) AS sem_milli,
         |  id_same * 1000 // (n_docs - 1) AS id_milli,
         |  (n_docs - n_cells) * 1000 // (n_docs - 1) - id_same * 1000 // (n_docs - 1) AS gain_milli
         |FROM g, ido""".stripMargin,

    // One base CTE computes every strategy's closed-form components;
    // three SELECTs unpivot it (engine: one agg + three projections).
    "pack_padding_audit" -> {
      val bucket = "CASE WHEN r <= 32 THEN 32 WHEN r <= 64 THEN 64 WHEN r <= 128 THEN 128 WHEN r <= 256 THEN 256 ELSE 512 END"
      def waste(pad: String) = s"CAST(floor($pad * 1000000.0 / (t + $pad) + 0.5) AS BIGINT) AS waste_micro"
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS L
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, L, L % 512 AS r,
         |    CAST(sum(L) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d),
         |base AS (
         |  SELECT
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(L) AS BIGINT) AS t,
         |    CAST(sum(CASE WHEN ((cum - L) // 512) <> ((cum - 1) // 512) THEN 1 ELSE 0 END) AS BIGINT) AS concat_split,
         |    CAST(sum((L + 511) // 512) AS BIGINT) AS pd_seqs,
         |    CAST(sum((L + 511) // 512 * 512 - L) AS BIGINT) AS pd_pad,
         |    CAST(sum(CASE WHEN L > 512 THEN 1 ELSE 0 END) AS BIGINT) AS over_ctx,
         |    CAST(sum(L // 512 + CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS bk_seqs,
         |    CAST(sum(CASE WHEN r = 0 THEN 0 ELSE ($bucket) - r END) AS BIGINT) AS bk_pad
         |  FROM c)
         |SELECT * FROM (
         |  SELECT 'concat_split' AS strategy, n_docs, t AS total_tokens,
         |    (t + 511) // 512 AS n_sequences,
         |    (t + 511) // 512 * 512 - t AS padded_tokens,
         |    concat_split AS docs_split,
         |    ${waste("((t + 511) // 512 * 512 - t)")}
         |  FROM base
         |  UNION ALL
         |  SELECT 'per_doc_pad', n_docs, t, pd_seqs, pd_pad, over_ctx, ${waste("pd_pad")}
         |  FROM base
         |  UNION ALL
         |  SELECT 'bucket_pad', n_docs, t, bk_seqs, bk_pad, over_ctx, ${waste("bk_pad")}
         |  FROM base)
         |ORDER BY strategy""".stripMargin
    },

    "pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, n_tokens,
         |  cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_window,
         |  (cum - 1) // 512 AS last_window,
         |  ((cum - n_tokens) // 512) <> ((cum - 1) // 512) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    // pack_sequences with the [[Bpe]] replace-chain token count — the
    // 256-merge byte-level fixture is interpolated as the identical
    // chain of left-to-right replaces both engines implement the same
    // way, staged through 64-merge CTE layers on the DuckDB side
    // (binder recursion cap).
    "pack_sequences_bpe" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |d AS (
         |  SELECT doc_id, CAST(length(bpe) AS BIGINT) AS n_tokens
         |  FROM enc),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, n_tokens,
         |  cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_window,
         |  (cum - 1) // 512 AS last_window,
         |  ((cum - n_tokens) // 512) <> ((cum - 1) // 512) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    // The pack-offsets prefix spelling denominated in WordPiece
    // counts (the tokenizer_wordpiece per-doc sums).
    "pack_sequences_wordpiece" ->
      s"""WITH RECURSIVE $wordpieceCtes,
         |docw AS (
         |  SELECT d.doc_id, t.w FROM read_parquet('{SFDIR}/documents.parquet') d,
         |    unnest(string_split(d.text, ' ')) t(w)
         |  WHERE len(t.w) > 0),
         |wagg AS (
         |  SELECT doc_id, CAST(sum(c.n_pieces) AS BIGINT) AS wp_tokens
         |  FROM docw JOIN wpcounts c ON c.word = docw.w GROUP BY doc_id),
         |d AS (
         |  SELECT dd.doc_id, coalesce(w.wp_tokens, 0) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet') dd
         |  LEFT JOIN wagg w USING (doc_id)),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, n_tokens,
         |  cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_window,
         |  (cum - 1) // 512 AS last_window,
         |  ((cum - n_tokens) // 512) <> ((cum - 1) // 512) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    "pack_windows" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d),
         |w AS (
         |  SELECT doc_id,
         |    unnest(range((cum - n_tokens) // 512, (cum - 1) // 512 + 1)) AS window_id
         |  FROM c WHERE (cum - 1) // 512 >= (cum - n_tokens) // 512)
         |SELECT window_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc,
         |  max(doc_id) AS last_doc
         |FROM w GROUP BY window_id ORDER BY window_id""".stripMargin,

    "pack_shuffle" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d),
         |w AS (
         |  SELECT doc_id,
         |    unnest(range((cum - n_tokens) // 512, (cum - 1) // 512 + 1)) AS window_id
         |  FROM c WHERE (cum - 1) // 512 >= (cum - n_tokens) // 512),
         |g AS (
         |  SELECT window_id, CAST(count(*) AS BIGINT) AS n_docs,
         |    ${h32("concat('shuffle_0_', CAST(window_id AS VARCHAR))")} AS shuffle_key
         |  FROM w GROUP BY window_id)
         |SELECT window_id, n_docs, shuffle_key,
         |  CAST(row_number() OVER (ORDER BY shuffle_key ASC, window_id ASC) AS BIGINT) AS train_pos
         |FROM g ORDER BY window_id""".stripMargin,

    "pack_batches" ->
      s"""WITH d AS (
         |  SELECT doc_id, $Toks AS t, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, t, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d),
         |o AS (
         |  SELECT doc_id, t, n_tokens, cum - n_tokens AS start_offset,
         |    (cum - n_tokens) // 512 AS fw, (cum - 1) // 512 AS lw
         |  FROM c WHERE (cum - 1) // 512 >= (cum - n_tokens) // 512),
         |p AS (
         |  SELECT doc_id, w.window_id,
         |    list_slice(t,
         |      greatest(w.window_id * 512, start_offset) - start_offset + 1,
         |      least((w.window_id + 1) * 512, start_offset + n_tokens) - start_offset) AS piece
         |  FROM o, LATERAL (SELECT unnest(range(fw, lw + 1)) AS window_id) w),
         |wm AS (
         |  SELECT window_id,
         |    CAST(sum(len(piece)) AS BIGINT) AS n_tokens,
         |    md5(array_to_string(flatten(list(piece ORDER BY doc_id)), ' ')) AS window_md5
         |  FROM p GROUP BY window_id),
         |tp AS (
         |  SELECT window_id, n_tokens, window_md5,
         |    row_number() OVER (ORDER BY
         |      ${h32("concat('shuffle_0_', CAST(window_id AS VARCHAR))")} ASC,
         |      window_id ASC) AS train_pos
         |  FROM wm)
         |SELECT (train_pos - 1) // 8 AS batch_id,
         |  CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  md5(string_agg(window_md5, '' ORDER BY train_pos)) AS batch_md5
         |FROM tp GROUP BY batch_id ORDER BY batch_id""".stripMargin,

    // Four epoch-filtered replays of the pack_batches chain (doc
    // subset per the mix_epochs permille arithmetic, shuffle key
    // salted per epoch), unioned. CTE blocks generated per epoch so
    // the two engines share one spelling of the whole composition.
    "pack_batches_epochs" -> {
      val blocks = (0 until 4).map { e =>
        s"""d$e AS (
           |  SELECT doc_id, t, n_tokens FROM basedocs JOIN perm USING (source)
           |  WHERE ${h32("concat('epoch_', CAST(doc_id AS VARCHAR))")} % 1000 < permille - ${e * 1000}),
           |c$e AS (
           |  SELECT doc_id, t, n_tokens,
           |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           |  FROM d$e),
           |o$e AS (
           |  SELECT doc_id, t, n_tokens, cum - n_tokens AS start_offset,
           |    (cum - n_tokens) // 512 AS fw, (cum - 1) // 512 AS lw
           |  FROM c$e WHERE (cum - 1) // 512 >= (cum - n_tokens) // 512),
           |p$e AS (
           |  SELECT doc_id, w.window_id,
           |    list_slice(t,
           |      greatest(w.window_id * 512, start_offset) - start_offset + 1,
           |      least((w.window_id + 1) * 512, start_offset + n_tokens) - start_offset) AS piece
           |  FROM o$e, LATERAL (SELECT unnest(range(fw, lw + 1)) AS window_id) w),
           |wm$e AS (
           |  SELECT window_id,
           |    CAST(sum(len(piece)) AS BIGINT) AS n_tokens,
           |    md5(array_to_string(flatten(list(piece ORDER BY doc_id)), ' ')) AS window_md5
           |  FROM p$e GROUP BY window_id),
           |tp$e AS (
           |  SELECT window_id, n_tokens, window_md5,
           |    row_number() OVER (ORDER BY
           |      ${h32(s"concat('shuffle_${e}_', CAST(window_id AS VARCHAR))")} ASC,
           |      window_id ASC) AS train_pos
           |  FROM wm$e)""".stripMargin
      }
      val selects = (0 until 4).map { e =>
        s"""SELECT CAST($e AS INTEGER) AS epoch, (train_pos - 1) // 8 AS batch_id,
           |  CAST(count(*) AS BIGINT) AS n_windows,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |  md5(string_agg(window_md5, '' ORDER BY train_pos)) AS batch_md5
           |FROM tp$e GROUP BY 1, 2""".stripMargin
      }
      s"""WITH basedocs AS (
         |  SELECT doc_id, source, $Toks AS t, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM basedocs GROUP BY source),
         |t_ AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM s),
         |w_ AS (
         |  SELECT source, n_tokens,
         |    round(sqrt(CAST(n_tokens AS DOUBLE))
         |      / (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) FROM s), 6) AS mix_weight
         |  FROM s),
         |perm AS (
         |  SELECT w_.source,
         |    least((CAST(floor(w_.mix_weight * CAST(t_.tot * 4 AS DOUBLE)) AS BIGINT) * 1000)
         |      // w_.n_tokens, 4000) AS permille
         |  FROM w_, t_),
         |${blocks.mkString(",\n")}
         |${selects.mkString("\nUNION ALL\n")}
         |ORDER BY epoch, batch_id""".stripMargin
    },

    // The materialized windows: slice each doc's token list at the
    // window boundaries its offsets imply, reassemble per window in
    // doc_id order, md5 the joined slice. list_slice is 1-based with
    // INCLUSIVE end, matching Spark's slice(start, len) spelling.
    "pack_materialize" ->
      s"""WITH d AS (
         |  SELECT doc_id, $Toks AS t, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, t, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d),
         |o AS (
         |  SELECT doc_id, t, n_tokens, cum - n_tokens AS start_offset,
         |    (cum - n_tokens) // 512 AS fw, (cum - 1) // 512 AS lw
         |  FROM c WHERE (cum - 1) // 512 >= (cum - n_tokens) // 512),
         |p AS (
         |  SELECT doc_id, w.window_id,
         |    list_slice(t,
         |      greatest(w.window_id * 512, start_offset) - start_offset + 1,
         |      least((w.window_id + 1) * 512, start_offset + n_tokens) - start_offset) AS piece
         |  FROM o, LATERAL (SELECT unnest(range(fw, lw + 1)) AS window_id) w)
         |SELECT window_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(piece)) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(flatten(list(piece ORDER BY doc_id)), ' ')) AS window_md5
         |FROM p GROUP BY window_id ORDER BY window_id""".stripMargin,

    // BPE windows: substr over the staged-encode column; string_agg
    // with ORDER BY doc_id concatenates pieces separator-free (symbols
    // ARE the tokens).
    "pack_materialize_bpe" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |d AS (
         |  SELECT doc_id, bpe, CAST(length(bpe) AS BIGINT) AS n_tokens FROM enc),
         |c AS (
         |  SELECT doc_id, bpe, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d),
         |o AS (
         |  SELECT doc_id, bpe, n_tokens, cum - n_tokens AS start_offset,
         |    (cum - n_tokens) // 512 AS fw, (cum - 1) // 512 AS lw
         |  FROM c WHERE (cum - 1) // 512 >= (cum - n_tokens) // 512),
         |p AS (
         |  SELECT doc_id, w.window_id,
         |    substr(bpe,
         |      CAST(greatest(w.window_id * 512, start_offset) - start_offset + 1 AS BIGINT),
         |      CAST(least((w.window_id + 1) * 512, start_offset + n_tokens)
         |        - greatest(w.window_id * 512, start_offset) AS BIGINT)) AS piece
         |  FROM o, LATERAL (SELECT unnest(range(fw, lw + 1)) AS window_id) w)
         |SELECT window_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(piece)) AS BIGINT) AS n_tokens,
         |  md5(string_agg(piece, '' ORDER BY doc_id)) AS window_md5
         |FROM p GROUP BY window_id ORDER BY window_id""".stripMargin,

    "pack_padding_stats" ->
      s"""WITH d AS (
         |  SELECT source, CAST(len($Toks) AS BIGINT) AS n,
         |    (CAST(len($Toks) AS BIGINT) + 511) // 512 AS seqs
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS n_tokens,
         |  CAST(sum(seqs) AS BIGINT) AS n_seqs_padded,
         |  round(1.0 - CAST(sum(n) AS DOUBLE) / (CAST(sum(seqs) AS BIGINT) * 512), 6) AS padding_frac
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "eval_cut_leakage_safe" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |k AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS ckey
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN labels l ON d.doc_id = l.doc_id),
         |cl AS (
         |  SELECT ckey, CAST(min(doc_id) AS BIGINT) AS eval_doc_id,
         |    CAST(count(*) AS BIGINT) AS cluster_size,
         |    ${h32("concat('evalcut:', CAST(ckey AS VARCHAR))")} AS pick_key
         |  FROM k GROUP BY ckey),
         |pick AS (SELECT * FROM cl ORDER BY pick_key ASC, ckey ASC LIMIT 50)
         |SELECT eval_doc_id, ckey, cluster_size,
         |  cluster_size - 1 AS n_excluded_train, pick_key
         |FROM pick ORDER BY eval_doc_id""".stripMargin,

    "corpus_split_leakage_safe" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |k AS (
         |  SELECT d.doc_id AS doc_id,
         |    coalesce(l.cluster_id, d.doc_id) AS split_key
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN labels l ON d.doc_id = l.doc_id)
         |SELECT doc_id, split_key,
         |  ${h32("concat('split_', CAST(split_key AS VARCHAR))")} % 100 AS bucket_pct,
         |  CASE WHEN ${h32("concat('split_', CAST(split_key AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(split_key AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM k ORDER BY doc_id""".stripMargin,

    "corpus_split" ->
      s"""SELECT doc_id,
         |  ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 AS bucket_pct,
         |  CASE WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
         |       WHEN ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin,

    "doc_winnow" ->
      s"""WITH $WinnowCtes
         |SELECT doc_id,
         |  CAST(len(hs) AS BIGINT) AS n_grams,
         |  CAST(len(fps) AS BIGINT) AS n_fingerprints,
         |  round(CASE WHEN len(hs) = 0 THEN 0.0
         |        ELSE CAST(len(fps) AS DOUBLE) / len(hs) END, 6) AS density,
         |  md5(array_to_string(list_transform(fps, p -> CAST(hs[p + 1] AS VARCHAR)), ' ')) AS fp_md5
         |FROM fp ORDER BY doc_id""".stripMargin,

    "dedup_winnow_clusters" ->
      s"""WITH RECURSIVE $WinnowCtes,
         |rows_ AS (
         |  SELECT DISTINCT doc_id, hs[p + 1] AS h
         |  FROM (SELECT doc_id, hs, unnest(fps) AS p FROM fp)),
         |keep AS (
         |  SELECT h FROM (SELECT h, count(*) AS c FROM rows_ GROUP BY h)
         |  WHERE c <= 16),
         |k AS (SELECT doc_id, h FROM rows_ JOIN keep USING (h)),
         |wp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |wedges AS (SELECT doc_a AS src, doc_b AS dst FROM wp
         |           UNION SELECT doc_b, doc_a FROM wp),
         |wreach(src, dst) AS (
         |  SELECT src, dst FROM wedges
         |  UNION
         |  SELECT rr.src, e.dst FROM wreach rr JOIN wedges e ON rr.dst = e.src)
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM wreach GROUP BY src ORDER BY doc_id""".stripMargin,

    "dedup_winnow_incremental" ->
      s"""WITH $WinnowCtes,
         |rows_ AS (
         |  SELECT DISTINCT doc_id, hs[p + 1] AS h
         |  FROM (SELECT doc_id, hs, unnest(fps) AS p FROM fp)),
         |keep AS (
         |  SELECT h FROM (SELECT h, count(*) AS c FROM rows_ GROUP BY h)
         |  WHERE c <= 16),
         |k AS (SELECT doc_id, h FROM rows_ JOIN keep USING (h))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared_fingerprints
         |FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
         |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_winnow_pairs" ->
      s"""WITH $WinnowCtes,
         |rows_ AS (
         |  SELECT DISTINCT doc_id, hs[p + 1] AS h
         |  FROM (SELECT doc_id, hs, unnest(fps) AS p FROM fp)),
         |keep AS (
         |  SELECT h FROM (SELECT h, count(*) AS c FROM rows_ GROUP BY h)
         |  WHERE c <= 16),
         |k AS (SELECT doc_id, h FROM rows_ JOIN keep USING (h))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared_fingerprints
         |FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin,

    "corpus_snapshot_diff" ->
      s"""WITH d AS (
         |  SELECT source, CAST(len($Toks) AS BIGINT) AS n_tok,
         |    (doc_id % 10 <> 0) AS is_old
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |a AS (
         |  SELECT source,
         |    CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_old,
         |    CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_new,
         |    CAST(sum(CASE WHEN is_old THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_old,
         |    CAST(sum(CASE WHEN NOT is_old THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_new
         |  FROM d GROUP BY source),
         |t AS (SELECT CAST(sum(n_tokens_old) AS BIGINT) AS "_to",
         |             CAST(sum(n_tokens_new) AS BIGINT) AS tn FROM a)
         |SELECT source, n_docs_old, n_docs_new, n_tokens_old, n_tokens_new,
         |  CAST((n_tokens_old * 1000) // "_to" AS BIGINT) AS share_old_permille,
         |  CAST((n_tokens_new * 1000) // tn AS BIGINT) AS share_new_permille,
         |  CAST((n_tokens_new * 1000) // tn - (n_tokens_old * 1000) // "_to" AS BIGINT)
         |    AS share_drift_permille
         |FROM a, t ORDER BY source""".stripMargin,

    "dedup_rate_by_source" ->
      s"""SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_contents,
         |  CAST(((count(*) - count(DISTINCT md5(text))) * 1000) // count(*) AS BIGINT)
         |    AS dup_rate_permille
         |FROM read_parquet('{SFDIR}/documents.parquet')
         |GROUP BY source ORDER BY source""".stripMargin,

    "source_overlap" -> {
      val n = Corpus.SubstringN
      s"""WITH t AS (SELECT source, $Toks AS t FROM read_parquet('{SFDIR}/documents.parquet')),
         |w AS (
         |  SELECT DISTINCT source, md5(array_to_string(list_slice(t, p + 1, p + $n), ' ')) AS wkey
         |  FROM (SELECT source, t, unnest(range(0, greatest(len(t) - ${n - 1}, 0))) AS p FROM t))
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_shared_windows
         |FROM w a JOIN w b ON a.wkey = b.wkey AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin
    },

    "vocab_coverage" ->
      s"""WITH c AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS n_occ
         |  FROM (SELECT unnest($Toks) AS token
         |        FROM read_parquet('{SFDIR}/documents.parquet'))
         |  GROUP BY token),
         |r AS (
         |  SELECT token, n_occ,
         |    row_number() OVER (ORDER BY n_occ DESC, token ASC) AS rank
         |  FROM c),
         |t AS (SELECT CAST(sum(n_occ) AS BIGINT) AS tot,
         |             CAST(count(*) AS BIGINT) AS nv FROM c),
         |ks(k) AS (VALUES (100), (1000), (10000))
         |SELECT CAST(ks.k AS BIGINT) AS k,
         |  (SELECT nv FROM t) AS n_vocab_total,
         |  CAST(count(r.token) AS BIGINT) AS n_in_vocab,
         |  CAST(coalesce(sum(r.n_occ), 0) AS BIGINT) AS covered_occ,
         |  (SELECT tot FROM t) AS total_occ,
         |  round(CAST(coalesce(sum(r.n_occ), 0) AS DOUBLE) / (SELECT tot FROM t), 6) AS coverage
         |FROM ks LEFT JOIN r ON r.rank <= ks.k
         |GROUP BY ks.k ORDER BY k""".stripMargin,

    "dedup_urls" -> {
      val tracking =
        Corpus.TrackingParams.map(p => s"'$p'").mkString("[", ", ", "]")
      s"""WITH u AS (
         |  SELECT doc_id * 3 AS sighting_id, $UrlSql AS url
         |  FROM read_parquet('{SFDIR}/documents.parquet')
         |  UNION ALL
         |  SELECT doc_id * 3 + 1 AS sighting_id,
         |    concat($UrlSql,
         |      CASE WHEN doc_id % 2 = 0 THEN '&utm_source=share' ELSE '?utm_source=share' END,
         |      '#frag') AS url
         |  FROM read_parquet('{SFDIR}/documents.parquet')
         |  WHERE doc_id % 3 <> 2
         |  UNION ALL
         |  SELECT doc_id * 3 + 2 AS sighting_id,
         |    concat(
         |      regexp_replace($UrlSql, '^https://(www\\.)?', 'https://www.'),
         |      CASE WHEN doc_id % 2 = 0 THEN '&fbclid=x' ELSE '?fbclid=x' END) AS url
         |  FROM read_parquet('{SFDIR}/documents.parquet')
         |  WHERE doc_id % 5 = 0),
         |c AS (
         |  SELECT sighting_id, url,
         |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)', 1)), '^www\\.', '') AS host,
         |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:]+:([0-9]+)', 1) AS port,
         |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
         |    regexp_extract(url, '\\?([^#]*)', 1) AS query
         |  FROM u),
         |k AS (
         |  SELECT sighting_id,
         |    scheme || '://' || host ||
         |    (CASE WHEN port <> '' AND port <> '80' AND port <> '443'
         |      THEN ':' || port ELSE '' END) ||
         |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
         |    (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS canon
         |  FROM (
         |    SELECT *,
         |      array_to_string(list_sort(list_filter(string_split(query, '&'),
         |        p -> p <> '' AND NOT list_contains($tracking,
         |          regexp_extract(p, '^([^=]*)', 1)))), '&') AS kept
         |    FROM c))
         |SELECT md5(canon) AS url_key, CAST(count(*) AS BIGINT) AS n_sightings,
         |  min(sighting_id) AS canonical_sighting, min(canon) AS url_canonical
         |FROM k GROUP BY md5(canon) ORDER BY url_key""".stripMargin
    },

    "shard_assign" ->
      s"""WITH k AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_tokens
         |  FROM k),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM k)
         |SELECT doc_id, n_tokens, cum_tokens,
         |  CAST(least(((cum_tokens - n_tokens) * 8) // tot, 7) AS BIGINT) AS shard
         |FROM c, t ORDER BY doc_id""".stripMargin,

    // Every tier replayed from scratch: the delete predicate against
    // raw docs/tokens, the shard-plan prefix CTE, the Lloyd-trained
    // cell assignment (KmeansCtes), and the LSH-CC cluster labels
    // (CcCtes) — the same shared CTE spellings their own queries use,
    // so the tiers can never disagree with their sources of truth.
    "deletion_impact_report" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
         |$KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |dii AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens,
         |    doc_id % 97 = 0 AS del
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |dic AS (
         |  SELECT doc_id, n_tokens, del,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum
         |  FROM dii),
         |dit AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM dii),
         |dia AS (
         |  SELECT doc_id, del,
         |    CAST(least(((cum - n_tokens) * 8) // tot, 7) AS BIGINT) AS shard
         |  FROM dic, dit),
         |rows_ AS (
         |  SELECT '1_docs' AS tier,
         |    CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |    CAST(count(*) AS BIGINT) AS n_total FROM dii
         |  UNION ALL
         |  SELECT '2_tokens',
         |    CAST(sum(CASE WHEN del THEN n_tokens ELSE 0 END) AS BIGINT),
         |    CAST(sum(n_tokens) AS BIGINT) FROM dii
         |  UNION ALL
         |  SELECT '3_shards',
         |    CAST(count(DISTINCT CASE WHEN del THEN shard END) AS BIGINT),
         |    CAST(count(DISTINCT shard) AS BIGINT) FROM dia
         |  UNION ALL
         |  SELECT '4_ivf_cells',
         |    CAST(count(DISTINCT CASE WHEN vec_id % 97 = 0 THEN cid END) AS BIGINT),
         |    CAST(count(DISTINCT cid) AS BIGINT) FROM asg
         |  UNION ALL
         |  SELECT '5_neardup_clusters',
         |    CAST(count(DISTINCT CASE WHEN doc_id % 97 = 0 THEN cluster_id END) AS BIGINT),
         |    CAST(count(DISTINCT cluster_id) AS BIGINT) FROM labels)
         |SELECT tier, n_hit, n_total, n_hit * 1000 // n_total AS share_pm
         |FROM rows_ ORDER BY tier""".stripMargin,

    // Replays the shard plan from the parquet source — the engine's
    // numbers come from reading the WRITTEN JSONL back, so equality IS
    // the round-trip proof (content digest = order-free bit_xor of the
    // per-doc 60-bit md5 slice; n_tokens re-tokenized from read-back
    // text).
    "shard_export_roundtrip" ->
      s"""WITH k AS (
         |  SELECT doc_id, text, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, text, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_tokens
         |  FROM k),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM k),
         |a AS (
         |  SELECT doc_id, text, n_tokens,
         |    CAST(least(((cum_tokens - n_tokens) * 8) // tot, 7) AS BIGINT) AS shard
         |  FROM c, t)
         |SELECT shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc_id,
         |  max(doc_id) AS last_doc_id,
         |  bit_xor(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
         |    ':', md5(text))), 1, 15)) AS BIGINT)) AS content_digest,
         |  CAST(sum(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
         |    ':', md5(text))), 1, 15)) AS BIGINT) % 1000000007) AS BIGINT)
         |    AS content_checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,

    // The shard_assign prefix spelling at the CLUSTER level (CC labels
    // -> per-key token sums -> key shards -> members join).
    "shard_assign_cluster_safe" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
         |k AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS shard_key,
         |    CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN labels l USING (doc_id)),
         |g AS (SELECT shard_key, CAST(sum(n_tokens) AS BIGINT) AS g_tok
         |      FROM k GROUP BY shard_key),
         |c AS (
         |  SELECT shard_key, g_tok,
         |    CAST(sum(g_tok) OVER (ORDER BY shard_key ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum
         |  FROM g),
         |t AS (SELECT CAST(sum(g_tok) AS BIGINT) AS tot FROM g),
         |sh AS (
         |  SELECT shard_key, CAST(least(((cum - g_tok) * 8) // tot, 7) AS BIGINT) AS shard
         |  FROM c, t)
         |SELECT k.doc_id, k.shard_key, k.n_tokens, sh.shard
         |FROM k JOIN sh USING (shard_key) ORDER BY doc_id""".stripMargin,

    "shard_assign_bpe" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |k AS (
         |  SELECT doc_id, CAST(length(bpe) AS BIGINT) AS n_tokens FROM enc),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_tokens
         |  FROM k),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM k)
         |SELECT doc_id, n_tokens, cum_tokens,
         |  CAST(least(((cum_tokens - n_tokens) * 8) // tot, 7) AS BIGINT) AS shard
         |FROM c, t ORDER BY doc_id""".stripMargin,

    "shard_stats" ->
      s"""WITH k AS (
         |  SELECT doc_id, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_tokens
         |  FROM k),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM k),
         |a AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(least(((cum_tokens - n_tokens) * 8) // tot, 7) AS BIGINT) AS shard
         |  FROM c, t)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  CAST((sum(n_tokens) * 8000) // (SELECT tot FROM t) AS BIGINT)
         |    AS permille_of_ideal
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,

    "corpus_sample_stratified" ->
      s"""SELECT doc_id, source, sample_rank FROM (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ${h32("concat('sample_', CAST(doc_id AS VARCHAR))")} ASC, doc_id ASC) AS INTEGER) AS sample_rank
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin,

    "corpus_sample_rate" ->
      s"""SELECT doc_id, source,
         |  ${h32("concat('rsample_', CAST(doc_id AS VARCHAR))")} % 10000 AS bucket_pm,
         |  CAST(CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 2500
         |    WHEN 'src2' THEN 5000 WHEN 'src3' THEN 7500 ELSE 10000 END AS BIGINT) AS rate_pm,
         |  ${h32("concat('rsample_', CAST(doc_id AS VARCHAR))")} % 10000 <
         |    CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 2500
         |    WHEN 'src2' THEN 5000 WHEN 'src3' THEN 7500 ELSE 10000 END AS kept
         |FROM read_parquet('{SFDIR}/documents.parquet')
         |ORDER BY doc_id""".stripMargin,

    "source_robust_stats" ->
      s"""WITH base AS (
         |  SELECT source, CAST(len($Toks) AS DOUBLE) AS n_tok
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |med AS (
         |  SELECT source, quantile_cont(n_tok, 0.5) AS median_tokens
         |  FROM base GROUP BY source)
         |SELECT b.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  round(first(m.median_tokens), 6) AS median_tokens,
         |  round(quantile_cont(abs(b.n_tok - m.median_tokens), 0.5), 6) AS mad_tokens
         |FROM base b JOIN med m ON b.source = m.source
         |GROUP BY b.source ORDER BY b.source""".stripMargin,

    // Per-source sampled median/MAD replay: the same bottom-128-by-hash
    // sample SET (hash then doc_id tiebreak within each source), the
    // same two-pass MAD over the sample, exact witnesses recomputed via
    // the source_robust_stats plan verbatim.
    "source_robust_stats_sketch" ->
      s"""WITH base AS (
         |  SELECT source, doc_id, CAST(len($Toks) AS DOUBLE) AS n_tok
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |r AS (
         |  SELECT source, n_tok,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${h32("concat('srq_', CAST(doc_id AS VARCHAR))")} ASC, doc_id ASC) AS rn
         |  FROM base),
         |smp AS (SELECT source, n_tok FROM r WHERE rn <= 128),
         |sm AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_sample,
         |    quantile_cont(n_tok, 0.5) AS med_s
         |  FROM smp GROUP BY source),
         |smad AS (
         |  SELECT s.source, first(m.n_sample) AS n_sample, first(m.med_s) AS med_s,
         |    quantile_cont(abs(s.n_tok - m.med_s), 0.5) AS mad_s
         |  FROM smp s JOIN sm m ON s.source = m.source GROUP BY s.source),
         |xm AS (
         |  SELECT source, quantile_cont(n_tok, 0.5) AS med_x
         |  FROM base GROUP BY source),
         |xmad AS (
         |  SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
         |    first(m.med_x) AS med_x,
         |    quantile_cont(abs(b.n_tok - m.med_x), 0.5) AS mad_x
         |  FROM base b JOIN xm m ON b.source = m.source GROUP BY b.source)
         |SELECT s.source, x.n_docs, s.n_sample,
         |  round(s.med_s, 6) AS median_tokens_est,
         |  round(x.med_x, 6) AS median_tokens_exact,
         |  round(abs(s.med_s - x.med_x) / greatest(abs(x.med_x), 1e-9), 6) AS median_rel_err,
         |  round(s.mad_s, 6) AS mad_tokens_est,
         |  round(x.mad_x, 6) AS mad_tokens_exact,
         |  round(abs(s.mad_s - x.mad_x) / greatest(abs(x.mad_x), 1e-9), 6) AS mad_rel_err
         |FROM smad s JOIN xmad x ON s.source = x.source
         |ORDER BY s.source""".stripMargin,

    "length_outliers" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, CAST(len($Toks) AS DOUBLE) AS n_tok
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |med AS (
         |  SELECT source, quantile_cont(n_tok, 0.5) AS med
         |  FROM base GROUP BY source),
         |mad AS (
         |  SELECT b.source, quantile_cont(abs(b.n_tok - m.med), 0.5) AS mad
         |  FROM base b JOIN med m ON b.source = m.source GROUP BY b.source)
         |SELECT b.doc_id, b.source,
         |  CAST(b.n_tok AS BIGINT) AS n_tokens,
         |  round(m.med, 6) AS median_tokens,
         |  round(d.mad, 6) AS mad_tokens,
         |  abs(b.n_tok - m.med) > d.mad * 4 AS outlier
         |FROM base b JOIN med m ON b.source = m.source
         |  JOIN mad d ON b.source = d.source
         |ORDER BY b.doc_id""".stripMargin,

    "split_novelty" ->
      s"""WITH bg AS MATERIALIZED (
         |  SELECT ${h32("concat('split_', CAST(doc_id AS VARCHAR))")} % 100 AS bucket,
         |         unnest(${shinglesSql(2)}) AS bg
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |train AS (SELECT DISTINCT bg FROM bg WHERE bucket < 80),
         |valid AS (SELECT DISTINCT bg FROM bg WHERE bucket >= 80 AND bucket < 90),
         |unseen AS (SELECT bg FROM valid WHERE bg NOT IN (SELECT bg FROM train))
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM valid) AS n_valid_bigrams,
         |  (SELECT CAST(count(*) AS BIGINT) FROM unseen) AS n_unseen,
         |  CASE WHEN (SELECT count(*) FROM valid) > 0
         |       THEN round(CAST((SELECT count(*) FROM unseen) AS DOUBLE) /
         |                  (SELECT count(*) FROM valid), 6)
         |       ELSE NULL END AS novelty_ratio""".stripMargin,

    "source_stats" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source, unnest($Toks) AS token
         |  FROM read_parquet('{SFDIR}/documents.parquet'))
         |SELECT source,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT token) AS BIGINT) AS n_types,
         |  round(CAST(count(DISTINCT token) AS DOUBLE) / count(*), 6) AS type_token_ratio
         |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "doc_logprob" ->
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, unnest($Toks) AS token
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tok),
         |vocab AS (
         |  SELECT token, CAST(round(ln(count(*) / tot.n_total) * 1e6, 0) AS BIGINT) AS logp_micro
         |  FROM tok, tot GROUP BY token, tot.n_total)
         |SELECT t.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(v.logp_micro) AS BIGINT) AS logprob_micro
         |FROM tok t JOIN vocab v ON t.token = v.token
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "doc_bigram_logprob" ->
      s"""WITH bg AS MATERIALIZED (
         |  SELECT doc_id, unnest(${shinglesSql(2)}) AS bg
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY bg),
         |c1 AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(count(*) AS BIGINT) AS c1
         |       FROM bg GROUP BY 1),
         |model AS (
         |  SELECT c2.bg,
         |    CAST(round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e6, 0) AS BIGINT) AS logp_micro
         |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1)
         |SELECT b.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(m.logp_micro) AS BIGINT) AS logprob_micro
         |FROM bg b JOIN model m ON b.bg = m.bg
         |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,

    "ppl_buckets" ->
      s"""WITH bg AS MATERIALIZED (
         |  SELECT doc_id, unnest(${shinglesSql(2)}) AS bg
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY bg),
         |c1 AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(count(*) AS BIGINT) AS c1
         |       FROM bg GROUP BY 1),
         |model AS (
         |  SELECT c2.bg,
         |    CAST(round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e6, 0) AS BIGINT) AS logp_micro
         |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1),
         |scored AS (
         |  SELECT b.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(m.logp_micro) AS DOUBLE) / count(*) AS avg_lp_micro
         |  FROM bg b JOIN model m ON b.bg = m.bg GROUP BY b.doc_id),
         |cum AS (
         |  SELECT doc_id, n_bigrams, avg_lp_micro,
         |    CAST(sum(n_bigrams) OVER (ORDER BY avg_lp_micro DESC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bigrams
         |  FROM scored),
         |t AS (SELECT CAST(sum(n_bigrams) AS BIGINT) AS tot FROM scored)
         |SELECT doc_id, n_bigrams, round(avg_lp_micro, 6) AS avg_lp_micro,
         |  CASE WHEN (cum_bigrams - n_bigrams) * 3 < tot THEN 'head'
         |       WHEN (cum_bigrams - n_bigrams) * 3 < tot * 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM cum, t ORDER BY doc_id""".stripMargin,

    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |sizes AS (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM labels GROUP BY cluster_id)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "tfidf_top_tokens" ->
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, CAST(len($Toks) AS DOUBLE) AS n_tok,
         |         unnest($Toks) AS token
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |tf AS (SELECT doc_id, token, count(*) / first(n_tok) AS tf
         |       FROM tok GROUP BY doc_id, token),
         |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc
         |        FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n
         |       FROM read_parquet('{SFDIR}/documents.parquet')),
         |scored AS (
         |  SELECT t.doc_id, t.token, t.tf * ln(nn.n / d.dfc) AS tfidf
         |  FROM tf t JOIN dfq d ON t.token = d.token CROSS JOIN nn)
         |SELECT doc_id, token AS top_token, round(tfidf, 6) AS tfidf
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rn
         |      FROM scored)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "bm25_topk" ->
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, $Toks AS t
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |corpus AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |         CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
         |  FROM tok),
         |p AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
         |             unnest(t) AS term FROM tok),
         |q AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
         |      FROM p WHERE term IN ('spark', 'merge', 'window')
         |      GROUP BY doc_id, dl, term),
         |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
         |        FROM q GROUP BY term),
         |c AS (
         |  SELECT doc_id,
         |    CAST(round(
         |      ln(1 + (n - df + 0.5) / (df + 0.5)) *
         |      (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) * 1e6,
         |      0) AS BIGINT) AS c_micro
         |  FROM q JOIN dfq USING (term) CROSS JOIN corpus)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
         |  CAST(sum(c_micro) AS BIGINT) AS score_micro
         |FROM c GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin,

    "hybrid_search_rrf" ->
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, $Toks AS t
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |corpus AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |         CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
         |  FROM tok),
         |p AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
         |             unnest(t) AS term FROM tok),
         |q AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
         |      FROM p WHERE term IN ('spark', 'merge', 'window')
         |      GROUP BY doc_id, dl, term),
         |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
         |        FROM q GROUP BY term),
         |c AS (
         |  SELECT doc_id,
         |    CAST(round(
         |      ln(1 + (n - df + 0.5) / (df + 0.5)) *
         |      (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) * 1e6,
         |      0) AS BIGINT) AS c_micro
         |  FROM q JOIN dfq USING (term) CROSS JOIN corpus),
         |bmtop AS (
         |  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro
         |  FROM c GROUP BY doc_id
         |  ORDER BY score_micro DESC, doc_id ASC LIMIT 20),
         |bmr AS (SELECT doc_id,
         |          CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INTEGER) AS bm25_rank
         |        FROM bmtop),
         |e AS (SELECT vec_id, embedding FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |ann AS (
         |  SELECT neighbor_id AS doc_id, CAST(rank AS INTEGER) AS ann_rank FROM (
         |    SELECT n.vec_id AS neighbor_id,
         |      row_number() OVER (ORDER BY ${cosSql("q2.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
         |    FROM e q2 JOIN e n ON q2.vec_id = 0 AND n.vec_id <> 0)
         |  WHERE rank <= 20),
         |f AS (
         |  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id, b.bm25_rank, a.ann_rank,
         |    coalesce(1000000 // (60 + b.bm25_rank), 0) +
         |    coalesce(1000000 // (60 + a.ann_rank), 0) AS rrf_micro
         |  FROM bmr b FULL OUTER JOIN ann a ON a.doc_id = b.doc_id)
         |SELECT doc_id, bm25_rank, ann_rank, rrf_micro,
         |  fused_rank
         |FROM (SELECT *, CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS INTEGER) AS fused_rank FROM f)
         |WHERE fused_rank <= 10 ORDER BY fused_rank""".stripMargin,

    "colocated_join_stats" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, CAST(len($Toks) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |e AS (
         |  SELECT vec_id,
         |    CAST(round(sqrt(${dotSql("embedding", "embedding")}) * 1e6, 0) AS BIGINT)
         |      AS norm_micro
         |  FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |j AS (SELECT source, n_tokens, norm_micro
         |      FROM d JOIN e ON d.doc_id = e.vec_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(norm_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_norm
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "zorder_layout_stats" -> {
      val morton = (0 until 8).map(b =>
        s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
        .mkString(" + ")
      def bin(v: String, mn: String, mx: String) =
        s"CAST(least(255, greatest(0, CASE WHEN $mx > $mn THEN floor(($v - $mn) / ($mx - $mn) * 256) ELSE 0 END)) AS BIGINT)"
      s"""WITH ev AS (SELECT CAST(user_id AS DOUBLE) AS x, value AS y FROM read_parquet('{SFDIR}/events.parquet')),
         |b AS (SELECT min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy FROM ev),
         |binned AS (SELECT ${bin("x", "mnx", "mxx")} AS bx, ${bin("y", "mny", "mxy")} AS by FROM ev, b),
         |keyed AS (SELECT bx, by, $morton AS zkey FROM binned),
         |files AS (SELECT floor(zkey * 16 / 65536) AS zfile, floor(bx * 16 / 256) AS lfile, bx, by FROM keyed),
         |tagged AS (
         |  SELECT 'zorder' AS layout, zfile AS file, bx, by FROM files
         |  UNION ALL
         |  SELECT 'linear' AS layout, lfile AS file, bx, by FROM files),
         |fstats AS (
         |  SELECT layout, file, min(bx) AS minx, max(bx) AS maxx, min(by) AS miny, max(by) AS maxy
         |  FROM tagged GROUP BY layout, file),
         |probes AS (
         |  SELECT CASE WHEN dd.d = 0 THEN 'x' ELSE 'y' END AS probe_dim,
         |    p.i * 32 AS plo, p.i * 32 + 31 AS phi
         |  FROM range(0, 8) p(i), range(0, 2) dd(d)),
         |scanned AS (
         |  SELECT layout, probe_dim, CAST(count(*) AS BIGINT) AS files_scanned
         |  FROM fstats f JOIN probes p
         |    ON (p.probe_dim = 'x' AND f.minx <= p.phi AND f.maxx >= p.plo)
         |    OR (p.probe_dim = 'y' AND f.miny <= p.phi AND f.maxy >= p.plo)
         |  GROUP BY layout, probe_dim),
         |totals AS (SELECT layout, CAST(count(DISTINCT file) AS BIGINT) AS n_files FROM fstats GROUP BY layout)
         |SELECT s.layout, s.probe_dim, t.n_files, CAST(8 AS BIGINT) AS n_probes, s.files_scanned,
         |  round(CAST(s.files_scanned AS DOUBLE) / (t.n_files * 8), 6) AS scan_fraction
         |FROM scanned s JOIN totals t USING (layout)
         |ORDER BY s.layout, s.probe_dim""".stripMargin
    },

    "corpus_sample_dedup_weighted" ->
      s"""WITH RECURSIVE $CcCtes,
         |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
         |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM labels GROUP BY cluster_id),
         |j AS (
         |  SELECT d.doc_id,
         |    coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |    coalesce(s.sz, 1) AS cluster_size,
         |    (${h32("concat('dwsample|', CAST(d.doc_id AS VARCHAR))")} % 1000000) AS u
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN labels l USING (doc_id)
         |  LEFT JOIN sizes s ON s.cluster_id = l.cluster_id)
         |SELECT doc_id, cluster_id, cluster_size, CAST(cluster_size AS DOUBLE) AS weight
         |FROM j WHERE u * cluster_size < 1000000 ORDER BY doc_id""".stripMargin,

    // The dedup_weighted HT spelling keyed by the ivf_cell_stats
    // home-cell assignment; unembedded docs -> singleton clusters.
    "corpus_sample_cluster_balanced" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz FROM asg GROUP BY cid),
         |j AS (
         |  SELECT d.doc_id,
         |    coalesce(CAST(a.cid AS BIGINT), d.doc_id) AS cluster_id,
         |    coalesce(s.sz, 1) AS cluster_size,
         |    (${h32("concat('cbsample|', CAST(d.doc_id AS VARCHAR))")} % 1000000) AS u
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN asg a ON a.vec_id = d.doc_id
         |  LEFT JOIN sizes s ON s.cid = a.cid)
         |SELECT doc_id, cluster_id, cluster_size, CAST(cluster_size AS DOUBLE) AS weight
         |FROM j WHERE u * cluster_size < 1000000 ORDER BY doc_id""".stripMargin,

    "lsh_param_plan" -> {
      def pAt(sv: String) =
        s"round(1.0 - pow(1.0 - pow($sv, rows_per_band), bands), 6)"
      s"""WITH grid(bands, rows_per_band) AS (VALUES (8, 1), (4, 2), (2, 4), (1, 8))
         |SELECT bands, rows_per_band,
         |  (bands = 4 AND rows_per_band = 2) AS is_current,
         |  round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS s_star,
         |  ${pAt("0.3")} AS p_at_030,
         |  ${pAt("0.5")} AS p_at_050,
         |  ${pAt("0.7")} AS p_at_070,
         |  ${pAt("0.9")} AS p_at_090
         |FROM grid ORDER BY bands DESC""".stripMargin
    },

    "snapshot_diff_report" ->
      s"""WITH a AS (
         |  SELECT doc_id, source, md5(text) AS ha
         |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 10 <> 0),
         |b AS (
         |  SELECT doc_id, source AS source_b,
         |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END) AS hb
         |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 10 <> 1),
         |j AS (
         |  SELECT coalesce(a.source, b.source_b) AS source, a.ha, b.hb
         |  FROM a FULL OUTER JOIN b USING (doc_id))
         |SELECT source,
         |  CAST(sum(CASE WHEN ha IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         |  CAST(sum(CASE WHEN hb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(sum(CASE WHEN ha IS NOT NULL AND hb IS NOT NULL AND ha <> hb
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
         |  CAST(sum(CASE WHEN ha = hb THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         |  CAST(count(*) AS BIGINT) AS n_union,
         |  (CAST(sum(CASE WHEN ha IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   + CAST(sum(CASE WHEN hb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   + CAST(sum(CASE WHEN ha IS NOT NULL AND hb IS NOT NULL AND ha <> hb
         |              THEN 1 ELSE 0 END) AS BIGINT)) * 1000 // count(*) AS churn_pm
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // Release-card field deltas: each side replays the corpus_datasheet
    // card body over its snapshot (A/B per snapshot_diff_report's
    // fixture convention), then one cross join computes (a, b, delta)
    // per field. The card helper strips its own margins BEFORE
    // interpolation (the stripMargin hazard — see bloomVerdictCtes).
    "datasheet_diff" -> {
      def cardSql(where: String, textExpr: String) =
        s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(nt) AS BIGINT) AS n_tokens,
           |  CAST(sum(nc) AS BIGINT) AS n_chars,
           |  CAST(count(DISTINCT h) AS BIGINT) AS nd,
           |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS gp,
           |  CAST(sum(q) AS BIGINT) AS qs,
           |  quantile_cont(nt, 0.5) AS p50,
           |  quantile_cont(nt, 0.9) AS p90
           |FROM (
           |  SELECT *,
           |    ((nt >= 30 AND nt <= 10000) AND (mwl >= 4.0 AND mwl <= 10.0)
           |      AND (af >= 0.8) AND (ns >= 2) AND (df <= 0.1)) AS keep
           |  FROM (
           |    SELECT CAST(len($Toks) AS BIGINT) AS nt,
           |      CAST(length(text) AS BIGINT) AS nc,
           |      md5(text) AS h,
           |      CAST(floor(($QualitySql) * 1000000 + 0.5) AS BIGINT) AS q,
           |      CAST(length(text) - (len($Toks) - 1) AS DOUBLE) / len($Toks) AS mwl,
           |      CAST(len(list_filter($Toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len($Toks) AS af,
           |      CAST(len(list_distinct(list_filter($Toks, w -> w IN ('the','a','of','to','and')))) AS BIGINT) AS ns,
           |      CASE WHEN len($Shingles) = 0 THEN 0.0
           |           ELSE 1.0 - CAST(len(list_distinct($Shingles)) AS DOUBLE) / len($Shingles) END AS df
           |    FROM (SELECT $textExpr AS text
           |          FROM read_parquet('{SFDIR}/documents.parquet')
           |          WHERE $where)))""".stripMargin
      val fin =
        """SELECT n_docs, n_tokens, n_chars,
          |  (n_docs - nd) * 1000 // n_docs AS dup_pm,
          |  gp * 1000 // n_docs AS gopher_pass_pm,
          |  qs // n_docs AS mean_quality_micro,
          |  p50, p90""".stripMargin
      val ints = Seq("n_docs", "n_tokens", "n_chars", "dup_pm",
        "gopher_pass_pm", "mean_quality_micro")
      val sel = (ints.map(f =>
        s"fa.$f AS ${f}_a, fb.$f AS ${f}_b, fb.$f - fa.$f AS ${f}_delta") ++
        Seq("p50" -> "p50_tokens", "p90" -> "p90_tokens").map { case (c, f) =>
          s"round(fa.$c, 6) AS ${f}_a, round(fb.$c, 6) AS ${f}_b, " +
            s"round(fb.$c - fa.$c, 6) AS ${f}_delta"
        }).mkString(",\n")
      s"""WITH ca AS (
${cardSql("doc_id % 10 <> 0", "text")}),
cb AS (
${cardSql("doc_id % 10 <> 1",
        "CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END")}),
fa AS ($fin FROM ca),
fb AS ($fin FROM cb)
SELECT
$sel
FROM fa, fb"""
    },

    "source_drift_report" -> {
      def side(cond: String, pfx: String) =
        s"""SELECT source,
           |  CAST(count(*) AS BIGINT) AS ${pfx}_docs,
           |  CAST(sum(qm) AS BIGINT) // count(*) AS ${pfx}_q_micro,
           |  (CAST(count(*) AS BIGINT) - count(DISTINCT h)) * 1000 // count(*) AS ${pfx}_dup_pm
           |FROM st WHERE $cond GROUP BY source""".stripMargin
      s"""WITH st AS (
         |  SELECT source, ${h32("concat('drift:', CAST(doc_id AS VARCHAR))")} % 2 = 1 AS is_delta,
         |    CAST(floor(($QualitySql) * 1000000 + 0.5) AS BIGINT) AS qm,
         |    md5(text) AS h
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |b AS (${side("NOT is_delta", "base")}),
         |d AS (${side("is_delta", "delta")})
         |SELECT coalesce(b.source, d.source) AS source,
         |  coalesce(base_docs, 0) AS base_docs,
         |  coalesce(delta_docs, 0) AS delta_docs,
         |  coalesce(base_q_micro, 0) AS base_q_micro,
         |  coalesce(delta_q_micro, 0) AS delta_q_micro,
         |  coalesce(base_dup_pm, 0) AS base_dup_pm,
         |  coalesce(delta_dup_pm, 0) AS delta_dup_pm,
         |  abs(coalesce(delta_q_micro, 0) - coalesce(base_q_micro, 0)) AS q_drift_micro,
         |  abs(coalesce(delta_dup_pm, 0) - coalesce(base_dup_pm, 0)) AS dup_drift_pm
         |FROM b FULL OUTER JOIN d ON b.source = d.source
         |ORDER BY source""".stripMargin
    },

    "join_skew_plan" -> {
      def block(kc: String) =
        s"""(WITH kc AS (
           |  SELECT CAST($kc AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS c
           |  FROM read_parquet('{SFDIR}/events.parquet') GROUP BY 1),
           |g AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
           |        CAST(max(c) AS BIGINT) AS max_count FROM kc),
           |t AS (SELECT k FROM kc ORDER BY c DESC, k ASC LIMIT 1)
           |SELECT '$kc' AS key_col, n_rows, n_keys, max_count, t.k AS top_key,
           |  n_rows * 1000 // n_keys AS avg_per_key_milli,
           |  max_count * n_keys * 1000 // n_rows AS skew_milli,
           |  (max_count * n_keys + n_rows - 1) // n_rows AS salt_factor,
           |  (max_count * n_keys * 1000 // n_rows) > 4000 AS needs_salt
           |FROM g, t)""".stripMargin
      s"""SELECT * FROM (
         |${block("user_id")}
         |UNION ALL
         |${block("event_type")})
         |ORDER BY key_col""".stripMargin
    },

    "ivf_param_plan" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n
        |  FROM read_parquet('{SFDIR}/embeddings.parquet')),
        |grid(rule) AS (VALUES ('current_8'), ('sqrt_n'), ('4sqrt_n'), ('n_over_64')),
        |g AS (
        |  SELECT rule, n, CAST(CASE rule
        |    WHEN 'current_8' THEN 8
        |    WHEN 'sqrt_n' THEN ceil(sqrt(n))
        |    WHEN '4sqrt_n' THEN ceil(sqrt(n)) * 4
        |    ELSE greatest(1, n // 64) END AS BIGINT) AS nlist
        |  FROM nn, grid)
        |SELECT rule, nlist, nlist = 8 AS is_current,
        |  (n * 1000) // nlist AS avg_cell_milli,
        |  least(1000, 1000 // nlist) AS scanned_pm_p1,
        |  least(1000, 2000 // nlist) AS scanned_pm_p2,
        |  least(1000, 4000 // nlist) AS scanned_pm_p4,
        |  n * nlist AS train_mults,
        |  nlist * 512 AS centroid_bytes
        |FROM g ORDER BY rule""".stripMargin,

    "ngram_diversity" -> {
      val byN = (1 to 3).map(n =>
        s"SELECT source, $n AS n, unnest(${shinglesSql(n)}) AS g FROM read_parquet('{SFDIR}/documents.parquet')")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH g AS (
         |  $byN)
         |SELECT source, n,
         |  CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(count(DISTINCT g) AS BIGINT) AS n_types,
         |  round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS ttr
         |FROM g GROUP BY source, n ORDER BY source, n""".stripMargin
    },

    "dsir_weights" ->
      s"""WITH fb AS MATERIALIZED (
         |  SELECT doc_id, is_t, ${h32("f")} % 128 AS b
         |  FROM (SELECT doc_id, source = 'src1' AS is_t,
         |          unnest(list_concat($Toks, ${shinglesSql(2)})) AS f
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |p AS MATERIALIZED (
         |  SELECT doc_id, is_t, b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM fb GROUP BY 1, 2, 3),
         |raw AS (SELECT b, sum(cnt) AS cr FROM p GROUP BY b),
         |tgt AS (SELECT b, sum(cnt) AS ct FROM p WHERE is_t GROUP BY b),
         |tots AS (SELECT sum(cnt) AS totr,
         |                sum(CASE WHEN is_t THEN cnt ELSE 0 END) AS tott FROM p),
         |r AS (SELECT raw.b AS b,
         |        CAST(round((ln((coalesce(ct, 0) + 1.0) / (tott + 128)) -
         |                    ln((cr + 1.0) / (totr + 128))) * 1e6, 0) AS BIGINT)
         |          AS lr_micro
         |      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
         |  CAST(sum(cnt * lr_micro) AS BIGINT) AS weight_micro,
         |  round(CAST(sum(cnt * lr_micro) AS DOUBLE) / sum(cnt) / 1e6, 6) AS avg_logratio
         |FROM p JOIN r USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "corpus_sample_dsir" ->
      s"""WITH fb AS MATERIALIZED (
         |  SELECT doc_id, is_t, ${h32("f")} % 128 AS b
         |  FROM (SELECT doc_id, source = 'src1' AS is_t,
         |          unnest(list_concat($Toks, ${shinglesSql(2)})) AS f
         |        FROM read_parquet('{SFDIR}/documents.parquet'))),
         |p AS MATERIALIZED (
         |  SELECT doc_id, is_t, b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM fb GROUP BY 1, 2, 3),
         |raw AS (SELECT b, sum(cnt) AS cr FROM p GROUP BY b),
         |tgt AS (SELECT b, sum(cnt) AS ct FROM p WHERE is_t GROUP BY b),
         |tots AS (SELECT sum(cnt) AS totr,
         |                sum(CASE WHEN is_t THEN cnt ELSE 0 END) AS tott FROM p),
         |r AS (SELECT raw.b AS b,
         |        CAST(round((ln((coalesce(ct, 0) + 1.0) / (tott + 128)) -
         |                    ln((cr + 1.0) / (totr + 128))) * 1e6, 0) AS BIGINT)
         |          AS lr_micro
         |      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots),
         |w AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
         |        CAST(sum(cnt * lr_micro) AS BIGINT) AS weight_micro
         |      FROM p JOIN r USING (b) GROUP BY doc_id),
         |tok AS (SELECT doc_id, source, CAST(len($Toks) AS BIGINT) AS n_tokens
         |        FROM read_parquet('{SFDIR}/documents.parquet')),
         |s AS (SELECT w.doc_id AS doc_id, tok.source AS source, tok.n_tokens AS n_tokens,
         |        CAST(weight_micro AS DOUBLE) / n_feats / 1e6 AS avg_lr
         |      FROM w JOIN tok ON w.doc_id = tok.doc_id),
         |c AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY avg_lr DESC, doc_id ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |      FROM s)
         |SELECT doc_id, source, n_tokens, cum_tokens, round(avg_lr, 6) AS avg_logratio
         |FROM c WHERE cum_tokens - n_tokens < 2000 ORDER BY cum_tokens, doc_id""".stripMargin,

    // The oracle is the UNSALTED groupBy — salting must be invisible
    // in the result.
    "events_user_stats_salted" ->
      """SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 6) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id ASC LIMIT 50""".stripMargin,

    // The oracle is again the UNSALTED one-stage groupBy, this time on
    // the skewed key — the two-phase spread must be invisible. The
    // value sum is exact-integer micro-units (floor is bit-identical
    // IEEE in both engines; a rounded double sum would sit on the 6dp
    // grid once each of the 5 keys sums ~n/5 of the stream).
    "events_hotkey_stats_salted" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "events_rate_anomaly" ->
      s"""WITH h AS (
         |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2),
         |w AS (
         |  SELECT event_type, hour, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
         |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_sum,
         |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY hour
         |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_n
         |  FROM h)
         |SELECT event_type, hour, cnt, prev_sum, prev_n,
         |  CASE WHEN prev_n > 0 THEN cnt * prev_n * 1000 // prev_sum END AS rate_pm,
         |  coalesce(CASE WHEN prev_n > 0 THEN cnt * prev_n * 1000 // prev_sum END > 1500, false) AS anomaly
         |FROM w ORDER BY event_type, hour""".stripMargin,

    "corpus_sample_fixed_n" ->
      s"""SELECT doc_id, source,
         |  ${h32("concat('fixn:', CAST(doc_id AS VARCHAR))")} AS pick_key
         |FROM read_parquet('{SFDIR}/documents.parquet')
         |ORDER BY pick_key ASC, doc_id ASC LIMIT 100""".stripMargin,

    "events_attribution" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us,
         |    CAST(regexp_extract(props, '(\\d+)', 1) AS INTEGER) AS channel
         |  FROM events),
         |p AS (SELECT event_id AS pid, user_id, us AS pus,
         |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |      FROM e WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, us AS cus, event_id AS cid, channel
         |      FROM e WHERE event_type = 'click'),
         |best AS (
         |  SELECT pid, channel FROM (
         |    SELECT p.pid, c.channel,
         |      row_number() OVER (PARTITION BY p.pid ORDER BY c.cus DESC, c.cid DESC) AS rn
         |    FROM p JOIN c ON c.user_id = p.user_id
         |      AND c.cus < p.pus AND p.pus - c.cus <= 21600000000)
         |  WHERE rn = 1)
         |SELECT coalesce(b.channel, -1) AS channel,
         |  CAST(count(*) AS BIGINT) AS n_purchases,
         |  CAST(sum(p.cents) AS BIGINT) AS attributed_cents
         |FROM p LEFT JOIN best b USING (pid)
         |GROUP BY 1 ORDER BY channel""".stripMargin,

    "events_funnel" -> {
      val names = Seq("view", "click", "signup", "purchase")
      val sel = names.zipWithIndex.map { case (nm, i) =>
        val k = i + 1
        val prev = if (i == 0) "n1" else s"n$i"
        s"SELECT CAST($k AS INTEGER) AS step, '$nm' AS event_type, n$k AS n_users, " +
          s"CAST(CASE WHEN $prev = 0 THEN 0 ELSE (n$k * 1000) // $prev END AS BIGINT) AS conv_prev_pm, " +
          s"CAST(CASE WHEN n1 = 0 THEN 0 ELSE (n$k * 1000) // n1 END AS BIGINT) AS conv_first_pm FROM n"
      }.mkString("\n|  UNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |s1 AS (SELECT user_id, min(us) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
         |s2 AS (SELECT e.user_id, min(us) AS t FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = 'click' AND us > s1.t AND us - s1.t <= 21600000000 GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(us) AS t FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = 'signup' AND us > s2.t AND us - s2.t <= 21600000000 GROUP BY e.user_id),
         |s4 AS (SELECT e.user_id, min(us) AS t FROM e JOIN s3 USING (user_id)
         |       WHERE event_type = 'purchase' AND us > s3.t AND us - s3.t <= 21600000000 GROUP BY e.user_id),
         |n AS (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s4) AS n4)
         |SELECT * FROM (
         |  $sel
         |) ORDER BY step""".stripMargin
    },

    // RFM quartiles mirror the engine's distributed rank plan with
    // plain window row_numbers (same (metric desc, user_id asc) tie
    // rule), same ((rank-1)*4)//n quartile arithmetic as the deciles.
    "events_rfm_segments" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, value, epoch_us(ts) AS us FROM events),
         |u AS (
         |  SELECT user_id, max(us) AS last_us,
         |    CAST(count(*) AS BIGINT) AS n_events,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                  ELSE 0 END) AS BIGINT) AS cents
         |  FROM e GROUP BY user_id),
         |r AS (
         |  SELECT *,
         |    row_number() OVER (ORDER BY last_us DESC, user_id ASC) AS rr,
         |    row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS fr,
         |    row_number() OVER (ORDER BY cents DESC, user_id ASC) AS mr,
         |    count(*) OVER () AS n
         |  FROM u)
         |SELECT ((rr - 1) * 4) // n AS r_q, ((fr - 1) * 4) // n AS f_q,
         |  ((mr - 1) * 4) // n AS m_q,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(cents) AS BIGINT) AS total_cents,
         |  CAST(sum(n_events) AS BIGINT) AS total_events
         |FROM r GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,

    "events_retention_cohorts" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY user_id),
        |sizes AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_users
        |          FROM c GROUP BY cohort_wk),
        |r AS (
        |  SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
        |    CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
        |  FROM w JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT r.cohort_wk, r.week_offset, r.n_active, s.cohort_users,
        |  (r.n_active * 1000) // s.cohort_users AS retained_pm
        |FROM r JOIN sizes s USING (cohort_wk)
        |ORDER BY cohort_wk, week_offset""".stripMargin,

    "sessionize" ->
      """WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |n AS (SELECT user_id, event_id, ts_us,
        |        CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |x AS (SELECT user_id, ts_us,
        |        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM n)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  make_timestamp(min(ts_us)) AS session_start,
        |  make_timestamp(max(ts_us)) AS session_end
        |FROM x GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,

    "multimodal_decode" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    list_reduce(
        |      list_prepend(CAST(1 AS BIGINT),
        |        list_transform(range(0, octet_length(encode(text))),
        |          i -> CAST((CAST(concat('0x', substr(hex(encode(text)), 2 * i + 1, 2)) AS INTEGER) + 128) % 256 - 128 AS BIGINT))),
        |      (acc, b) -> (((31 * acc + b + 2147483648) % 4294967296 + 4294967296) % 4294967296) - 2147483648) AS jh
        |  FROM read_parquet('{SFDIR}/documents.parquet'))
        |SELECT doc_id, 'text' AS modality, n_bytes,
        |  CAST(16 + ((jh % 16) + 16) % 16 AS BIGINT) AS width,
        |  CAST(16 + ((CAST(floor(jh / 256.0) AS BIGINT) % 16) + 16) % 16 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS n_frames
        |FROM h ORDER BY doc_id""".stripMargin,

    // decode -> nearest-neighbor 8x8 resize -> histogram, predicted
    // arithmetically: resampled pixel i reads source index
    // (i * w*h) // 64 of the (id*31+j)%256 grid (the grayscale payload
    // IS the pixel grid, so byte-index == pixel-index resampling).
    "multimodal_resize" -> {
      val bins = (0 until 16)
        .map(b => s"CAST(count(*) FILTER (WHERE bin = $b) AS BIGINT) AS h$b")
        .mkString(",\n        |  ")
      s"""WITH d AS (
        |  SELECT doc_id,
        |    16 + doc_id % 16 AS w,
        |    16 + (doc_id // 16) % 16 AS h
        |  FROM read_parquet('{SFDIR}/documents.parquet')),
        |px AS (
        |  SELECT doc_id, ((doc_id * 31 + ((t.i * (w * h)) // 64)) % 256) // 16 AS bin
        |  FROM d, LATERAL (SELECT unnest(range(0, 64)) AS i) t)
        |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  $bins
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // aHash replayed arithmetically: resampled pixel i of doc id is
    // (id*31 + (i*(w*h))//64) % 256; bit = pixel*64 > grid sum; bits
    // pack MSB-first into hex bytes; dedup is exact-hash grouping.
    "multimodal_phash_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    16 + doc_id % 16 AS w,
         |    16 + (doc_id // 16) % 16 AS h
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |px AS (
         |  SELECT doc_id, t.i AS i,
         |    (doc_id * 31 + ((t.i * (w * h)) // 64)) % 256 AS v
         |  FROM d, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
         |sm AS (SELECT doc_id, sum(v) AS s FROM px GROUP BY doc_id),
         |bits AS (
         |  SELECT px.doc_id AS doc_id, i,
         |    CASE WHEN v * 64 > s THEN 1 ELSE 0 END AS b
         |  FROM px JOIN sm ON px.doc_id = sm.doc_id),
         |bytes AS (
         |  SELECT doc_id, i // 8 AS k,
         |    CAST(sum(b * CAST(round(pow(2, 7 - (i % 8)), 0) AS BIGINT)) AS BIGINT) AS byte
         |  FROM bits GROUP BY doc_id, i // 8),
         |hx AS (
         |  SELECT doc_id, string_agg(printf('%02x', byte), '' ORDER BY k) AS ahash
         |  FROM bytes GROUP BY doc_id),
         |g AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_same,
         |        min(doc_id) AS canon FROM hx GROUP BY ahash)
         |SELECT hx.doc_id AS doc_id, hx.ahash AS ahash, g.n_same AS n_same,
         |  hx.doc_id = g.canon AS is_canonical
         |FROM hx JOIN g USING (ahash) ORDER BY doc_id""".stripMargin,

    // The packed 64-bit aHash rebuilt as a SIGNED BIGINT (two 32-bit
    // halves; the hi half recentred before the shift so the top bit
    // lands as the sign), then the simhash64 band-join spelling.
    "multimodal_phash_pairs" ->
      s"""WITH $PhashShCtes,
         |sbands AS (
         |  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS v
         |  FROM sh, (SELECT unnest(range(0, 8)) AS band) b)
         |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
         |FROM sbands l JOIN sbands r ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "multimodal_phash_clusters" ->
      s"""WITH RECURSIVE $PhashCcCtes
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM wreach GROUP BY src ORDER BY doc_id""".stripMargin,

    // The phash_pairs banded chain on the AUDIO waveform (the
    // audio_dedup px formula), same signed-64 packing as PhashShCtes.
    "multimodal_audio_pairs" ->
      s"""WITH $AudioShCtes,
         |sbands AS (
         |  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS v
         |  FROM sh, (SELECT unnest(range(0, 8)) AS band) b)
         |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
         |FROM sbands l JOIN sbands r ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    // CC over the audio pair graph — the phash_clusters spelling on
    // the audio CTE chain.
    "multimodal_audio_clusters" ->
      s"""WITH RECURSIVE $AudioCcCtes
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM wreach GROUP BY src ORDER BY doc_id""".stripMargin,

    "media_representatives" ->
      s"""WITH RECURSIVE $PhashCcCtes,
         |wlabels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM wreach GROUP BY src),
         |wld AS (
         |  SELECT cluster_id, doc_id,
         |    (16 + doc_id % 16) * (16 + (doc_id // 16) % 16) AS pixels
         |  FROM wlabels),
         |wrk AS (
         |  SELECT cluster_id, doc_id, pixels,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY pixels DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cluster_id) AS cs
         |  FROM wld)
         |SELECT cluster_id, doc_id AS keep_doc_id,
         |  CAST(pixels AS BIGINT) AS keep_pixels, CAST(cs AS BIGINT) AS cluster_size
         |FROM wrk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    "media_dedup_report" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    16 + doc_id % 16 AS w,
         |    16 + (doc_id // 16) % 16 AS h,
         |    256 + doc_id % 512 AS n
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |ipx AS (
         |  SELECT doc_id, t.i AS i,
         |    (doc_id * 31 + ((t.i * (w * h)) // 64)) % 256 AS v
         |  FROM d, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
         |apx AS (
         |  SELECT doc_id, t.i AS i,
         |    (doc_id * 17 + ((t.i * n) // 64) * 7) % 256 AS v
         |  FROM d, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
         |ih AS (
         |  SELECT b.doc_id AS doc_id,
         |    string_agg(printf('%02x',
         |      CAST(byte AS BIGINT)), '' ORDER BY k) AS ahash
         |  FROM (
         |    SELECT px.doc_id AS doc_id, i // 8 AS k,
         |      sum(CASE WHEN v * 64 > s THEN 1 ELSE 0 END
         |          * CAST(round(pow(2, 7 - (i % 8)), 0) AS BIGINT)) AS byte
         |    FROM ipx px JOIN (SELECT doc_id, sum(v) AS s FROM ipx GROUP BY doc_id) t
         |      ON px.doc_id = t.doc_id
         |    GROUP BY px.doc_id, i // 8) b
         |  GROUP BY b.doc_id),
         |ah AS (
         |  SELECT b.doc_id AS doc_id,
         |    string_agg(printf('%02x',
         |      CAST(byte AS BIGINT)), '' ORDER BY k) AS ahash
         |  FROM (
         |    SELECT px.doc_id AS doc_id, i // 8 AS k,
         |      sum(CASE WHEN v * 64 > s THEN 1 ELSE 0 END
         |          * CAST(round(pow(2, 7 - (i % 8)), 0) AS BIGINT)) AS byte
         |    FROM apx px JOIN (SELECT doc_id, sum(v) AS s FROM apx GROUP BY doc_id) t
         |      ON px.doc_id = t.doc_id
         |    GROUP BY px.doc_id, i // 8) b
         |  GROUP BY b.doc_id),
         |ig AS (SELECT ahash, count(*) AS n FROM ih GROUP BY ahash),
         |ag AS (SELECT ahash, count(*) AS n FROM ah GROUP BY ahash),
         |irep AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS n_images,
         |    CAST(count(*) AS BIGINT) AS n_images_hashes,
         |    CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_images_in_dup_groups,
         |    CAST(max(n) AS BIGINT) AS max_images_group
         |  FROM ig),
         |arep AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS n_audio,
         |    CAST(count(*) AS BIGINT) AS n_audio_hashes,
         |    CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_audio_in_dup_groups,
         |    CAST(max(n) AS BIGINT) AS max_audio_group
         |  FROM ag)
         |SELECT * FROM irep, arep""".stripMargin,

    // Audio aHash replay: resampled point i of doc id reads sample
    // (i*n)//64 -> value (id*17 + ((i*n)//64)*7) % 256; then the
    // same threshold/pack/group arithmetic as the image tier.
    "multimodal_audio_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, 256 + doc_id % 512 AS n
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |px AS (
         |  SELECT doc_id, t.i AS i,
         |    (doc_id * 17 + ((t.i * n) // 64) * 7) % 256 AS v
         |  FROM d, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
         |sm AS (SELECT doc_id, sum(v) AS s FROM px GROUP BY doc_id),
         |bits AS (
         |  SELECT px.doc_id AS doc_id, i,
         |    CASE WHEN v * 64 > s THEN 1 ELSE 0 END AS b
         |  FROM px JOIN sm ON px.doc_id = sm.doc_id),
         |bytes AS (
         |  SELECT doc_id, i // 8 AS k,
         |    CAST(sum(b * CAST(round(pow(2, 7 - (i % 8)), 0) AS BIGINT)) AS BIGINT) AS byte
         |  FROM bits GROUP BY doc_id, i // 8),
         |hx AS (
         |  SELECT doc_id, string_agg(printf('%02x', byte), '' ORDER BY k) AS ahash
         |  FROM bytes GROUP BY doc_id),
         |g AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_same,
         |        min(doc_id) AS canon FROM hx GROUP BY ahash)
         |SELECT hx.doc_id AS doc_id, hx.ahash AS ahash, g.n_same AS n_same,
         |  hx.doc_id = g.canon AS is_canonical
         |FROM hx JOIN g USING (ahash) ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.syntheticVideoFrames + aHash + videoDupPairs:
    // frame waveforms are pure doc_id arithmetic, the per-frame aHash
    // CTEs are the audio_dedup chain keyed by (doc_id, f), then the
    // df-capped frame-hash join and exact integer Jaccard.
    "multimodal_video_dedup" ->
      s"""WITH $VideoPairCtes
         |SELECT id_a, id_b, n_shared, n_union, jaccard_micro
         |FROM vpairs ORDER BY id_a, id_b""".stripMargin,

    // The declared contract: incremental maintenance equals the FULL
    // rebuild restricted to delta-touching pairs (the
    // dedup_clusters_incremental oracle stance) — so the oracle is the
    // multimodal_video_dedup chain verbatim plus that restriction.
    "multimodal_video_dedup_incremental" ->
      s"""WITH $VideoPairCtes
         |SELECT id_a, id_b, n_shared, n_union, jaccard_micro
         |FROM vpairs WHERE id_a % 10 = 0 OR id_b % 10 = 0
         |ORDER BY id_a, id_b""".stripMargin,

    // CC over the shared vpairs graph (the audio/phash clusters
    // spelling for video).
    "multimodal_video_clusters" ->
      s"""WITH RECURSIVE $VideoPairCtes,
         |vedges AS (SELECT id_a AS src, id_b AS dst FROM vpairs
         |           UNION SELECT id_b, id_a FROM vpairs),
         |vreach(src, dst) AS (
         |  SELECT src, dst FROM vedges
         |  UNION
         |  SELECT rr.src, e.dst FROM vreach rr JOIN vedges e ON rr.dst = e.src)
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id,
         |  least(src, min(dst)) = src AS is_canonical
         |FROM vreach GROUP BY src ORDER BY doc_id""".stripMargin,

    // Canonical per video cluster: largest distinct-frame set, ties to
    // the lowest id (the media_representatives spelling on vsz).
    "multimodal_video_representatives" ->
      s"""WITH RECURSIVE $VideoPairCtes,
         |vedges AS (SELECT id_a AS src, id_b AS dst FROM vpairs
         |           UNION SELECT id_b, id_a FROM vpairs),
         |vreach(src, dst) AS (
         |  SELECT src, dst FROM vedges
         |  UNION
         |  SELECT rr.src, e.dst FROM vreach rr JOIN vedges e ON rr.dst = e.src),
         |vlabels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM vreach GROUP BY src),
         |vwrk AS (
         |  SELECT l.cluster_id, l.doc_id, z.sz,
         |    row_number() OVER (PARTITION BY l.cluster_id ORDER BY z.sz DESC, l.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY l.cluster_id) AS cs
         |  FROM vlabels l JOIN vsz z ON z.video_id = l.doc_id)
         |SELECT cluster_id, doc_id AS keep_video_id,
         |  sz AS keep_n_frames, CAST(cs AS BIGINT) AS cluster_size
         |FROM vwrk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // 1-D NN resample prediction: output index i reads source sample
    // (i*n)//m, whose value is the synthetic (id*17 + idx*7) % 256.
    "multimodal_audio" -> {
      val bins = (0 until 16)
        .map(b => s"CAST(count(*) FILTER (WHERE bin = $b) AS BIGINT) AS h$b")
        .mkString(",\n        |  ")
      s"""WITH d AS (
        |  SELECT doc_id, 256 + doc_id % 512 AS n
        |  FROM read_parquet('{SFDIR}/documents.parquet')),
        |s AS (SELECT doc_id, n, greatest(n // 2, 1) AS m FROM d),
        |px AS (
        |  SELECT doc_id, ((doc_id * 17 + ((t.i * n) // m) * 7) % 256) // 16 AS bin
        |  FROM s, LATERAL (SELECT unnest(range(0, m)) AS i) t)
        |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_samples, CAST(s.m AS BIGINT) AS n_out,
        |  $bins
        |FROM px JOIN s USING (doc_id)
        |GROUP BY s.doc_id, s.n, s.m ORDER BY s.doc_id""".stripMargin
    },

    // Frame sampling: the fake decoder's video frame count is
    // 1 + floorMod(jh >> 16, 8) with jh = Java Arrays.hashCode of the
    // blob bytes (the multimodal_decode emulation; >> 16 on a negative
    // int is floor division by 65536); every-3rd sampling is then pure
    // integer math.
    "multimodal_frames" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(1 AS BIGINT),
        |        list_transform(range(0, octet_length(encode(text))),
        |          i -> CAST((CAST(concat('0x', substr(hex(encode(text)), 2 * i + 1, 2)) AS INTEGER) + 128) % 256 - 128 AS BIGINT))),
        |      (acc, b) -> (((31 * acc + b + 2147483648) % 4294967296 + 4294967296) % 4294967296) - 2147483648) AS jh
        |  FROM read_parquet('{SFDIR}/documents.parquet')),
        |f AS (
        |  SELECT doc_id,
        |    1 + ((CAST(floor(jh / 65536.0) AS BIGINT) % 8) + 8) % 8 AS n_frames
        |  FROM h)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST((n_frames + 2) // 3 AS BIGINT) AS n_sampled,
        |  CAST(3 * ((n_frames + 2) // 3 - 1) AS BIGINT) AS last_sampled
        |FROM f ORDER BY doc_id""".stripMargin,

    // Predicts the REAL javax.imageio round-trip arithmetically: dims
    // and the 16-bin luminance histogram follow from the pixel formula
    // (id*31+i)%256 over a w*h grid, no codec needed oracle-side.
    "multimodal_decode_image" -> {
      val bins = (0 until 16)
        .map(b => s"CAST(count(*) FILTER (WHERE bin = $b) AS BIGINT) AS h$b")
        .mkString(",\n        |  ")
      s"""WITH d AS (
        |  SELECT doc_id,
        |    16 + doc_id % 16 AS w,
        |    16 + (doc_id // 16) % 16 AS h
        |  FROM read_parquet('{SFDIR}/documents.parquet')),
        |px AS (
        |  SELECT doc_id, w, h, ((doc_id * 31 + t.i) % 256) // 16 AS bin
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) t)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS n_frames,
        |  $bins
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
    },

    // Predicts the real decode arithmetically (the decode_image
    // oracle's histogram), then float32-exact fractions (binary64
    // division rounded to REAL is the correctly-rounded binary32
    // quotient — safe double rounding), the 16-dim prefix cosine, and
    // the integer-exact keep.
    "media_text_alignment" -> {
      def dot16(a: String, b: String) =
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 17), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
      s"""WITH d AS (
         |  SELECT doc_id,
         |    16 + doc_id % 16 AS w,
         |    16 + (doc_id // 16) % 16 AS h
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |px AS (
         |  SELECT doc_id, ((doc_id * 31 + t.i) % 256) // 16 AS bin
         |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) t),
         |hist AS (SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS cnt
         |         FROM px GROUP BY doc_id, bin),
         |bins AS (
         |  SELECT d.doc_id, CAST(d.w * d.h AS BIGINT) AS n, t.b
         |  FROM d, LATERAL (SELECT unnest(range(0, 16)) AS b) t),
         |fv AS (
         |  SELECT b.doc_id,
         |    list(CAST(CAST(coalesce(h.cnt, 0) AS DOUBLE) / b.n AS REAL) ORDER BY b.b) AS f
         |  FROM bins b LEFT JOIN hist h ON h.doc_id = b.doc_id AND h.bin = b.b
         |  GROUP BY b.doc_id),
         |ev AS (SELECT vec_id AS doc_id, list_slice(embedding, 1, 16) AS e
         |       FROM read_parquet('{SFDIR}/embeddings.parquet')),
         |sc AS (
         |  SELECT fv.doc_id,
         |    CASE WHEN sqrt(${dot16("f", "f")}) * sqrt(${dot16("e", "e")}) > 0
         |         THEN ${dot16("f", "e")} / (sqrt(${dot16("f", "f")}) * sqrt(${dot16("e", "e")}))
         |         ELSE 0.0 END AS score
         |  FROM fv JOIN ev ON ev.doc_id = fv.doc_id)
         |SELECT doc_id, round(score, 6) AS alignment,
         |  CAST(round(score * 1e6, 0) AS BIGINT) >= 0 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS blob_len,
        |  md5(text) AS blob_md5,
        |  source,
        |  'text' AS modality
        |FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""".stripMargin,

    // KMV: k smallest distinct token hashes per source (exact window
    // formulation — the oracle can afford the vocabulary shuffle the
    // sketch avoids), same final-math expressions as the Spark side.
    "approx_quantiles_sample" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, value
         |  FROM read_parquet('{SFDIR}/events.parquet')),
         |r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY ${h32("concat('qs_', CAST(event_id AS VARCHAR))")} ASC, event_id ASC) AS rn
         |  FROM e),
         |samp AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |    quantile_cont(value, 0.5) AS p50_est,
         |    quantile_cont(value, 0.9) AS p90_est
         |  FROM r WHERE rn <= 128 GROUP BY event_type),
         |ex AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |    quantile_cont(value, 0.5) AS p50_exact,
         |    quantile_cont(value, 0.9) AS p90_exact
         |  FROM e GROUP BY event_type)
         |SELECT s.event_type, ex.n_events, s.n_sample,
         |  round(s.p50_est, 6) AS p50_est,
         |  round(ex.p50_exact, 6) AS p50_exact,
         |  round(abs(s.p50_est - ex.p50_exact) / greatest(abs(ex.p50_exact), 1e-9), 6) AS p50_rel_err,
         |  round(s.p90_est, 6) AS p90_est,
         |  round(ex.p90_exact, 6) AS p90_exact,
         |  round(abs(s.p90_est - ex.p90_exact) / greatest(abs(ex.p90_exact), 1e-9), 6) AS p90_rel_err
         |FROM samp s JOIN ex ON s.event_type = ex.event_type
         |ORDER BY s.event_type""".stripMargin,

    "approx_distinct_kmv" ->
      s"""WITH tok AS (
         |  SELECT source, unnest($Toks) AS token
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |h AS (SELECT DISTINCT source,
         |        CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
         |      FROM tok),
         |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types
         |      FROM h GROUP BY source),
         |rk AS (SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rk
         |  FROM h),
         |kmv AS (SELECT source, CAST(count(*) AS BIGINT) AS kmv_k,
         |    max(h) AS kth_hash
         |  FROM rk WHERE rk <= 64 GROUP BY source),
         |est AS (SELECT k.source, k.kmv_k, k.kth_hash, n.n_types,
         |    CASE WHEN k.kmv_k < 64 THEN CAST(k.kmv_k AS DOUBLE)
         |         ELSE 63.0 * 1152921504606846976.0 / CAST(k.kth_hash AS DOUBLE)
         |    END AS est_raw
         |  FROM kmv k JOIN n ON k.source = n.source)
         |SELECT source, kmv_k, kth_hash, n_types,
         |  round(est_raw, 6) AS est_types,
         |  round(abs(est_raw - CAST(n_types AS DOUBLE))
         |    / CAST(n_types AS DOUBLE), 6) AS rel_err
         |FROM est ORDER BY source""".stripMargin,

    "corpus_sample_weighted" ->
      s"""SELECT doc_id, source,
         |  CAST(len($Toks) AS BIGINT) AS n_tokens,
         |  round(
         |    ln((${h32("concat('wsample_', CAST(doc_id AS VARCHAR))")} + 1)
         |        / 4294967296.0)
         |      / len($Toks), 6) AS sample_key
         |FROM read_parquet('{SFDIR}/documents.parquet')
         |ORDER BY sample_key DESC, doc_id ASC LIMIT 50""".stripMargin,

    "source_mix_weights" ->
      s"""WITH s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet') GROUP BY source)
         |SELECT source, n_docs, n_tokens,
         |  round(sqrt(CAST(n_tokens AS DOUBLE))
         |    / (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) FROM s), 6)
         |    AS mix_weight
         |FROM s ORDER BY source""".stripMargin,

    "source_mix_temperature" ->
      s"""WITH s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet') GROUP BY source),
         |t AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.3)) AS totw,
         |             CAST(sum(n_tokens) AS BIGINT) AS tott FROM s)
         |SELECT source, n_docs, n_tokens,
         |  round(pow(CAST(n_tokens AS DOUBLE), 0.3) / totw, 6) AS mix_weight,
         |  round(pow(CAST(n_tokens AS DOUBLE), 0.3) / totw * tott / n_tokens, 6)
         |    AS upsample_factor
         |FROM s, t ORDER BY source""".stripMargin,

    // Mirrors source_mix_semantic: the ivf_cell_stats home-cell
    // assignment left-joined to documents (unembedded docs -> -1),
    // then the source_mix_temperature math keyed by cluster.
    "source_mix_semantic" ->
      s"""WITH $KmeansCtes,
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotMixedSql("e.embedding", "c.ce")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * ${normDblSql("c.ce")}) DESC, c.cid ASC) AS crank
         |    FROM e, c2 c) WHERE crank = 1),
         |dl AS (
         |  SELECT coalesce(a.cid, -1) AS cluster, len($Toks) AS ntok
         |  FROM read_parquet('{SFDIR}/documents.parquet') d
         |  LEFT JOIN asg a ON a.vec_id = d.doc_id),
         |s AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(ntok) AS BIGINT) AS n_tokens FROM dl GROUP BY cluster),
         |t AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.3)) AS totw,
         |             CAST(sum(n_tokens) AS BIGINT) AS tott FROM s)
         |SELECT cluster, n_docs, n_tokens,
         |  round(pow(CAST(n_tokens AS DOUBLE), 0.3) / totw, 6) AS mix_weight,
         |  round(pow(CAST(n_tokens AS DOUBLE), 0.3) / totw * tott / n_tokens, 6)
         |    AS upsample_factor
         |FROM s, t ORDER BY cluster""".stripMargin,

    "mix_epochs" ->
      s"""WITH s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet') GROUP BY source),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM s),
         |w AS (
         |  SELECT source, n_docs, n_tokens,
         |    round(sqrt(CAST(n_tokens AS DOUBLE))
         |      / (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) FROM s), 6) AS mix_weight
         |  FROM s),
         |a AS (
         |  SELECT w.source, w.n_docs, w.n_tokens, w.mix_weight,
         |    CAST(floor(w.mix_weight * CAST(t.tot * 4 AS DOUBLE)) AS BIGINT) AS alloc_tokens
         |  FROM w, t)
         |SELECT source, n_docs, n_tokens, mix_weight, alloc_tokens,
         |  CAST(least((alloc_tokens * 1000) // n_tokens, 4000) AS BIGINT) AS epochs_permille,
         |  (alloc_tokens * 1000) // n_tokens > 4000 AS capped
         |FROM a ORDER BY source""".stripMargin,

    "corpus_budget_sample" ->
      s"""WITH s AS (
         |  SELECT source, CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         |  FROM read_parquet('{SFDIR}/documents.parquet') GROUP BY source),
         |wgt AS (
         |  SELECT source,
         |    CAST(floor(2000.0 * round(sqrt(CAST(n_tokens AS DOUBLE))
         |      / (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) FROM s), 6))
         |      AS BIGINT) AS budget_tokens
         |  FROM s),
         |k AS (
         |  SELECT doc_id, source, CAST(len($Toks) AS BIGINT) AS n_tokens,
         |    ${h32("concat('budget_', CAST(doc_id AS VARCHAR))")} AS ord
         |  FROM read_parquet('{SFDIR}/documents.parquet')),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM k)
         |SELECT c.source, c.doc_id, c.n_tokens, c.cum_tokens, wgt.budget_tokens
         |FROM c JOIN wgt USING (source)
         |WHERE c.cum_tokens - c.n_tokens < wgt.budget_tokens
         |ORDER BY source, cum_tokens, doc_id""".stripMargin,

    // corpus_budget_sample re-denominated in BPE tokens: the SAME
    // chain replaces both the per-source totals (mix weights) and the
    // per-doc counts, as in the engine. Window sum keeps the BIGINT
    // cast (the round-7/8 HUGEINT dtype lesson).
    "corpus_budget_sample_bpe" ->
      s"""WITH ${Bpe.sqlEncodeCtes("enc", "read_parquet('{SFDIR}/documents.parquet')")},
         |s AS (
         |  SELECT source, CAST(sum(length(bpe)) AS BIGINT) AS n_tokens
         |  FROM enc GROUP BY source),
         |wgt AS (
         |  SELECT source,
         |    CAST(floor(2000.0 * round(sqrt(CAST(n_tokens AS DOUBLE))
         |      / (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) FROM s), 6))
         |      AS BIGINT) AS budget_tokens
         |  FROM s),
         |k AS (
         |  SELECT doc_id, source, CAST(length(bpe) AS BIGINT) AS n_tokens,
         |    ${h32("concat('budget_', CAST(doc_id AS VARCHAR))")} AS ord
         |  FROM enc),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM k)
         |SELECT c.source, c.doc_id, c.n_tokens, c.cum_tokens, wgt.budget_tokens
         |FROM c JOIN wgt USING (source)
         |WHERE c.cum_tokens - c.n_tokens < wgt.budget_tokens
         |ORDER BY source, cum_tokens, doc_id""".stripMargin,

    "approx_counts_cms" ->
      s"""WITH tc AS MATERIALIZED (
         |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($Toks) AS token
         |        FROM read_parquet('{SFDIR}/documents.parquet'))
         |  GROUP BY token),
         |buck AS (
         |  SELECT token, cnt, i.row AS row,
         |    ${h32("concat('cms', CAST(i.row AS VARCHAR), '_', token)")} % 64 AS bucket
         |  FROM tc, (SELECT unnest(range(0, 4)) AS row) i),
         |sketch AS (
         |  SELECT row, bucket, CAST(sum(cnt) AS BIGINT) AS bucket_sum
         |  FROM buck GROUP BY row, bucket),
         |top AS (SELECT token, cnt FROM tc ORDER BY cnt DESC, token ASC LIMIT 50),
         |est AS (
         |  SELECT t.token, t.cnt, CAST(min(s.bucket_sum) AS BIGINT) AS est_cnt
         |  FROM top t
         |  JOIN buck b ON t.token = b.token
         |  JOIN sketch s ON b.row = s.row AND b.bucket = s.bucket
         |  GROUP BY t.token, t.cnt)
         |SELECT token, cnt, est_cnt, est_cnt - cnt AS overcount
         |FROM est ORDER BY cnt DESC, token ASC""".stripMargin
  )
}
