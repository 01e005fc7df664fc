package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic BYTE-level byte-pair encoding over a COMMITTED
  * fixture merge table -- the tokenizer-faithful token accounting the
  * packing/budget tier runs on (`pack_sequences_bpe`,
  * `corpus_budget_sample_bpe`), replacing the whitespace proxy with
  * merge-based subword counts (Sennrich et al. 2016's procedure at
  * byte granularity, the GPT-2-class denomination).
  *
  * Design for cross-engine bit-equality: every symbol is ONE char --
  * initial symbols are the text's UTF-8 bytes (the corpus contract
  * below makes byte == char), each merge output is a fresh Unicode
  * private-use char (U+E000+rank) -- so applying merge rules in rank
  * order is a chain of plain left-to-right non-overlapping string
  * replaces, a spelling Spark (StringReplace, whole-stage codegen),
  * DuckDB (`replace`) and the JVM (`String.replace`) implement
  * identically (pinned in PipelineSpec). Token count = character
  * length of the fully-merged string. The merge table was trained by
  * [[graft.tools.BpeTrain]] -- the committed in-repo procedure, now
  * DISTRIBUTED (per-round pair-count aggregate: most-frequent
  * adjacent pair, ties lexicographic, left-to-right non-overlapping
  * counting and replace; the corpus never moves) -- on the sf0.001
  * documents corpus, run to SATURATION: 2400 merges (training stops
  * when no pair repeats -- the corpus admits no 2401st), compressing
  * sf0.01 to ~9.3 chars/symbol and ~0.59 symbols/word (round-12's
  * earlier 1024-merge table ~32.5 mean symbols/doc, round-11's
  * 256-merge table ~49, round-10's 47-merge table 160).
  *
  * Contract: input text must be ASCII -- no U+E000..U+F8FF
  * private-use chars (reserved for merge outputs) and no multi-byte
  * chars (a non-ASCII char is several bytes but ONE char, so the
  * replace-chain spelling would no longer implement the byte-level
  * merge). PipelineSpec pins both properties over the committed
  * testdata corpora so a contract violation fails loudly, and
  * [[graft.tools.BpeTrain]] refuses to train on a non-ASCII corpus.
  * Scale shape: encode is a map-only projection (the fused
  * presence-gated kernel; rank space sized off the table), no
  * shuffle, no state.
  */
object Bpe {

  /** (pair, replacement) in training rank order -- 2400 byte-level
    * merges (saturation) trained by the DISTRIBUTED
    * [[graft.tools.BpeTrain]] (per-round pair-count aggregate; the
    * corpus never moves) on sf0.001; committed as the generated
    * [[BpeMergesTable]]. Earlier rounds' 256- and 1024-merge tables
    * are its exact rank-for-rank, freq-for-freq prefixes (the
    * training procedure is deterministic), verified at generation
    * time and procedure-pinned in PipelineSpec.
    */
  val Merges: Seq[(String, String)] = BpeMergesTable.rows

  /** Round-10's 47-merge char-level fixture, kept for continuity.
    * The training procedure is deterministic and byte == char on the
    * ASCII corpus, so it is EXACTLY the first 47 rows of [[Merges]]
    * (BpeTrain reproduces the round-10 table rank-for-rank,
    * freq-for-freq; PipelineSpec pins the prefix relation).
    */
  val MergesChar: Seq[(String, String)] = Merges.take(47)

  private def encodeWith(merges: Seq[(String, String)], text: Column): Column =
    merges.foldLeft(text) { case (c, (p, r)) =>
      call_function("replace", c, lit(p), lit(r))
    }

  /** The fully-merged symbol string (each char = one BPE token).
    * Spelled as the fused one-buffer kernel
    * ([[org.apache.spark.sql.graft.expressions.BpeEncodeF]]) rather
    * than 2400 chained `StringReplace`s: bit-identical by contract
    * (PipelineSpec pins kernel == fold == Spark chain), ~an order of
    * magnitude cheaper per row (no per-rank intermediate UTF8Strings;
    * passes whose pair symbols are absent are skipped).
    */
  def encode(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.BpeEncodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** [[encode]] capped to the first `budget` merges — the vocabulary-
    * budget encode (deterministic training makes any prefix a valid
    * shallower table). Same fused kernel, same map-only shape.
    */
  def encodeBudget(text: Column, budget: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.BpeEncodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), budget))

  /** BPE token count: length of the merged symbol string. */
  def tokenCount(text: Column): Column = length(encode(text)).cast("long")

  /** Integer token ids for `text` — [[encode]] then the GPT-2-style
    * id mapping (base byte symbols keep their byte value, merge
    * symbols map to 256+rank; see
    * [[org.apache.spark.sql.graft.expressions.BpeIdsF]]). The array a
    * trainer's embedding table actually indexes; bijective with the
    * symbol string, hence losslessly decodable to byte-exact text.
    */
  def tokenIds(text: Column): Column = idsFromSymbols(encode(text))

  /** The id mapping over an ALREADY-ENCODED symbol column (the staged
    * [[BpeChain]] frame's `bpe`) — skips the encode pass.
    */
  def idsFromSymbols(sym: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.BpeIdsF(
        org.apache.spark.sql.graft.ColumnBridge.expression(sym)))

  /** Inverse of [[encode]]: expand merge symbols back to their pairs
    * in REVERSE rank order (each replace re-inflates one symbol; a
    * later-rank symbol's expansion may contain earlier-rank symbols,
    * which the remaining passes then expand). BPE merge chains are
    * lossless by construction — every symbol maps to exactly one pair
    * and output symbols never occur in input text (the U+E000
    * contract) — so `decode(encode(s)) == s`, pinned over the real
    * corpus in PipelineSpec. This is what makes the merged symbol
    * string a legitimate STORED representation: a pipeline can carry
    * the ~6x-smaller symbol column through packing/budget stages and
    * still recover byte-exact text.
    */
  def decode(sym: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.BpeDecodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(sym)))

  private lazy val mergesReversed: Seq[(String, String)] = Merges.reverse

  /** The decode kernel (also the JVM mirror for tests): reverse-rank
    * `String.replace` chain. With the 2400-row table the Column-fold
    * spelling would be a 2400-deep expression tree, so [[decode]]
    * routes through the codegen static-call expression
    * [[org.apache.spark.sql.graft.expressions.BpeDecodeF]] instead;
    * `String.replace` returns the receiver unchanged when the target
    * is absent, so passes for symbols not present are near-free.
    */
  def decodeString(s: String): String =
    mergesReversed.foldLeft(s) { case (acc, (p, r)) => acc.replace(r, p) }

  /** Char-47 legacy encode/count (the round-10 denomination). */
  def encodeChar(text: Column): Column = encodeWith(MergesChar, text)
  def tokenCountChar(text: Column): Column =
    length(encodeChar(text)).cast("long")

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  private def sqlEncodeWith(merges: Seq[(String, String)], expr: String): String =
    merges.foldLeft(expr) { case (e, (p, r)) =>
      s"replace($e, ${sqlLit(p)}, ${sqlLit(r)})"
    }

  /** DuckDB mirror of [[encode]] as a staged CTE block: DuckDB's
    * binder caps expression recursion at 128, so the 2400-deep replace
    * nesting cannot bind as ONE scalar expression -- the identical
    * chain is applied in 64-merge layers through stacked CTEs instead
    * (each layer's expression is 64 deep; rank order is preserved
    * across layers, so the result is bit-identical to the Spark
    * fold). Emits `name_0 .. name_k, name` CTE definitions; the final
    * CTE `name` carries (doc_id, source, bpe) with `bpe` the
    * fully-merged symbol string -- token count = length(bpe).
    */
  def sqlEncodeCtes(name: String, from: String): String = {
    val layers = Merges.grouped(64).toSeq
    val defs = layers.zipWithIndex.map { case (g, i) =>
      val src = if (i == 0) from else s"${name}_${i - 1}"
      val inner = if (i == 0) "text" else "bpe"
      s"${name}_$i AS (SELECT doc_id, source, ${sqlEncodeWith(g, inner)} AS bpe FROM $src)"
    }
    (defs :+ s"$name AS (SELECT * FROM ${name}_${layers.size - 1})")
      .mkString(",\n")
  }
}
