package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WordPiece tokenization over a COMMITTED fixture vocabulary — the
  * BERT-family subword tokenizer (Schuster & Nakajima 2012; Devlin et
  * al. 2018), the second tokenizer family next to [[Bpe]]:
  *
  *  - TRAINING selects merges by the likelihood ratio
  *    `count(ab) / (count(a)·count(b))` (not BPE's raw frequency) over
  *    word-bounded symbols, with continuation symbols distinct from
  *    word-initial ones. The committed vocabulary is trained to
  *    SATURATION (the BPE table's stance): the trainer self-terminated
  *    at 100 merges, the depth at which no symbol pair repeats — on
  *    this corpus that is full word coverage, every distinct word a
  *    single piece, with every training-order prefix (the capped
  *    BERT-style vocabulary-budget tables, e.g. the 48-merge round-13
  *    fixture the spec pins) remaining a valid shallower vocabulary of
  *    the same deterministic procedure. Trained DISTRIBUTED by
  *    [[graft.tools.WordpieceTrain]] over the word-frequency table —
  *    the corpus is scanned once; each merge round aggregates the
  *    word table only.
  *  - INFERENCE is greedy longest-match per word (NOT merge replay):
  *    at each position the longest matching vocab piece wins,
  *    continuation positions match only `##` pieces, and an unmatched
  *    char falls back to itself (lossless byte-fallback instead of
  *    BERT's `[UNK]`). One map-only codegen kernel pass
  *    ([[org.apache.spark.sql.graft.expressions.WordpieceEncodeF]]);
  *    the DuckDB oracle mirrors it as a non-recursive best-step table
  *    (word × position × vocab) + a LINEAR recursive-CTE walk — greedy
  *    match has a deterministic successor, so the recursion is one row
  *    per emitted piece, never a search.
  */
object Wordpiece {

  /** (piece, training-time weighted frequency) — single-char symbols
    * first (the byte-fallback tier), then merges in rank order; `##`
    * prefixes continuation pieces. Committed as the generated
    * [[WordpieceVocabTable]].
    */
  val Vocab: Seq[(String, Long)] = WordpieceVocabTable.rows

  /** The per-document piece array (continuation pieces spelled
    * `##x`); empty-word gaps from repeated spaces are skipped.
    */
  def pieces(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.WordpieceEncodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** WordPiece token count of `text`. */
  def tokenCount(text: Column): Column = size(pieces(text)).cast("long")

  /** [[pieces]] under a MERGE BUDGET: all single-char symbols (the
    * byte-fallback tier) plus the first `budget` merges — any budget
    * is a training-order prefix of the saturated table (deterministic
    * training), so this is the BERT-style vocabulary-size knob.
    */
  def piecesBudget(text: Column, budget: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.WordpieceEncodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), budget))

  /** JVM mirror of the kernel for tests. */
  def encodeString(s: String): Seq[String] = {
    val a = org.apache.spark.sql.graft.expressions.WordpieceEncodeF.encode(s)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }
}
