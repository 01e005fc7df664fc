package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization over a COMMITTED fixture vocabulary — the
  * SentencePiece tokenizer (Kudo 2018; Kudo & Richardson 2018), the
  * THIRD tokenizer family next to [[Bpe]] (merge replay) and
  * [[Wordpiece]] (greedy longest-match):
  *
  *  - TRAINING fits a unigram language model over pieces by hard-EM
  *    (Viterbi-EM) with BUDGET PRUNING — unlike BPE/WordPiece, the
  *    unigram algorithm's essence is selecting WHICH pieces survive a
  *    vocabulary budget, not growing merges to saturation: seed the
  *    inventory with every character plus all word substrings (scored
  *    by weighted corpus occurrence), then alternate (E) Viterbi-
  *    segment the word-frequency table under current scores, (M)
  *    re-score pieces by `round(ln(count/total)·1e6)` micro-log-probs
  *    and prune to the top-`budget` multi-char pieces by usage
  *    (characters always survive — the coverage floor). Trained
  *    DISTRIBUTED by [[graft.tools.UnigramTrain]]: the corpus is
  *    scanned once for the word table; each EM round touches only the
  *    word table.
  *  - INFERENCE is per-word VITERBI (maximum total log-prob
  *    segmentation), not greedy: a word segments into the piece
  *    sequence the model scores highest, which is where unigram beats
  *    greedy matching on fertility. One map-only codegen kernel pass
  *    ([[org.apache.spark.sql.graft.expressions.UnigramEncodeF]]);
  *    integer micro scores make the DP exact, so the DuckDB oracle
  *    (bounded path enumeration + `ORDER BY score DESC, lens DESC`
  *    argmax) reproduces every segmentation bit-for-bit.
  */
object Unigram {

  /** Byte-fallback score for serving-time characters outside the
    * committed vocabulary — far below any trained piece score, so a
    * fallback edge is taken only when nothing else matches. Mirrored
    * verbatim into the oracle SQL.
    */
  val FallbackMicro: Long = -30000000L

  /** (piece, score_micro) — committed as the generated
    * [[UnigramVocabTable]].
    */
  val Vocab: Seq[(String, Long)] = UnigramVocabTable.rows

  /** The per-document piece array; empty-word gaps from repeated
    * spaces are skipped.
    */
  def pieces(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.UnigramEncodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Unigram token count of `text`. */
  def tokenCount(text: Column): Column = size(pieces(text)).cast("long")

  /** JVM mirror of the kernel for tests. */
  def encodeString(s: String): Seq[String] = {
    val a = org.apache.spark.sql.graft.expressions.UnigramEncodeF.encode(s)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }
}
