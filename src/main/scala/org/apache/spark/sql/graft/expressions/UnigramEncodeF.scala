package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen UNIGRAM-LM (SentencePiece-family) Viterbi
  * segmentation over the committed [[graft.pipeline.UnigramVocabTable]]
  * — the third tokenizer family next to BPE (merge replay) and
  * WordPiece (greedy longest-match): each whitespace word is segmented
  * into the piece sequence of MAXIMUM total log-probability (Kudo
  * 2018), found by dynamic programming over word positions. Scores are
  * committed integer micro-log-probs, so the DP compares exact BIGINTs
  * and the DuckDB oracle (path enumeration + argmax) reaches the
  * identical segmentation with no float drift.
  *
  * Determinism under score ties: the DP runs RIGHT-TO-LEFT memoizing
  * per position `(best suffix score, best suffix length-sequence)`,
  * breaking score ties by the lexicographically GREATEST
  * length-sequence string (each piece length encoded as one char
  * `chr(64+len)`). Two complete segmentations with equal totals share
  * identical piece prefixes up to their first diverging boundary (same
  * boundaries ⇒ same pieces ⇒ same prefix score), so the local suffix
  * rule equals the oracle's global `ORDER BY score DESC, lens DESC` —
  * the one subtle invariant the spec pins.
  *
  * An unmatched character falls back to itself at
  * [[graft.pipeline.Unigram.FallbackMicro]] (lossless byte-fallback,
  * the GPT-2 stance) — with every corpus character seeded into the
  * vocabulary, the fallback edge only fires on serving-time unseen
  * chars. Map-only, no shuffle; codegen emits a static call so the row
  * loop stays inside whole-stage codegen.
  */
case class UnigramEncodeF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnigramEncodeF.encode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.UnigramEncodeF.encode($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeF =
    copy(child = newChild)
}

object UnigramEncodeF {

  // committed vocab as (piece -> score_micro); built lazily from the
  // fixture so class-init order cannot deadlock
  private lazy val vocabMap: Map[String, Long] =
    graft.pipeline.Unigram.Vocab.toMap
  private lazy val maxPieceLen: Int =
    math.max(1, if (vocabMap.isEmpty) 1 else vocabMap.keysIterator.map(_.length).max)

  /** Viterbi segmentation of ONE word under an explicit scored vocab —
    * shared by the serving kernel (committed table) and the trainer's
    * hard-EM E-step (per-round live scores). Right-to-left DP; see the
    * class scaladoc for the tie rule.
    */
  def segmentWord(
      w: String,
      vocab: Map[String, Long],
      maxLen: Int,
      fallback: Long): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val dpScore = new Array[Long](n + 1)
    val dpLens = new Array[String](n + 1)
    dpLens(n) = ""
    var i = n - 1
    while (i >= 0) {
      var bestScore = Long.MinValue
      var bestLens: String = null
      val maxL = math.min(maxLen, n - i)
      var l = 1
      while (l <= maxL) {
        val cand = w.substring(i, i + l)
        val sc = vocab.get(cand) match {
          case Some(s) => s
          case None => if (l == 1) fallback else Long.MinValue
        }
        if (sc != Long.MinValue) {
          val total = sc + dpScore(i + l)
          val lens = ((64 + l).toChar).toString + dpLens(i + l)
          if (total > bestScore ||
              (total == bestScore && lens.compareTo(bestLens) > 0)) {
            bestScore = total
            bestLens = lens
          }
        }
        l += 1
      }
      dpScore(i) = bestScore
      dpLens(i) = bestLens
      i -= 1
    }
    // reconstruct: each lens char is one piece length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    val lens = dpLens(0)
    var k = 0
    while (k < lens.length) {
      val l = lens.charAt(k) - 64
      out += w.substring(pos, pos + l)
      pos += l
      k += 1
    }
    out.toSeq
  }

  /** Viterbi over every whitespace word of `s` (empty tokens from
    * repeated spaces are skipped, matching the oracle's `len(w) > 0`
    * filter).
    */
  def encode(s: String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val fb = graft.pipeline.Unigram.FallbackMicro
    val n = s.length
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var e = i
        while (e < n && s.charAt(e) != ' ') e += 1
        segmentWord(s.substring(i, e), vocabMap, maxPieceLen, fb)
          .foreach(p => out += UTF8String.fromString(p))
        i = e
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
