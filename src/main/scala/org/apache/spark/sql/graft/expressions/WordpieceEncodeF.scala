package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen WordPiece greedy longest-match segmentation
  * over the committed [[graft.pipeline.Wordpiece.Vocab]] — BERT's
  * inference procedure (Devlin et al. 2018): per whitespace word, at
  * each position take the LONGEST vocabulary piece that matches, with
  * word-initial and continuation (`##`) pieces drawn from separate
  * sets; an unmatched character falls back to itself as a single-char
  * piece (byte-fallback, lossless — the GPT-2 stance, rather than
  * BERT's lossy `[UNK]`), so the emitted pieces always concatenate
  * back to the word. Output is the piece array for the whole document
  * (continuation pieces carry the `##` prefix).
  *
  * Note greedy-match inference is deliberately NOT a replay of the
  * training merges (that is BPE's inference); a word whose full form
  * entered the vocabulary segments to one piece even though training
  * built it through intermediate merges. Map-only, no shuffle, no
  * state; codegen emits a static call so the row loop stays inside
  * whole-stage codegen.
  */
case class WordpieceEncodeF(child: Expression, maxMerges: Int = Int.MaxValue)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordpieceEncodeF.encode(input.asInstanceOf[UTF8String].toString, maxMerges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.WordpieceEncodeF.encode($c.toString(), $maxMerges)")

  override protected def withNewChildInternal(newChild: Expression): WordpieceEncodeF =
    copy(child = newChild)
}

object WordpieceEncodeF {

  // committed vocab split into word-initial / continuation piece sets,
  // memoized PER MERGE BUDGET (a budget keeps all single-char symbols —
  // the byte-fallback tier — plus the first `maxMerges` merges, the
  // training-order-prefix semantics the spec pins); built lazily from
  // the fixture so class-init order cannot deadlock
  private val budgetSets =
    scala.collection.concurrent.TrieMap.empty[Int, (Set[String], Set[String], Int, Int)]
  private def setsFor(maxMerges: Int): (Set[String], Set[String], Int, Int) =
    budgetSets.getOrElseUpdate(maxMerges, {
      val all = graft.pipeline.Wordpiece.Vocab.map(_._1)
      val (singles, merges) = all.partition(p => p.replace("##", "").length == 1)
      val rows = singles ++ merges.take(maxMerges)
      val init = rows.filterNot(_.startsWith("##")).toSet
      val cont = rows.filter(_.startsWith("##")).map(_.substring(2)).toSet
      (init, cont,
        math.max(1, if (init.isEmpty) 1 else init.map(_.length).max),
        math.max(1, if (cont.isEmpty) 1 else cont.map(_.length).max))
    })

  /** Greedy longest-match over every whitespace word of `s` (empty
    * tokens from repeated spaces are skipped, matching the oracle's
    * `len(w) > 0` filter).
    */
  def encode(s: String): GenericArrayData = encode(s, Int.MaxValue)

  def encode(s: String, maxMerges: Int): GenericArrayData = {
    val (initSet, contSet, maxInit, maxCont) = setsFor(maxMerges)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val n = s.length
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var e = i
        while (e < n && s.charAt(e) != ' ') e += 1
        var pos = i
        while (pos < e) {
          val isCont = pos > i
          val set = if (isCont) contSet else initSet
          val maxL = if (isCont) maxCont else maxInit
          var l = math.min(maxL, e - pos)
          var matched: String = null
          while (l >= 1 && matched == null) {
            val cand = s.substring(pos, pos + l)
            if (set.contains(cand)) matched = cand
            l -= 1
          }
          if (matched == null) matched = s.substring(pos, pos + 1)
          out += UTF8String.fromString(if (isCont) "##" + matched else matched)
          pos += matched.length
        }
        i = e
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
