package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen BPE merge-chain encode over the committed
  * [[graft.pipeline.Bpe.Merges]] table — bit-identical to the rank-ordered
  * chained `StringReplace` expressions it replaces (each pass is the
  * same left-to-right non-overlapping replace `String.replace`
  * implements; PipelineSpec pins the equality), but fused into ONE
  * kernel over a single reused char buffer:
  *
  *  - the replace chain materializes one intermediate `UTF8String` per rank
  *    per row (UTF-8 decode + encode + allocation each) — the fused
  *    kernel decodes once, runs every pass in place (write cursor
  *    never passes the read cursor), and encodes once;
  *  - a pass is SKIPPED outright when either pair char is provably
  *    absent (a presence table over ASCII + the U+E000+rank
  *    merge-symbol space, updated as merges fire): most of the deep
  *    table's pairs are built from intermediate symbols that occur
  *    only if their parent merges fired, so typical documents execute
  *    a fraction of the table's passes.
  *
  * Codegen emits a call to the static [[BpeEncodeF.encode]] kernel,
  * so the expression stays inside whole-stage codegen (no
  * CodegenFallback row boxing) while the loop runs as ordinary JVM
  * code. Scale shape unchanged: map-only, no shuffle, no state.
  */
case class BpeEncodeF(child: Expression, maxRank: Int = Int.MaxValue)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeEncodeF.encode(input.asInstanceOf[UTF8String].toString, maxRank))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.spark.sql.graft.expressions.BpeEncodeF.encode($c.toString(), $maxRank))")

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeF =
    copy(child = newChild)
}

object BpeEncodeF {

  // merge table flattened to primitive arrays (pair chars + output
  // symbol per rank); built lazily from the committed fixture so
  // class-init order between this object and Bpe cannot deadlock
  private lazy val (pairA, pairB, outSym): (Array[Char], Array[Char], Array[Char]) = {
    val m = graft.pipeline.Bpe.Merges
    val a = new Array[Char](m.length)
    val b = new Array[Char](m.length)
    val o = new Array[Char](m.length)
    m.zipWithIndex.foreach { case ((p, r), i) =>
      require(p.length == 2 && r.length == 1, s"malformed merge at rank $i")
      a(i) = p.charAt(0); b(i) = p.charAt(1); o(i) = r.charAt(0)
      require(slot(a(i)) >= 0 && slot(b(i)) >= 0 && slot(o(i)) >= 0,
        s"merge rank $i uses a char outside the ASCII/private-use space")
    }
    (a, b, o)
  }

  private lazy val nRanks: Int = graft.pipeline.Bpe.Merges.length

  /** Presence-table slot for a char: 0..127 ASCII, then the
    * U+E000..U+E000+|Merges| merge-symbol space (sized off the
    * committed table, so the kernel follows the vocabulary), -1 =
    * cannot appear in any merge pair (so passes never track it).
    */
  private def slot(c: Char): Int =
    if (c < 128) c.toInt
    else if (c >= 0xE000 && c < 0xE000 + nRanks) 128 + (c - 0xE000)
    else -1

  /** One-buffer merge-chain encode, semantics identical to
    * `Merges.foldLeft(s)((acc, m) => acc.replace(m._1, m._2))`.
    * `maxRank` caps the chain to the first `maxRank` merges — a
    * vocabulary-BUDGET encode (any capped run is a training-order
    * prefix of the saturated table, so the budgeted vocab is always
    * a legitimate shallower table of the same procedure).
    */
  def encode(s: String): String = encode(s, Int.MaxValue)

  def encode(s: String, maxRank: Int): String = {
    val buf = s.toCharArray
    var len = buf.length
    val present = new Array[Boolean](128 + nRanks)
    var i = 0
    while (i < len) {
      val d = slot(buf(i)); if (d >= 0) present(d) = true
      i += 1
    }
    val n = math.min(pairA.length, maxRank)
    var changed = false
    var k = 0
    while (k < n) {
      val a = pairA(k); val b = pairB(k)
      if (present(slot(a)) && present(slot(b))) {
        var r = 0; var w = 0; var fired = false
        while (r < len) {
          if (r + 1 < len && buf(r) == a && buf(r + 1) == b) {
            buf(w) = outSym(k); r += 2; fired = true
          } else {
            buf(w) = buf(r); r += 1
          }
          w += 1
        }
        if (fired) {
          len = w
          present(slot(outSym(k))) = true
          changed = true
        }
      }
      k += 1
    }
    if (!changed) s else new String(buf, 0, len)
  }
}
