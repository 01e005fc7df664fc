package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent symbol pairs of a BPE symbol string, extracted with the
  * EXACT left-to-right non-overlapping scan the merge-chain replace
  * implements ("aaa" yields "aa" once, "aaaa" twice) — the per-row map
  * side of the distributed BPE trainer's pair-frequency aggregate
  * ([[graft.tools.BpeTrain]]): `explode(bpe_pairs(s))` →
  * `groupBy(pair).count` is one vocabulary-sized shuffle per merge
  * round while the corpus itself never moves. The skip-ahead rule is
  * applied per candidate pair exactly as the driver-side fixture
  * trainer counted it, so the distributed trainer reproduces the
  * committed table rank-for-rank, freq-for-freq (pinned in
  * PipelineSpec). Codegen emits a static call to the
  * [[BpePairsF.pairs]] kernel, keeping the expression inside
  * whole-stage codegen. Map-only, no shuffle, no state.
  */
case class BpePairsF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BpePairsF.pairs(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.BpePairsF.pairs($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BpePairsF =
    copy(child = newChild)
}

object BpePairsF {

  /** JVM mirror of the scan, for trainer parity tests. */
  def pairsArray(s: String): Array[String] = {
    if (s.length < 2) return Array.empty
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length - 1) {
      out += s.substring(i, i + 2)
      // a self-overlapping pair (s(i)==s(i+1)==s(i+2)) would be
      // replaced only once by the left-to-right scan: skip ahead
      if (s.charAt(i) == s.charAt(i + 1) && i + 2 < s.length &&
        s.charAt(i + 2) == s.charAt(i)) i += 2
      else i += 1
    }
    out.result()
  }

  def pairs(s: String): GenericArrayData =
    new GenericArrayData(
      pairsArray(s).map(x => UTF8String.fromString(x): AnyRef))
}
