package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE merge-chain decode — the inverse of [[BpeEncodeF]],
  * expanding merge symbols back to their pairs in reverse rank order
  * via the JVM kernel [[graft.pipeline.Bpe.decodeString]]. With the
  * vocab-scale table a Column-fold spelling would be a table-deep
  * nested `StringReplace` tree (slow to analyze, at risk of codegen
  * fallback); the kernel call keeps the expression inside whole-stage
  * codegen as ONE static call. `String.replace` returns the receiver
  * when the target is absent, so the reverse chain is presence-skipped
  * for free (typical strings contain a small suffix of the symbol
  * space). Map-only, no shuffle, no state.
  */
case class BpeDecodeF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.pipeline.Bpe.decodeString(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.pipeline.Bpe.decodeString($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeF =
    copy(child = newChild)
}
