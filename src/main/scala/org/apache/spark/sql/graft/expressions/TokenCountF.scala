package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free token count: `size(split(text, " "))` without the
  * split — one byte scan counting 0x20 separators (+1), instead of
  * materializing an array of substring objects just to read its
  * length. Byte-exact with the split spelling for EVERY input: Java's
  * regex split with limit −1 keeps leading/trailing/interior empties,
  * so `size(split(s, " ")) == count(' ' in s) + 1` unconditionally
  * (empty string → 1, trailing space → +1, double space → +1 each —
  * pinned in ExtensionsSpec). Scanning bytes is safe in UTF-8: 0x20
  * never occurs inside a multibyte sequence.
  *
  * Installed by [[org.apache.spark.sql.graft.rules.RewriteTokenCount]]
  * — the optimizer rewrite that fires when an operator's ONLY use of
  * the space-split is counting it, the dominant shape in corpus-scale
  * token accounting (shard planning, budget fills, pack offsets,
  * text stats).
  */
case class TokenCountF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    TokenCountF.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.TokenCountF.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountF =
    copy(child = newChild)
}

object TokenCountF {
  /** separators + 1, one byte scan, no allocation. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var c = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }
}
