package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Whole-stage-codegen 32-bit SimHash majority vote over a token-hash
  * array: bit j of the result is set iff strictly more tokens have bit
  * j set than clear; the 32 bits land at positions
  * `offset`..`offset + 31` (offset 32 gives the high half of a 64-bit
  * fingerprint from a second independent hash stream).
  *
  * Bit-identical to the 32-expression `aggregate(...)` chain it
  * replaces — including the two null quirks that chain had: a NULL
  * array yields 0L (each `when(vote > 0, ...)` fell to its 0 branch),
  * and a NULL element votes −1 on every bit (`when(NULL === 1, 1)
  * .otherwise(-1)`). The chain form ran 32 interpreted higher-order
  * aggregates per row (Spark's `aggregate` is CodegenFallback),
  * re-walking the token array 32 times; this is one fused O(32·n)
  * loop inside whole-stage codegen.
  */
case class SimhashBitsF(child: Expression, offset: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(offset >= 0 && offset <= 32, s"offset must be in [0, 32], got $offset")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](32)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) {
          var j = 0
          while (j < 32) { votes(j) -= 1; j += 1 }
        } else {
          val h = arr.getLong(i)
          var j = 0
          while (j < 32) {
            votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
        i += 1
      }
      var result = 0L
      var j = 0
      while (j < 32) {
        if (votes(j) > 0) result |= (1L << (offset + j))
        j += 1
      }
      result
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val arr = childGen.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val votes = ctx.freshName("votes")
    val code =
      code"""
        |${childGen.code}
        |long ${ev.value} = 0L;
        |if (!${childGen.isNull}) {
        |  int $n = $arr.numElements();
        |  int[] $votes = new int[32];
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($arr.isNullAt($i)) {
        |      for (int $j = 0; $j < 32; $j++) $votes[$j]--;
        |    } else {
        |      long $h = $arr.getLong($i);
        |      for (int $j = 0; $j < 32; $j++) {
        |        $votes[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
        |      }
        |    }
        |  }
        |  for (int $j = 0; $j < 32; $j++) {
        |    if ($votes[$j] > 0) ${ev.value} |= (1L << ($offset + $j));
        |  }
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override def prettyName: String = "simhash_bits_f"

  override protected def withNewChildInternal(newChild: Expression): SimhashBitsF =
    copy(child = newChild)
}
