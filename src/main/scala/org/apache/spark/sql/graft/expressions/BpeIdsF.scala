package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Integer token ids for a BPE SYMBOL string (the output of
  * [[BpeEncodeF]]) — the id space a trainer's embedding table indexes,
  * GPT-2 convention: base byte symbols keep their byte value
  * (0..255; this corpus is ASCII so 0..127 occur), merge symbols map
  * to 256 + rank. The mapping is a bijection on the symbol alphabet
  * (U+E000+rank ↔ 256+rank), so the id sequence round-trips to the
  * symbol string and through Bpe.decodeString to byte-exact text
  * (PipelineSpec pins both). Map-only, no shuffle, no state.
  */
case class BpeIdsF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BpeIdsF.ids(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.BpeIdsF.ids($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BpeIdsF =
    copy(child = newChild)
}

object BpeIdsF {

  // id space sized off the committed table (GPT-2 convention: byte
  // ids 0..255, then 256+rank per merge) so it follows the vocabulary
  private lazy val nRanks: Int = graft.pipeline.Bpe.Merges.length

  def idsArray(sym: String): Array[Int] = {
    val out = new Array[Int](sym.length)
    var i = 0
    while (i < sym.length) {
      val c = sym.charAt(i)
      out(i) =
        if (c < 256) c.toInt
        else if (c >= 0xE000 && c < 0xE000 + nRanks) 256 + (c - 0xE000)
        else throw new IllegalArgumentException(
          f"char U+${c.toInt}%04X is not a BPE symbol")
      i += 1
    }
    out
  }

  /** Inverse of [[idsArray]] — ids back to the symbol string. */
  def symbols(ids: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(ids.length)
    ids.foreach { id =>
      if (id >= 0 && id < 256) sb.append(id.toChar)
      else if (id >= 256 && id < 256 + nRanks) sb.append((0xE000 + id - 256).toChar)
      else throw new IllegalArgumentException(s"id $id out of vocabulary")
    }
    sb.toString
  }

  def ids(sym: String): GenericArrayData = new GenericArrayData(idsArray(sym))
}
