package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused whole-stage-codegen winnowing selection (Schleimer-Wilkerson-
  * Aiken): one kernel pass computes the n-token k-gram hash stream and
  * the rightmost-min-per-width-w-window fingerprint selection, emitting
  * (n_grams, selected positions, selected hashes) as a struct —
  * bit-identical to the higher-order-function array spelling it
  * replaces (PipelineSpec pins the digest against an independent
  * reference), but with none of the HOF interpretation overhead: Spark
  * evaluates `transform`/`aggregate` lambdas outside whole-stage
  * codegen, and the array spelling materialized the full window-hash
  * array plus one O(w) fold per window as boxed rows. Same hash as
  * TextOps.hash32 (first 4 md5 bytes, big-endian unsigned), so the
  * DuckDB oracle is unchanged. Map-only, no shuffle, no state.
  */
case class WinnowF(child: Expression, n: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = WinnowF.schema

  override protected def nullSafeEval(input: Any): Any =
    WinnowF.select(input.asInstanceOf[UTF8String].toString, n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.WinnowF.select($c.toString(), $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowF =
    copy(child = newChild)
}

object WinnowF {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false), nullable = false)))

  private val emptyRow: InternalRow = new GenericInternalRow(Array[Any](
    0L,
    new GenericArrayData(Array.empty[Int]),
    new GenericArrayData(Array.empty[Long])))

  /** One-pass selection kernel. Tokenization matches Spark's
    * split(text, ' ') exactly (limit -1: trailing empties kept).
    */
  def select(s: String, n: Int, w: Int): InternalRow = {
    val toks = s.split(" ", -1)
    val g = toks.length - n + 1
    if (g <= 0) return emptyRow
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      // first 8 md5 hex chars as a long = first 4 bytes, BE unsigned
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // rightmost-min per window: ascending scan replaces on <=
    val selected = new Array[Boolean](g)
    val lastStart = math.max(g - w, 0)
    var j0 = 0
    while (j0 <= lastStart) {
      val end = math.min(j0 + w, g)
      var best = j0
      var p = j0 + 1
      while (p < end) {
        if (hs(p) <= hs(best)) best = p
        p += 1
      }
      selected(best) = true
      j0 += 1
    }
    var nSel = 0
    var q = 0
    while (q < g) { if (selected(q)) nSel += 1; q += 1 }
    val ps = new Array[Int](nSel)
    val hSel = new Array[Long](nSel)
    var o = 0
    q = 0
    while (q < g) {
      if (selected(q)) { ps(o) = q; hSel(o) = hs(q); o += 1 }
      q += 1
    }
    new GenericInternalRow(Array[Any](
      g.toLong, new GenericArrayData(ps), new GenericArrayData(hSel)))
  }
}
