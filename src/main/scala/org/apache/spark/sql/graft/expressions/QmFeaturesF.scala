package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The quality-classifier TRAINING feature vector (64 hashed-token-
  * bucket frequencies + 5 dense text-shape features) as one map-only
  * kernel pass per document — the corpus-scale half of the
  * distributed [[graft.tools.TrainQualityModel]]: feature extraction
  * runs where the data lives (map-only, no shuffle, no state) and
  * only the fixed-width 69-double vector leaves the executor, never
  * the text. The kernel is the byte-for-byte arithmetic of the
  * round-11 driver-side trainer (same md5-derived hash32, same
  * division order), which is what lets the distributed trainer
  * reproduce the committed integer-micro weights EXACTLY
  * (PipelineSpec pins the full round trip).
  */
case class QmFeaturesF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    QmFeaturesF.features(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.QmFeaturesF.features($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): QmFeaturesF =
    copy(child = newChild)
}

object QmFeaturesF {

  /** Number of hashed buckets — must equal Corpus.QualityModelBuckets. */
  val B = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Same as TextOps.hash32: first 8 md5 hex chars as a long. */
  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** The 69-dim per-doc feature kernel (the round-11 trainer's
    * per-row code, verbatim arithmetic).
    */
  def features(text: String): GenericArrayData = {
    val toks = text.split(" ", -1)
    val cnt = new Array[Double](B + 5)
    toks.foreach(t => cnt((hash32("qm_" + t) % B).toInt) += 1.0)
    val n = math.max(toks.length, 1).toDouble
    var j = 0
    while (j < B) { cnt(j) /= n; j += 1 }
    cnt(B) = math.min(toks.length, 1000).toDouble / 1000.0
    cnt(B + 1) = ((text.length - (toks.length - 1)).toDouble / toks.length) / 10.0
    cnt(B + 2) = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / toks.length
    cnt(B + 3) = toks.filter(Set("the", "a", "of", "to", "and")).distinct.length.toDouble / 5.0
    cnt(B + 4) = {
      val sh = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toArray
      if (sh.isEmpty) 0.0 else 1.0 - sh.distinct.length.toDouble / sh.length
    }
    new GenericArrayData(cnt)
  }
}
