package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen fused text profile: every INTEGER token
  * statistic the quality/language/Gopher tier reads, computed in ONE
  * pass over the token stream. Replaces a pile of interpreted
  * higher-order array lambdas — `size(filter(tokens, _.isin(stops)))`,
  * `size(filter(tokens, _.rlike("[a-z]")))`,
  * `size(array_distinct(filter(...)))`,
  * `size(array_distinct(shingles(text)))` — each of which re-walks
  * the token array outside whole-stage codegen (higher-order
  * functions are CodegenFallback-interpreted; the round-11 PSL
  * rewrite measured ~7 µs/row for that shape).
  *
  * DELIBERATELY integers only: every float the consumers derive
  * (quality score, mean word length, alpha fraction, dup-trigram
  * fraction) stays spelled in Column arithmetic on these counts, so
  * the fusion cannot introduce float drift against the DuckDB
  * oracles — the counts either match the lambda spelling exactly or
  * a hash compare fails loudly.
  *
  * Field semantics (pinned against the Column spelling in
  * PipelineSpec, including empty-token edge cases):
  *  - n_tokens:      size(split(text, " "))            (Java split, limit -1)
  *  - stop_en/es:    tokens ∈ {the,a,of,to,and} / {el,la,de,y,que}
  *  - n_alpha:       tokens containing a char in [a-z]   (rlike "[a-z]")
  *  - stop_en_dist:  DISTINCT EN stopwords present (≤5, bitmask popcount)
  *  - sh_n:          word-3-gram count  = max(n_tokens − 2, 0)
  *  - sh_distinct:   distinct 3-grams (space-joined, exact string set)
  *
  * Codegen emits a static kernel call (the [[BpeEncodeF]] pattern), so
  * the expression stays inside whole-stage codegen and — being
  * deterministic — is shared by Spark's subexpression elimination when
  * several derived columns in one projection read it.
  */
case class TextCountsF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = TextCountsF.schema

  override protected def nullSafeEval(input: Any): Any =
    TextCountsF.countsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.TextCountsF.countsRow($c)")

  override protected def withNewChildInternal(newChild: Expression): TextCountsF =
    copy(child = newChild)
}

object TextCountsF {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("stop_en_dist", IntegerType, nullable = false),
    StructField("sh_n", IntegerType, nullable = false),
    StructField("sh_distinct", IntegerType, nullable = false)))

  // the committed stopword fixtures (TextOps.EnStop / EsStop order —
  // the EN index doubles as the distinct-presence bitmask position)
  private val En = Array("the", "a", "of", "to", "and")
  private val Es = Array("el", "la", "de", "y", "que")

  private def enIndex(t: String): Int = {
    var i = 0
    while (i < En.length) { if (En(i) == t) return i; i += 1 }
    -1
  }

  private def isEs(t: String): Boolean = {
    var i = 0
    while (i < Es.length) { if (Es(i) == t) return true; i += 1 }
    false
  }

  private def hasLowerAlpha(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= 'a' && c <= 'z') return true
      i += 1
    }
    false
  }

  /** One-pass profile; `java.lang.String.split(" ", -1)` matches
    * Spark's `split(text, " ")` (regex, trailing empties kept —
    * spec-pinned).
    */
  def countsRow(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    var stopEn = 0; var stopEs = 0; var alpha = 0; var mask = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      val ei = enIndex(t)
      if (ei >= 0) { stopEn += 1; mask |= 1 << ei }
      if (isEs(t)) stopEs += 1
      if (hasLowerAlpha(t)) alpha += 1
      i += 1
    }
    var shN = 0; var shD = 0
    if (n >= 3) {
      shN = n - 2
      val seen = new java.util.HashSet[String](math.min(shN * 2, 1 << 16))
      i = 0
      while (i <= n - 3) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      shD = seen.size
    }
    new GenericInternalRow(Array[Any](
      n, stopEn, stopEs, alpha, Integer.bitCount(mask), shN, shD))
  }
}
