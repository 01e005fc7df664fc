package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import org.apache.spark.sql.graft.expressions.{BpeDecodeF, BpeEncodeF, BpeIdsF, BpePairsF, DotProductF, DotProductFD, EwmaWindow, QmFeaturesF, SimhashBitsF, TextCountsF, UnigramEncodeF, VarAlphaEwmaWindow, WinnowF, WordpieceEncodeF}

/** SQL surface for graft's custom catalyst expressions.
  *
  * Two ways in:
  *  - config: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *    at session build time (the standard extensions mechanism);
  *  - runtime: `GraftExtensions.register(spark)` on an existing session.
  *
  * Registered:
  *  - `ewma(x, alpha, adjust)` — window function (use with OVER);
  *  - `var_alpha_ewma(x, alpha)` — window function (use with OVER);
  *  - `dot_product_f(a, b)` — scalar codegen float-array dot product;
  *  - `dot_product_fd(a, b)` — float array × double array (constant
  *    plane-vector sides);
  *  - `simhash_bits_f(th[, offset])` — fused 32-bit SimHash majority
  *    vote over a token-hash array, bits at offset..offset+31;
  *  - `bpe_encode(text)` — the fused one-buffer BPE merge-chain
  *    encode over the committed 1024-merge table (token count =
  *    length of the result);
  *  - `bpe_decode(sym)` — its lossless inverse (reverse-rank
  *    expansion);
  *  - `bpe_pairs(sym)` — the left-to-right non-overlapping adjacent
  *    symbol pairs (the distributed BPE trainer's map side);
  *  - `bpe_ids(sym)` — integer token ids for a symbol string (byte
  *    value for base symbols, 256+rank for merges);
  *  - `qm_features(text)` — the quality classifier's 69-dim training
  *    feature vector (64 hashed-bucket frequencies + 5 text-shape);
  *  - `text_counts(text)` — the fused one-pass token profile struct
  *    (n_tokens, stop_en, stop_es, n_alpha, stop_en_dist, sh_n,
  *    sh_distinct);
  *  - `winnow_fp(text[, n, w])` — the fused winnowing fingerprint
  *    selection struct (n_grams, positions, hashes); defaults n=8,
  *    w=4, the doc_winnow contract;
  *  - `wordpiece_encode(text)` — the greedy longest-match WordPiece
  *    piece array over the committed vocabulary (`##` continuation
  *    prefixes; token count = size of the result).
  *  - `unigram_encode(text)` — the Viterbi max-log-prob Unigram-LM
  *    piece array over the committed budgeted vocabulary.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer rewrite: size(split(text, ' ')) -> TokenCountF, the
    // allocation-free token count (see rules.RewriteTokenCount for
    // the only-consumer guard)
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.rules.RewriteTokenCount)
  }
}

object GraftExtensions {

  private def doubleLit(e: Expression, what: String): Double =
    if (e.foldable) e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other =>
        throw new IllegalArgumentException(s"$what must be numeric, got $other")
    }
    else throw new IllegalArgumentException(s"$what must be a constant, got $e")

  private def boolLit(e: Expression, what: String): Boolean =
    if (e.foldable) e.eval() match {
      case b: Boolean => b
      case other =>
        throw new IllegalArgumentException(s"$what must be boolean, got $other")
    }
    else throw new IllegalArgumentException(s"$what must be a constant, got $e")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "ewma",
      new ExpressionInfo(classOf[EwmaWindow].getName, "ewma"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "ewma(x, alpha, adjust) takes 3 arguments")
        EwmaWindow(args.head, doubleLit(args(1), "alpha"), boolLit(args(2), "adjust"))
      }),
    (
      "var_alpha_ewma",
      new ExpressionInfo(classOf[VarAlphaEwmaWindow].getName, "var_alpha_ewma"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "var_alpha_ewma(x, alpha) takes 2 arguments")
        VarAlphaEwmaWindow(args.head, args(1))
      }),
    (
      "dot_product_f",
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product_f(a, b) takes 2 arguments")
        DotProductF(args.head, args(1))
      }),
    (
      "dot_product_fd",
      new ExpressionInfo(classOf[DotProductFD].getName, "dot_product_fd"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product_fd(a, b) takes 2 arguments")
        DotProductFD(args.head, args(1))
      }),
    (
      "simhash_bits_f",
      new ExpressionInfo(classOf[SimhashBitsF].getName, "simhash_bits_f"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "simhash_bits_f(th[, offset]) takes 1 or 2 arguments")
        val offset =
          if (args.length == 2) doubleLit(args(1), "offset").toInt else 0
        SimhashBitsF(args.head, offset)
      }),
    (
      "bpe_encode",
      new ExpressionInfo(classOf[BpeEncodeF].getName, "bpe_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_encode(text) takes 1 argument")
        BpeEncodeF(args.head)
      }),
    (
      "bpe_decode",
      new ExpressionInfo(classOf[BpeDecodeF].getName, "bpe_decode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_decode(sym) takes 1 argument")
        BpeDecodeF(args.head)
      }),
    (
      "bpe_pairs",
      new ExpressionInfo(classOf[BpePairsF].getName, "bpe_pairs"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_pairs(sym) takes 1 argument")
        BpePairsF(args.head)
      }),
    (
      "bpe_ids",
      new ExpressionInfo(classOf[BpeIdsF].getName, "bpe_ids"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_ids(sym) takes 1 argument")
        BpeIdsF(args.head)
      }),
    (
      "qm_features",
      new ExpressionInfo(classOf[QmFeaturesF].getName, "qm_features"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "qm_features(text) takes 1 argument")
        QmFeaturesF(args.head)
      }),
    (
      "winnow_fp",
      new ExpressionInfo(classOf[WinnowF].getName, "winnow_fp"),
      (args: Seq[Expression]) => {
        require(args.length >= 1 && args.length <= 3,
          "winnow_fp(text[, n, w]) takes 1-3 arguments")
        val n = if (args.length >= 2) doubleLit(args(1), "n").toInt else 8
        val w = if (args.length >= 3) doubleLit(args(2), "w").toInt else 4
        WinnowF(args.head, n, w)
      }),
    (
      "text_counts",
      new ExpressionInfo(classOf[TextCountsF].getName, "text_counts"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "text_counts(text) takes 1 argument")
        TextCountsF(args.head)
      }),
    (
      "wordpiece_encode",
      new ExpressionInfo(classOf[WordpieceEncodeF].getName, "wordpiece_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "wordpiece_encode(text) takes 1 argument")
        WordpieceEncodeF(args.head)
      }),
    (
      "unigram_encode",
      new ExpressionInfo(classOf[UnigramEncodeF].getName, "unigram_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "unigram_encode(text) takes 1 argument")
        UnigramEncodeF(args.head)
      }))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
    // runtime path for an EXISTING session (extensions only apply at
    // build time): the rewrite joins the experimental batch, which
    // runs once after the main optimizer — same fixed point here
    // since the rule is idempotent
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(org.apache.spark.sql.graft.rules.RewriteTokenCount))
      spark.experimental.extraOptimizations =
        extra :+ org.apache.spark.sql.graft.rules.RewriteTokenCount
  }
}
