package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DISTRIBUTED trainer for the committed lang_id_model weights
  * ([[graft.pipeline.Corpus.LangIdWMicro]]) — the TrainQualityModel
  * stance applied to language identification: the in-repo record of
  * "trained by exactly this procedure", with the weight table the
  * committed artifact and the procedure the code.
  *
  * Model: multinomial Naive Bayes over 64 hashed-token buckets — the
  * fastText-shaped linear per-language scorer (hashed bag-of-words,
  * one integer dot product per language at serve time, argmax
  * decides). Training is CLOSED-FORM, so unlike the quality model's
  * gradient loop there is no optimizer at all:
  *
  *   w[l][j]  = round(1e6 · ln((cnt[l][j] + 1) / (tot[l] + B)))
  *   bias[l]  = round(1e6 · ln(docs[l] / n_docs))
  *
  * (Laplace-smoothed bucket log-likelihoods + class log-prior.)
  *
  * Scale shape: ONE distributed pass — explode tokens, groupBy
  * (lang, bucket) with map-side combine — reduces the corpus to a
  * |langs|·B-row count table (320 rows here; bounded by the label
  * set, not the corpus), and only that reaches the driver for the
  * log/round step. Deterministic end to end: exact integer counts,
  * JVM ln, half-up micro rounding — so the trainer re-derives the
  * COMMITTED weights exactly (PipelineSpec pins the round trip on the
  * training corpus).
  *
  * Honesty note (recorded where the weights are committed): the
  * synthetic corpus draws every language's text from nearly the same
  * token distribution, so the achievable accuracy is bounded near the
  * majority-class rate — `lang_id_agreement` measures it; the
  * machinery (distributed counting, integer serve path, agreement
  * instrument) is the deliverable, exactly as ann_recall_opq records
  * the isotropic corpus's ~0 rotation gain.
  *
  * CHAR-TRIGRAM NEGATIVE RESULT (round 17, measured): fastText's real
  * feature space is hashed char 2-4-grams, so [[countsC3]] trains the
  * same closed-form NB over 256 hashed char-trigram buckets ("lc_"
  * salt) as the candidate upgrade. Trained on sf0.001 and evaluated
  * by [[evalAccuracy]]: char-trigram 260‰ vs token-bucket 396‰ at
  * sf0.1 (234‰ vs 418‰ at sf0.01) — STRICTLY WORSE. Cause, not
  * speculation: every language draws from the SAME ~30-word English
  * vocabulary, so trigrams carry no orthography signal (that is what
  * char n-grams buy on real text), and with so few distinct words the
  * 256 buckets are already near-injective over the ~200 distinct
  * trigrams — the loss is the signal dilution of splitting each
  * word's weak frequency-mixture evidence across boundary-spanning
  * grams, not hash collisions. The token model therefore stays the
  * declared lang_id_model; the comparison is pinned reproducible in
  * PipelineSpec so the measurement can't drift into folklore.
  *
  * Usage: runMain graft.tools.TrainLangModel [sfDir] [evalDir]
  */
object TrainLangModel {
  val B = 64
  /** Char-trigram bucket count — wider than the token space's 64
    * because the trigram type space is larger (fastText's hashing
    * trick at fixture scale).
    */
  val BC = 256

  /** The (lang, bucket) → count table plus per-lang doc counts,
    * computed distributed; only |langs|·(B+1) numbers reach the
    * driver.
    */
  def counts(docs: DataFrame): (Map[(String, Int), Long], Map[String, Long]) = {
    val tok = docs.select(
      col("lang"),
      explode(graft.pipeline.TextOps.tokens(col("text"))).as("t"))
    val bkt = pmod(
      graft.pipeline.TextOps.hash32(concat(lit("li_"), col("t"))),
      lit(B.toLong)).cast("int")
    val cnt = tok.select(col("lang"), bkt.as("j"))
      .groupBy("lang", "j").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nd = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (cnt, nd)
  }

  /** The char-trigram variant of [[counts]]: fastText's feature space
    * (hashed char n-grams) instead of whole tokens — same ONE
    * distributed (lang, bucket) count pass, BC buckets, "lc_" salt.
    */
  def countsC3(docs: DataFrame): (Map[(String, Int), Long], Map[String, Long]) = {
    val g = docs.select(
      col("lang"),
      explode(graft.pipeline.TextOps.charGrams(col("text"), 3)).as("g"))
    val bkt = pmod(
      graft.pipeline.TextOps.hash32(concat(lit("lc_"), col("g"))),
      lit(BC.toLong)).cast("int")
    val cnt = g.select(col("lang"), bkt.as("j"))
      .groupBy("lang", "j").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nd = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (cnt, nd)
  }

  /** Closed-form NB weights in integer micros: per lang (sorted),
    * (bucket weights, bias). `nBuckets` is the feature width (64
    * token buckets or BC char-trigram buckets).
    */
  def fit(cnt: Map[(String, Int), Long], nd: Map[String, Long],
      nBuckets: Int = B): Seq[(String, Array[Long], Long)] = {
    val nDocs = nd.values.sum
    nd.keys.toSeq.sorted.map { l =>
      val tot = (0 until nBuckets).map(j => cnt.getOrElse((l, j), 0L)).sum
      val w = Array.tabulate(nBuckets) { j =>
        math.round(1e6 * math.log(
          (cnt.getOrElse((l, j), 0L) + 1).toDouble / (tot + nBuckets)))
      }
      val bias = math.round(1e6 * math.log(nd(l).toDouble / nDocs))
      (l, w, bias)
    }
  }

  private def printTable(
      name: String, fitted: Seq[(String, Array[Long], Long)]): Unit = {
    println(s"  val ${name}WMicro: Array[Array[Long]] = Array(")
    fitted.foreach { case (l, w, _) =>
      println(s"    // $l")
      println("    Array(\n" +
        w.grouped(8).map(g => "      " + g.mkString(", ")).mkString(",\n") + "\n    ),")
    }
    println("  )")
    println(s"  val ${name}BiasMicro: Array[Long] = Array(${fitted.map(_._3).mkString(", ")})")
  }

  /** JVM argmax accuracy of a fitted table over an eval frame —
    * (correct, total), computed driver-side from the same md5 buckets
    * the serve path uses. Eval instrument only; the declared accuracy
    * row is lang_id_agreement.
    */
  def evalAccuracy(
      docs: DataFrame,
      fitted: Seq[(String, Array[Long], Long)],
      salt: String,
      nBuckets: Int,
      charGrams: Boolean): (Long, Long) = {
    def h32(s: String) = graft.pipeline.TextOps.hash32Jvm(s)
    val langs = fitted.map(_._1)
    val rows = docs.select("lang", "text").collect()
    var correct = 0L
    rows.foreach { r =>
      val text = r.getString(1)
      // split with limit -1: Spark's split(text, ' ') KEEPS trailing
      // empty tokens — the serve/training feature multiset; Java's
      // default split drops them and would score a subtly different
      // model on any doc with trailing whitespace
      val feats =
        if (charGrams) (0 to text.length - 3).map(i => text.substring(i, i + 3))
        else text.split(" ", -1).toSeq
      val bkts = feats.map(f => (h32(s"$salt$f") % nBuckets).toInt)
      val scores = fitted.map { case (_, w, b) => b + bkts.map(w(_)).sum }
      val best = langs.indices.minBy(i => (-scores(i), langs(i)))
      if (langs(best) == r.getString(0)) correct += 1
    }
    (correct, rows.length.toLong)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val evalDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (cnt, nd) = counts(docs)
    val fitted = fit(cnt, nd)
    println(s"// trained on $sfDir: ${nd.values.sum} docs, langs ${nd.keys.toSeq.sorted.mkString(",")}")
    println(s"  val LangIdLangs: Seq[String] = Seq(${fitted.map(f => s""""${f._1}"""").mkString(", ")})")
    printTable("LangId", fitted)
    val (cntC, ndC) = countsC3(docs)
    val fittedC = fit(cntC, ndC, BC)
    printTable("LangIdC3", fittedC)
    val ev = spark.read.parquet(s"$evalDir/documents.parquet")
    val (tokC, tokN) = evalAccuracy(ev, fitted, "li_", B, charGrams = false)
    val (c3C, c3N) = evalAccuracy(ev, fittedC, "lc_", BC, charGrams = true)
    println(s"// eval on $evalDir: token-bucket model ${tokC * 1000 / tokN}pm " +
      s"($tokC/$tokN), char-trigram model ${c3C * 1000 / c3N}pm ($c3C/$c3N)")
    spark.stop()
  }
}
