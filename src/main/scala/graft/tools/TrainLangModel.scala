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
  * Usage: runMain graft.tools.TrainLangModel [sfDir]
  */
object TrainLangModel {
  val B = 64

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

  /** Closed-form NB weights in integer micros: per lang (sorted),
    * (bucket weights, bias).
    */
  def fit(cnt: Map[(String, Int), Long], nd: Map[String, Long])
      : Seq[(String, Array[Long], Long)] = {
    val nDocs = nd.values.sum
    nd.keys.toSeq.sorted.map { l =>
      val tot = (0 until B).map(j => cnt.getOrElse((l, j), 0L)).sum
      val w = Array.tabulate(B) { j =>
        math.round(1e6 * math.log(
          (cnt.getOrElse((l, j), 0L) + 1).toDouble / (tot + B)))
      }
      val bias = math.round(1e6 * math.log(nd(l).toDouble / nDocs))
      (l, w, bias)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (cnt, nd) = counts(docs)
    val fitted = fit(cnt, nd)
    println(s"// trained on $sfDir: ${nd.values.sum} docs, langs ${nd.keys.toSeq.sorted.mkString(",")}")
    println(s"  val LangIdLangs: Seq[String] = Seq(${fitted.map(f => s""""${f._1}"""").mkString(", ")})")
    println(s"  val LangIdWMicro: Array[Array[Long]] = Array(")
    fitted.foreach { case (l, w, _) =>
      println(s"    // $l")
      println("    Array(\n" +
        w.grouped(8).map(g => "      " + g.mkString(", ")).mkString(",\n") + "\n    ),")
    }
    println("  )")
    println(s"  val LangIdBiasMicro: Array[Long] = Array(${fitted.map(_._3).mkString(", ")})")
    spark.stop()
  }
}
