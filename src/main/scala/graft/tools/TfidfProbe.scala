package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.TextOps._
import graft.sources.Sessions

/** Scratch A/B harness for the tfidf_top_tokens plan (round-6 verdict
  * item #5): times the production operator against candidate shapes,
  * interleaved, several rounds, so the winner is chosen on same-window
  * comparisons (this host's noise is time-varying — see BASELINE.md).
  */
object TfidfProbe {

  /** v2: no persist — both lineages re-derive the (doc_id, token)
    * aggregate and AQE/ReuseExchange decides what is shared.
    */
  private def noPersist(docs: DataFrame): DataFrame = {
    val nDf = broadcast(docs.agg(count(lit(1)).cast("double").as("n")))
    val tokenized = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("double").as("n_tok"),
      explode(tokens(col("text"))).as("token"))
    val perDocTok = tokenized.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("cnt_dt"), first(col("n_tok")).as("n_tok"))
    val tf = perDocTok.select(
      col("doc_id"), col("token"), (col("cnt_dt") / col("n_tok")).as("tf"))
    val df_ = perDocTok
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(nDf)
      .withColumn("idf", log(col("n") / col("df")))
      .drop("n")
    val scored = tf.join(broadcast(df_), Seq("token"))
      .select(col("doc_id"), col("token"), (col("tf") * col("idf")).as("tfidf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("token").as("top_token"), col("tfidf"))
  }

  /** v3: map-side per-doc token counting (array expressions, zero
    * shuffle for tf) + one small shuffle for df + window top-1.
    */
  private def arrayCount(docs: DataFrame): DataFrame = {
    val nDf = broadcast(docs.agg(count(lit(1)).cast("double").as("n")))
    val pairs = docs
      .select(col("doc_id"), tokens(col("text")).as("_t"))
      .select(
        col("doc_id"),
        size(col("_t")).cast("double").as("n_tok"),
        explode(transform(
          array_distinct(col("_t")),
          w => struct(
            w.as("token"),
            size(filter(col("_t"), x => x === w)).cast("long").as("cnt_dt"))))
          .as("tc"))
      .select(col("doc_id"), col("n_tok"), col("tc.token").as("token"),
        col("tc.cnt_dt").as("cnt_dt"))
      .persist()
    val df_ = pairs.groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(nDf)
      .withColumn("idf", log(col("n") / col("df")))
      .drop("n")
    val scored = pairs.join(broadcast(df_), Seq("token"))
      .select(col("doc_id"), col("token"),
        ((col("cnt_dt") / col("n_tok")) * col("idf")).as("tfidf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("token").as("top_token"), col("tfidf"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "current " -> graft.pipeline.Corpus.topTfidfTokens,
      "noPersist" -> noPersist,
      "arrayCnt" -> arrayCount)
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    (1 to rounds).foreach { r =>
      variants.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn(docs).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[tfidf] round $r $name $dt%7.2f s ($n rows)")
      }
    }
    // sanity: identical results
    val base = graft.pipeline.Corpus.topTfidfTokens(docs)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    variants.drop(1).foreach { case (name, fn) =>
      val got = fn(docs).orderBy("doc_id").collect().map(_.toString).toSeq
      println(s"[tfidf] $name matches current: ${got == base}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
