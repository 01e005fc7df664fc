package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{CheckpointUtil, Corpus, TextOps}
import graft.sources.Sessions

/** Round-22 A/B for the BigramChain build (13.5 s of the r21 bench's
  * chain bill): the shipped build explodes the corpus into bigrams
  * TWICE — once for the model aggregation, once for the score join —
  * because the model is checkpointed before the score pass, which
  * breaks the subtree identity ReuseExchange would need.
  *
  * Variant B groups the single exploded frame by (doc_id, bg) FIRST;
  * the model then re-aggregates that vocabulary-per-doc frame by bg
  * (both lineages share the (doc_id, bg) exchange → ReuseExchange runs
  * the explode once) and the score join carries counts instead of raw
  * occurrences: n_bigrams = Σc, logprob = Σ(c · logp) — algebraically
  * identical sums over bigints.
  */
object BigramProbe {

  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(TextOps.shingles(col("text"), 2)).as("bg"))

  /** Shipped spelling: model checkpoint, then a second explode+join. */
  def scoredA(docs: DataFrame): DataFrame = {
    val model = Corpus.bigramModel(bigrams(docs)).localCheckpoint(true)
    Corpus.bigramScore(bigrams(docs), model).localCheckpoint(true)
  }

  /** One-explode spelling (counts carried through the join). */
  def scoredB(docs: DataFrame): DataFrame = {
    val docBg = bigrams(docs).groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"))
    val c2 = docBg.groupBy("bg").agg(sum(col("c")).as("c2"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val model = c2.join(c1, Seq("w1"))
      .select(
        col("bg"),
        round(log(col("c2").cast("double") / col("c1")) * 1e6, 0)
          .cast("bigint").as("logp_micro"))
    docBg.join(model, Seq("bg"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_bigrams"),
        sum(col("logp_micro") * col("c")).as("logprob_micro"))
      .localCheckpoint(true)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) taskTime.addAndGet(te.taskMetrics.executorRunTime)
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def hashOf(df: DataFrame): Long =
      df.agg(coalesce(sum(xxhash64(col("doc_id"), col("n_bigrams"),
        col("logprob_micro"))), lit(0L))).head().getLong(0)
    var ref = 0L
    def run(name: String, f: => DataFrame): Unit = {
      val tt0 = taskTime.get(); val t0 = System.nanoTime()
      val out = f
      val h = hashOf(out)
      val dt = (System.nanoTime() - t0) / 1e9
      if (ref == 0L) ref = h
      val eq = if (h == ref) "EQ" else "MISMATCH"
      println(f"[bigram] $name ${dt}%7.2f s  task=${(taskTime.get() - tt0) / 1e3}%7.1f s  $eq")
      CheckpointUtil.checkpointRdd(out).foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { rep =>
      run(s"A(shipped)  rep$rep", scoredA(docs))
      run(s"B(one-pass) rep$rep", scoredB(docs))
    }
    spark.stop()
  }
}
