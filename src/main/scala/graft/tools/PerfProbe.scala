package graft.tools

import graft.sources.Sessions

/** Scratch harness for round-5 perf work: times a subset of declared
  * queries (args) against a scale dir exactly the way Bench does —
  * count + clearCache per query — and prints per-query wall seconds,
  * so regressions can be bisected without a full bench run.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.indicators.Indicators(graft.sources.Bars.fromEvents(spark, sfDir))
      .sma(Seq("close"), 5).toDF.count()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "ann_topk_lsh", "dedup_clusters", "ngram_counts", "tfidf_top_tokens",
      "dedup_jaccard", "dedup_lsh_pairs", "embedding_neardup_lsh",
      "dedup_simhash_pairs", "corpus_filter")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[probe] $name%-24s $dt%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
