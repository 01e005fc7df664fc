package graft.tools

import graft.sources.Sessions

/** Scratch harness for perf work: times a subset of declared queries
  * (args) against a scale dir exactly the way Bench does — count +
  * clearCache per query — and prints per-query wall seconds, so
  * regressions can be bisected without a full bench run. Also prints
  * the JVM GC-time delta and the executor-side task-time sum per
  * query (via a stage listener): wall-time inflation WITHOUT a
  * matching rise in either points at host noise, not the engine.
  */
object PerfProbe {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  private def stealMillis(): Long =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = cpu.trim.split("\\s+")
      if (f.length > 8) f(8).toLong * 10 else 0L
    } catch { case _: Exception => 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // executor task-time accumulator (single JVM in local mode, so a
    // plain listener sum is exact)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    // shuffle WRITE bytes: the per-query exchange volume — the number
    // the compact-key work (round 12) moves
    val shufBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          taskTime.addAndGet(te.taskMetrics.executorRunTime)
          shufBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    })
    graft.indicators.Indicators(graft.sources.Bars.fromEvents(spark, sfDir))
      .sma(Seq("close"), 5).toDF.count()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "ann_topk_lsh", "dedup_clusters", "ngram_counts", "tfidf_top_tokens",
      "dedup_jaccard", "dedup_lsh_pairs", "embedding_neardup_lsh",
      "dedup_simhash_pairs", "corpus_filter")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val gc0 = gcMillis()
      val st0 = stealMillis()
      val tt0 = taskTime.get()
      val sb0 = shufBytes.get()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val gc = gcMillis() - gc0
      val st = stealMillis() - st0
      val tt = (taskTime.get() - tt0) / 1e3
      val sb = (shufBytes.get() - sb0) / 1e6
      println(f"[probe] $name%-24s $dt%8.2f s  gc=${gc}%5d ms  steal=${st}%6d ms  taskSum=$tt%8.1f s  shufW=$sb%8.1f MB  ($n rows)")
    }
    spark.stop()
  }
}
