package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sources.Sessions

/** Stage-by-stage decomposition of the IvfChain build (r22): the
  * bitext_mine carrier probe read ~9.8 s wall / 81 s task at sf0.1 —
  * which stage owns it: the Lloyd train, the trained assignment
  * window, the cell-tile cosine join, or the margin windows?
  */
object IvfProbe {
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
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    embs.count()
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val tt0 = taskTime.get()
      val n = f
      println(f"[ivf] $what%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  task=${(taskTime.get() - tt0) / 1e3}%7.1f s ($n rows)")
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { rep =>
      time(s"kmeans train (2 iters) #$rep")(Similarity.kmeansCentroids(embs).count())
      val cents = Similarity.kmeansCentroids(embs).localCheckpoint(true)
      time(s"bitext candidates     #$rep")(
        Similarity.bitextCandidates(embs, cents).count())
      val cand = Similarity.bitextCandidates(embs, cents).localCheckpoint(true)
      time(s"mine margins          #$rep")(Similarity.bitextMineFrom(cand).count())
    }
    spark.stop()
  }
}
