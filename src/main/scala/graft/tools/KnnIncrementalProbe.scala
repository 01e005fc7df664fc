package graft.tools

import graft.pipeline.Similarity
import graft.sources.Sessions

/** A/B: NN-descent working-list build WITH round-20 new-flag rounds
  * (from round 2 on, the neighbor-of-neighbor join generates only
  * pairs with ≥1 edge new vs the previous round's g) vs WITHOUT
  * (`incremental = false` — the shipped default, full g⋈g every
  * round). The r19 prefilter cut bytes-per-candidate; this probe
  * measured whether cutting candidate COUNT bends the knn cpu-alpha
  * further. It does NOT at the shipped iters=3 — the verdict this
  * instrument produced (see Similarity.knnWorkingList): the first
  * two-sided spelling read +22% cpu / 7.1 vs 6.4 GB shuffle at 100×
  * in both pairs (new-new pairs generated twice) — decisively
  * negative; the corrected disjoint spelling read +17% / −11% across
  * two pairs (break-even within host noise) at +2% on the
  * deterministic byte witness, because KnnChurnProbe's measured
  * 0.45-0.6 round churn leaves only ~15-30% of volume skippable and
  * a post-prefilter candidate row is too cheap for that cut to repay
  * the anti/semi joins and per-round checkpoint. Kept so the
  * conclusion is re-measurable if the regime changes (iters≫3).
  *
  * Interleaved ×2 per scale in one JVM (host-noise stance); wall +
  * task-CPU + shuffle-write.
  * Usage: runMain graft.tools.KnnIncrementalProbe [sfDir] [scalesCsv]
  */
object KnnIncrementalProbe {

  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
  private val shufW = new java.util.concurrent.atomic.AtomicLong(0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
          shufW.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    })
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb1.count()

    def run(label: String, inc: Boolean, fx: org.apache.spark.sql.DataFrame): Unit = {
      val c0 = cpuNs.get(); val s0 = shufW.get(); val t0 = System.nanoTime()
      val n = Similarity.knnWorkingList(fx, incremental = inc).count()
      println(f"[newflag] $label%-22s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu=${(cpuNs.get() - c0) / 1e9}%9.2f s" +
        f"  shufW=${(shufW.get() - s0) / 1048576.0}%8.1f MB  ($n rows)")
      spark.catalog.clearCache()
    }

    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      fx.count()
      (1 to 2).foreach { i =>
        run(s"on ${n}x #$i", inc = true, fx)
        run(s"off ${n}x #$i", inc = false, fx)
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
