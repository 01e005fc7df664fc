package graft.tools

import graft.pipeline.Similarity
import graft.sources.Sessions

/** A/B: NN-descent exact pass with the round-20 FLOAT-JOIN broadcast
  * gate (pool ⋈ us / pool ⋈ vs forced BroadcastHashJoin while the
  * vector frame fits the 6M-row ≈ 1.6 GB budget) vs without
  * (`floatBcastRows = 0` — the r19 plan, where the same joins fall
  * into shuffle+sort once the corpus passes Spark's 10 MB auto
  * threshold ≈ 40k vectors). The r18/r19 chain instruments diagnosed
  * exactly this threshold crossing as the residual behind the knn
  * cpu-alpha (1.20 on the 10→100× decade); join strategy never
  * changes the ranked output, so the gate is a pure plan decision.
  *
  * Interleaved ×2 per scale in one JVM (host-noise stance); wall +
  * task-CPU + shuffle-write (the byte witness is the deterministic
  * discriminator on this host).
  * Usage: runMain graft.tools.KnnFloatBcastProbe [sfDir] [scalesCsv]
  */
object KnnFloatBcastProbe {

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

    def run(label: String, gate: Long, fx: org.apache.spark.sql.DataFrame): Unit = {
      val c0 = cpuNs.get(); val s0 = shufW.get(); val t0 = System.nanoTime()
      val n = Similarity.knnWorkingList(fx, floatBcastRows = gate).count()
      println(f"[floatbcast] $label%-20s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu=${(cpuNs.get() - c0) / 1e9}%9.2f s" +
        f"  shufW=${(shufW.get() - s0) / 1048576.0}%8.1f MB  ($n rows)")
      spark.catalog.clearCache()
    }

    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      fx.count()
      (1 to 2).foreach { i =>
        run(s"on ${n}x #$i", 6000000L, fx)
        run(s"off ${n}x #$i", 0L, fx)
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
