package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sources.Sessions

/** A/B: NN-descent working-list build WITH the round-19 binary
  * prefilter (candK=8·searchK, the shipped default) vs WITHOUT
  * (candK=Int.MaxValue — the exact r18 plan, no hamming pass).
  * The prefilter routes the ~n·(2·searchK)² candidate rows through
  * two 8-byte-fingerprint BROADCAST joins + an integer top-candK,
  * so the exact float scoring touches searchK+candK rows per node
  * instead of ~(2·searchK)² — the bytes-per-candidate-row lever the
  * r18 SMJ/shuffled-hash NEGATIVE pointed at.
  *
  * Interleaved ×2 per scale (host-noise stance); wall + task-CPU.
  * Usage: runMain graft.tools.KnnPrefilterProbe [sfDir] [scalesCsv]
  */
object KnnPrefilterProbe {

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

    def run(label: String, ck: Int, fx: org.apache.spark.sql.DataFrame): Unit = {
      val c0 = cpuNs.get(); val s0 = shufW.get(); val t0 = System.nanoTime()
      val n = Similarity.knnWorkingList(fx, candK = ck).count()
      println(f"[prefilter] $label%-22s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu=${(cpuNs.get() - c0) / 1e9}%9.2f s" +
        f"  shufW=${(shufW.get() - s0) / 1048576.0}%8.1f MB  ($n rows)")
      spark.catalog.clearCache()
    }

    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      fx.count()
      (1 to 2).foreach { i =>
        run(s"on ${n}x #$i", 0, fx)
        run(s"off ${n}x #$i", Int.MaxValue, fx)
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
