package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sources.Sessions

/** A/B: NN-descent working-list build with AQE's SMJ→shuffled-hash
  * conversion on vs off
  * (`spark.sql.adaptive.shuffledHashJoinLocalMapThreshold`, default 0
  * = disabled). The topk scoring joins sort pair-volume rows (the
  * candidate pool with one 256-byte embedding array attached) on
  * every descent round once the embeddings side outgrows the
  * broadcast threshold; a shuffled-hash join builds the n-row
  * embeddings side per partition instead and never sorts the pool.
  * Interleaved ×2 per scale (host-noise stance); wall + task-CPU.
  *
  * Usage: runMain graft.tools.KnnShjProbe [sfDir] [scalesCsv]
  */
object KnnShjProbe {

  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("10,30")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb1.count()

    def run(label: String, thresholdBytes: Long, fx: org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set(
        "spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", thresholdBytes.toString)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = Similarity.knnWorkingList(fx).count()
      println(f"[shj] $label%-26s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu=${(cpuNs.get() - c0) / 1e9}%9.2f s  ($n rows)")
      spark.conf.set("spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", "0")
      spark.catalog.clearCache()
    }

    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      fx.count()
      (1 to 2).foreach { i =>
        run(s"smj ${n}x #$i", 0L, fx)
        run(s"shj-64m ${n}x #$i", 64L * 1024 * 1024, fx)
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
