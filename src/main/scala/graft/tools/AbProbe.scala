package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sessions

/** Shared harness for the knn A/B instruments ([[KnnPrefilterProbe]],
  * [[KnnShjProbe]], [[KnnIncrementalProbe]], [[KnnFloatBcastProbe]]):
  * one JVM so every variant shares a host-noise window, task-CPU and
  * shuffle-write listener deltas (the byte delta is the deterministic
  * discriminator on a steal-prone host), a per-scale amplified
  * fixture, interleaved ×2 runs per variant, and checkpoint release
  * per scale tier. Each probe contributes only its tag, default
  * scales, and the (label, build) variants — the knob under test —
  * so a harness fix lands once, not four times.
  *
  * CLI contract (all probes): args(0) = sfDir (default
  * /root/testdata/sf0.1), args(1) = comma-separated scale multipliers;
  * SPARK_GRAFT_CPUS sets the local[...] thread count (default 4, the
  * scaling-discipline tier).
  */
object AbProbe {

  def run(
      tag: String, defaultScales: String, args: Array[String],
      variants: Seq[(String, (SparkSession, DataFrame) => Long)]): Unit = {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse(defaultScales)
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: the constant-bytes-per-partition
    // control (see [[ChainScale]]); default = cpus, the config every
    // committed A/B was measured under.
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus).toInt
    val spark = Sessions.builder(s"local[$cpus]", shufP).getOrCreate()
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

    def once(
        label: String, build: (SparkSession, DataFrame) => Long,
        fx: DataFrame): Unit = {
      // clearCache() drops CacheManager persists but NOT checkpoint RDD
      // blocks: each knnWorkingList build leaves its converged list
      // locally checkpointed with no handle here, so interleaved ×2
      // runs would accumulate one full-list snapshot per run per tier
      // in the block manager — a memory-pressure bias against LATER
      // runs at the big tiers (r20 ADVICE). Snapshot the persistent-RDD
      // set before the build and release the delta after the count,
      // mirroring the per-tier fixture release below.
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val c0 = cpuNs.get(); val s0 = shufW.get(); val t0 = System.nanoTime()
      val n = build(spark, fx)
      println(f"[$tag] $label%-22s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu=${(cpuNs.get() - c0) / 1e9}%9.2f s" +
        f"  shufW=${(shufW.get() - s0) / 1048576.0}%8.1f MB  ($n rows)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(false))
    }

    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      fx.count()
      (1 to 2).foreach { i =>
        variants.foreach { case (vl, build) => once(s"$vl ${n}x #$i", build, fx) }
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
