package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal
import graft.sources.Sessions

/** Stage-by-stage timing of the synthetic-media chains (r21): where do
  * the image/audio/video chain builds spend their wall and task time —
  * the synth+decode map (suspected single-partition: documents.parquet
  * is one 0.6 MB scan split), the hash, or the pair joins?
  */
object MediaProbe {
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
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val tt0 = taskTime.get()
      val n = f
      println(f"[media] $what%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  task=${(taskTime.get() - tt0) / 1e3}%7.1f s ($n rows)")
      spark.catalog.clearCache()
    }
    time("image synth+decode+hash") {
      Multimodal.aHash(Multimodal.syntheticImages(spark, docs),
        Multimodal.ImageIODecoder).count()
    }
    time("video synth+hash") {
      Multimodal.aHash(Multimodal.syntheticVideoFrames(spark, docs),
        Multimodal.PcmDecoder).count()
    }
    val vh = Multimodal.aHash(Multimodal.syntheticVideoFrames(spark, docs),
      Multimodal.PcmDecoder).localCheckpoint(true)
    time("video sets distinct") {
      vh.select(expr("doc_id DIV 16").as("video_id"), col("ahash")).distinct().count()
    }
    time("video dup pairs (full)")(Multimodal.videoDupPairs(vh).count())
    time("video dup pairs again")(Multimodal.videoDupPairs(vh).count())
    // decompose the pair join: cardinalities + plan
    val sets = vh.select(expr("doc_id DIV 16").as("video_id"), col("ahash"))
      .distinct().persist()
    time("distinct hashes")(sets.select("ahash").distinct().count())
    val hashDf = sets.groupBy("ahash").agg(count(lit(1)).as("df"))
    time("hashes over dfCap 64")(hashDf.where(col("df") > 64).count())
    val frontier = sets.join(hashDf.where(col("df") <= 64), Seq("ahash"))
      .select(col("ahash"), col("video_id"))
    time("frontier rows")(frontier.count())
    val joined = frontier.as("a").join(frontier.as("b"),
      col("a.ahash") === col("b.ahash") && col("a.video_id") < col("b.video_id"))
    time("join output rows")(joined.count())
    Multimodal.videoDupPairs(vh).explain("formatted")
    spark.stop()
  }
}
