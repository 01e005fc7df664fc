package graft.tools

import graft.pipeline.Similarity

/** A/B: NN-descent working-list build with AQE's SMJ→shuffled-hash
  * conversion on vs off
  * (`spark.sql.adaptive.shuffledHashJoinLocalMapThreshold`, default 0
  * = disabled). The topk scoring joins sort pair-volume rows (the
  * candidate pool with one 256-byte embedding array attached) on
  * every descent round once the embeddings side outgrows the
  * broadcast threshold; a shuffled-hash join builds the n-row
  * embeddings side per partition instead and never sorts the pool.
  * Interleaved ×2 per scale (host-noise stance); wall + task-CPU +
  * shuffle-write (via the shared [[AbProbe]] harness).
  *
  * Usage: runMain graft.tools.KnnShjProbe [sfDir] [scalesCsv]
  */
object KnnShjProbe {

  private def withThreshold(bytes: Long)(
      s: org.apache.spark.sql.SparkSession,
      fx: org.apache.spark.sql.DataFrame): Long = {
    s.conf.set(
      "spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", bytes.toString)
    try Similarity.knnWorkingList(fx).count()
    finally s.conf.set("spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", "0")
  }

  def main(args: Array[String]): Unit =
    AbProbe.run("shj", "10,30", args, Seq(
      "smj" -> withThreshold(0L) _,
      "shj-64m" -> withThreshold(64L * 1024 * 1024) _))
}
